"""NAD83(2011) <-> ITRF 14-parameter Helmert frame hop, from public
EPSG/IERS constants — the real replacement for round 1's constant
lon/lat-offset stand-in.

Semantics re-expressed from the reference's hardcoded PROJ pipelines
(``reference/vyperdatum/pipeline.py:2-16``): lat/lon deg -> radians ->
geodetic-to-cartesian on GRS80 -> INVERSE coordinate-frame Helmert
(the published parameters map ITRF->NAD83; the hop runs NAD83->ITRF)
-> cartesian-to-geodetic -> degrees. Without a coordinate epoch the
rate terms vanish at t = t_epoch (PROJ's behavior for epoch-less
coordinates), leaving a static 7-parameter transform; the inverse uses
the standard small-angle negated-parameter form (second-order error
< 1e-7 m — far below the output quantization).

Everything here is mirrored in DuckDB SQL (``sql_*`` helpers below)
with IDENTICAL operation order and constants embedded via ``repr``
(shortest round-trip doubles), so engine and oracle agree bit-for-bit
up to libm 1-ulp noise, which the output quantization (1e-7 deg ~ 1 cm
horizontal, 1e-4 m vertical — documented engine semantics) absorbs.
"""

from __future__ import annotations

import numpy as np

# GRS80 (public): semi-major axis and flattening
A = 6378137.0
F = 1.0 / 298.257222101
E2 = F * (2.0 - F)
DEG2RAD = np.pi / 180.0
RAD2DEG = 180.0 / np.pi
AS2RAD = DEG2RAD / 3600.0

# ITRF->NAD83(2011) coordinate-frame params at t_epoch
# (tx, ty, tz [m], rx, ry, rz [arcsec], s [ppm]) — the same constants the
# reference embeds in its PROJ pipeline strings (pipeline.py:2-16).
PARAMS_ITRF2008 = (0.99343, -1.90331, -0.52655,
                   0.02591467, 0.00942644999999999, 0.01159935, 0.00171504)
PARAMS_ITRF2014 = (1.0053, -1.9092, -0.5416,
                   0.0267814, -0.0004203, 0.0109321, 0.00037)

FRAME_PARAMS = {"ITRF2008": PARAMS_ITRF2008, "ITRF2014": PARAMS_ITRF2014}

LONLAT_DECIMALS = 7  # hop output quantization: ~1 cm horizontal
Z_DECIMALS = 4  # ~0.1 mm vertical


def _neg_params(params):
    """NAD83->ITRF direction: negated ITRF->NAD83 params, angles in
    radians, scale applied as a single multiplier."""
    tx, ty, tz, rx, ry, rz, s = params
    return (-tx, -ty, -tz, -rx * AS2RAD, -ry * AS2RAD, -rz * AS2RAD,
            1.0 + (-s * 1e-6))


def geodetic_to_cart(lon, lat, h):
    lam = lon * DEG2RAD
    phi = lat * DEG2RAD
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    nn = A / np.sqrt(1.0 - E2 * sphi * sphi)
    cx = (nn + h) * cphi * np.cos(lam)
    cy = (nn + h) * cphi * np.sin(lam)
    cz = (nn * (1.0 - E2) + h) * sphi
    return cx, cy, cz


def cart_to_geodetic(cx, cy, cz):
    """Fixed-4-iteration latitude recovery (sub-1e-9 deg converged for
    |h| < 10 km) — iteration count is part of the defined semantics so
    the SQL mirror can unroll it."""
    pp = np.sqrt(cx * cx + cy * cy)
    lam = np.arctan2(cy, cx)
    phi = np.arctan2(cz, pp * (1.0 - E2))
    for _ in range(4):
        sphi = np.sin(phi)
        nn = A / np.sqrt(1.0 - E2 * sphi * sphi)
        phi = np.arctan2(cz + E2 * nn * sphi, pp)
    sphi = np.sin(phi)
    nn = A / np.sqrt(1.0 - E2 * sphi * sphi)
    h = pp / np.cos(phi) - nn
    return lam * RAD2DEG, phi * RAD2DEG, h


def frame_hop(lon, lat, z, frame: str):
    """NAD83(2011) -> ``frame`` 3-D hop; returns (lon2, lat2, z2)
    quantized to the documented decimals. Vectorized over numpy
    arrays."""
    tx, ty, tz, rx, ry, rz, m = _neg_params(FRAME_PARAMS[frame])
    cx, cy, cz = geodetic_to_cart(lon, lat, z)
    hx = tx + m * (cx + rz * cy - ry * cz)
    hy = ty + m * (-rz * cx + cy + rx * cz)
    hz = tz + m * (ry * cx - rx * cy + cz)
    lon2, lat2, h2 = cart_to_geodetic(hx, hy, hz)
    return (np.round(lon2, LONLAT_DECIMALS), np.round(lat2, LONLAT_DECIMALS),
            np.round(h2, Z_DECIMALS))


# ----------------------------------------------------------- SQL mirror ---


def sql_rn(e: str, n: int) -> str:
    """SQL bit-identical to ``np.round(e, n)`` (rint on the binary
    product, ties to even) — the generalized form of oracle._r3."""
    scale = f"{10.0 ** n:.1f}"
    y = f"(({e}) * {scale})"
    f_ = f"floor({y})"
    return (
        f"((CASE WHEN {y} - {f_} > 0.5 THEN {f_} + 1 "
        f"WHEN {y} - {f_} < 0.5 THEN {f_} "
        f"WHEN {f_} / 2 = floor({f_} / 2) THEN {f_} "
        f"ELSE {f_} + 1 END) / {scale})"
    )


def sql_hop_ctes(prefix: str, src: str, lon: str, lat: str, z: str,
                 frame_expr: str, key_cols: str) -> str:
    """CTE chain computing the quantized NAD83->ITRF hop for every row
    of ``src``: emits ``{prefix}hop(key_cols, hlon, hlat, hz)``.

    ``frame_expr`` selects the param set per row (the region's
    geoid_frame column); rows whose frame is NAD83(2011) pass through
    unchanged. Operation order matches frame_hop exactly; constants are
    repr-embedded doubles."""
    d2r = "(pi() / 180.0)"
    r2d = "(180.0 / pi())"
    e2 = repr(E2)
    one_e2 = repr(1.0 - E2)
    a = repr(A)

    def pcase(i: int) -> str:
        """Per-frame negated-param constant #i as a CASE over frames
        (``vh_hop_frame`` is the frame_expr value carried from c0).
        All hop intermediates are vh_-prefixed so they can never
        collide with caller key columns (cx/cy/lam/... are common)."""
        whens = " ".join(
            f"WHEN '{fr}' THEN {repr(_neg_params(p)[i])}"
            for fr, p in sorted(FRAME_PARAMS.items())
        )
        return f"(CASE vh_hop_frame {whens} ELSE NULL END)"

    tx, ty, tz, rx, ry, rz, m = (pcase(i) for i in range(7))

    # 4 unrolled latitude iterations, same recurrence as cart_to_geodetic
    phi_iter = ""
    prev = "vh_phi0"
    for k in range(1, 5):
        phi_iter += f""",
{prefix}i{k} AS (
  SELECT *, atan2(vh_hz + {e2} * ({a} / sqrt(1.0 - {e2} * sin({prev}) * sin({prev}))) * sin({prev}), vh_pp) AS vh_phi{k}
  FROM {prefix}i{k - 1}
)"""
        prev = f"vh_phi{k}"

    return f"""
{prefix}c0 AS (
  SELECT {key_cols}, {frame_expr} AS vh_hop_frame, ({lon}) AS vh_hlon0, ({lat}) AS vh_hlat0, ({z}) AS vh_hz0,
    ({lon}) * {d2r} AS vh_lam, ({lat}) * {d2r} AS vh_phi
  FROM {src}
),
{prefix}c1 AS (
  SELECT *, {a} / sqrt(1.0 - {e2} * sin(vh_phi) * sin(vh_phi)) AS vh_nn FROM {prefix}c0
),
{prefix}c2 AS (
  SELECT *, (vh_nn + vh_hz0) * cos(vh_phi) * cos(vh_lam) AS vh_cx,
            (vh_nn + vh_hz0) * cos(vh_phi) * sin(vh_lam) AS vh_cy,
            (vh_nn * {one_e2} + vh_hz0) * sin(vh_phi) AS vh_cz
  FROM {prefix}c1
),
{prefix}h AS (
  SELECT *, {tx} + {m} * (vh_cx + {rz} * vh_cy - {ry} * vh_cz) AS vh_hx,
            {ty} + {m} * (0.0 - {rz} * vh_cx + vh_cy + {rx} * vh_cz) AS vh_hy,
            {tz} + {m} * ({ry} * vh_cx - {rx} * vh_cy + vh_cz) AS vh_hz
  FROM {prefix}c2
),
{prefix}i0 AS (
  SELECT *, sqrt(vh_hx * vh_hx + vh_hy * vh_hy) AS vh_pp, atan2(vh_hy, vh_hx) AS vh_lam2,
    atan2(vh_hz, sqrt(vh_hx * vh_hx + vh_hy * vh_hy) * {one_e2}) AS vh_phi0
  FROM {prefix}h
){phi_iter},
{prefix}g AS (
  SELECT *, {a} / sqrt(1.0 - {e2} * sin(vh_phi4) * sin(vh_phi4)) AS vh_n4 FROM {prefix}i4
),
{prefix}hop AS (
  SELECT {key_cols},
    CASE WHEN vh_hop_frame = 'NAD83(2011)' THEN vh_hlon0
         ELSE {sql_rn("vh_lam2 * " + r2d, LONLAT_DECIMALS)} END AS hlon,
    CASE WHEN vh_hop_frame = 'NAD83(2011)' THEN vh_hlat0
         ELSE {sql_rn("vh_phi4 * " + r2d, LONLAT_DECIMALS)} END AS hlat,
    CASE WHEN vh_hop_frame = 'NAD83(2011)' THEN vh_hz0
         ELSE {sql_rn("vh_pp / cos(vh_phi4) - vh_n4", Z_DECIMALS)} END AS hz
  FROM {prefix}g
)"""
