"""From-scratch UTM / transverse-Mercator forward + inverse on GRS80,
via the public Krüger series in the third flattening n (the standard
published coefficients through n^4; see Karney 2011 "Transverse
Mercator with an accuracy of a few nanometers" for the series family).

This completes SURVEY M1: the reference accepts projected horizontal
CRSs (state-plane/UTM EPSG codes) and splits them into horizontal +
vertical before transforming (``reference/vyperdatum/vypercrs.py:685-812``,
``core.py:198-248``; its golden tests drive UTM and state-plane inputs,
``tests/test_core.py:89-199``). Here the projected-input path is:
inverse-project to geographic NAD83 -> PIP -> datum transform.

Parity discipline (same as core/helmert.py): hyperbolics and inverse
trig are spelled in exp/ln/atan2/sqrt primitives IDENTICALLY in numpy
and in the generated DuckDB SQL; outputs are quantized (easting /
northing to 1e-4 m, recovered lon/lat to 1e-7 deg) so 1-ulp libm noise
cannot flip a comparison.
"""

from __future__ import annotations

import numpy as np

from vyperdatum_ray.core.helmert import A, E2, DEG2RAD, RAD2DEG, sql_rn

K0 = 0.9996
FALSE_EASTING = 500000.0
E_ = np.sqrt(E2)  # first eccentricity
N3 = (1.0 - np.sqrt(1.0 - E2)) / (1.0 + np.sqrt(1.0 - E2))  # third flattening

# rectifying radius
A_BAR = (A / (1.0 + N3)) * (1.0 + N3 * N3 / 4.0 + N3 ** 4 / 64.0)

# Krüger series coefficients (public; through n^4)
ALPHA = (
    N3 / 2.0 - 2.0 / 3.0 * N3 ** 2 + 5.0 / 16.0 * N3 ** 3 + 41.0 / 180.0 * N3 ** 4,
    13.0 / 48.0 * N3 ** 2 - 3.0 / 5.0 * N3 ** 3 + 557.0 / 1440.0 * N3 ** 4,
    61.0 / 240.0 * N3 ** 3 - 103.0 / 140.0 * N3 ** 4,
    49561.0 / 161280.0 * N3 ** 4,
)
BETA = (
    N3 / 2.0 - 2.0 / 3.0 * N3 ** 2 + 37.0 / 96.0 * N3 ** 3 - 1.0 / 360.0 * N3 ** 4,
    N3 ** 2 / 48.0 + N3 ** 3 / 15.0 - 437.0 / 1440.0 * N3 ** 4,
    17.0 / 480.0 * N3 ** 3 - 37.0 / 840.0 * N3 ** 4,
    4397.0 / 161280.0 * N3 ** 4,
)
# conformal -> geodetic latitude series
DELTA = (
    2.0 * N3 - 2.0 / 3.0 * N3 ** 2 - 2.0 * N3 ** 3,
    7.0 / 3.0 * N3 ** 2 - 8.0 / 5.0 * N3 ** 3,
    56.0 / 15.0 * N3 ** 3,
)

E_DECIMALS = 4  # 0.1 mm easting/northing quantization
LL_DECIMALS = 7  # recovered lon/lat quantization


def zone_central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


# exp/ln-spelled hyperbolics — the SAME primitive set the SQL uses, so
# both sides share one expression tree (np.sinh etc. would be a
# different libm path)
def _sinh(x):
    return (np.exp(x) - np.exp(-x)) / 2.0


def _cosh(x):
    return (np.exp(x) + np.exp(-x)) / 2.0


def _atanh(x):
    return 0.5 * np.log((1.0 + x) / (1.0 - x))


def _asin(x):
    return np.arctan2(x, np.sqrt(1.0 - x * x))


def utm_forward(lon, lat, zone: int):
    """Geographic NAD83 -> UTM (meters), quantized to 0.1 mm."""
    lam0 = zone_central_meridian(zone) * DEG2RAD
    phi = lat * DEG2RAD
    lamd = lon * DEG2RAD - lam0
    s = np.sin(phi)
    t = _sinh(_atanh(s) - E_ * _atanh(E_ * s))
    xi = np.arctan2(t, np.cos(lamd))
    eta = _atanh(np.sin(lamd) / np.sqrt(1.0 + t * t))
    xi_s = xi
    eta_s = eta
    for j, a_j in enumerate(ALPHA, start=1):
        xi_s = xi_s + a_j * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        eta_s = eta_s + a_j * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    easting = FALSE_EASTING + K0 * A_BAR * eta_s
    northing = K0 * A_BAR * xi_s
    return np.round(easting, E_DECIMALS), np.round(northing, E_DECIMALS)


def utm_inverse(easting, northing, zone: int):
    """UTM (meters) -> geographic NAD83, quantized to 1e-7 deg."""
    lam0 = zone_central_meridian(zone) * DEG2RAD
    xi = northing / (K0 * A_BAR)
    eta = (easting - FALSE_EASTING) / (K0 * A_BAR)
    xi_p = xi
    eta_p = eta
    for j, b_j in enumerate(BETA, start=1):
        xi_p = xi_p - b_j * np.sin(2.0 * j * xi) * _cosh(2.0 * j * eta)
        eta_p = eta_p - b_j * np.cos(2.0 * j * xi) * _sinh(2.0 * j * eta)
    chi = _asin(np.sin(xi_p) / _cosh(eta_p))
    phi = chi
    for j, d_j in enumerate(DELTA, start=1):
        phi = phi + d_j * np.sin(2.0 * j * chi)
    lam = lam0 + np.arctan2(_sinh(eta_p), np.cos(xi_p))
    return (np.round(lam * RAD2DEG, LL_DECIMALS),
            np.round(phi * RAD2DEG, LL_DECIMALS))


# ----------------------------------------------------------- SQL mirror ---


def _s_sinh(x: str) -> str:
    return f"((exp({x}) - exp(0.0 - ({x}))) / 2.0)"


def _s_cosh(x: str) -> str:
    return f"((exp({x}) + exp(0.0 - ({x}))) / 2.0)"


def _s_atanh(x: str) -> str:
    return f"(0.5 * ln((1.0 + ({x})) / (1.0 - ({x}))))"


def sql_utm_roundtrip_ctes(prefix: str, src: str, lon: str, lat: str,
                           zone: int, key_cols: str) -> str:
    """CTE chain mirroring ``utm_forward`` then ``utm_inverse``: emits
    ``{prefix}utm(key_cols, easting, northing, rlon, rlat)`` — the
    projected coordinates and the recovered geographic ones, both
    quantized exactly as the numpy kernels. All intermediates are
    vp_-prefixed to avoid caller column collisions."""
    lam0 = repr(zone_central_meridian(zone) * (np.pi / 180.0))
    d2r = "(pi() / 180.0)"
    r2d = "(180.0 / pi())"
    e_ = repr(float(E_))
    ka = repr(float(K0 * A_BAR))
    fe = repr(FALSE_EASTING)

    fwd_xi = "vp_xi"
    fwd_eta = "vp_eta"
    for j, a_j in enumerate(ALPHA, start=1):
        fwd_xi = (f"({fwd_xi} + {repr(float(a_j))} * sin({2.0 * j} * vp_xi)"
                  f" * {_s_cosh(f'{2.0 * j} * vp_eta')})")
        fwd_eta = (f"({fwd_eta} + {repr(float(a_j))} * cos({2.0 * j} * vp_xi)"
                   f" * {_s_sinh(f'{2.0 * j} * vp_eta')})")
    inv_xi = "vp_ixi"
    inv_eta = "vp_ieta"
    for j, b_j in enumerate(BETA, start=1):
        inv_xi = (f"({inv_xi} - {repr(float(b_j))} * sin({2.0 * j} * vp_ixi)"
                  f" * {_s_cosh(f'{2.0 * j} * vp_ieta')})")
        inv_eta = (f"({inv_eta} - {repr(float(b_j))} * cos({2.0 * j} * vp_ixi)"
                   f" * {_s_sinh(f'{2.0 * j} * vp_ieta')})")
    phi = "vp_chi"
    for j, d_j in enumerate(DELTA, start=1):
        phi = f"({phi} + {repr(float(d_j))} * sin({2.0 * j} * vp_chi))"

    return f"""
{prefix}p0 AS (
  SELECT {key_cols}, ({lat}) * {d2r} AS vp_phi, ({lon}) * {d2r} - {lam0} AS vp_lamd
  FROM {src}
),
{prefix}p1 AS (
  SELECT *, {_s_sinh(f"{_s_atanh('sin(vp_phi)')} - {e_} * {_s_atanh(f'{e_} * sin(vp_phi)')}")} AS vp_t
  FROM {prefix}p0
),
{prefix}p2 AS (
  SELECT *, atan2(vp_t, cos(vp_lamd)) AS vp_xi,
    {_s_atanh('sin(vp_lamd) / sqrt(1.0 + vp_t * vp_t)')} AS vp_eta
  FROM {prefix}p1
),
{prefix}p3 AS (
  SELECT *, {sql_rn(f"{fe} + {ka} * {fwd_eta}", E_DECIMALS)} AS easting,
            {sql_rn(f"{ka} * {fwd_xi}", E_DECIMALS)} AS northing
  FROM {prefix}p2
),
{prefix}p4 AS (
  SELECT *, northing / {ka} AS vp_ixi, (easting - {fe}) / {ka} AS vp_ieta
  FROM {prefix}p3
),
{prefix}p5 AS (
  SELECT *, {inv_xi} AS vp_xip, {inv_eta} AS vp_etap FROM {prefix}p4
),
{prefix}p6 AS (
  SELECT *, atan2(sin(vp_xip) / {_s_cosh('vp_etap')},
                  sqrt(1.0 - (sin(vp_xip) / {_s_cosh('vp_etap')})
                             * (sin(vp_xip) / {_s_cosh('vp_etap')}))) AS vp_chi
  FROM {prefix}p5
),
{prefix}utm AS (
  SELECT {key_cols}, easting, northing,
    {sql_rn(f"({lam0} + atan2({_s_sinh('vp_etap')}, cos(vp_xip))) * {r2d}", LL_DECIMALS)} AS rlon,
    {sql_rn(f"({phi}) * {r2d}", LL_DECIMALS)} AS rlat
  FROM {prefix}p6
)"""
