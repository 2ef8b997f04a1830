"""Array-in / array-out points API — the reference's
``VyperPoints.transform_points`` surface (``points.py:24-102``) on top
of the Ray pipeline, so a reference user can switch call-for-call.

Semantics:

* NaN x/y inputs propagate: NaN z/unc, region -1 — never dropped
  (M6, reference points.py:71-102),
* ``sample_distance`` routes through the O2 coarse-cell accelerator
  (transform distinct cell centers once, assign per point),
* results: ``(x, y, z, unc, region_index)`` with z rounded to 3
  (core.py:462) and region_index int8 with -1 outside coverage.

Small inputs run through the same actor classes directly (no Ray
session needed); pass ``use_ray=True`` to run the full Dataset
pipeline for large arrays.
"""

from __future__ import annotations

import numpy as np

from vyperdatum_ray.catalog import Catalog


def transform_points(
    catalog: Catalog,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray | None = None,
    from_datum: str = "ellipse",
    to_datum: str = "mllw",
    in_is_height: bool = True,
    out_is_height: bool = False,
    sample_distance: float | None = None,
    input_crs=None,
):
    """Transform coordinate arrays; returns (x, y, z, unc, region_index).

    ``input_crs`` (optional): EPSG code / 'EPSG:nnnn' / (horizontal,
    vertical) tuple / compound WKT string — UTM and state-plane (LCC)
    inputs are inverse-projected first (core/projection.py);
    unsupported CRSs raise (core/crs.py) instead of being silently
    treated as geographic NAD83."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if input_crs is not None:
        from vyperdatum_ray.core.crs import parse_crs
        from vyperdatum_ray.core.projection import (lcc_inverse, om_inverse,
                                                    tm_inverse, utm_inverse)

        info = parse_crs(input_crs)
        if info.vertical != "ellipse":
            from_datum = info.vertical
        if info.kind == "utm":
            x, y = utm_inverse(x, y, info.zone)
        elif info.kind == "lcc":
            x, y = lcc_inverse(x, y, info.zone)
        elif info.kind == "tm":
            x, y = tm_inverse(x, y, info.zone)
        elif info.kind == "om":
            x, y = om_inverse(x, y, info.zone)
    n = len(x)
    zin = np.zeros(n) if z is None else np.asarray(z, dtype=np.float64)
    nan_mask = np.isnan(x) | np.isnan(y)

    ans_z = np.full(n, np.nan)
    ans_unc = np.full(n, np.nan)
    ans_region = np.full(n, -1, dtype=np.int8)
    valid = ~nan_mask
    if valid.any():
        vx, vy, vz = x[valid], y[valid], zin[valid]
        if sample_distance:
            # O2: transform distinct coarse-cell centers (z = 0), then
            # per point: cell separation + the point's own z, exactly
            # the reference's sample_array binning which adds input z to
            # the sampled sep (points.py:86). Bias offsets keep the key
            # packing valid for negative cell indices (southern/western
            # hemispheres).
            cx = np.floor(vx / sample_distance).astype(np.int64) + (1 << 20)
            cy = np.floor(vy / sample_distance).astype(np.int64) + (1 << 20)
            key = cx * (1 << 21) + cy
            ukey, inv = np.unique(key, return_inverse=True)
            ux = (ukey // (1 << 21) - (1 << 20) + 0.5) * sample_distance
            uy = (ukey % (1 << 21) - (1 << 20) + 0.5) * sample_distance
            uz, uunc, uregion = _transform_arrays(
                catalog, ux, uy, np.zeros(len(ux)), from_datum, to_datum,
                in_is_height, out_is_height,
            )
            flip = 1.0 if out_is_height else -1.0
            vz_height = vz if in_is_height else -vz
            # uncovered cells carry uz = NaN, which propagates through
            ans_z[valid] = np.round(flip * vz_height + uz[inv], 3)
            ans_unc[valid] = uunc[inv]
            ans_region[valid] = uregion[inv]
        else:
            tz, tunc, tregion = _transform_arrays(
                catalog, vx, vy, vz, from_datum, to_datum,
                in_is_height, out_is_height,
            )
            ans_z[valid] = tz
            ans_unc[valid] = tunc
            ans_region[valid] = tregion
    return x, y, ans_z, ans_unc, ans_region


def _transform_arrays(catalog, x, y, z, from_datum, to_datum,
                      in_is_height, out_is_height):
    import pyarrow as pa

    from vyperdatum_ray.stages.region_join import RegionJoiner
    from vyperdatum_ray.stages.transform import DatumTransformer

    batch = pa.table({
        "lon": pa.array(x, pa.float64()),
        "lat": pa.array(y, pa.float64()),
        "z_in": pa.array(z, pa.float64()),
    })
    join = RegionJoiner(catalog_ref=catalog)
    transform = DatumTransformer(
        catalog_ref=catalog, from_datum=from_datum, to_datum=to_datum,
        in_is_height=in_is_height, out_is_height=out_is_height, z_col="z_in",
    )
    out = transform(join(batch))
    return (
        out.column("z_out").to_numpy(zero_copy_only=False),
        out.column("unc").to_numpy(zero_copy_only=False),
        out.column("region_index").to_numpy(zero_copy_only=False),
    )
