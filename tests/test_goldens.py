"""Golden-value regression fixtures, in the shape of the reference's
``vdatum_answers`` blocks (vdatum_validation.py:1396-1457): exact
hardcoded z / uncertainty / region-index for probe points per target
datum plus raster probe cells. Values were produced by this engine and
frozen; any semantic drift in grids, algebra, flips or rounding breaks
these exactly."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

# probe points: region A, B, C, D(ITRF), the A-fallback notch, outside
PX = np.array([-75.20, -74.35, -74.90, -73.30, -74.72, -76.8])
PY = np.array([35.00, 35.65, 36.60, 34.30, 35.35, 33.2])

GOLDEN = {
    # to_datum -> (z, unc, region_index); NaN = outside all coverage.
    # Region D (index 3) runs the real NAD83->ITRF2014 Helmert hop: its
    # z includes the ~1.45 m frame separation (fixture v5).
    "mllw": (
        [-32.761, -32.657, -33.164, -31.244, -32.231, np.nan],
        [0.058, 0.060, 0.059, 0.067, 0.058, np.nan],
        [0, 1, 2, 3, 0, -1],
    ),
    "mhw": (
        [-32.835, -32.553, -33.152, -31.215, -32.286, np.nan],
        [0.044, 0.054, 0.037, 0.068, 0.044, np.nan],
        [0, 1, 2, 3, 0, -1],
    ),
}

# mllw -> ellipse inverse of z=0: NAD83 regions mirror the forward
# depth by grid symmetry; region D does NOT (the frame dz seeds z with
# the same sign in both directions, as in the reference's hop-first
# flow, core.py:426-429)
GOLDEN_INV_Z = [-32.761, -32.657, -33.164, -34.142, -32.231, np.nan]

RASTER_GOLDEN = {
    (5, 5): (-12.558, 0.166, 0),
    (24, 24): (-26.095, 0.168, 0),
    (40, 10): (-17.160, 0.170, 0),
    (10, 45): (-6.972, 0.161, 1),
}


@pytest.fixture(scope="module")
def catalog():
    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.fixtures import ensure_fixtures

    return Catalog.from_dir(ensure_fixtures(SF)["catalog_dir"])


@pytest.mark.parametrize("target", ["mllw", "mhw"])
def test_point_goldens(catalog, target):
    from vyperdatum_ray.points import transform_points

    gz, gu, gr = GOLDEN[target]
    _, _, z, unc, ridx = transform_points(catalog, PX, PY, to_datum=target)
    np.testing.assert_array_equal(ridx, gr)
    # exact to the engine's own 3-decimal rounding
    np.testing.assert_array_equal(np.round(z, 3), np.asarray(gz))
    np.testing.assert_allclose(unc, np.asarray(gu), atol=5e-4, equal_nan=True)


def test_inverse_golden(catalog):
    from vyperdatum_ray.points import transform_points

    _, _, z, unc, ridx = transform_points(
        catalog, PX, PY, from_datum="mllw", to_datum="ellipse",
        in_is_height=False, out_is_height=True,
    )
    np.testing.assert_array_equal(np.round(z, 3), np.asarray(GOLDEN_INV_Z))
    # ellipse target -> zero transform uncertainty (core.py:334-335)
    assert np.all(unc[ridx >= 0] == 0.0)


def test_raster_goldens(ray_session):
    from vyperdatum_ray.pipelines.raster import raster_transform

    out = raster_transform(SF, allow_outside=True).to_pandas().set_index(["row", "col"])
    for rc, (gz, gu, gr) in RASTER_GOLDEN.items():
        row = out.loc[rc]
        assert row["z"] == pytest.approx(gz, abs=5e-4)
        assert row["unc"] == pytest.approx(gu, abs=5e-4)
        assert int(row["region_index"]) == gr
