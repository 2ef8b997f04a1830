"""Grid interpolation unit tests (semantics of the reference's
vgridshift execution: inf outside coverage, core.py:445-446)."""

import numpy as np

from vyperdatum_ray.core.grid import SeparationGrid, grid_from_long


def make_linear_grid(a=2.0, bx=0.5, by=-0.25):
    xs = np.arange(10) * 0.1 - 76.0
    ys = np.arange(8) * 0.2 + 34.0
    X, Y = np.meshgrid(xs, ys)
    return SeparationGrid(-76.0, 34.0, 0.1, 0.2, a + bx * (X + 76) + by * (Y - 34))


def test_bilinear_exact_on_linear_field():
    g = make_linear_grid()
    rng = np.random.default_rng(0)
    lon = rng.uniform(-76.0, -76.0 + 0.9, 1000)
    lat = rng.uniform(34.0, 34.0 + 1.4, 1000)
    expect = 2.0 + 0.5 * (lon + 76) - 0.25 * (lat - 34)
    got = g.interpolate(lon, lat)
    assert np.allclose(got, expect, atol=1e-12)


def test_grid_nodes_exact():
    g = make_linear_grid()
    # interior nodes: the extent-edge nodes can fall a float-ulp outside
    # the [0, n-1] grid-coordinate range (mirrored exactly by the SQL
    # oracle, so parity is unaffected)
    ix = np.array([0, 3, 8])
    iy = np.array([0, 2, 6])
    x, y = g.node_xy(ix, iy)
    assert np.allclose(g.interpolate(x, y), g.values[iy, ix])


def test_outside_extent_is_inf():
    g = make_linear_grid()
    out = g.interpolate(np.array([-77.0, -76.0, -75.0]), np.array([35.0, 40.0, 34.5]))
    assert np.isinf(out[0]) and np.isinf(out[1]) and np.isinf(out[2])


def test_nan_corner_is_inf():
    g = make_linear_grid()
    g.values[3, 4] = np.nan
    # a point whose 2x2 neighborhood includes node (ix=4, iy=3)
    lon = np.array([-76.0 + 0.1 * 3.5])
    lat = np.array([34.0 + 0.2 * 2.5])
    assert np.isinf(g.interpolate(lon, lat)[0])
    # far from the NaN node the grid still interpolates
    assert np.isfinite(g.interpolate(np.array([-75.95]), np.array([34.1]))[0])


def test_grid_from_long_roundtrip():
    g = make_linear_grid()
    iy, ix = np.nonzero(~np.isnan(g.values))
    g2 = grid_from_long(g.origin_x, g.origin_y, g.dx, g.dy, g.nx, g.ny, ix, iy, g.values[iy, ix])
    assert np.array_equal(g2.values, g.values)


def test_nearest_and_knn_nodes():
    g = make_linear_grid()
    lon = np.array([-75.97, -75.52])
    lat = np.array([34.05, 34.93])
    ix, iy = g.nearest_node(lon, lat)
    assert ix.tolist() == [0, 5] and iy.tolist() == [0, 5]
    kx, ky, kd = g.knn_nodes(lon, lat, k=4)
    # distances sorted ascending, first equals the nearest node
    assert np.all(np.diff(kd, axis=1) >= 0)
    assert kx[0, 0] == ix[0] and ky[0, 0] == iy[0]
    assert kx.shape == (2, 4)
