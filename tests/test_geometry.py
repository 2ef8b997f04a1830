import numpy as np

from vyperdatum_ray.core.geometry import (
    Polygon,
    STRtree,
    points_in_polygon,
    polygon_from_wkb,
    polygon_to_wkb,
)
from vyperdatum_ray.fixtures import REGION_SPECS, hexagon


def test_pip_matches_halfplane_on_convex_hexagons():
    """The engine's ray-cast must agree with the convex half-plane test
    the SQL oracle uses (random points; boundary measure-zero)."""
    rng = np.random.default_rng(7)
    x = np.round(rng.uniform(-77, -72, 50000), 5)
    y = np.round(rng.uniform(33, 38, 50000), 5)
    for name, cx, cy, r, *_ in REGION_SPECS:
        verts = hexagon(cx, cy, r)
        got = points_in_polygon(x, y, verts)
        closed = np.vstack([verts, verts[:1]])
        hp = np.ones(len(x), dtype=bool)
        for e in range(6):
            (x0, y0), (x1, y1) = closed[e], closed[e + 1]
            ax, ay = y1 - y0, -(x1 - x0)
            hp &= ax * x + ay * y <= ax * x0 + ay * y0
        assert np.array_equal(got, hp), name


def test_wkb_roundtrip():
    verts = hexagon(-75.0, 35.0, 0.5)
    p = polygon_from_wkb(polygon_to_wkb(verts))
    assert np.allclose(p.vertices, verts)


def test_strtree_matches_bruteforce():
    polys = [Polygon(hexagon(cx, cy, r)) for _, cx, cy, r, *_ in REGION_SPECS]
    tree = STRtree(polys)
    rng = np.random.default_rng(3)
    x = rng.uniform(-77, -72, 20000)
    y = rng.uniform(33, 38, 20000)
    m = tree.query_points(x, y)
    for i, p in enumerate(polys):
        assert np.array_equal(m[:, i], p.contains(x, y))


def test_bbox_intersects():
    p = Polygon(hexagon(-75.0, 35.0, 0.5))
    assert p.intersects_bbox(-75.1, 34.9, -74.9, 35.1)  # rect inside polygon
    assert p.intersects_bbox(-76.0, 34.0, -74.0, 36.0)  # polygon inside rect
    assert p.intersects_bbox(-75.6, 34.9, -75.4, 35.1)  # edge overlap
    assert not p.intersects_bbox(-74.0, 34.0, -73.5, 34.5)  # disjoint
