import numpy as np

from vyperdatum_ray.core.cells import (
    hex_cell_center,
    hex_cell_id,
    s2_cell_center,
    s2_cell_id,
    s2_cell_level,
    tile_id,
)


def test_s2_level_and_face_bits():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 180, 50000)
    lat = rng.uniform(-89.9, 89.9, 50000)
    for level in (5, 13, 30):
        cid = s2_cell_id(lon, lat, level)
        assert np.all(s2_cell_level(cid) == level)
        faces = np.unique(cid >> np.uint64(61))
        assert set(faces.tolist()) <= set(range(6))


def test_s2_center_roundtrip_containment():
    """The cell center decoded from the id must re-encode to the same
    cell, and lie within one cell diagonal of the probe point."""
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-85, 85, 20000)
    cid = s2_cell_id(lon, lat, 13)
    clon, clat = s2_cell_center(cid, 13)
    assert np.array_equal(s2_cell_id(clon, clat, 13), cid)
    err = np.hypot((clon - lon) * np.cos(np.radians(lat)), clat - lat)
    assert err.max() < 360.0 / (4 * 2**13)  # < one leaf-cell-angle * 2^17... one cell diag


def test_s2_deterministic_and_local():
    lon = np.array([-75.123456])
    lat = np.array([35.654321])
    a = s2_cell_id(lon, lat, 13)
    b = s2_cell_id(lon + 1e-9, lat + 1e-9, 13)
    assert a == s2_cell_id(lon, lat, 13)
    assert a == b  # 1e-9 deg never crosses a level-13 boundary from a generic point


def test_hex_center_within_circumradius():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-77, -72, 20000)
    lat = rng.uniform(33, 38, 20000)
    h = hex_cell_id(lon, lat, 9)
    hx, hy = hex_cell_center(h)
    assert np.hypot(hx - lon, hy - lat).max() <= 0.0018 * 1.0001
    assert np.unique(h >> np.uint64(56)).tolist() == [9]


def test_hex_resolution_hierarchy_coarsens():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-77, -72, 5000)
    lat = rng.uniform(33, 38, 5000)
    n9 = len(np.unique(hex_cell_id(lon, lat, 9)))
    n5 = len(np.unique(hex_cell_id(lon, lat, 5)))
    assert n5 < n9


def test_tile_id_formula():
    import duckdb

    rng = np.random.default_rng(4)
    lon = np.round(rng.uniform(-77, -72, 10000), 5)
    lat = np.round(rng.uniform(33, 38, 10000), 5)
    mine = tile_id(lon, lat)
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame({"lon": lon, "lat": lat}))
    sql = (
        "SELECT CAST(floor((lat + 90.0) / 0.25) AS BIGINT) * 4096 "
        "+ CAST(floor((lon + 180.0) / 0.25) AS BIGINT) AS tid FROM t"
    )
    theirs = con.execute(sql).fetchnumpy()["tid"]
    assert np.array_equal(mine, theirs)
