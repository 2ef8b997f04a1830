"""Helmert frame hop + transverse-Mercator projection: numpy<->SQL
bit-parity, inverse consistency, CRS parsing, and the z-correction
query semantics."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _grid_coords(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    lon = np.round(rng.uniform(-77, -72, n), 5)
    lat = np.round(rng.uniform(33, 38, n), 5)
    z = np.round(rng.uniform(-100, 100, n), 3)
    return lon, lat, z


def test_helmert_sql_parity_exact():
    from vyperdatum_ray.core.helmert import frame_hop, sql_hop_ctes

    lon, lat, z = _grid_coords()
    for frame in ("ITRF2014", "ITRF2008"):
        hlon, hlat, hz = frame_hop(lon, lat, z, frame)
        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"i": np.arange(len(lon)),
                                          "lon": lon, "lat": lat, "z": z}))
        sql = f"""WITH src AS (SELECT i, lon, lat, z, '{frame}' AS gf FROM pts),
{sql_hop_ctes('t', 'src', 'lon', 'lat', 'z', 'gf', 'i')}
SELECT i, hlon, hlat, hz FROM thop ORDER BY i"""
        df = con.execute(sql).df()
        assert (df["hlon"].to_numpy() == hlon).all()
        assert (df["hlat"].to_numpy() == hlat).all()
        assert (df["hz"].to_numpy() == hz).all()


def test_helmert_magnitude_and_inverse_consistency():
    """The NAD83->ITRF2014 hop is a ~1-2 m shift (the published
    translation is ~2.2 m), and cart round-trip self-consistency holds
    to sub-mm."""
    from vyperdatum_ray.core.helmert import (cart_to_geodetic, frame_hop,
                                             geodetic_to_cart)

    lon, lat, z = _grid_coords(500)
    hlon, hlat, hz = frame_hop(lon, lat, z, "ITRF2014")
    dxy_m = np.hypot((hlon - lon) * 111320.0 * np.cos(np.radians(lat)),
                     (hlat - lat) * 110574.0)
    assert (dxy_m > 0.2).all() and (dxy_m < 3.0).all()
    assert (np.abs(hz - z) > 0.5).all() and (np.abs(hz - z) < 3.0).all()
    # cart roundtrip
    cx, cy, cz = geodetic_to_cart(lon, lat, z)
    rlon, rlat, rz = cart_to_geodetic(cx, cy, cz)
    assert np.abs(rlon - lon).max() < 1e-9
    assert np.abs(rlat - lat).max() < 1e-9
    assert np.abs(rz - z).max() < 1e-4


def test_helmert_nad83_passthrough_sql():
    from vyperdatum_ray.core.helmert import sql_hop_ctes

    lon, lat, z = _grid_coords(200)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"i": np.arange(len(lon)),
                                      "lon": lon, "lat": lat, "z": z}))
    sql = f"""WITH src AS (SELECT i, lon, lat, z, 'NAD83(2011)' AS gf FROM pts),
{sql_hop_ctes('t', 'src', 'lon', 'lat', 'z', 'gf', 'i')}
SELECT count(*) AS n FROM thop t JOIN pts p ON p.i = t.i
WHERE t.hlon != p.lon OR t.hlat != p.lat OR t.hz != p.z"""
    assert con.execute(sql).fetchone()[0] == 0


def test_utm_roundtrip_and_sql_parity():
    from vyperdatum_ray.core.projection import (sql_utm_roundtrip_ctes,
                                                utm_forward, utm_inverse)

    lon, lat, _ = _grid_coords()
    e, n_ = utm_forward(lon, lat, 18)
    rlon, rlat = utm_inverse(e, n_, 18)
    # series error is far below the 1e-7 quantization -> exact recovery
    np.testing.assert_array_equal(rlon, lon)
    np.testing.assert_array_equal(rlat, lat)
    # plausibility: zone-18 central meridian -75 -> easting ~ 500 km there
    near_cm = np.abs(lon + 75.0) < 0.01
    if near_cm.any():
        assert np.abs(e[near_cm] - 500000.0).max() < 2000
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"i": np.arange(len(lon)), "lon": lon, "lat": lat}))
    sql = f"""WITH src AS (SELECT i, lon, lat FROM pts),
{sql_utm_roundtrip_ctes('u', 'src', 'lon', 'lat', 18, 'i')}
SELECT i, easting, northing, rlon, rlat FROM uutm ORDER BY i"""
    df = con.execute(sql).df()
    assert (df["easting"].to_numpy() == e).all()
    assert (df["northing"].to_numpy() == n_).all()
    assert (df["rlon"].to_numpy() == rlon).all()
    assert (df["rlat"].to_numpy() == rlat).all()


def test_utm_known_value():
    """Sanity vs the standard UTM example magnitudes: zone 18N,
    (38N, 77W) lands near easting 323 km, northing 4208 km (public
    tables give ~322.6 km / 4208.4 km for WGS84; GRS80 is within
    meters)."""
    from vyperdatum_ray.core.projection import utm_forward

    e, n_ = utm_forward(np.array([-77.0]), np.array([38.0]), 18)
    assert abs(e[0] - 324000) < 2500
    assert abs(n_[0] - 4207000) < 2500


def test_parse_crs():
    from vyperdatum_ray.core.crs import parse_crs

    assert parse_crs(6319).kind == "geographic"
    assert parse_crs("EPSG:6318").kind == "geographic"
    u = parse_crs("EPSG:26918")
    assert u.kind == "utm" and u.zone == 18
    u2 = parse_crs(6347)  # NAD83(2011) UTM 18N
    assert u2.kind == "utm" and u2.zone == 18
    t = parse_crs(("EPSG:26918", "mllw"))
    assert t.kind == "utm" and t.vertical == "mllw"
    assert parse_crs("navd88").vertical == "navd88"
    for bad in (4326, "EPSG:32618", "not-a-crs", 3.5, ("EPSG:26918",)):
        with pytest.raises(ValueError):
            parse_crs(bad)


def test_transform_points_utm_input_matches_geographic():
    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.core.projection import utm_forward
    from vyperdatum_ray.fixtures import ensure_fixtures
    from vyperdatum_ray.points import transform_points

    cat = Catalog.from_dir(ensure_fixtures("/root/testdata/sf0.001")["catalog_dir"])
    lon = np.array([-75.20, -74.35, -73.30])
    lat = np.array([35.00, 35.65, 34.30])
    e, n_ = utm_forward(lon, lat, 18)
    _, _, z_geo, unc_geo, r_geo = transform_points(cat, lon, lat)
    gx, gy, z_utm, unc_utm, r_utm = transform_points(
        cat, e, n_, input_crs="EPSG:26918")
    np.testing.assert_array_equal(z_geo, z_utm)
    np.testing.assert_array_equal(r_geo, r_utm)
    np.testing.assert_array_equal(gx, lon)  # returned coords are geographic
    with pytest.raises(ValueError):
        transform_points(cat, lon, lat, input_crs="EPSG:32618")


def test_utm_roundtrip_property():
    """Property: forward->inverse recovers any 5-decimal in-zone
    coordinate exactly (series error far below quantization)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vyperdatum_ray.core.projection import utm_forward, utm_inverse

    @settings(max_examples=200, deadline=None)
    @given(
        lon=st.integers(-7800000, -7200000).map(lambda v: v / 1e5),
        lat=st.integers(2000000, 6000000).map(lambda v: v / 1e5),
    )
    def check(lon, lat):
        e, n_ = utm_forward(np.array([lon]), np.array([lat]), 18)
        rlon, rlat = utm_inverse(e, n_, 18)
        assert rlon[0] == lon and rlat[0] == lat

    check()


def test_helmert_hop_z_linearity():
    """Property: the frame hop is locally linear in input height — a
    +10 m input z moves output z by 10 m within ~1e-3 m (the scale+
    rotation terms are ~1e-7), never by a different amount."""
    from vyperdatum_ray.core.helmert import frame_hop

    lon, lat, _ = _grid_coords(300, seed=21)
    z0 = np.zeros_like(lon)
    _, _, hz0 = frame_hop(lon, lat, z0, "ITRF2014")
    _, _, hz10 = frame_hop(lon, lat, z0 + 10.0, "ITRF2014")
    assert np.abs((hz10 - hz0) - 10.0).max() < 1e-3
