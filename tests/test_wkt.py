"""WKT/compound-CRS metadata (F5/F6/F8): remark round-trip, axis sign
conventions, bbox-scoped pipeline resolution — the same assertions the
reference makes in tests/test_vypercrs.py (e.g. :362-368 compound
detection, :402-434 remark split), re-expressed for our builder."""

import pytest

from vyperdatum_ray.core.wkt import (
    GEOGRAPHIC_WKT,
    VerticalMeta,
    build_compound_wkt,
    build_vertical_wkt,
    parse_vertical_wkt,
    vertical_datum_to_wkt,
)

SF = "/root/testdata/sf0.001"


def _meta():
    m = VerticalMeta(datum="mllw", catalog_version="abc123", base_datum=["ellipse"])
    m.add_pipeline("regA", "+proj=pipeline +step +proj=vgridshift grids=g1")
    m.add_pipeline("regB", "+proj=pipeline +step +inv +proj=vgridshift grids=g2")
    return m


def test_remark_round_trip():
    wkt = build_vertical_wkt(_meta())
    back = parse_vertical_wkt(wkt)
    assert back.datum == "mllw"
    assert back.regions == ["regA", "regB"]
    assert back.pipelines == [
        "+proj=pipeline +step +proj=vgridshift grids=g1",
        "+proj=pipeline +step +inv +proj=vgridshift grids=g2",
    ]
    assert back.base_datum == ["ellipse"]
    assert back.catalog_version == "abc123"


def test_add_pipeline_idempotent():
    m = _meta()
    m.add_pipeline("regA", "something else")  # duplicate region ignored
    assert m.regions == ["regA", "regB"]
    assert len(m.pipelines) == 2


def test_axis_direction_by_datum():
    assert "down" in build_vertical_wkt(VerticalMeta(datum="mllw"))
    assert "up" in build_vertical_wkt(VerticalMeta(datum="navd88"))
    assert "up" in build_vertical_wkt(VerticalMeta(datum="ellipse"))


def test_no_remark_without_pipelines():
    wkt = build_vertical_wkt(VerticalMeta(datum="ellipse"))
    assert "REMARK" not in wkt
    assert parse_vertical_wkt(wkt).regions == []


def test_compound_wkt_names():
    wkt = build_compound_wkt(GEOGRAPHIC_WKT, build_vertical_wkt(_meta()))
    assert wkt.startswith('COMPOUNDCRS["NAD83(2011) + mllw"')
    assert "VERTCRS" in wkt and "GEOGCRS" in wkt


def test_vertical_datum_to_wkt_scopes_regions_by_bbox():
    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.fixtures import ensure_fixtures

    cat = Catalog.from_dir(ensure_fixtures(SF)["catalog_dir"])
    # bbox over region A only
    wkt = vertical_datum_to_wkt("mllw", (-75.3, 34.9, -75.1, 35.1), cat)
    meta = parse_vertical_wkt(wkt)
    assert meta.regions == ["SYNcoastA_8301"]
    assert "SYNcoastA_8301/mllw" in meta.pipelines[0]
    assert meta.catalog_version == cat.version
    # wide bbox: all four regions, catalog order
    wkt = vertical_datum_to_wkt("mllw", (-77.0, 33.0, -72.0, 38.0), cat)
    assert parse_vertical_wkt(wkt).regions == [r.name for r in cat.regions]


def test_vertical_datum_to_wkt_ellipse_shortcut_and_errors():
    assert "REMARK" not in vertical_datum_to_wkt("ellipse", (0, 0, 1, 1))
    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.fixtures import ensure_fixtures

    cat = Catalog.from_dir(ensure_fixtures(SF)["catalog_dir"])
    with pytest.raises(ValueError):
        vertical_datum_to_wkt("mllw", (0.0, 0.0, 1.0, 1.0), cat)  # no regions
    with pytest.raises(ValueError):
        vertical_datum_to_wkt("mllw", (-75.3, 34.9, -75.1, 35.1), None)


def test_export_points_csv(ray_session, tmp_path):
    import glob

    import pandas as pd

    from vyperdatum_ray.pipelines.queries import export_points_csv

    out = export_points_csv(SF, str(tmp_path / "csv"))
    files = glob.glob(out + "/*.csv")
    assert files
    df = pd.concat([pd.read_csv(f) for f in files])
    assert list(df.columns) == ["lon", "lat", "z_out", "unc", "region_index"]
    assert len(df) > 0 and (df["region_index"] >= 0).all()


def test_parse_crs_wkt_inputs():
    """WKT-string input CRS (reference vypercrs.py:685-812): compound,
    bare horizontal, bare vertical, and rejection paths."""
    from vyperdatum_ray.core.crs import parse_crs
    from vyperdatum_ray.core.wkt import projected_wkt

    vert = build_vertical_wkt(VerticalMeta(datum="navd88"))
    # geographic + vertical compound
    c = parse_crs(build_compound_wkt(GEOGRAPHIC_WKT, vert))
    assert c.kind == "geographic" and c.vertical == "navd88"
    # projected UTM + vertical compound
    u = parse_crs(build_compound_wkt(projected_wkt("utm", 18), vert))
    assert u.kind == "utm" and u.zone == 18 and u.vertical == "navd88"
    # projected state-plane LCC compound
    sp = parse_crs(build_compound_wkt(
        projected_wkt("lcc", 3631), build_vertical_wkt(VerticalMeta(datum="mllw"))))
    assert sp.kind == "lcc" and sp.zone == 3631 and sp.vertical == "mllw"
    # bare pieces
    assert parse_crs(GEOGRAPHIC_WKT).kind == "geographic"
    assert parse_crs(vert).vertical == "navd88"
    b = parse_crs(projected_wkt("utm", 19))
    assert b.kind == "utm" and b.zone == 19
    # rejections: projected WKT without an EPSG id; non-NAD83 geographic
    with pytest.raises(ValueError):
        parse_crs('PROJCRS["x",BASEGEOGCRS["NAD83(2011)"],CS[Cartesian,2]]')
    with pytest.raises(ValueError):
        parse_crs('GEOGCRS["WGS 84",DATUM["World Geodetic System 1984"],'
                  'CS[ellipsoidal,2]]')
    with pytest.raises(ValueError):
        parse_crs(build_compound_wkt(
            GEOGRAPHIC_WKT, build_vertical_wkt(VerticalMeta(datum="bogus"))))


def test_tile_sink_wkt_reingest(ray_session, tmp_path):
    """Round-trip (VERDICT r2 item 2 done-criterion): the compound WKT
    emitted by write_raster_tiles re-ingests as the input CRS of a new
    transform — its vertical half (mllw) becomes the from_datum, giving
    exactly the direct mllw->ellipse inverse results."""
    import numpy as np

    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.core.crs import parse_crs
    from vyperdatum_ray.fixtures import catalog_dir, ensure_fixtures
    from vyperdatum_ray.pipelines.raster import write_raster_tiles
    from vyperdatum_ray.points import transform_points

    res = write_raster_tiles(SF, str(tmp_path / "tiles"))
    wkt = open(res["crs_wkt"]).read()
    info = parse_crs(wkt)
    assert info.kind == "geographic" and info.vertical == "mllw"

    ensure_fixtures(SF)
    cat = Catalog.from_dir(catalog_dir(SF))
    lon = np.array([-75.20, -74.35, -73.30])
    lat = np.array([35.00, 35.65, 34.30])
    _, _, z_wkt, _, r_wkt = transform_points(
        cat, lon, lat, to_datum="ellipse", in_is_height=False,
        out_is_height=True, input_crs=wkt)
    _, _, z_ref, _, r_ref = transform_points(
        cat, lon, lat, from_datum="mllw", to_datum="ellipse",
        in_is_height=False, out_is_height=True)
    np.testing.assert_array_equal(z_wkt, z_ref)
    np.testing.assert_array_equal(r_wkt, r_ref)
