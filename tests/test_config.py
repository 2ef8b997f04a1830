"""Catalog ingestion parsers: sigma-inf format, external-region config,
datum-name guessing, external-region upsert (S6/S8/F5/O4/§2.9)."""

import numpy as np
import pytest

from vyperdatum_ray.core.config import (
    guess_datum_from_string,
    parse_sigma_inf,
    read_region_config,
    register_external_region,
)

SF = "/root/testdata/sf0.001"

SIGMA_TEXT = """
# comment line, ignored
akglacier.navd88.lmsl=8.0
akglacier.lmsl.mllw=4.5
akglacier.lmsl.dtl=n/a
conus.navd88.nad83=5.0
conus.xgeoid17b=not-three-parts
conus.sxgeoid17b.any=2.1
random garbage
nomatch.navd88.lmsl=9.9
"""


def test_parse_sigma_inf():
    regions, geoids = parse_sigma_inf(SIGMA_TEXT, ["AKglacier_8301", "OtherRegion"])
    ak = regions["AKglacier_8301"]
    assert ak["tss"] == pytest.approx(0.08)     # navd88.lmsl, cm -> m
    assert ak["mllw"] == pytest.approx(0.045)
    assert ak["dtl"] == 0.0                     # n/a -> 0
    assert ak["mhw"] == 0.0                     # unset -> 0
    assert regions["OtherRegion"]["tss"] == 0.0
    assert geoids["geoid12b"] == pytest.approx(0.05)   # conus.navd88.nad83
    assert geoids["sxgeoid17b"] == pytest.approx(0.021)


def test_parse_sigma_inf_ambiguous_prefix_raises():
    with pytest.raises(ValueError):
        parse_sigma_inf("ak.navd88.lmsl=1.0", ["AKone", "AKtwo"])


def test_read_region_config():
    text = """
[Default]
reference_frame = NAD83(2011)
reference_geoid = sgeoid12x
[uncertainty]
uncertainty_tss = 0.01
"""
    settings = read_region_config(text)
    assert settings["reference_frame"] == "NAD83(2011)"
    assert settings["reference_geoid"] == "sgeoid12x"
    assert settings["uncertainty_tss"] == "0.01"


def test_guess_datum_from_string():
    assert guess_datum_from_string("NOAA MLLW depth") == "mllw"
    assert guess_datum_from_string("NAVD88 height") == "navd88"
    assert guess_datum_from_string("totally unknown") == ""
    with pytest.raises(ValueError):
        guess_datum_from_string("mllw or maybe mhw")


def test_register_external_region_upsert():
    from vyperdatum_ray.catalog import Catalog, RegionInfo
    from vyperdatum_ray.core.geometry import polygon_from_wkb, polygon_to_wkb
    from vyperdatum_ray.fixtures import ensure_fixtures, hexagon

    cat = Catalog.from_dir(ensure_fixtures(SF)["catalog_dir"])
    verts = hexagon(-73.0, 36.5, 0.3)
    info = RegionInfo(
        name="USER_custom_1", ord=0, geoid_name="sgeoid12x",
        geoid_frame="NAD83(2011)",
        polygon=polygon_from_wkb(polygon_to_wkb(verts)),
    )
    grid = cat.grids["SYNcoastA_8301/tss"]
    sig = dict(tss=0.01, mhhw=0, mhw=0, mlw=0, mllw=0.02, dtl=0, mtl=0)
    cat2 = register_external_region(
        cat, info, {"USER_custom_1/tss": grid, "USER_custom_1/mllw": grid}, sig
    )
    # new region appended LAST, ords renumbered, original catalog intact
    assert cat2.region_names[-1] == "USER_custom_1"
    assert [r.ord for r in cat2.regions] == list(range(len(cat2.regions)))
    assert "USER_custom_1" not in cat.region_names
    assert cat2.sigmas["USER_custom_1"]["mllw"] == 0.02
    assert cat2.version.endswith("+ext")
    # upsert replaces (remove-then-append): registering again keeps one
    cat3 = register_external_region(cat2, info, {}, sig)
    assert cat3.region_names.count("USER_custom_1") == 1
    # PIP through the new catalog sees the new region
    tree = cat3.tree()
    memb = tree.query_points(np.array([-73.0]), np.array([36.5]))
    assert memb[0, cat3.region_names.index("USER_custom_1")]


def test_resolve_band_roles():
    from vyperdatum_ray.core.config import resolve_band_roles

    # depth preferred over elevation; case-insensitive
    r = resolve_band_roles(["Elevation", "Depth", "Vertical Uncertainty", "Contributor"])
    assert r == {"elevation": 1, "uncertainty": 2, "contributor": 3}
    # sole band is elevation regardless of name
    assert resolve_band_roles(["whatever"])["elevation"] == 0
    # uncertainty falls through 'uncertainty' -> 'vertical uncertainty'
    assert resolve_band_roles(["depth", "Uncertainty"])["uncertainty"] == 1
    # missing roles -> None
    r = resolve_band_roles(["band_a", "band_b"])
    assert r == {"elevation": None, "uncertainty": None, "contributor": None}


def test_external_region_end_to_end_overwrite():
    """The parquet-supplied external region (fixtures EXT_REGION) wins
    overlaps with SYNcoastA via the appended-last catalog-order rule,
    and points covered ONLY by it gain coverage (reference
    core.py:671-764 external-region flow, pure data — no code)."""
    import os

    import numpy as np

    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.core.config import register_external_region
    from vyperdatum_ray.fixtures import EXT_REGION, ensure_fixtures, fixture_dir
    from vyperdatum_ray.points import transform_points

    sf = "/root/testdata/sf0.001"
    ensure_fixtures(sf)
    base = Catalog.from_dir(fixture_dir(sf))
    ext = Catalog.from_dir(os.path.join(fixture_dir(sf), "external"))
    cat2 = register_external_region(
        base, ext.regions[0], ext.grids, ext.sigmas[ext.regions[0].name])
    assert cat2.region_names[-1] == "EXTuser_9901"
    assert cat2.regions[-1].ord == len(base.regions)

    # point inside the EXT/SYNcoastA overlap: base assigns A (ord 0),
    # extended assigns the external region (ord 4) with its own z/unc
    lon = np.array([EXT_REGION[1] + 0.25])
    lat = np.array([EXT_REGION[2] + 0.20])
    _, _, z_b, unc_b, r_b = transform_points(base, lon, lat)
    _, _, z_e, unc_e, r_e = transform_points(cat2, lon, lat)
    assert r_b[0] == 0 and r_e[0] == len(base.regions)
    assert np.isfinite(z_e[0]) and z_e[0] != z_b[0]
    assert unc_e[0] != unc_b[0]

    # point covered ONLY by the external region (west of A's hexagon)
    lon2 = np.array([EXT_REGION[1] - 0.40])
    lat2 = np.array([EXT_REGION[2] - 0.25])
    _, _, z_b2, _, r_b2 = transform_points(base, lon2, lat2)
    _, _, z_e2, _, r_e2 = transform_points(cat2, lon2, lat2)
    assert r_b2[0] == -1 and np.isnan(z_b2[0])
    assert r_e2[0] == len(base.regions) and np.isfinite(z_e2[0])
