"""End-to-end flagship semantics that define reference parity
(core.py:421-453): catalog-order region overwrite, grid-coverage
fallback at the NaN notch, -1 outside coverage, byte-identical text
passthrough."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from vyperdatum_ray.fixtures import NOTCH_CENTER, NOTCH_R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def out(ray_session):
    from vyperdatum_ray.pipelines.flagship import flagship_pipeline

    return flagship_pipeline(SF).to_pandas()


def test_overlap_later_region_wins(out):
    """Points covered by A and B (mask has both bits) with valid grids:
    region B (higher catalog ord) wins — reference's per-region loop
    overwrite order."""
    both = out[(out["region_mask"] & 3) == 3]
    ok = both[both["region_index"] >= 0]
    # away from the notch, B's grids are valid -> B wins
    far = ok[
        (ok["lon"] - NOTCH_CENTER[0]) ** 2 + (ok["lat"] - NOTCH_CENTER[1]) ** 2
        > (NOTCH_R * 1.5) ** 2
    ]
    assert len(far) > 5
    assert (far["region_index"] == 1).all()


def test_notch_falls_back_to_earlier_region(out):
    """Inside the A-and-B overlap where B's tss grid is notched out
    (NaN nodes), the pipeline keeps A's answer: PIP winner is B but the
    grid-valid winner is A (core.py:445-453 masking)."""
    inside_notch = out[
        (out["lon"] - NOTCH_CENTER[0]) ** 2 + (out["lat"] - NOTCH_CENTER[1]) ** 2
        < (NOTCH_R * 0.7) ** 2
    ]
    covered = inside_notch[inside_notch["region_index"] >= 0]
    assert len(covered) > 20
    # PIP alone said B...
    assert (covered["pip_region_index"] == 1).all()
    # ...but the transform fell back to A wherever A covers
    assert (covered["region_index"] == 0).all()
    assert np.isfinite(covered["z_out"]).all()


def test_outside_all_regions_minus_one(out):
    far = out[out["region_mask"] == 0]
    assert len(far) > 100
    assert (far["region_index"] == -1).all()
    assert far["z_out"].isna().all()
    assert far["unc"].isna().all()


def test_text_byte_identical_passthrough(out):
    """input_hint invariant: extracted text per url byte-identical."""
    src = pq.read_table(
        "/tmp/vdr_data/sf0.001/pages/part-0000.parquet", columns=["url", "text"]
    ).to_pandas().set_index("url")["text"]
    sample = out.sample(500, random_state=1)
    for url, text in zip(sample["url"], sample["text"]):
        assert text.encode() == src[url].encode()


def test_itrf_region_frame_hop_changes_answer(out):
    """Region D (ITRF frame) points: the real 3-D Helmert hop must be
    applied — recompute one point by hand (hop lon/lat AND the frame
    dz seeding z) and check the engine's answer."""
    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.core.helmert import frame_hop
    from vyperdatum_ray.core.pipeline_algebra import get_regional_pipeline, parse_pipeline
    from vyperdatum_ray.fixtures import ensure_fixtures

    from vyperdatum_ray.stages.transform import DatumTransformer

    cat = Catalog.from_dir(ensure_fixtures(SF)["catalog_dir"])
    d_rows = out[(out["region_index"] == 3)]
    assert len(d_rows) > 10
    r = cat.regions[3]
    assert r.geoid_frame == "ITRF2014"
    dt = DatumTransformer(catalog_ref=cat)
    assert dt.region_frames[3] == "ITRF2014"
    assert dt.region_frames[0] == "NAD83(2011)"
    # recompute one D point WITH the hop: must reproduce the engine's z
    steps = parse_pipeline(get_regional_pipeline("ellipse", "mllw", r.name, r.geoid_name))
    row = d_rows.iloc[0]
    hlon, hlat, hz = frame_hop(np.array([row["lon"]]), np.array([row["lat"]]),
                               np.zeros(1), "ITRF2014")
    # the hop is a real ~1-2 m 3-D shift, not a constant nudge
    assert 1e-6 < abs(hlon[0] - row["lon"]) < 1e-4
    assert abs(hz[0]) > 0.1
    z = hz[0]
    for s in steps:
        z = z + s.sign * cat.grids[s.grid_key].interpolate(hlon, hlat)[0]
    assert np.round(-z, 3) == row["z_out"]


def test_tif_fallback_active_in_transformer():
    """The .tif extension fallback must apply where steps are BUILT
    (DatumTransformer / raster), not only in the validator: a catalog
    whose tss grid exists only under the .tif key still transforms."""
    import dataclasses

    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.fixtures import ensure_fixtures
    from vyperdatum_ray.stages.transform import DatumTransformer

    cat = Catalog.from_dir(ensure_fixtures(SF)["catalog_dir"])
    grids2 = dict(cat.grids)
    grids2["SYNcoastA_8301/tss.tif"] = grids2.pop("SYNcoastA_8301/tss")
    cat2 = dataclasses.replace(cat, grids=grids2, _tree=None)
    dt = DatumTransformer(catalog_ref=cat2)
    assert dt.region_steps[0] is not None  # resolved via the .tif fallback
    dt_orig = DatumTransformer(catalog_ref=cat)
    # same grid object -> identical steps either way
    assert [g for g, _ in dt.region_steps[0]] == [g for g, _ in dt_orig.region_steps[0]]
