"""Raster-path semantics (reference raster.py:160-406): valid-count
stack order, CATZOC-D outside-coverage fallback, nodata handling and the
per-tile manifest — all over the deterministic sf0.001 fixture raster."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fx_dir():
    from vyperdatum_ray.fixtures import ensure_fixtures

    return ensure_fixtures(SF)["catalog_dir"]


@pytest.fixture(scope="module")
def cells(fx_dir):
    return pq.read_table(os.path.join(fx_dir, "raster_cells.parquet")).to_pandas()


@pytest.fixture(scope="module")
def transformed(ray_session, fx_dir):
    from vyperdatum_ray.pipelines.raster import raster_transform

    return raster_transform(SF, allow_outside=True).to_pandas()


def test_candidates_exclude_north_region(fx_dir):
    """Region C lies fully north of the raster extent (J1 bbox join)."""
    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.pipelines.raster import _candidates, raster_meta

    cat = Catalog.from_dir(fx_dir)
    cands = _candidates(cat, raster_meta(SF))
    names = [cat.regions[i].name for i in cands]
    assert names == ["SYNcoastA_8301", "SYNcoastB_8301", "SYNdeepD_8301"]


def test_valid_counts_drive_stack_order(ray_session, fx_dir):
    from vyperdatum_ray.pipelines.raster import _stack_order, q_raster_valid_counts

    counts = q_raster_valid_counts(SF).to_pandas().set_index("region")["n_valid"]
    order = _stack_order(SF, "ellipse", "mllw")
    # ascending valid-count (J3: most-valid region applied last, wins)
    names = ["SYNcoastA_8301", "SYNcoastB_8301", "SYNdeepD_8301"]
    ordered_counts = [counts[names[p]] for p in order]
    assert ordered_counts == sorted(ordered_counts)


def test_nodata_cells_dropped_everything_else_kept(transformed, cells):
    n_finite = int(np.isfinite(cells["elevation"]).sum())
    out = transformed[np.isfinite(transformed["z"])]
    assert len(out) == n_finite


def test_covered_cells_z_matches_sep(ray_session, transformed):
    """Covered cells: z == round(-(elev + sep), 3) using q_raster_sep's
    independent sep computation."""
    from vyperdatum_ray.pipelines.raster import q_raster_sep, raster_cells

    sep = q_raster_sep(SF).to_pandas().set_index(["row", "col"])
    cells_df = raster_cells(SF).to_pandas().set_index(["row", "col"])
    cov = transformed[transformed["region_index"] >= 0].set_index(["row", "col"])
    joined = cov.join(sep, rsuffix="_s").join(cells_df, rsuffix="_c")
    ok = np.isfinite(joined["elevation"])
    expect = np.round(-1.0 * (joined["elevation"][ok] + joined["sep"][ok]), 3)
    assert np.array_equal(expect.to_numpy(), joined["z"][ok].to_numpy())
    assert np.array_equal(
        joined["region_index"].to_numpy(), joined["region_index_s"].to_numpy()
    )


def test_catzoc_outside_coverage(transformed, cells):
    """region_index == -1 cells (elevation present, no sep): z passes
    through flipped; unc = max(3 - 0.06 z, source) capped at 3.0 for
    z > 0 (raster.py:380-396)."""
    out = transformed[np.isfinite(transformed["z"])]
    miss = out[out["region_index"] == -1].set_index(["row", "col"])
    assert len(miss) > 0
    src = cells.set_index(["row", "col"])
    j = miss.join(src, rsuffix="_c")
    assert np.array_equal(np.round(-1.0 * j["elevation"], 3).to_numpy(), j["z"].to_numpy())
    u = 3.0 - 0.06 * j["elevation"].to_numpy()
    u[j["elevation"].to_numpy() > 0] = 3.0
    expect = np.round(np.maximum(u, j["uncertainty"].to_numpy()), 3)
    assert np.array_equal(expect, j["unc"].to_numpy())
    assert (j["unc"] >= j["uncertainty"]).all()


def test_no_catzoc_when_disallowed(ray_session, cells):
    from vyperdatum_ray.pipelines.raster import raster_transform

    out = raster_transform(SF, allow_outside=False).to_pandas()
    miss = out[(out["region_index"] == -1)]
    assert np.isnan(miss["z"]).all()
    assert np.isnan(miss["unc"]).all()
    assert np.isnan(miss["contributor"]).all()


def test_tile_manifest_totals(ray_session, transformed):
    from vyperdatum_ray.pipelines.raster import q_raster_tile_manifest

    man = q_raster_tile_manifest(SF).to_pandas()
    assert int(man["n_rows"].sum()) == len(transformed)
    assert man["tile_id"].is_unique


def test_write_raster_tiles_resumable_layout(ray_session, tmp_path):
    from vyperdatum_ray.pipelines.raster import write_raster_tiles

    res = write_raster_tiles(SF, str(tmp_path / "tiles"))
    with open(res["manifest"]) as f:
        manifest = json.load(f)
    assert res["n_tiles"] == len(manifest)
    # one directory per tile (resumable partition layout)
    dirs = [d for d in os.listdir(tmp_path / "tiles") if d.startswith("tile_id=")]
    assert len(dirs) == len(manifest)
    got = pq.read_table(str(tmp_path / "tiles")).num_rows
    assert got == sum(manifest.values())
