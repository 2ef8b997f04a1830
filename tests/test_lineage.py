"""Checkpoint/resume semantics: per-shard lineage records, read-time
pruning of completed shards, idempotent partition overwrite, stale
version invalidation."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"  # 3 input shards -> real multi-shard resume


def _read_output(out_dir: str) -> pd.DataFrame:
    t = pq.read_table(out_dir)
    return (
        t.to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def first_run(ray_session, tmp_path_factory):
    from vyperdatum_ray.fixtures import ensure_fixtures
    from vyperdatum_ray.state.lineage import run_flagship_checkpointed

    ensure_fixtures(SF)
    out = str(tmp_path_factory.mktemp("ckpt") / "out")
    metrics = run_flagship_checkpointed(SF, out)
    return out, metrics


def test_first_run_commits_all_shards(first_run):
    out, metrics = first_run
    assert metrics["n_shards_skipped"] == 0
    assert metrics["n_shards_run"] == metrics["n_shards_total"] > 0
    recs = [f for f in os.listdir(os.path.join(out, "_lineage"))
            if f.endswith(".json") and not f.startswith("_")]
    assert len(recs) == metrics["n_shards_total"]
    rec = json.load(open(os.path.join(out, "_lineage", sorted(recs)[0])))
    assert rec["transform_version"] == metrics["transform_version"]
    assert rec["n_rows_out"] > 0 and rec["cell_set"]
    assert rec["row_range"] == [0, rec["n_rows_in"]]


def test_noop_resume_skips_everything(first_run):
    from vyperdatum_ray.state.lineage import run_flagship_checkpointed

    out, _ = first_run
    m2 = run_flagship_checkpointed(SF, out)
    assert m2["n_shards_run"] == 0
    assert m2["n_shards_skipped"] == m2["n_shards_total"]


def test_resume_recomputes_only_missing_shard(first_run):
    from vyperdatum_ray.state.lineage import run_flagship_checkpointed

    out, metrics = first_run
    baseline = _read_output(out)

    # simulate a crash: one shard's lineage gone + partial partition
    victim = sorted(
        f for f in os.listdir(os.path.join(out, "_lineage"))
        if f.endswith(".json") and not f.startswith("_")
    )[0]
    shard = victim[: -len(".json")]
    os.remove(os.path.join(out, "_lineage", victim))
    shutil.rmtree(os.path.join(out, f"shard={shard}"))

    m3 = run_flagship_checkpointed(SF, out)
    assert m3["n_shards_run"] == 1
    assert m3["n_shards_skipped"] == m3["n_shards_total"] - 1

    resumed = _read_output(out)
    pd.testing.assert_frame_equal(resumed, baseline)


def test_resume_after_partial_write_is_exactly_once(first_run):
    """Crash MID-WRITE stress (VERDICT r2 item 10): the victim shard's
    partition is left PARTIALLY written — a duplicated output file
    (stale extra rows a naive append would keep), a truncated/corrupt
    parquet half-file, and a missing file — with no lineage record.
    The resume's pre-clear + append path must produce exactly-once rows
    byte-identical to the clean run (write_parquet(mode='overwrite')
    would wipe FINISHED shards; append without pre-clear would
    double-count — this pins the only correct combination)."""
    from vyperdatum_ray.state.lineage import run_flagship_checkpointed

    out, metrics = first_run
    baseline = _read_output(out)

    victim = sorted(
        f for f in os.listdir(os.path.join(out, "_lineage"))
        if f.endswith(".json") and not f.startswith("_")
    )[-1]
    shard = victim[: -len(".json")]
    os.remove(os.path.join(out, "_lineage", victim))
    part_dir = os.path.join(out, f"shard={shard}")
    files = sorted(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
    assert files
    # (a) duplicate a finished file under a retry-ish name
    shutil.copy(os.path.join(part_dir, files[0]),
                os.path.join(part_dir, "retry_" + files[0]))
    # (b) a half-written parquet file (truncated bytes, no footer)
    data = open(os.path.join(part_dir, files[0]), "rb").read()
    with open(os.path.join(part_dir, "partial_0000.parquet"), "wb") as f:
        f.write(data[: max(16, len(data) // 3)])
    # (c) a lost file, if the partition has more than one
    if len(files) > 1:
        os.remove(os.path.join(part_dir, files[1]))

    m = run_flagship_checkpointed(SF, out)
    assert m["n_shards_run"] == 1
    assert m["n_shards_skipped"] == m["n_shards_total"] - 1

    resumed = _read_output(out)
    assert not resumed["url"].duplicated().any()
    pd.testing.assert_frame_equal(resumed, baseline)
    # the corrupt leftovers are gone from the rewritten partition
    names = set(os.listdir(part_dir))
    assert "partial_0000.parquet" not in names
    assert "retry_" + files[0] not in names


def test_stale_version_triggers_recompute(first_run):
    from vyperdatum_ray.state.lineage import completed_shards

    out, metrics = first_run
    done = completed_shards(out, metrics["transform_version"])
    assert len(done) == metrics["n_shards_total"]
    assert completed_shards(out, "different-version") == {}


def test_metrics_appended(first_run):
    out, _ = first_run
    lines = open(os.path.join(out, "_lineage", "_metrics.jsonl")).read().splitlines()
    assert len(lines) >= 1
    rec = json.loads(lines[0])
    assert rec["rows_in"] >= rec["rows_out"] > 0


def test_manifest_written_and_grid_change_invalidates_exactly(first_run):
    """Versioned catalog manifest (T5 completion): per-grid MD5s are
    committed with the run; a VALUE change in one region's grid marks
    stale exactly the shards whose region_set touches that region,
    while a STRUCTURE change (region renamed) invalidates everything."""
    import copy

    from vyperdatum_ray.catalog import Catalog
    from vyperdatum_ray.fixtures import ensure_fixtures
    from vyperdatum_ray.state.lineage import (completed_shards,
                                              load_catalog_manifest,
                                              run_flagship_checkpointed)

    out, metrics = first_run
    cat = Catalog.from_dir(ensure_fixtures(SF)["catalog_dir"])
    man = load_catalog_manifest(out)
    assert man is not None
    assert man["catalog_version"] == cat.version == metrics["transform_version"]
    assert man["grids"] == cat.grid_fingerprints()
    assert man["structure"] == cat.structure_fingerprint()

    # every committed record carries its region provenance
    recs = completed_shards(out, cat.version)
    assert recs and all("region_set" in r for r in recs.values())

    # The real shards all touch every region (the fixture's points are
    # spread), which would make the "kept" branch vacuous — inject a
    # synthetic committed record whose region_set AVOIDS the victim so
    # the disjoint-shard path is actually exercised.
    from vyperdatum_ray.state.lineage import _commit_record

    fake = {**next(iter(recs.values())), "shard": "part-9999",
            "input_file": "synthetic", "region_set": ["SYNcoastA_8301"]}
    _commit_record(out, fake)
    recs = completed_shards(out, cat.version)
    assert "part-9999" in recs

    # perturb ONE region's grid values -> a new catalog "version"
    victim = "SYNcoastB_8301"
    cat2 = copy.deepcopy(cat)
    cat2.grids[f"{victim}/mllw"].values += 0.01
    cat2.version = "vNext"

    done2 = completed_shards(out, cat2.version, catalog=cat2)
    expect_done = {s for s, r in recs.items() if victim not in r["region_set"]}
    assert "part-9999" in expect_done  # the kept branch is non-vacuous
    assert set(done2) == expect_done  # exactly the untouched shards

    # resuming with the perturbed catalog re-runs exactly the affected
    # real shards and re-stamps the manifest at the new version
    real_done = {s for s in expect_done if s != "part-9999"}
    m2 = run_flagship_checkpointed(SF, out, catalog=cat2)
    assert m2["n_shards_run"] == metrics["n_shards_total"] - len(real_done)
    assert m2["n_shards_skipped"] == len(real_done)
    assert load_catalog_manifest(out)["catalog_version"] == "vNext"
    # kept old-version records were RE-STAMPED to vNext: without that,
    # the next routine resume would silently recompute everything the
    # fine-grained rule just saved (the manifest now says vNext)
    kept = completed_shards(out, "vNext")
    assert "part-9999" in kept
    assert kept["part-9999"]["transform_version"] == "vNext"
    # and a further no-op resume skips everything again
    m3 = run_flagship_checkpointed(SF, out, catalog=cat2)
    assert m3["n_shards_run"] == 0

    os.remove(os.path.join(out, "_lineage", "part-9999.json"))

    # STRUCTURE change: renaming a region invalidates ALL records
    import dataclasses

    cat3 = copy.deepcopy(cat2)
    cat3.regions[0] = dataclasses.replace(cat3.regions[0], name="RENAMED")
    cat3.version = "vNext2"
    assert completed_shards(out, cat3.version, catalog=cat3) == {}
