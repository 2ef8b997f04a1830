"""Two-phase corpus-curation resume (state/corpus_lineage.py): full-run
equivalence with the adjudicated pipeline, shard-level phase-A resume
after a crash that left partial candidate files, and bucket-level
phase-B resume with phase A fully skipped."""

import glob
import json
import os
import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _final(out_dir):
    files = glob.glob(os.path.join(out_dir, "final", "bucket=*", "*.parquet"))
    return pd.concat(map(pd.read_parquet, files)).sort_values("doc_id") \
        .reset_index(drop=True)


@pytest.fixture()
def ref(ray_session):
    from vyperdatum_ray.pipelines.training import q_corpus_pipeline

    return q_corpus_pipeline(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)


def test_full_run_matches_adjudicated_pipeline_and_noop_resume(ray_session, ref, tmp_path):
    from vyperdatum_ray.state.corpus_lineage import run_corpus_checkpointed

    out = str(tmp_path / "run")
    m1 = run_corpus_checkpointed(SF, out, n_shards=4, n_buckets=16)
    assert m1["phaseA_run"] == 4 and m1["phaseB_run"] == 16
    got = _final(out)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["split"].tolist() == ref["split"].tolist()
    assert (got.set_index("doc_id")["n_tok"]
            == ref.set_index("doc_id")["n_tok"]).all()
    # second invocation is a no-op at both phases
    m2 = run_corpus_checkpointed(SF, out, n_shards=4, n_buckets=16)
    assert m2["phaseA_run"] == 0 and m2["phaseB_run"] == 0
    assert m2["rows_out"] == m1["rows_out"]
    assert _final(out)["doc_id"].tolist() == ref["doc_id"].tolist()


def test_input_rewrite_invalidates_all_records(ray_session, tmp_path):
    """The input manifest gate: rewriting documents.parquet (same
    params, different data) must recompute every shard and bucket AND
    refresh the persisted probe; an untouched input still no-op
    resumes."""
    import pyarrow.parquet as pq

    from vyperdatum_ray.state.corpus_lineage import run_corpus_checkpointed

    sf = str(tmp_path / "in")
    os.makedirs(sf)
    shutil.copy(os.path.join(SF, "documents.parquet"),
                os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "run")
    m1 = run_corpus_checkpointed(sf, out, n_shards=4, n_buckets=16)
    assert m1["phaseA_run"] == 4 and m1["phaseB_run"] == 16
    base = _final(out)

    # untouched input: no-op resume
    m2 = run_corpus_checkpointed(sf, out, n_shards=4, n_buckets=16)
    assert m2["phaseA_run"] == 0 and m2["phaseB_run"] == 0

    # rewrite the input: drop half the documents
    t = pq.read_table(os.path.join(sf, "documents.parquet"))
    pq.write_table(t.slice(0, t.num_rows // 2),
                   os.path.join(sf, "documents.parquet"))
    m3 = run_corpus_checkpointed(sf, out, n_shards=4, n_buckets=16)
    assert m3["phaseA_run"] == 4 and m3["phaseB_run"] == 16
    got = _final(out)
    assert len(got) < len(base)
    assert got["doc_id"].max() < t.num_rows // 2


def test_phase_a_crash_resumes_shard_granular(ray_session, ref, tmp_path):
    """Simulate a crash mid-phase-A: one shard committed, another left
    PARTIAL candidate files with no lineage record. The resume must
    pre-clear and recompute only uncommitted shards and end bit-equal
    to a clean run."""
    from vyperdatum_ray.state.corpus_lineage import run_corpus_checkpointed

    out = str(tmp_path / "run")
    run_corpus_checkpointed(SF, out, n_shards=4, n_buckets=16)
    # forge the crash: drop shard 1's and 2's records; corrupt shard 2's
    # partition to a half-written state; wipe phase B entirely
    for k in (1, 2):
        os.remove(os.path.join(out, "_lineage", "phaseA", f"shard{k}.json"))
    part = glob.glob(os.path.join(out, "candidates", "shard=2", "bucket=*",
                                  "*.parquet"))
    assert part
    with open(part[0], "wb") as f:
        f.write(b"not a parquet file")  # truncated partial write
    shutil.rmtree(os.path.join(out, "_lineage", "phaseB"))
    shutil.rmtree(os.path.join(out, "final"))

    m = run_corpus_checkpointed(SF, out, n_shards=4, n_buckets=16)
    assert m["phaseA_run"] == 2 and m["phaseA_skipped"] == 2
    got = _final(out)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["split"].tolist() == ref["split"].tolist()


def test_phase_b_crash_resumes_bucket_granular(ray_session, ref, tmp_path):
    """Crash mid-phase-B: all curate shards committed, some buckets
    missing records (one with partial output). Resume must skip ALL of
    phase A, recompute only the uncommitted buckets, and not disturb
    committed bucket partitions."""
    from vyperdatum_ray.state.corpus_lineage import run_corpus_checkpointed

    out = str(tmp_path / "run")
    run_corpus_checkpointed(SF, out, n_shards=4, n_buckets=16)
    for b in (3, 7):
        os.remove(os.path.join(out, "_lineage", "phaseB", f"bucket{b}.json"))
    shutil.rmtree(os.path.join(out, "final", "bucket=7"), ignore_errors=True)
    # stamp a committed bucket's file mtime to detect rewrites
    keep_file = glob.glob(os.path.join(out, "final", "bucket=0", "*.parquet"))[0]
    mtime = os.path.getmtime(keep_file)

    m = run_corpus_checkpointed(SF, out, n_shards=4, n_buckets=16)
    assert m["phaseA_run"] == 0
    assert m["phaseB_run"] == 2 and m["phaseB_skipped"] == 14
    assert os.path.getmtime(keep_file) == mtime  # committed bucket untouched
    got = _final(out)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["split"].tolist() == ref["split"].tolist()


def test_stale_version_recomputes(ray_session, tmp_path, monkeypatch):
    """Records carrying an old transform_version are ignored — the run
    recomputes everything rather than serving stale output."""
    import vyperdatum_ray.state.corpus_lineage as cl

    out = str(tmp_path / "run")
    cl.run_corpus_checkpointed(SF, out, n_shards=2, n_buckets=4)
    rec = json.load(open(os.path.join(out, "_lineage", "phaseA", "shard0.json")))
    assert rec["transform_version"] == cl.corpus_version(2, 4)
    monkeypatch.setattr(cl, "corpus_version", lambda *a: "corpus-v999-changed")
    m = cl.run_corpus_checkpointed(SF, out, n_shards=2, n_buckets=4)
    assert m["phaseA_run"] == 2 and m["phaseB_run"] == 4
