"""Resumable corpus-curation runs: two-phase lineage checkpoints.

The corpus pipeline (pipelines/training.q_corpus_pipeline) has one
stage that is NOT shard-local — exact dedup compares documents across
the whole corpus — so a single shard-level checkpoint (state/lineage.py
style) cannot make the run resumable. Instead the run is split at the
one cross-shard boundary:

- **Phase A — curate, resumable per INPUT SHARD** (a doc_id range of
  the documents table; with multi-file input a shard would be one
  file). Each shard independently runs the langid/quality/
  decontamination scan and writes its survivors as *candidate*
  partitions ``candidates/shard=K/bucket=B/`` carrying only
  ``(doc_id, n_tok, h_lo, h_hi)`` — a 128-bit content hash, never the
  text — plus an atomic lineage record. The probe n-gram vocabulary is
  computed once and PERSISTED (``_probe.parquet``), so a resumed run
  reuses it instead of rescanning the corpus.
- **Phase B — dedup + split, resumable per HASH BUCKET.** Exact dedup
  is partitionable by content hash: bucket ``h_lo % n_buckets``'s
  result depends only on bucket-B candidate rows across all shards,
  never on other buckets. Each pending bucket reads its candidate
  files, keeps the min doc_id per 128-bit hash, assigns the
  deterministic train/val/test split, writes ``final/bucket=B/`` and
  commits its lineage record.

Both phases follow the lineage.py protocol: pre-clear pending
partitions (a crashed attempt may have left partial files without a
record), append-write, then atomically commit the record — so re-runs
are exactly-once per partition and resume cost is proportional to the
remaining work. Any phase-A recompute drops ALL phase-B records (a
bucket's input spans every shard), while a crash inside phase B
resumes bucket-granular with phase A fully skipped. Dedup keys on the 128-bit hash rather than exact text
(collision odds ~2^-64 per pair; the adjudicated q_corpus_pipeline
keeps the exact-compare semantics for the oracle gate).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from vyperdatum_ray.state.lineage import lineage_dir

CORPUS_SCHEMA_VERSION = 1


def corpus_version(n_shards: int, n_buckets: int) -> str:
    """Stale-detection fingerprint: every parameter a lineage record's
    validity depends on — the curation thresholds, the SHARD/BUCKET
    geometry (a record names a partition of that geometry; resuming
    with different counts would silently misassign rows), and the
    polars version (h_lo/h_hi come from polars' hash, which polars does
    not guarantee stable across releases — mixing old and new candidate
    hashes would break cross-shard dedup)."""
    import polars as pl

    from vyperdatum_ray.pipelines.textops import CONTAM_N, CONTAM_PROBE_MOD
    from vyperdatum_ray.pipelines.training import CP_MAX_TOK, CP_MIN_TOK, CP_MIN_W

    return (f"corpus-v{CORPUS_SCHEMA_VERSION}-n{CONTAM_N}-p{CONTAM_PROBE_MOD}"
            f"-t{CP_MIN_TOK}.{CP_MAX_TOK}-w{CP_MIN_W}"
            f"-s{n_shards}-b{n_buckets}-pl{pl.__version__}")


CORPUS_MANIFEST_NAME = "_corpus_manifest.json"


def input_fingerprints(paths) -> dict[str, str]:
    """Cheap per-file INPUT content fingerprint: md5 over (file size,
    last 64 KB). The parquet footer lives in that tail and carries
    row-group offsets + statistics, so any rewrite of the data changes
    it; the read is O(64 KB) per file regardless of data size. This is
    the corpus-run analogue of lineage.write_catalog_manifest's
    per-grid hashes: corpus_version() covers PARAMETERS, this covers
    the DATA — without it a rewritten documents.parquet would resume
    against stale phase-A candidates and silently emit the old
    corpus."""
    out = {}
    for p in sorted(str(x) for x in ([paths] if isinstance(paths, (str, bytes))
                                     else paths)):
        size = os.path.getsize(p)
        with open(p, "rb") as f:
            f.seek(max(0, size - 65536))
            tail = f.read()
        h = hashlib.md5()
        h.update(str(size).encode())
        h.update(tail)
        out[os.path.basename(p)] = h.hexdigest()[:16]
    return out


def _manifest_path(out_dir: str) -> str:
    return os.path.join(lineage_dir(out_dir), CORPUS_MANIFEST_NAME)


def _load_manifest(out_dir: str) -> dict | None:
    try:
        with open(_manifest_path(out_dir)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _write_manifest(out_dir: str, inputs: dict[str, str]) -> None:
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    final = _manifest_path(out_dir)
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"schema_version": CORPUS_SCHEMA_VERSION,
                   "inputs": inputs}, f, indent=1, sort_keys=True)
    os.replace(tmp, final)


def _records(ldir: str, version: str) -> dict[str, dict]:
    done: dict[str, dict] = {}
    if not os.path.isdir(ldir):
        return done
    for name in os.listdir(ldir):
        if not name.endswith(".json") or name.startswith("_"):
            continue
        try:
            with open(os.path.join(ldir, name)) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if rec.get("transform_version") == version:
            done[rec["part"]] = rec
    return done


def _persisted_probe(sf_dir: str, out_dir: str, version: str) -> "ray.ObjectRef":
    """Probe vocabulary: load the persisted copy if present FOR THIS
    VERSION, else compute once and persist atomically. The version is
    part of the filename so a parameter change (e.g. CONTAM_N) can
    never resume against a stale vocabulary — which would silently
    disable decontamination."""
    from vyperdatum_ray.pipelines.textops import contam_probe_ref

    path = os.path.join(out_dir, f"_probe.{version}.parquet")
    if os.path.exists(path):
        return ray.put(pq.read_table(path).column("g").combine_chunks())
    ref = contam_probe_ref(sf_dir)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(pa.table({"g": ray.get(ref)}), tmp)
    os.replace(tmp, path)
    return ref


def run_corpus_checkpointed(
    sf_dir: str,
    out_dir: str,
    n_shards: int = 8,
    n_buckets: int = 64,
) -> dict:
    """Run the curation pipeline resumably; call again after a crash
    and only pending shards (phase A) / buckets (phase B) recompute."""
    from vyperdatum_ray.pipelines.textops import _hash_utf8_fast
    from vyperdatum_ray.pipelines.training import (SPLIT_MULT, CurateStage,
                                                   _hash32)

    t0 = time.perf_counter()
    version = corpus_version(n_shards, n_buckets)
    os.makedirs(out_dir, exist_ok=True)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    meta = pq.ParquetFile(doc_path).metadata
    n_docs = meta.num_rows
    # Shard bounds cover the ACTUAL doc_id value range (from parquet
    # row-group stats — no data read), not [0, num_rows): ids that
    # start above 0, are sparse, or exceed the row count all land in
    # exactly one shard. (With multi-file input, shards would be files
    # and this range partition disappears.)
    id_col = meta.schema.names.index("doc_id")
    stats = [meta.row_group(i).column(id_col).statistics
             for i in range(meta.num_row_groups)]
    if all(s is not None and s.min is not None and s.max is not None
           for s in stats):
        id_lo = min(s.min for s in stats)
        id_hi = max(s.max for s in stats) + 1
    else:
        # statistics disabled by the writer: one cheap id-column scan
        ids = pq.read_table(doc_path, columns=["doc_id"]).column("doc_id")
        import pyarrow.compute as _pc

        id_lo = _pc.min(ids).as_py()
        id_hi = _pc.max(ids).as_py() + 1
    # Integer bound arithmetic (Python ints): np.linspace goes through
    # float64 and mis-rounds ids above 2^53, which would drop the
    # lowest documents from every shard.
    span = id_hi - id_lo
    bounds = np.array([id_lo + span * i // n_shards
                       for i in range(n_shards + 1)], dtype=np.int64)

    cand_dir = os.path.join(out_dir, "candidates")
    final_dir = os.path.join(out_dir, "final")
    ldir_a = os.path.join(lineage_dir(out_dir), "phaseA")
    ldir_b = os.path.join(lineage_dir(out_dir), "phaseB")

    # Input-data staleness gate (corpus_version covers parameters only):
    # a rewritten documents.parquet invalidates EVERY record — phase A
    # read it, and every phase-B bucket spans every shard. The manifest
    # is (re)written BEFORE any work so a mid-run crash resumes
    # consistently; a dir from a pre-manifest run is honored as-is and
    # gains the manifest now.
    fps = input_fingerprints(doc_path)
    man = _load_manifest(out_dir)
    if man is not None and man.get("inputs") != fps:
        shutil.rmtree(ldir_a, ignore_errors=True)
        shutil.rmtree(ldir_b, ignore_errors=True)
        # the persisted probe vocabulary derives from the same input
        for p in os.listdir(out_dir):
            if p.startswith("_probe.") and p.endswith(".parquet"):
                os.unlink(os.path.join(out_dir, p))
    _write_manifest(out_dir, fps)

    # ---------------------------------------------------- phase A ---
    done_a = _records(ldir_a, version)
    pending_a = [k for k in range(n_shards) if f"shard{k}" not in done_a]
    metrics = {
        "transform_version": version,
        "phaseA_total": n_shards, "phaseA_skipped": n_shards - len(pending_a),
        "phaseB_total": n_buckets,
    }
    if pending_a:
        # Write-ahead invalidation: phase-A output is about to change
        # and a bucket's input spans every shard, so drop ALL phase-B
        # records BEFORE any phase-A work — a crash after the phase-A
        # commits but before this point could otherwise leave valid-
        # looking phase-B records over stale candidates.
        shutil.rmtree(ldir_b, ignore_errors=True)
        probe_ref = _persisted_probe(sf_dir, out_dir, version)
        for k in pending_a:
            shutil.rmtree(os.path.join(cand_dir, f"shard={k}"), ignore_errors=True)

        def read_shard(batch: pa.Table) -> pa.Table:
            outs = []
            for k in batch.column("k").to_pylist():
                lo, hi = int(bounds[k]), int(bounds[k + 1])
                t = pq.read_table(
                    doc_path, columns=["doc_id", "text"],
                    filters=[("doc_id", ">=", lo), ("doc_id", "<", hi)])
                outs.append(t.append_column(
                    "shard", pa.array(np.full(t.num_rows, k), pa.int64())))
            return pa.concat_tables(outs)

        def to_candidates(t: pa.Table) -> pa.Table:
            col = t.column("text")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            import polars as pl

            h_lo = _hash_utf8_fast(col)
            h_hi = pl.from_arrow(col).hash(seed=43).to_numpy().astype(np.uint64)
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_tok": t.column("n_tok"),
                "shard": t.column("shard"),
                "h_lo": pa.array(h_lo.astype(np.int64)),
                "h_hi": pa.array(h_hi.astype(np.int64)),
                "bucket": pa.array((h_lo % np.uint64(n_buckets)).astype(np.int64)),
            })

        class CurateKeepShard(CurateStage):
            def __init__(self, probe_ref):
                super().__init__(probe_ref)
                # actor-scoped (this pool's workers die with the pool):
                # one Arrow thread per 1-CPU actor
                pa.set_cpu_count(1)

            def __call__(self, t: pa.Table) -> pa.Table:
                shard = t.column("shard")
                kept = super().__call__(t.drop_columns(["shard"]))
                idx = pc.index_in(kept.column("doc_id"), t.column("doc_id"))
                return kept.append_column("shard", shard.take(idx))

        (ray.data.from_items([{"k": k} for k in pending_a],
                             override_num_blocks=len(pending_a))
         .map_batches(read_shard, batch_format="pyarrow", batch_size=1)
         .map_batches(CurateKeepShard,
                      fn_constructor_kwargs=dict(probe_ref=probe_ref),
                      batch_format="pyarrow",
                      concurrency=min(8, len(pending_a)), num_cpus=1)
         .map_batches(to_candidates, batch_format="pyarrow")
         .write_parquet(cand_dir, partition_cols=["shard", "bucket"]))

        for k in pending_a:
            sdir = os.path.join(cand_dir, f"shard={k}")
            n_out = 0
            if os.path.isdir(sdir):
                for root, _dirs, files in os.walk(sdir):
                    for f in files:
                        if f.endswith(".parquet"):
                            n_out += pq.ParquetFile(os.path.join(root, f)) \
                                .metadata.num_rows
            _commit_record_in(ldir_a, {
                "schema_version": CORPUS_SCHEMA_VERSION, "part": f"shard{k}",
                # id_range is the doc_id VALUE range this shard owns —
                # with sparse ids its width is not a row count, so no
                # n_rows_in is claimed (n_rows_out is measured output)
                "shard": f"shard{k}",
                "id_range": [int(bounds[k]), int(bounds[k + 1])],
                "n_rows_out": n_out,
                "transform_version": version,
            })
    # ---------------------------------------------------- phase B ---
    done_b = _records(ldir_b, version)
    pending_b = [b for b in range(n_buckets) if f"bucket{b}" not in done_b]
    metrics["phaseB_skipped"] = n_buckets - len(pending_b)
    if pending_b:
        for b in pending_b:
            shutil.rmtree(os.path.join(final_dir, f"bucket={b}"), ignore_errors=True)
        files_by_bucket: dict[int, list[str]] = {b: [] for b in pending_b}
        for k in range(n_shards):
            for b in pending_b:
                d = os.path.join(cand_dir, f"shard={k}", f"bucket={b}")
                if os.path.isdir(d):
                    files_by_bucket[b] += [
                        os.path.join(d, f) for f in os.listdir(d)
                        if f.endswith(".parquet")]
        all_files = [f for fs in files_by_bucket.values() for f in fs]
        if all_files:
            def dedup_split(df):
                df = df.sort_values("doc_id")
                g = df.groupby(["h_lo", "h_hi"], as_index=False).agg(
                    doc_id=("doc_id", "first"), n_tok=("n_tok", "first"),
                    bucket=("bucket", "first"))
                ids = g["doc_id"].to_numpy().astype(np.int64)
                b = (_hash32(ids, SPLIT_MULT) % np.uint64(1000)).astype(np.int64)
                g["split"] = np.where(b < 980, "train",
                                      np.where(b < 990, "val", "test"))
                return g[["doc_id", "n_tok", "bucket", "split"]]

            def rebucket(t: pa.Table) -> pa.Table:
                # ray.data.read_parquet hive-infers shard=/bucket= path
                # columns (as strings, and not uniformly across blocks)
                # — drop them and recover the bucket from h_lo instead
                t = t.drop_columns([c for c in ("shard", "bucket")
                                    if c in t.column_names])
                h = t.column("h_lo").to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                return t.append_column(
                    "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

            (ray.data.read_parquet(all_files)
             .map_batches(rebucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(dedup_split, batch_format="pandas")
             .write_parquet(final_dir, partition_cols=["bucket"]))
        for b in pending_b:
            bdir = os.path.join(final_dir, f"bucket={b}")
            n_out = 0
            if os.path.isdir(bdir):
                for f in os.listdir(bdir):
                    if f.endswith(".parquet"):
                        n_out += pq.ParquetFile(os.path.join(bdir, f)) \
                            .metadata.num_rows
            _commit_record_in(ldir_b, {
                "schema_version": CORPUS_SCHEMA_VERSION, "part": f"bucket{b}",
                "n_candidate_files": len(files_by_bucket[b]),
                "n_rows_out": n_out,
                "transform_version": version,
            })

    rows_out = sum(r["n_rows_out"] for r in _records(ldir_b, version).values())
    metrics.update(
        phaseA_run=len(pending_a), phaseB_run=len(pending_b),
        rows_in=n_docs, rows_out=rows_out,
        elapsed_s=round(time.perf_counter() - t0, 3),
    )
    with open(os.path.join(lineage_dir(out_dir), "_corpus_metrics.jsonl"), "a") as f:
        f.write(json.dumps({"ts": time.time(), **metrics}) + "\n")
    return metrics


def _commit_record_in(ldir: str, rec: dict) -> None:
    os.makedirs(ldir, exist_ok=True)
    final = os.path.join(ldir, f"{rec['part']}.json")
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    os.replace(tmp, final)
