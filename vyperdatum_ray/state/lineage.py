"""Per-partition lineage checkpoints + resumable flagship runs.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The unit of checkpointing is the INPUT SHARD (one pages
parquet file): a shard is "done" iff its lineage record exists. A
lineage record is committed atomically (tmp file + rename) only AFTER
the shard's output partition is fully written, and records

    {input_file, row_range, cell_set (distinct tile ids), n_rows_in,
     n_rows_out, transform_version, engine_version}

(reference analogue: the transform-version fingerprint cache,
core.py:766-792/1063-1147 — extended to per-partition provenance).

Resume semantics (scalable at 10^12 docs): completed shards are pruned
AT THE READ — the resumed Dataset simply never reads finished input
files, so resume cost is proportional to the remaining work. Output is
partitioned by shard id (one directory per shard), so a retried /
resumed shard overwrites its own partition idempotently and never
double-counts (Ray tasks are at-least-once).

A lineage record whose ``transform_version`` differs from the current
catalog fingerprint is treated as stale and recomputed.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

SCHEMA_VERSION = 1


def _shard_of(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_shards(out_dir: str, transform_version: str) -> dict[str, dict]:
    """Shard -> lineage record for every committed, version-current
    shard."""
    ldir = lineage_dir(out_dir)
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
            continue  # partial/corrupt record -> recompute that shard
        if rec.get("transform_version") == transform_version:
            done[rec["shard"]] = rec
    return done


def _commit_record(out_dir: str, rec: dict) -> None:
    ldir = lineage_dir(out_dir)
    os.makedirs(ldir, exist_ok=True)
    final = os.path.join(ldir, f"{rec['shard']}.json")
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    os.replace(tmp, final)  # atomic commit


def run_flagship_checkpointed(
    sf_dir: str,
    out_dir: str,
    batch_size: int = 16384,
) -> dict:
    """Run the flagship pipeline shard-resumably; returns run metrics.

    Call again after a failure (or after new input shards appear) and it
    processes only the pending shards.
    """
    from vyperdatum_ray.pipelines.flagship import flagship_pipeline, load_catalog
    from vyperdatum_ray.fixtures import pages_paths

    t0 = time.perf_counter()
    catalog = load_catalog(sf_dir)
    version = catalog.version

    all_paths = sorted(pages_paths(sf_dir))
    done = completed_shards(out_dir, version)
    pending = [p for p in all_paths if _shard_of(p) not in done]
    metrics = {
        "n_shards_total": len(all_paths),
        "n_shards_skipped": len(all_paths) - len(pending),
        "n_shards_run": len(pending),
        "transform_version": version,
    }
    if not pending:
        metrics["elapsed_s"] = round(time.perf_counter() - t0, 3)
        _write_metrics(out_dir, metrics)
        return metrics

    # Clear partitions of pending shards (idempotent re-run; a crashed
    # attempt may have left partial files without a lineage record).
    import shutil

    for p in pending:
        part_dir = os.path.join(out_dir, f"shard={_shard_of(p)}")
        shutil.rmtree(part_dir, ignore_errors=True)

    def tag_shard(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        shards = [_shard_of(p) for p in paths]
        return batch.drop_columns(["path"]).append_column(
            "shard", pa.array(shards, pa.string())
        )

    # geocode_in_read: the sink schema below has no text column, so the
    # page text is parsed inside the read task and never enters the
    # object store (2x flagship throughput at 8 CPUs — BASELINE.md
    # round-3 bandwidth analysis)
    ds = flagship_pipeline(sf_dir, batch_size=batch_size, catalog=catalog,
                           paths=pending, include_paths=True,
                           geocode_in_read=True)
    ds = ds.map_batches(tag_shard, batch_format="pyarrow")
    ds = ds.select_columns(
        ["shard", "url", "lat", "lon", "h3_9", "s2_13", "tile_id",
         "region", "region_index", "z_out", "unc"]
    )
    # append mode: completed shards' partitions are untouched; pending
    # partitions were cleared above, so the write is shard-idempotent
    ds.write_parquet(out_dir, partition_cols=["shard"])

    # Per-shard lineage aggregates from the WRITTEN output — reading
    # ONLY the pending partitions (resume cost stays proportional to
    # the work actually done).
    pending_files = []
    for p in pending:
        d = os.path.join(out_dir, f"shard={_shard_of(p)}")
        if os.path.isdir(d):
            pending_files += [
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            ]
    if not pending_files:
        # every pending shard produced zero output rows (e.g. no
        # geocodable pages) — still commit their (empty) lineage records
        # so the resume converges instead of crashing forever
        import pyarrow.parquet as pq

        rows_in = 0
        for p in pending:
            n_in = pq.ParquetFile(p).metadata.num_rows
            _commit_record(out_dir, {
                "schema_version": SCHEMA_VERSION, "shard": _shard_of(p),
                "input_file": p, "row_range": [0, n_in], "n_rows_in": n_in,
                "n_rows_out": 0, "cell_set": [], "transform_version": version,
            })
            rows_in += n_in
        metrics.update(rows_in=rows_in, rows_out=0,
                       elapsed_s=round(time.perf_counter() - t0, 3))
        _write_metrics(out_dir, metrics)
        return metrics
    out = ray.data.read_parquet(pending_files, columns=["tile_id"], include_paths=True)

    def partial(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        sh = np.array(
            [next(seg[6:] for seg in p.split(os.sep) if seg.startswith("shard="))
             for p in paths],
            dtype=object,
        )
        tid = batch.column("tile_id").to_numpy(zero_copy_only=False)
        rows = []
        for s in np.unique(sh):
            m = sh == s
            rows.append({"shard": str(s), "n": int(m.sum()),
                         "tiles": np.unique(tid[m]).tolist()})
        return pa.Table.from_pylist(rows)

    def merge(df):
        tiles = sorted({t for lst in df["tiles"] for t in lst})
        return df.iloc[:1].assign(n=df["n"].sum())[["shard", "n"]].assign(
            tiles=[tiles]
        )

    agg = (
        out.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    by_shard = {r["shard"]: r for _, r in agg.iterrows()}

    import pyarrow.parquet as pq

    rows_in = rows_out = 0
    for p in pending:
        shard = _shard_of(p)
        n_in = pq.ParquetFile(p).metadata.num_rows
        rec_row = by_shard.get(shard)
        rec = {
            "schema_version": SCHEMA_VERSION,
            "shard": shard,
            "input_file": p,
            "row_range": [0, n_in],
            "n_rows_in": n_in,
            "n_rows_out": int(rec_row["n"]) if rec_row is not None else 0,
            "cell_set": [int(t) for t in rec_row["tiles"]] if rec_row is not None else [],
            "transform_version": version,
        }
        _commit_record(out_dir, rec)
        rows_in += n_in
        rows_out += rec["n_rows_out"]

    metrics.update(
        rows_in=rows_in, rows_out=rows_out,
        elapsed_s=round(time.perf_counter() - t0, 3),
    )
    _write_metrics(out_dir, metrics)
    return metrics


def _write_metrics(out_dir: str, metrics: dict) -> None:
    path = os.path.join(lineage_dir(out_dir), "_metrics.jsonl")
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps({"ts": time.time(), **metrics}) + "\n")
