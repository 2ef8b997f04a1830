"""Training-set assembly operators: deterministic split, sequence
packing, and quality-weighted resampling.

These are the last-mile ops of a web-text training pipeline (after
dedup/filter/score in textops.py): carve reproducible train/val/test
partitions, pack documents into fixed-length token windows, and
importance-sample by a quality weight. All three are pure integer
arithmetic mirrored bit-for-bit in the DuckDB oracles — no RNG state,
no float thresholds — so the same decision is made for a document
regardless of partitioning, run, or cluster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from vyperdatum_ray.pipelines.textops import SAMPLE_MOD, _docs

_MASK32 = np.uint64(0xFFFFFFFF)
# Distinct odd multipliers per purpose (xxhash32 primes) so the split,
# the resample draw, and textops' 5% sample are pairwise independent.
SPLIT_MULT = np.uint64(2246822519)
DRAW_MULT = np.uint64(3266489917)

SEQ_LEN = 2048          # tokens per packed training sequence
PACK_SHARD_BITS = 8     # 256 docs per prefix-sum shard
_PACK_SALT_GROUPS = 1024


def _hash32(ids: np.ndarray, mult: np.uint64) -> np.ndarray:
    """``((doc_id & 0xFFFFFFFF) * mult) mod 2^32`` in uint64 — the
    masked product stays < 2^64 so numpy cannot wrap differently from
    the oracle's HUGEINT arithmetic (same id-range note as
    textops.q_sample_documents)."""
    ids_u = ids.astype(np.uint64) & _MASK32
    return (ids_u * mult) % SAMPLE_MOD


def q_train_split(sf_dir: str) -> ray.data.Dataset:
    """98/1/1 train/val/test split by integer hash bucket — stable
    under repartitioning and re-runs, no coordination: each task
    decides its own rows from doc_id alone."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_hash32(ids, SPLIT_MULT) % np.uint64(1000)).astype(np.int64)
        split = np.where(bucket < 980, "train", np.where(bucket < 990, "val", "test"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "bucket": pa.array(bucket, pa.int64()),
            "split": pa.array(split, pa.string()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(f, batch_format="pyarrow")


TRAIN_SPLIT_ORACLE = """
WITH h AS (
  SELECT doc_id,
    CAST((CAST(doc_id & 4294967295 AS HUGEINT) * 2246822519)
         % 4294967296 % 1000 AS BIGINT) AS bucket
  FROM documents)
SELECT doc_id, bucket,
  CASE WHEN bucket < 980 THEN 'train'
       WHEN bucket < 990 THEN 'val' ELSE 'test' END AS split
FROM h"""


def q_seq_pack(sf_dir: str) -> ray.data.Dataset:
    """Pack the doc_id-ordered corpus into fixed SEQ_LEN-token training
    sequences: each document gets the sequence id and offset where its
    tokens start in the global concatenation. A global ordered prefix
    sum, done distributed in two passes:

    1. per-shard token totals (shard = doc_id >> 8): a per-batch
       combiner emits (shard, partial_sum) rows, a bounded groupby-sum
       merges them, and the driver cumsums the shard table — the only
       driver-side state is n_docs/256 (shard, offset) pairs; at
       trillions of docs widen the shard or add a second prefix level.
    2. the offset table broadcasts once (ray.put); docs stream through
       a bounded-salt groupby (shard % 1024) where each group sorts by
       doc_id and computes its shards' local cumsums vectorized.

    The shuffle carries only (doc_id, shard, n_tok) int rows — text
    never leaves pass 1's fused read tasks."""
    from ray.data.aggregate import Sum

    def shard_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = pc.count_substring_regex(t.column("text"), r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        shard = ids >> PACK_SHARD_BITS
        us, inv = np.unique(shard, return_inverse=True)
        sums = np.bincount(inv, weights=ntok).astype(np.int64)
        return pa.table({"shard": pa.array(us, pa.int64()),
                         "p_tok": pa.array(sums, pa.int64())})

    totals = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(shard_partial, batch_format="pyarrow")
        .groupby("shard").aggregate(Sum("p_tok", alias_name="tok"))
        .to_pandas().sort_values("shard")
    )
    shards = totals["shard"].to_numpy()
    tok = totals["tok"].to_numpy()
    offs = np.concatenate([[0], np.cumsum(tok)[:-1]]).astype(np.int64)
    off_ref = ray.put((shards, offs))

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = pc.count_substring_regex(t.column("text"), r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        shard = ids >> PACK_SHARD_BITS
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tok": pa.array(ntok, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "salt": pa.array(shard % _PACK_SALT_GROUPS, pa.int64()),
        })

    def pack_group(df):
        import pandas as pd

        g_shards, g_offs = ray.get(off_ref)
        df = df.sort_values("doc_id")
        ntok = df["n_tok"].to_numpy()
        shard = df["shard"].to_numpy()
        cs = np.cumsum(ntok) - ntok  # exclusive cumsum over the group
        # rebase each shard segment (shard is nondecreasing after the
        # doc_id sort) to its broadcast global offset
        starts = np.concatenate([[0], np.flatnonzero(np.diff(shard) != 0) + 1])
        seg_len = np.diff(np.concatenate([starts, [len(shard)]]))
        base = np.repeat(cs[starts], seg_len)
        glob = cs - base + g_offs[np.searchsorted(g_shards, shard)]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tok": ntok,
            "seq_id": glob // SEQ_LEN,
            "seq_off": glob % SEQ_LEN,
        })

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(pack_group, batch_format="pandas")
    )


SEQ_PACK_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
  FROM documents),
c AS (
  SELECT doc_id, n_tok,
    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
  FROM t)
SELECT doc_id, n_tok,
  CAST(cum // 2048 AS BIGINT) AS seq_id,
  CAST(cum % 2048 AS BIGINT) AS seq_off
FROM c"""


def q_quality_resample(sf_dir: str) -> ray.data.Dataset:
    """Quality-weighted downsampling: keep a document with probability
    proportional to its alpha-character density (the importance-sample
    step of CCNet-style pipelines, here with the repo's integer quality
    signal as the weight). Weight and draw are both integers in
    [0, 1000) — ``keep iff hash(doc_id) % 1000 < w_permille`` — so the
    engine and the oracle make identical decisions with no float
    threshold anywhere."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_alpha = pc.count_substring_regex(text, r"[A-Za-z]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.minimum(1000, (n_alpha * 1250) // np.maximum(n_chars, 1))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        draw = (_hash32(ids, DRAW_MULT) % np.uint64(1000)).astype(np.int64)
        keep = draw < w
        t = batch.filter(pa.array(keep))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "w_permille": pa.array(w[keep], pa.int64()),
            "draw": pa.array(draw[keep], pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


QUALITY_RESAMPLE_ORACLE = """
WITH q AS (
  SELECT doc_id,
    least(1000, (CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
                 * 1250) // greatest(CAST(length(text) AS BIGINT), 1)) AS w_permille,
    CAST((CAST(doc_id & 4294967295 AS HUGEINT) * 3266489917)
         % 4294967296 % 1000 AS BIGINT) AS draw
  FROM documents)
SELECT doc_id, CAST(w_permille AS BIGINT) AS w_permille, draw
FROM q WHERE draw < w_permille"""
