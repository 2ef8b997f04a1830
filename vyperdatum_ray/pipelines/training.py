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
PACK_SHARD_BITS = 8     # 256 docs per prefix-sum shard (floor; auto-widens)
_PACK_SALT_GROUPS = 1024
PACK_MAX_DRIVER_SHARDS = 1 << 20  # driver offset-table cap (~16 MB)


def _pack_shard_bits(n_docs: int) -> int:
    """Auto-scale the prefix-sum shard width so the driver's offset
    table stays <= PACK_MAX_DRIVER_SHARDS entries under dense ids:
    widen past the 2^8 floor once n_docs exceeds 2^28. Sparse id spaces
    are additionally caught at runtime by the measured distinct-shard
    count, which switches to the two-level prefix path."""
    bits = PACK_SHARD_BITS
    while (n_docs >> bits) > PACK_MAX_DRIVER_SHARDS:
        bits += 1
    return bits


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


def _n_tok(text_col) -> np.ndarray:
    """Whitespace token count with the NULL rule mirrored everywhere:
    NULL text counts 0 tokens (COALESCE on both sides — without it the
    Arrow kernel's NaN would cast to INT64_MIN and poison downstream
    integer sums)."""
    return pc.count_substring_regex(pc.coalesce(text_col, ""), r"\S+") \
        .to_numpy(zero_copy_only=False).astype(np.int64)


def _quality_weight(text_col) -> np.ndarray:
    """Integer alpha-density permille in [0, 1000] — the ONE weight
    formula shared by q_quality_resample and CurateStage (SQL mirror:
    ``_QUALITY_WEIGHT_SQL``). NULL text weighs 0 and is dropped by
    every gate that uses it."""
    text = pc.coalesce(text_col, "")
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return np.minimum(1000, (n_alpha * 1250) // np.maximum(n_chars, 1))


_QUALITY_WEIGHT_SQL = (
    "least(1000, (CAST(length(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]')) "
    "AS BIGINT) * 1250) // greatest(CAST(length(COALESCE(text, '')) AS BIGINT), 1))"
)


def q_seq_pack(sf_dir: str, shard_bits: int | None = None,
               max_driver_shards: int = PACK_MAX_DRIVER_SHARDS,
               ) -> ray.data.Dataset:
    """Pack the doc_id-ordered corpus into fixed SEQ_LEN-token training
    sequences: each document gets the sequence id and offset where its
    tokens start in the global concatenation. A global ordered prefix
    sum, done distributed:

    1. per-shard token totals (shard = doc_id >> bits, bits auto-scaled
       from the parquet metadata row count so dense corpora keep <=
       ``max_driver_shards`` shards): a per-batch combiner emits
       (shard, partial_sum) rows and a bounded groupby-sum merges them
       — materialized distributed, never collected whole.
    2. prefix offsets per shard. If the MEASURED distinct-shard count
       fits ``max_driver_shards`` the driver cumsums the shard table
       and broadcasts it (one ray.put). Otherwise (sparse id spaces,
       or corpora past 2^20 x 2^bits docs) a SECOND prefix level runs:
       super-shard totals (shard >> 10) cumsum on the driver — 1024x
       smaller — and each super's shards get their offsets vectorized
       inside a salted groupby; the per-shard offset table then never
       exists in one place.
    3. docs stream through a bounded-salt groupby (shard % 1024) where
       each group sorts by doc_id and computes its shards' local
       cumsums vectorized; in the two-level path the shard offsets
       arrive in the SAME salt groups as union rows (a repartition
       join) instead of a broadcast.

    The shuffle carries only (doc_id, shard, n_tok) int rows — text
    never leaves pass 1's fused read tasks."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["doc_id", "text"])
    if shard_bits is None:
        shard_bits = _pack_shard_bits(docs.count())  # metadata-only count

    def shard_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = _n_tok(t.column("text"))
        shard = ids >> shard_bits
        us, inv = np.unique(shard, return_inverse=True)
        sums = np.bincount(inv, weights=ntok).astype(np.int64)
        return pa.table({"shard": pa.array(us, pa.int64()),
                         "p_tok": pa.array(sums, pa.int64())})

    totals_ds = (
        docs.map_batches(shard_partial, batch_format="pyarrow")
        .groupby("shard").aggregate(Sum("p_tok", alias_name="tok"))
        .materialize()
    )
    n_shards = totals_ds.count()

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = _n_tok(t.column("text"))
        shard = ids >> shard_bits
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tok": pa.array(ntok, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "salt": pa.array(shard % _PACK_SALT_GROUPS, pa.int64()),
        })

    prepped = docs.map_batches(prep, batch_format="pyarrow")

    def _rebase(df, shard_keys: np.ndarray, shard_offs: np.ndarray):
        """Sort one salt group by doc_id, exclusive-cumsum within each
        shard segment, rebase to the shard's global offset."""
        import pandas as pd

        df = df.sort_values("doc_id")
        ntok = df["n_tok"].to_numpy()
        shard = df["shard"].to_numpy()
        cs = np.cumsum(ntok) - ntok  # exclusive cumsum over the group
        # shard is nondecreasing after the doc_id sort
        starts = np.concatenate([[0], np.flatnonzero(np.diff(shard) != 0) + 1])
        seg_len = np.diff(np.concatenate([starts, [len(shard)]]))
        base = np.repeat(cs[starts], seg_len)
        glob = cs - base + shard_offs[np.searchsorted(shard_keys, shard)]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tok": ntok,
            "seq_id": glob // SEQ_LEN,
            "seq_off": glob % SEQ_LEN,
        })

    if n_shards <= max_driver_shards:
        # one-level: driver cumsum + one broadcast (the common case)
        totals = totals_ds.to_pandas().sort_values("shard")
        shards = totals["shard"].to_numpy()
        tok = totals["tok"].to_numpy()
        offs = np.concatenate([[0], np.cumsum(tok)[:-1]]).astype(np.int64)
        off_ref = ray.put((shards, offs))

        def pack_group(df):
            g_shards, g_offs = ray.get(off_ref)
            return _rebase(df, g_shards, g_offs)

        return prepped.groupby("salt").map_groups(
            pack_group, batch_format="pandas")

    # --- two-level prefix: driver holds only SUPER-shard offsets ---
    SUPER_BITS = 10  # 1024 shards per super-shard

    def super_partial(t: pa.Table) -> pa.Table:
        sh = t.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
        tk = t.column("tok").to_numpy(zero_copy_only=False).astype(np.int64)
        sup = sh >> SUPER_BITS
        us, inv = np.unique(sup, return_inverse=True)
        sums = np.bincount(inv, weights=tk).astype(np.int64)
        return pa.table({"super": pa.array(us, pa.int64()),
                         "s_tok": pa.array(sums, pa.int64())})

    sup = (totals_ds.map_batches(super_partial, batch_format="pyarrow")
           .groupby("super").aggregate(Sum("s_tok", alias_name="tok"))
           .to_pandas().sort_values("super"))
    sup_keys = sup["super"].to_numpy()
    sup_offs = np.concatenate([[0], np.cumsum(sup["tok"].to_numpy())[:-1]]) \
        .astype(np.int64)
    sup_ref = ray.put((sup_keys, sup_offs))

    def add_super_salt(t: pa.Table) -> pa.Table:
        sh = t.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "ssalt", pa.array((sh >> SUPER_BITS) % _PACK_SALT_GROUPS, pa.int64()))

    def shard_offsets_group(df):
        # all shards of each super land in one salt group (salted on
        # super): exclusive cumsum per super, rebased to its offset
        import pandas as pd

        g_sup, g_offs = ray.get(sup_ref)
        df = df.sort_values("shard")
        sh = df["shard"].to_numpy()
        tk = df["tok"].to_numpy()
        sup_of = sh >> SUPER_BITS
        cs = np.cumsum(tk) - tk
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sup_of) != 0) + 1])
        seg_len = np.diff(np.concatenate([starts, [len(sh)]]))
        base = np.repeat(cs[starts], seg_len)
        off = cs - base + g_offs[np.searchsorted(g_sup, sup_of)]
        return pd.DataFrame({"shard": sh, "off": off})

    shard_offs_ds = (
        totals_ds.map_batches(add_super_salt, batch_format="pyarrow")
        .groupby("ssalt").map_groups(shard_offsets_group, batch_format="pandas")
    )

    # route shard offsets into the SAME salt groups as the doc rows
    # (union + salted groupby = repartition join; no broadcast)
    def off_rows(t: pa.Table) -> pa.Table:
        sh = t.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.full(len(sh), -1), pa.int64()),
            "n_tok": t.column("off"),  # offset rides the n_tok column
            "shard": pa.array(sh, pa.int64()),
            "salt": pa.array(sh % _PACK_SALT_GROUPS, pa.int64()),
        })

    def pack_group_joined(df):
        is_off = df["doc_id"].to_numpy() == -1
        offmap = df[is_off]
        keys = offmap["shard"].to_numpy(np.int64)
        offs_ = offmap["n_tok"].to_numpy(np.int64)
        o = np.argsort(keys)
        return _rebase(df[~is_off], keys[o], offs_[o])

    u = prepped.union(shard_offs_ds.map_batches(off_rows, batch_format="pyarrow"))
    return u.groupby("salt").map_groups(pack_group_joined, batch_format="pandas")


SEQ_PACK_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(COALESCE(text, ''), '\S+')) AS BIGINT) AS n_tok
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
        w = _quality_weight(batch.column("text"))
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


QUALITY_RESAMPLE_ORACLE = f"""
WITH q AS (
  SELECT doc_id,
    {_QUALITY_WEIGHT_SQL} AS w_permille,
    CAST((CAST(doc_id & 4294967295 AS HUGEINT) * 3266489917)
         % 4294967296 % 1000 AS BIGINT) AS draw
  FROM documents)
SELECT doc_id, CAST(w_permille AS BIGINT) AS w_permille, draw
FROM q WHERE draw < w_permille"""


# ------------------------------------------- end-to-end curation ---

CP_MIN_TOK, CP_MAX_TOK, CP_MIN_W = 10, 5000, 500


class CurateStage:
    """One fused actor-pool pass over the raw pages: language ID +
    quality signals + decontamination membership, emitting only the
    surviving (doc_id, text, n_tok) stream. Stateful pieces — the
    LangId stopword sets and the broadcast probe n-gram vocabulary —
    are built once per actor; everything per batch is Arrow/numpy
    kernels (the same ones the adjudicated langid / quality_score /
    contamination_check queries use)."""

    def __init__(self, probe_ref):
        from vyperdatum_ray.pipelines.textops import LangId

        # NOTE: no pa.set_cpu_count here — this class also runs inside
        # stateless tasks on shared long-lived workers, where that
        # process-global setting would leak to every later query; the
        # actor-scoped subclass in state/corpus_lineage.py sets it.
        self.langid = LangId()
        self.probe = ray.get(probe_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        from vyperdatum_ray.pipelines.textops import (CONTAM_PROBE_MOD,
                                                      _ngram_strings)

        pred = self.langid(t).column("lang_pred").to_numpy(zero_copy_only=False)
        text = t.column("text")
        n_tok = _n_tok(text)
        w = _quality_weight(text)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        grams, doc_of, _ = _ngram_strings(text)
        hit = pc.is_in(grams, value_set=self.probe).to_numpy(zero_copy_only=False)
        n_contam = np.bincount(doc_of[hit], minlength=t.num_rows).astype(np.int64)
        keep = ((pred == "en") & (n_tok >= CP_MIN_TOK) & (n_tok <= CP_MAX_TOK)
                & (w >= CP_MIN_W) & (n_contam == 0)
                & (ids % CONTAM_PROBE_MOD != 0))
        kept = t.filter(pa.array(keep))
        return pa.table({
            "doc_id": kept.column("doc_id"),
            "text": kept.column("text"),
            "n_tok": pa.array(n_tok[keep], pa.int64()),
        })


def q_corpus_pipeline(sf_dir: str,
                      input_ds: ray.data.Dataset | None = None,
                      salt_bits: int | None = None) -> ray.data.Dataset:
    """The webtext flagship: raw pages -> curated, split training
    corpus in one streaming pipeline — English-only (LangId), quality-
    gated (10..5000 tokens, alpha density >= 0.5), decontaminated
    against the probe set (no shared 8-gram, probe docs excluded),
    exact-deduplicated (min doc_id per identical text), and assigned a
    deterministic train/val/test split. Shapes: one broadcast (probe
    vocabulary), one actor-pool scan fused into the read, and one
    bounded-salt shuffle for the dedup (the only all-to-all; it carries
    surviving text once — at larger scale swap the key to a 128-bit
    content hash exactly as dedup_exact's docstring describes)."""
    from vyperdatum_ray.pipelines.textops import (_hash_utf8_fast,
                                                  contam_probe_ref,
                                                  dedup_salt_bits)

    probe_ref = contam_probe_ref(sf_dir, input_ds=input_ds)
    docs = input_ds if input_ds is not None else _docs(sf_dir, ["doc_id", "text"])
    if salt_bits is None:
        if input_ds is None:
            # width from the RAW corpus footer (curation only shrinks
            # the dedup shuffle payload, so this over-provisions safely)
            salt_bits = dedup_salt_bits(f"{sf_dir}/documents.parquet",
                                        ("doc_id", "text"))
        else:
            # an injected input_ds has no footer: callers at scale pass
            # the width explicitly; the floor covers test corpora
            from vyperdatum_ray.pipelines.textops import DEDUP_SALT_BITS_FLOOR
            salt_bits = DEDUP_SALT_BITS_FLOOR
    salt_shift = np.uint64(64 - salt_bits)
    # stateless tasks: CurateStage's "state" is the broadcast probe
    # ref (plasma-cached per worker) plus the µs-built LangId arrays —
    # a model-loading curate stage would be an actor pool instead
    ds = docs.map_batches(
        lambda t: CurateStage(probe_ref)(t), batch_format="pyarrow",
    )

    def add_salt(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        salt = _hash_utf8_fast(col) >> salt_shift  # bounded groups
        return t.append_column("hash_salt", pa.array(salt, pa.uint64()))

    def dedup_split(df):
        df = df.sort_values("doc_id")
        g = df.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "first"), n_tok=("n_tok", "first"))
        ids = g["doc_id"].to_numpy().astype(np.int64)
        bucket = (_hash32(ids, SPLIT_MULT) % np.uint64(1000)).astype(np.int64)
        g["split"] = np.where(bucket < 980, "train",
                              np.where(bucket < 990, "val", "test"))
        return g[["doc_id", "n_tok", "split"]]

    return (ds.map_batches(add_salt, batch_format="pyarrow")
            .groupby("hash_salt")
            .map_groups(dedup_split, batch_format="pandas"))


def corpus_pipeline_oracle_sql() -> str:
    from vyperdatum_ray.pipelines.textops import _langid_sql_parts

    score_cols, tot, pred, _langs = _langid_sql_parts()
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+') AS t
  FROM documents),
sc AS (SELECT doc_id, {', '.join(score_cols)} FROM toks),
lid AS (SELECT doc_id, {pred} AS lang_pred FROM sc),
feat AS (
  SELECT doc_id, text,
    CAST(length(regexp_extract_all(COALESCE(text, ''), '\S+')) AS BIGINT) AS n_tok,
    {_QUALITY_WEIGHT_SQL} AS w
  FROM documents),
tok2 AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS a FROM documents),
win AS (SELECT doc_id, a, unnest(range(1, greatest(len(a) - 7, 0) + 1)) AS i FROM tok2),
grams AS (SELECT doc_id, array_to_string(list_slice(a, i, i + 7), ' ') AS g FROM win),
probe AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hits AS (SELECT grams.doc_id, count(*) AS n FROM grams JOIN probe USING (g)
         GROUP BY grams.doc_id),
kept AS (
  SELECT f.doc_id, f.text, f.n_tok
  FROM feat f JOIN lid USING (doc_id) LEFT JOIN hits h ON f.doc_id = h.doc_id
  WHERE lid.lang_pred = 'en' AND f.n_tok BETWEEN {CP_MIN_TOK} AND {CP_MAX_TOK}
    AND f.w >= {CP_MIN_W} AND coalesce(h.n, 0) = 0 AND f.doc_id % 97 <> 0),
ded AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
fin AS (SELECT k.doc_id, k.n_tok FROM kept k JOIN ded USING (doc_id)),
spl AS (
  SELECT doc_id, n_tok,
    CAST((CAST(doc_id & 4294967295 AS HUGEINT) * 2246822519)
         % 4294967296 % 1000 AS BIGINT) AS bucket
  FROM fin)
SELECT doc_id, n_tok,
  CASE WHEN bucket < 980 THEN 'train'
       WHEN bucket < 990 THEN 'val' ELSE 'test' END AS split
FROM spl"""
