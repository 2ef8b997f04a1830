"""Training-data text operators over the ``documents`` / ``pages``
tables: exact + normalized dedup, MinHash-LSH near-dup, SimHash,
rolling-hash fingerprints, token counting, quality scoring, language ID.

Vectorized per batch; the only shuffle is the hash-keyed groupby of the
dedup reducers (the hash column is computed per batch first, so the
shuffle moves ids + 8-byte hashes, never full text when avoidable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

NORMALIZE_PATTERN = r"[0-9]+(\.[0-9]+)?"  # digits (incl. decimals) -> '#'


def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _hash_utf8_fast(arr) -> np.ndarray:
    """Vectorized content hash via polars' xxhash (deterministic for a
    pinned polars version; used for shuffle keys, with exact-equality
    verification inside each group so collisions are harmless)."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(arr).hash(seed=42).to_numpy().astype(np.uint64)


def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup of documents by full text: hash-partition, then keep
    min doc_id per distinct text (group-internal exact comparison, so
    hash collisions cannot merge distinct texts)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column("text_hash", pa.array(_hash_utf8_fast(batch.column("text")), pa.uint64()))

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text", as_index=False).agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        return g[["doc_id", "n_dups"]]

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(add_hash, batch_format="pyarrow")
    return ds.groupby("text_hash").map_groups(reduce_group, batch_format="pandas")


def q_dedup_normalized(sf_dir: str) -> ray.data.Dataset:
    """Template dedup of pages: strip numbers from text, dedupe on the
    normalized key (the pages corpus is template-generated, so this
    collapses it to the handful of real templates)."""
    from vyperdatum_ray.fixtures import pages_paths

    def add_key(batch: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(batch.column("text"), NORMALIZE_PATTERN, "#")
        return pa.table(
            {
                "url": batch.column("url"),
                "norm_text": norm,
                "key_hash": pa.array(_hash_utf8_fast(norm), pa.uint64()),
            }
        )

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("norm_text", as_index=False).agg(url=("url", "min"), n_dups=("url", "size"))
        return g[["url", "n_dups"]]

    ds = ray.data.read_parquet(pages_paths(sf_dir), columns=["url", "text"])
    ds = ds.map_batches(add_key, batch_format="pyarrow")
    return ds.groupby("key_hash").map_groups(reduce_group, batch_format="pandas")


def q_token_count(sf_dir: str) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch.column("text"), r"\S+"), pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_quality_score(sf_dir: str) -> ray.data.Dataset:
    """Quality signals: char/alpha/space/punct counts (ints — exact)."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_alpha": pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64()),
                "n_space": pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64()),
                "n_punct": pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------- language ID ---

_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "with", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den"],
    "fr": ["le", "la", "les", "des", "et", "est", "dans", "pour"],
}


class LangId:
    """n-gram/stopword heuristic language ID (actor pool: word regex and
    stopword lookups compiled once per actor)."""

    def __init__(self):
        import re

        self.word = re.compile(r"[a-zA-Z']+")
        self.table = {}
        for lang, words in _LANG_STOPWORDS.items():
            for w in words:
                self.table.setdefault(w, []).append(lang)
        self.langs = list(_LANG_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        pred = np.empty(len(texts), dtype=object)
        conf = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            scores = dict.fromkeys(self.langs, 0)
            toks = self.word.findall((t or "").lower())
            for tok in toks:
                for lang in self.table.get(tok, ()):
                    scores[lang] += 1
            best = max(self.langs, key=lambda l: (scores[l], l))
            total = sum(scores.values())
            pred[i] = best if total else "und"
            conf[i] = scores[best] / total if total else 0.0
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(pred, pa.string()),
                "lang_conf": pa.array(np.round(conf, 6)),
            }
        )


def q_langid(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )


# -------------------------------------------------- fingerprints / LSH ---

_MERSENNE = np.uint64((1 << 61) - 1)
_SHINGLE_MOD = np.uint64((1 << 31) - 1)  # shingle hashes < 2^31 so a*s fits uint64


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling polynomial hashes of character k-shingles, vectorized
    (k shifted-slice passes; values < 2^31)."""
    data = np.frombuffer((text or "").encode(), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    n = len(data) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = (h * np.uint64(257) + data[j : j + n]) % _SHINGLE_MOD
    return np.unique(h)


class MinHasher:
    """MinHash signatures over character shingles. Permutation params
    are < 2^31 so ``(a*s + b) % (2^61-1)`` never overflows uint64 —
    fully vectorized as a (num_perm, n_shingles) broadcast."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 31, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, 1 << 31, num_perm, dtype=np.int64).astype(np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)


class MinHashStage:
    def __init__(self, num_perm=64, bands=16, id_col="doc_id", text_col="text"):
        self.mh = MinHasher(num_perm=num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit (band_id, band_hash, id) rows — the LSH explode."""
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        sigs = np.empty((n, self.mh.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.mh.signature(t)
        banded = sigs.reshape(n, self.bands, self.rows_per_band)
        band_hash = np.bitwise_xor.reduce(banded, axis=2) * np.uint64(0x9E3779B97F4A7C15)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        ids = batch.column(self.id_col)
        id_rep = ids.take(pa.array(np.repeat(np.arange(n), self.bands)))
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_hash": pa.array(band_hash.reshape(-1), pa.uint64()),
                "id": id_rep,
            }
        )


def q_minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """MinHash-LSH candidate pairs over pages text (rows-only check;
    verified by Jaccard in tests): shingle -> minhash -> band explode ->
    groupby(band) -> pairs."""
    from vyperdatum_ray.fixtures import pages_paths

    ds = ray.data.read_parquet(pages_paths(sf_dir), columns=["url", "text"])
    # LSH over a deterministic sample to bound pair blowup at test scale
    ds = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"id_col": "url", "text_col": "text"},
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
        batch_size=2048,
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df["id"].unique())
        if len(ids) < 2 or len(ids) > 64:  # skip degenerate / mega-buckets
            return pd.DataFrame({"id_a": [], "id_b": []}).astype({"id_a": str, "id_b": str})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    cand = ds.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return cand.groupby("id_a").map_groups(dedup_pairs, batch_format="pandas")


class SimHashStage:
    """64-bit SimHash over word unigrams (token hash sign aggregation)."""

    def __init__(self, id_col="doc_id", text_col="text"):
        import re

        self.word = re.compile(r"\S+")
        self.id_col = id_col
        self.text_col = text_col

    def _simhash(self, text: str) -> int:
        toks = self.word.findall(text or "")
        if not toks:
            return 0
        hs = np.empty(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks):
            h = 0xCBF29CE484222325
            for byte in tok.encode():
                h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            hs[i] = h
        shifts = np.arange(64, dtype=np.uint64)
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
        acc = np.where(bits == 1, 1, -1).sum(axis=0)
        return int(np.bitwise_or.reduce((acc > 0).astype(np.uint64) << shifts))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        hashes = np.array([self._simhash(t) for t in texts], dtype=np.uint64)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "simhash": pa.array(hashes, pa.uint64())})


def q_simhash(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashStage, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )


def q_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Document fingerprint: min rolling-hash shingle (winnowing-style
    representative) + shingle count."""

    class Fingerprint:
        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            fp = np.empty(len(texts), dtype=np.uint64)
            cnt = np.empty(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                sh = _shingle_hashes(t or "", 5)
                fp[i] = sh.min() if len(sh) else 0
                cnt[i] = len(sh)
            return pa.table(
                {"doc_id": batch.column("doc_id"),
                 "fingerprint": pa.array(fp, pa.uint64()),
                 "n_shingles": pa.array(cnt, pa.int64())}
            )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        Fingerprint, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )


def q_html_stats(sf_dir: str) -> ray.data.Dataset:
    """Binary-column stats over pages html (exercises reading the binary
    payload column that every other pipeline prunes)."""
    from vyperdatum_ray.fixtures import pages_paths

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "html_bytes": pc.cast(pc.binary_length(batch.column("html")), pa.int64()),
            }
        )

    ds = ray.data.read_parquet(pages_paths(sf_dir), columns=["url", "html"])
    return ds.map_batches(f, batch_format="pyarrow")
