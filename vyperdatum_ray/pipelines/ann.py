"""Similarity search over the ``embeddings`` table.

* ``q_ann_topk`` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one float64 matmul, emits
  its local top-k candidates, and a tiny final reduce picks the global
  top-k. Scale path: the per-batch candidate emission keeps the reduce
  input at O(queries * k * n_blocks), never O(n).
* ``q_ann_ivf`` — IVF-style bucketed variant: k-means-lite centroids
  (sampled, fixed seed) assign every vector to a list; probes search
  only the nearest ``nprobe`` lists. Approximate by design (rows-only
  check; recall asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

K = 10
N_QUERIES = 10


def _emb(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df["vec_id"] < N_QUERIES].sort_values("vec_id")
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), q


def _batch_to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(ids), -1)
    return ids, mat


class TopKScorer:
    """Per-batch brute-force scorer: local top-k per query against the
    broadcast query matrix."""

    def __init__(self, qids_ref, qmat_ref, k: int = K):
        self.qids = ray.get(qids_ref) if isinstance(qids_ref, ray.ObjectRef) else qids_ref
        q = ray.get(qmat_ref) if isinstance(qmat_ref, ray.ObjectRef) else qmat_ref
        self.qnorm = np.linalg.norm(q, axis=1)
        self.q = q
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _batch_to_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        sims = (self.q @ mat.T) / (self.qnorm[:, None] * norms[None, :])
        k = min(self.k, sims.shape[1])
        # local top-k per query (argpartition then exact sort of the head)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = []
        for qi in range(sims.shape[0]):
            cand = part[qi]
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": self.qids[qi],
                        "neighbor_id": ids[cand],
                        "sim": sims[qi, cand],
                    }
                )
            )
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Global exact top-k (query_id, rank, neighbor_id); deterministic
    tie-break (sim desc, neighbor_id asc)."""
    qids, qmat = _query_matrix(sf_dir)
    refs = {"qids_ref": ray.put(qids), "qmat_ref": ray.put(qmat)}
    cand = _emb(sf_dir).map_batches(
        TopKScorer, fn_constructor_kwargs=refs, batch_format="pyarrow",
        batch_size=4096, concurrency=(1, 8), num_cpus=1,
    )
    # final reduce: O(queries * k * n_blocks) rows — tiny
    df = cand.to_pandas()
    df = df.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    top = df.groupby("query_id", as_index=False).head(K).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


class IVFScorer:
    """IVF probe: score only vectors whose centroid list is among the
    query's nprobe nearest lists."""

    def __init__(self, qids_ref, qmat_ref, cents_ref, nprobe: int = 4, k: int = K):
        self.qids = ray.get(qids_ref) if isinstance(qids_ref, ray.ObjectRef) else qids_ref
        self.q = ray.get(qmat_ref) if isinstance(qmat_ref, ray.ObjectRef) else qmat_ref
        cents = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        self.qnorm = np.linalg.norm(self.q, axis=1)
        qsims = (self.q / self.qnorm[:, None]) @ self.cents.T
        self.probe_lists = np.argsort(-qsims, axis=1)[:, :nprobe]  # (Q, nprobe)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _batch_to_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        assign = np.argmax((mat / norms[:, None]) @ self.cents.T, axis=1)
        rows = []
        for qi in range(len(self.qids)):
            m = np.isin(assign, self.probe_lists[qi])
            if not m.any():
                continue
            sims = (mat[m] @ self.q[qi]) / (norms[m] * self.qnorm[qi])
            k = min(self.k, len(sims))
            cand = np.argpartition(-sims, k - 1)[:k]
            rows.append(pd.DataFrame({"query_id": self.qids[qi],
                                      "neighbor_id": ids[m][cand], "sim": sims[cand]}))
        if not rows:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.Table.from_pandas(pd.concat(rows), preserve_index=False)


def q_ann_ivf(sf_dir: str, nlist: int = 16, nprobe: int = 4) -> pd.DataFrame:
    """Approximate IVF top-k (rows-only check; tests assert recall vs
    brute force)."""
    import pyarrow.parquet as pq

    qids, qmat = _query_matrix(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    all_emb = np.stack(t.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(11)
    cents = all_emb[rng.choice(len(all_emb), size=min(nlist, len(all_emb)), replace=False)]
    # a few Lloyd iterations (driver-side, deterministic) — sampled
    # seeds alone give lopsided lists and poor recall
    normed = all_emb / np.linalg.norm(all_emb, axis=1, keepdims=True)
    for _ in range(4):
        c = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(normed @ c.T, axis=1)
        for j in range(len(cents)):
            members = all_emb[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    refs = {
        "qids_ref": ray.put(qids),
        "qmat_ref": ray.put(qmat),
        "cents_ref": ray.put(cents),
        "nprobe": nprobe,
    }
    cand = _emb(sf_dir).map_batches(
        IVFScorer, fn_constructor_kwargs=refs, batch_format="pyarrow",
        batch_size=4096, concurrency=(1, 8), num_cpus=1,
    )
    df = cand.to_pandas()
    df = df.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    top = df.groupby("query_id", as_index=False).head(K).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


class CosinePairs:
    """All-pairs cosine near-dup (embedding near-dup dedup family): each
    batch scores against the broadcast full matrix and emits (a, b)
    pairs with a < b and cosine >= tau. O(n^2) brute force is the
    test-scale baseline; the scale path buckets by IVF/LSH list first
    (q_ann_ivf's assignment) so only same-bucket pairs are scored."""

    def __init__(self, ids_ref, mat_ref, tau: float):
        self.ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        mat = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
        self.mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        self.tau = tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _batch_to_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ self.mat.T
        ai, bi = np.nonzero(sims >= self.tau)
        a, b = ids[ai], self.ids[bi]
        keep = a < b
        return pa.table({"vec_id_a": pa.array(a[keep], pa.int64()),
                         "vec_id_b": pa.array(b[keep], pa.int64())})


def q_neardup_embedding(sf_dir: str, tau: float = 0.4) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs over the whole embeddings
    table."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id")
    ids = df["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    refs = {"ids_ref": ray.put(ids), "mat_ref": ray.put(mat), "tau": tau}
    return _emb(sf_dir).map_batches(
        CosinePairs, fn_constructor_kwargs=refs, batch_format="pyarrow",
        batch_size=4096, concurrency=(1, 8), num_cpus=1,
    )
