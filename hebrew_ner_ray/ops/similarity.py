"""Similarity search over the ``embeddings`` table (vec_id, embedding, label).

- ``ann_topk``: brute-force cosine top-k against a broadcast query matrix —
  the small-side-broadcast pattern: the query matrix is ``ray.put`` once,
  every batch does one float64 matmul, emits only its LOCAL top-k per
  query, and a tiny final groupby merges the partial top-ks. Shuffle
  volume is O(n_queries × k × n_batches), independent of corpus size.
- ``embedding_pairs``: all pairs with cosine ≥ τ (embedding near-dup),
  same broadcast pattern emitting pairs.
- ``ivf_topk``: the scale path — md5-seeded random-hyperplane LSH buckets;
  queries only search their own bucket (approximate → rows-only oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from hebrew_ner_ray.kg.ids import stable_id

TOPK = 10
N_QUERIES = 8
PAIR_TAU = 0.4


def _load_matrix(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def _batch_matrix(batch: pd.DataFrame):
    ids = batch["vec_id"].to_numpy()
    mat = np.stack(batch["embedding"].to_list()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


class TopKScorer:
    """Actor: holds the broadcast query matrix; emits local top-k per batch."""

    def __init__(self, query_ref, k: int = TOPK):
        import ray

        self.qids, self.qmat = ray.get(query_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        scores = self.qmat @ mat.T  # (n_queries, batch)
        rows = []
        for qi, qid in enumerate(self.qids):
            s = scores[qi]
            mask = ids != qid
            cand = np.flatnonzero(mask)
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((ids[cand], -s[cand]))][: self.k]
            for j in order:
                rows.append((qid, ids[j], s[j]))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "score"]).astype(
            {"query_id": "int64", "vec_id": "int64"}
        )


def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(TOPK)
    g = g.copy()
    g["score"] = g["score"].round(6)
    return g


def ann_topk(sf_dir: str):
    import ray
    import ray.data

    ids, mat = _load_matrix(sf_dir)
    sel = ids < N_QUERIES
    query_ref = ray.put((ids[sel], mat[sel]))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    local = ds.map_batches(
        TopKScorer,
        fn_constructor_kwargs={"query_ref": query_ref},
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 4),
    )
    return local.groupby("query_id").map_groups(_final_topk, batch_format="pandas")


class PairScorer:
    def __init__(self, all_ref, tau: float = PAIR_TAU):
        import ray

        self.ids, self.mat = ray.get(all_ref)
        self.tau = tau

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        scores = mat @ self.mat.T
        bi, aj = np.nonzero((scores >= self.tau) & (ids[:, None] < self.ids[None, :]))
        return pd.DataFrame(
            {
                "a": pd.array(ids[bi], dtype="int64"),
                "b": pd.array(self.ids[aj], dtype="int64"),
                "cosine": np.round(scores[bi, aj], 6),
            }
        )


def embedding_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ τ)."""
    import ray
    import ray.data

    all_ref = ray.put(_load_matrix(sf_dir))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(
        PairScorer,
        fn_constructor_kwargs={"all_ref": all_ref},
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 4),
    )


N_PLANES = 4  # 16 buckets


def _bucket_of(mat: np.ndarray, dim: int) -> np.ndarray:
    rng = np.random.default_rng(stable_id("ivf-planes") % 2**32)
    planes = rng.standard_normal((N_PLANES, dim))
    bits = (mat @ planes.T) > 0
    return (bits.astype(np.int64) << np.arange(N_PLANES)).sum(axis=1)


def ivf_topk(sf_dir: str):
    """Approximate top-k: queries search only their LSH bucket.

    At scale each bucket is a groupby partition; brute force runs within
    buckets. Approximate by construction → rows-only correctness check.
    """
    import ray
    import ray.data

    ids, mat = _load_matrix(sf_dir)
    sel = ids < N_QUERIES
    qb = _bucket_of(mat[sel], mat.shape[1])
    query_ref = ray.put((ids[sel], mat[sel], qb))

    class BucketScorer:
        def __init__(self):
            self.qids, self.qmat, self.qb = ray.get(query_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bids, bmat = _batch_matrix(batch)
            bb = _bucket_of(bmat, bmat.shape[1])
            scores = self.qmat @ bmat.T
            rows = []
            for qi, qid in enumerate(self.qids):
                mask = (bb == self.qb[qi]) & (bids != qid)
                cand = np.flatnonzero(mask)
                s = scores[qi]
                order = cand[np.lexsort((bids[cand], -s[cand]))][:TOPK]
                for j in order:
                    rows.append((qid, bids[j], s[j]))
            return pd.DataFrame(rows, columns=["query_id", "vec_id", "score"]).astype(
                {"query_id": "int64", "vec_id": "int64"}
            )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    local = ds.map_batches(BucketScorer, batch_format="pandas", batch_size=1024, concurrency=(1, 4))
    return local.groupby("query_id").map_groups(_final_topk, batch_format="pandas")
