"""Deduplication operators over the ``documents`` table.

Five dedup families, each expressed as a shuffle-conscious Ray Data
pipeline (the pattern that scales to 100 TB):

- exact:    content-hash → groupby(hash) → min(doc_id)   (one small shuffle
            over hashes; per-batch pre-hash is vectorized)
- jaccard:  word-3-gram shingles → inverted index (shingle → docs) →
            candidate pairs per shingle group with a HOT-SHINGLE CAP →
            groupby(pair) counts carrying set sizes → exact jaccard.
            The cap bounds the quadratic pair blowup on stop-shingles; the
            SQL oracle applies the identical cap so semantics stay exact.
- minhash:  K md5-derived min-hashes per doc → banded LSH buckets →
            candidate pairs per (band, bucket) group (dedup'd).
- simhash:  60-bit sign-aggregated token-hash sketch per doc.
- embedding: cosine ≥ τ pairs via per-batch numpy matmul against a
            broadcast matrix (ops/similarity.py holds the broadcast
            helper); at real scale the same code runs per LSH bucket.

Shared hashing (kg/ids.stable_id) is md5-based so every step is exactly
reproducible in the DuckDB oracles.
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from hebrew_ner_ray.kg.ids import stable_id
from hebrew_ner_ray.ops.textstats import ws_tokens

HOT_SHINGLE_CAP = 200
MINHASH_K = 12
MINHASH_BAND = 3  # → 4 bands
SIMHASH_BITS = 60


def shingles(text: str) -> set[str]:
    toks = ws_tokens(text)
    if len(toks) < 3:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


# --- exact ---


def exact_hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "text_hash": [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]],
            "doc_id": batch["doc_id"].astype("int64"),
        }
    )


def dedup_exact(sf_dir: str):
    """One row per distinct text: (text_hash, canonical_doc_id, n_dups).

    Per-batch combiner first (one row per hash per batch), then a bucketed
    aggregate — distinct-hash cardinality ≈ corpus size at web scale."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = exact_hash_batch(b)
        return h.groupby("text_hash", as_index=False).agg(
            canonical_doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            from hebrew_ner_ray.ops.shuffle import typed_empty

            return typed_empty({"text_hash": "object", "canonical_doc_id": "int64",
                                "n_dups": "int64"})
        return g.groupby("text_hash", as_index=False).agg(
            canonical_doc_id=("canonical_doc_id", "min"), n_dups=("n_dups", "sum")
        )

    from hebrew_ner_ray.ops.shuffle import partitions_for

    return bucketed_aggregate(partials, ["text_hash"], reduce,
                              coalesce=partitions_for())


# --- shingle explode (shared by jaccard + minhash) ---


def shingle_explode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Inverted-index rows keyed by the 60-bit md5 shingle id, NOT the
    shingle string — the exchange ships int64 keys (~5× less volume) and
    the SQL oracle hashes with the identical expression, so even a hash
    collision (≈n²/2⁶⁰, merging two shingles) reproduces bit-for-bit on
    both sides. ``set_size`` counts DISTINCT shingle ids per doc for the
    same reason."""
    rows_doc, rows_sh, rows_n = [], [], []
    memo: dict[str, int] = {}
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        ids = set()
        for s in shingles(text):
            h = memo.get(s)
            if h is None:
                h = memo[s] = stable_id(s)
            ids.add(h)
        n = len(ids)
        for h in ids:
            rows_doc.append(doc_id)
            rows_sh.append(h)
            rows_n.append(n)
    return pd.DataFrame({"doc_id": pd.array(rows_doc, dtype="int64"),
                         "sh_h": pd.array(rows_sh, dtype="int64"),
                         "set_size": pd.array(rows_n, dtype="int64")})


def _bucket_pair_fn(key_cols: list[str], carry_sizes: bool):
    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            from hebrew_ner_ray.ops.shuffle import typed_empty

            cols = {"a": "int64", "b": "int64"}
            if carry_sizes:
                cols.update({"size_a": "int64", "size_b": "int64"})
            return typed_empty(cols)
        # each join key lives entirely in one bucket, so the hot-key cap is
        # decided locally and the self-merge is complete for this bucket
        sizes = g.groupby(key_cols, as_index=False).size()
        live = sizes[(sizes["size"] >= 2) & (sizes["size"] <= HOT_SHINGLE_CAP)][key_cols]
        gg = g.merge(live, on=key_cols)
        m = gg.merge(gg, on=key_cols, suffixes=("", "_r"))
        m = m[m["doc_id"] < m["doc_id_r"]]
        out = {"a": m["doc_id"].astype("int64"), "b": m["doc_id_r"].astype("int64")}
        if carry_sizes:
            out["size_a"] = m["set_size"].astype("int64")
            out["size_b"] = m["set_size_r"].astype("int64")
        return pd.DataFrame(out)

    return pairs_in_bucket


def dedup_jaccard(sf_dir: str, threshold: float = 0.5):
    """Near-dup pairs by exact 3-gram-shingle jaccard ≥ threshold.

    Two shuffles total: inverted index bucketed by shingle hash (candidate
    pairs emitted vectorized per bucket), then a groupby over the (a, b)
    pairs summing shared-shingle counts."""
    import ray.data

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    exploded = ds.map_batches(shingle_explode_batch, batch_format="pandas")
    pair_fn = _bucket_pair_fn(["sh_h"], carry_sizes=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        p = pair_fn(g)
        # local partial: shared-shingle count per pair within this partition
        return p.groupby(["a", "b"], as_index=False).agg(
            inter=("a", "size"), size_a=("size_a", "max"), size_b=("size_b", "max")
        )

    # keyed exchange on the shingle id (the inverted-index build): each
    # partition holds complete shingle groups, pair_fn handles the rest
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate

    pairs = bucketed_aggregate(exploded, ["sh_h"], bucket_pairs)

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            from hebrew_ner_ray.ops.shuffle import typed_empty

            return typed_empty({"a": "int64", "b": "int64", "jaccard": "float64"})
        c = g.groupby(["a", "b"], as_index=False).agg(
            inter=("inter", "sum"), size_a=("size_a", "max"), size_b=("size_b", "max")
        )
        union = c["size_a"] + c["size_b"] - c["inter"]
        j = c["inter"] / union  # threshold on the unrounded value (SQL parity)
        out = pd.DataFrame({"a": c["a"], "b": c["b"], "jaccard": j.round(6)})
        return out[(j >= threshold).to_numpy()]

    # pair-key cardinality ~ candidate count → bucketed aggregate, not
    # Dataset.aggregate (per-distinct-key reduce overhead — ops/shuffle.py)
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate

    from hebrew_ner_ray.ops.shuffle import partitions_for

    return bucketed_aggregate(pairs, ["a", "b"], reduce_pairs,
                              coalesce=partitions_for())


# --- minhash LSH ---


def minhash_signature(sh_ids: "set[int]") -> list[int]:
    """K min-hashes over the shingle-ID set (int64 md5 ids — the same
    representation the jaccard exchange uses; the SQL oracle hashes the
    identical ``k|id`` strings)."""
    if not sh_ids:
        return [0] * MINHASH_K
    return [min(stable_id(f"{k}|{h}") for h in sh_ids) for k in range(MINHASH_K)]


def minhash_bands_batch(batch: pd.DataFrame) -> pd.DataFrame:
    rows_doc, rows_band, rows_bucket = [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        sig = minhash_signature({stable_id(s) for s in shingles(text)})
        for band in range(MINHASH_K // MINHASH_BAND):
            vals = sig[band * MINHASH_BAND : (band + 1) * MINHASH_BAND]
            # int64 bucket id (identical md5 prefix in the SQL oracle) —
            # the LSH exchange ships ints, not hex strings
            bucket = stable_id(",".join(str(v) for v in vals))
            rows_doc.append(doc_id)
            rows_band.append(band)
            rows_bucket.append(bucket)
    return pd.DataFrame({"doc_id": pd.array(rows_doc, dtype="int64"),
                         "band": pd.array(rows_band, dtype="int64"),
                         "bucket": pd.array(rows_bucket, dtype="int64")})


def dedup_minhash(sf_dir: str):
    """Distinct candidate pairs sharing ≥1 LSH band bucket (bucketed hash
    join on the (band, bucket) key, hot-bucket capped)."""
    import ray.data

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bands = ds.map_batches(minhash_bands_batch, batch_format="pandas")
    pair_fn = _bucket_pair_fn(["band", "bucket"], carry_sizes=False)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return pair_fn(g).drop_duplicates()

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, typed_empty

    pairs = bucketed_aggregate(bands, ["band", "bucket"], bucket_pairs)

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty({"a": "int64", "b": "int64"})
        return g.drop_duplicates(["a", "b"])

    from hebrew_ner_ray.ops.shuffle import partitions_for

    return bucketed_aggregate(pairs, ["a", "b"], dedupe,
                              coalesce=partitions_for())


# --- connected components over near-dup pairs ---


DRIVER_PAIR_LIMIT = 2_000_000


def _project_ab(b: pd.DataFrame) -> pd.DataFrame:
    """Schema-stable (a, b) projection — select_columns leaves mixed
    bundle schemas behind when upstream emits typed empties (observed
    RefBundle drift warnings)."""
    return pd.DataFrame({"a": b["a"].astype("int64"), "b": b["b"].astype("int64")})


def dedup_clusters(sf_dir: str, threshold: float = 0.5,
                   driver_pair_limit: int = DRIVER_PAIR_LIMIT):
    """Cluster assignment for near-duplicate documents: connected
    components over the jaccard-pair graph.

    SIZE-AWARE dispatch: the pair set is materialized once (it is already
    the product of LSH/threshold pruning, orders of magnitude smaller than
    the corpus) and counted. At or under ``driver_pair_limit`` pairs the
    exact driver-side union-find runs (any component diameter, zero extra
    shuffles); above it the distributed min-label propagation takes over —
    so a skew-blown pair graph can never OOM the driver.

    Output: (doc_id, cluster_id) for every doc in ≥1 pair; cluster_id =
    min doc id of the component.
    """
    return clusters_from_pairs(
        dedup_jaccard(sf_dir, threshold).map_batches(
            _project_ab, batch_format="pandas"),
        driver_pair_limit)


def clusters_from_pairs(pairs, driver_pair_limit: int = DRIVER_PAIR_LIMIT):
    """Size-aware connected components over any (a, b) int64 pair
    Dataset — the dispatch shared by near-dup clustering and the
    fuzzy-token entity-resolution composition (textstats). Returns
    (doc_id, cluster_id); cluster_id = min node id of the component."""
    import ray.data

    pairs = pairs.materialize()
    if pairs.count() > driver_pair_limit:
        return _clusters_label_propagation(pairs)

    from hebrew_ner_ray.ops.shuffle import to_pandas_typed

    # to_pandas_typed: a ZERO-pair corpus (nothing near-duplicated) must
    # yield the typed empty, not a column-less frame (KeyError on "a")
    pdf = to_pandas_typed(pairs, {"a": "int64", "b": "int64"})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pdf["a"], pdf["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min so the root IS the min doc id of the component
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = sorted((node, find(node)) for node in parent)
    out = pd.DataFrame(rows, columns=["doc_id", "cluster_id"]).astype("int64")
    return ray.data.from_pandas(out)


def dedup_clusters_distributed(sf_dir: str, threshold: float = 0.5,
                               max_rounds: int = 64):
    """Distributed connected components over the jaccard-pair graph (the
    large-pair-set arm of ``dedup_clusters``'s dispatch)."""
    return _clusters_label_propagation(
        dedup_jaccard(sf_dir, threshold).map_batches(
            _project_ab, batch_format="pandas"), max_rounds
    )


def _clusters_label_propagation(pairs, max_rounds: int = 64):
    """Connected components via min-label propagation WITH pointer
    doubling — each round (a) every edge carries its endpoint's label one
    hop, (b) every label chases its own label (lbl ← lbl[lbl]), so the
    hop distance covered doubles per round and convergence takes
    O(log diameter) exchanges, not O(diameter). The loop runs until the
    sum of labels is a fixed point (labels only ever decrease, so a
    stable sum IS convergence — no silent cap); ``max_rounds`` is a
    safety bound far past any reachable diameter (2^64) and RAISES if
    hit rather than returning wrong cluster ids. Use when the pair graph
    is too large to collect on the driver."""
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, typed_empty

    _LBL_COLS = {"node": "int64", "lbl": "int64"}

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_LBL_COLS)
        return g.groupby("node", as_index=False).agg(lbl=("lbl", "min")).astype(_LBL_COLS)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([b["a"], b["b"]], ignore_index=True).astype("int64"),
                "peer": pd.concat([b["b"], b["a"]], ignore_index=True).astype("int64"),
            }
        )

    from hebrew_ner_ray.ops.shuffle import partitions_for

    edges = pairs.map_batches(undirect, batch_format="pandas").materialize()
    n_parts = partitions_for(edges.count())

    labels = bucketed_aggregate(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "lbl": b["node"]}),
            batch_format="pandas",
        ),
        ["node"],
        min_label,
        coalesce=n_parts,
    ).materialize()

    # one lookup exchange per round serves BOTH moves (a plan with >2
    # concurrent hash-shuffle operators starves its aggregator pools on
    # small CPU counts — measured deadlock):
    #   edge requests  (key=edge.node, req=peer):  emit lbl[node] → peer
    #   double requests (key=lbl, req=node):       emit lbl[lbl]  → node
    # Every lbl value is itself a node id present in `labels` (labels
    # start as node ids and min-merge only keeps node ids), so the inner
    # merge never drops a request.
    def lookup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_LBL_COLS)
        lab = g[g["req"].isna()][["node", "lbl"]]
        req = g[g["req"].notna()][["node", "req"]]
        m = req.merge(lab, on="node")
        return pd.DataFrame({"node": m["req"].astype("int64"),
                             "lbl": m["lbl"].astype("int64")})

    def _null_col(b: pd.DataFrame) -> pd.api.extensions.ExtensionArray:
        return pd.array([None] * len(b), dtype="Int64")

    prev_sum = labels.sum("lbl")
    for _ in range(max_rounds):
        lookup = labels.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "req": _null_col(b),
                                    "lbl": b["lbl"]}),
            batch_format="pandas",
        )
        edge_req = edges.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "req": b["peer"].astype("Int64"),
                                    "lbl": _null_col(b)}),
            batch_format="pandas",
        )
        double_req = labels.map_batches(
            lambda b: pd.DataFrame({"node": b["lbl"].astype("int64"),
                                    "req": b["node"].astype("Int64"),
                                    "lbl": _null_col(b)}),
            batch_format="pandas",
        )
        candidates = bucketed_aggregate(
            lookup.union(edge_req).union(double_req), ["node"], lookup_bucket,
            coalesce=n_parts,
        )
        merged = bucketed_aggregate(
            labels.union(candidates), ["node"], min_label, coalesce=n_parts
        ).materialize()
        new_sum = merged.sum("lbl")
        labels = merged
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} pointer-doubling "
            f"rounds — unreachable by design (covers diameter 2^{max_rounds}); "
            "refusing to return wrong cluster ids"
        )

    return labels.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["node"].astype("int64"),
                                "cluster_id": b["lbl"].astype("int64")}),
        batch_format="pandas",
    )


# --- simhash ---


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    out = []
    for text in batch["text"]:
        toks = set(ws_tokens(text))
        acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
        for t in toks:
            h = stable_id(t)
            bits = (h >> np.arange(SIMHASH_BITS)) & 1
            acc += np.where(bits == 1, 1, -1)
        sim = int(((acc > 0).astype(np.int64) << np.arange(SIMHASH_BITS)).sum())
        out.append(sim)
    return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                         "simhash": pd.array(out, dtype="int64")})


def dedup_simhash(sf_dir: str):
    import ray.data

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pandas")


_INCR_COLS = {"doc_id": "int64", "text_hash": "object"}


def dedup_incremental(sf_dir: str):
    """Incremental exact dedup: which DELTA documents are genuinely new
    against the existing BASE corpus — the daily-ingest shape (dedupe the
    new crawl against yesterday's index without re-scanning it into the
    driver). Base/delta stand-in: the deterministic stable_id(doc_id)
    parity split (the kg_*_incremental convention). One exchange keyed on
    the content hash; each complete-hash partition anti-joins delta
    against base AND dedups within the delta itself (min doc_id per new
    hash) — both halves of a real ingest dedup."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _ROW = {"doc_id": "int64", "text_hash": "object", "side": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        h = exact_hash_batch(b)
        parity = stable_ids([str(i) for i in h["doc_id"]]) % 2
        h["side"] = parity.astype(np.int64)  # 0 = base, 1 = delta
        # combiner: base side needs only distinct hashes; delta side only
        # its min doc_id per hash
        base = (h[h["side"] == 0][["text_hash"]].drop_duplicates()
                .assign(doc_id=np.int64(0), side=np.int64(0)))
        delta = (h[h["side"] == 1]
                 .groupby("text_hash", as_index=False)
                 .agg(doc_id=("doc_id", "min")).assign(side=np.int64(1)))
        return pd.concat([base, delta], ignore_index=True)[list(_ROW)].astype(_ROW)

    def anti(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_INCR_COLS)
        seen = set(p.loc[p["side"] == 0, "text_hash"])
        fresh = p[(p["side"] == 1) & ~p["text_hash"].isin(seen)]
        if fresh.empty:
            return typed_empty(_INCR_COLS)
        out = (fresh.groupby("text_hash", as_index=False)
               .agg(doc_id=("doc_id", "min")))
        return out[list(_INCR_COLS)].astype(_INCR_COLS)

    return bucketed_aggregate(ds.map_batches(rows, batch_format="pandas"),
                              ["text_hash"], anti,
                              coalesce=partitions_for())


_CONTAM_COLS = {"n_eval_docs": "int64", "n_contaminated": "int64",
                "contamination_ppm": "int64"}


def split_contamination(sf_dir: str):
    """Train/eval decontamination check — the release gate every LLM
    training pipeline runs: how many EVAL-split documents share at least
    one 3-token shingle with ANY train-split document. Splits are the
    engine's content-addressed buckets (corpus_split_assign: train < 80,
    eval ≥ 80), shingles the dedup int64-id contract. One shingle-keyed
    exchange marks contaminated shingles (≥1 train doc in the partition)
    and emits their eval doc ids; a doc-keyed dedup + count finishes.
    Nothing corpus-sized reaches the driver; empty/short docs shingle to
    their full token string (or nothing) exactly as in dedup_jaccard."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def sh_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = shingle_explode_batch(b)
        bucket = stable_ids([f"split|{i}" for i in s["doc_id"]]) % 100
        s = s.assign(is_train=(bucket < 80).astype(np.int64))
        return s[["doc_id", "sh_h", "is_train"]].astype(
            {"doc_id": "int64", "sh_h": "int64", "is_train": "int64"})

    _D = {"doc_id": "int64"}

    def contaminated(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_D)
        train_sh = set(p.loc[p["is_train"] == 1, "sh_h"])
        ev = p[(p["is_train"] == 0) & p["sh_h"].isin(train_sh)]
        return ev[["doc_id"]].drop_duplicates().astype(_D)

    cont = bucketed_aggregate(ds.map_batches(sh_rows, batch_format="pandas"),
                              ["sh_h"], contaminated,
                              coalesce=partitions_for())

    def dedup_docs(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_D)
        return p.drop_duplicates().astype(_D)

    cont = bucketed_aggregate(cont, ["doc_id"], dedup_docs,
                              coalesce=partitions_for()).materialize()
    n_cont = cont.count()

    def eval_count(b: pd.DataFrame) -> pd.DataFrame:
        bucket = stable_ids([f"split|{i}" for i in b["doc_id"]]) % 100
        return pd.DataFrame({"n": [np.int64((bucket >= 80).sum())]})

    n_eval = int(read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(eval_count, batch_format="pandas").sum("n") or 0)

    ppm = np.int64(n_cont * 1_000_000 // n_eval) if n_eval else np.int64(0)
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "n_eval_docs": [np.int64(n_eval)],
        "n_contaminated": [np.int64(n_cont)],
        "contamination_ppm": [ppm]}).astype(_CONTAM_COLS))
