"""True base/delta two-snapshot incremental ingest — the daily-crawl shape.

The parity-split queries (``dedup_incremental``, ``kg_*_incremental``)
prove the MERGE algebra is associative; this module proves the LAYOUT:
yesterday's corpus lives in its own parquet snapshot with a persisted
hash index and node table built through the checkpoint manifest
(state/checkpoint.py), and today's ingest reads ONLY the delta files plus
the (much smaller) persisted artifacts — never yesterday's documents.
The test suite deletes the base documents before the day-2 ingest to
prove it (tests/test_incremental.py).

Layout under :func:`snapshot_root`:

    base_docs/shard=<k>/*.parquet   yesterday's corpus, hash-sharded into
                                    BASE_SHARDS files (a real crawl is
                                    many files; each shard is one
                                    manifest partition)
    delta_docs/*.parquet            today's crawl
    base_index/part=<k>/ + manifest exact-dedup hash index per base shard
    base_nodes/part=<k>/ + manifest persisted KG node table per doc shard

The base/delta split is the SAME deterministic stable_id(doc_id) parity
the parity-split queries use, so the snapshot queries share their exact
DuckDB oracles (registry: ``dedup_incremental``'s SQL, ``kg_nodes``'s).
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

BASE_SHARDS = 8   # base corpus files = index manifest partitions
KG_SHARDS = 4     # base node-table manifest partitions

_INCR_COLS = {"doc_id": "int64", "text_hash": "object"}


def snapshot_root(sf_dir: str) -> str:
    """Deterministic per-corpus scratch root (reused across runs so the
    manifest skip is observable)."""
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    name = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/hebrew_ner_ray_snapshots/{name}-{n}"


def materialize_crawl(sf_dir: str, root: str) -> None:
    """Write the two-snapshot layout once: base = parity-0 documents
    hash-sharded into BASE_SHARDS parquet directories, delta = parity-1
    documents. Streaming writes (no driver materialization); atomic via
    tmp-dir rename + a done marker."""
    import ray.data

    done = os.path.join(root, "_CRAWL_DONE")
    if os.path.exists(done):
        return
    os.makedirs(root, exist_ok=True)
    import shutil

    from hebrew_ner_ray.kg.ids import stable_ids

    def split(b: pd.DataFrame) -> pd.DataFrame:
        h = stable_ids([str(i) for i in b["doc_id"]])
        b = b.copy()
        b["par"] = (h % 2).astype(np.int64)
        b["shard"] = ((h // 2) % BASE_SHARDS).astype(np.int64)
        return b

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(split, batch_format="pandas").materialize()

    for d in ("base_docs", "delta_docs"):
        for p in (os.path.join(root, d), os.path.join(root, "_tmp_" + d)):
            if os.path.exists(p):
                shutil.rmtree(p)

    def side(par: int, drop: list):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["par"] == par].drop(columns=drop)

        return f

    base = ds.map_batches(side(0, ["par"]), batch_format="pandas")
    base.write_parquet(os.path.join(root, "_tmp_base_docs"),
                       partition_cols=["shard"])
    delta = ds.map_batches(side(1, ["par", "shard"]), batch_format="pandas")
    delta.write_parquet(os.path.join(root, "_tmp_delta_docs"))
    # write_parquet(partition_cols=...) creates a shard=<k> directory
    # only for shards that received rows; on a small corpus an empty
    # shard would make the day-1 index build FileNotFoundError AFTER
    # _CRAWL_DONE committed, wedging the snapshot root. Backfill
    # typed-empty partitions so every shard dir exists before the
    # marker.
    import pyarrow as pa

    tmp_base = os.path.join(root, "_tmp_base_docs")
    existing = {d for d in os.listdir(tmp_base) if d.startswith("shard=")}
    missing = [k for k in range(BASE_SHARDS)
               if f"shard={k}" not in existing]
    if missing:
        sample = next(
            (os.path.join(tmp_base, d, f) for d in sorted(existing)
             for f in sorted(os.listdir(os.path.join(tmp_base, d)))
             if f.endswith(".parquet")), None)
        schema = (pq.read_schema(sample) if sample else
                  pa.schema([("doc_id", pa.int64()),
                             ("text", pa.string())]))
        for k in missing:
            d = os.path.join(tmp_base, f"shard={k}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(schema.empty_table(),
                           os.path.join(d, "empty.parquet"))
    os.rename(os.path.join(root, "_tmp_base_docs"),
              os.path.join(root, "base_docs"))
    os.rename(os.path.join(root, "_tmp_delta_docs"),
              os.path.join(root, "delta_docs"))
    with open(done, "w") as f:
        f.write("ok\n")


def build_base_index(root: str) -> list[int]:
    """Day-1 job: exact-dedup hash index of the base corpus, one manifest
    partition per base shard (each shard's documents are read ONCE; a
    re-run with a complete manifest executes nothing — returned list is
    the partitions actually run)."""
    import ray.data

    from hebrew_ner_ray.ops.dedup import exact_hash_batch
    from hebrew_ner_ray.state.checkpoint import run_partitioned

    def hash_combine(b: pd.DataFrame) -> pd.DataFrame:
        h = exact_hash_batch(b)
        return h[["text_hash"]].drop_duplicates()

    def build(k: int):
        return read_parquet_clean(
            os.path.join(root, "base_docs", f"shard={k}")
        ).map_batches(hash_combine, batch_format="pandas")

    return run_partitioned(
        os.path.join(root, "base_index"), range(BASE_SHARDS), build,
        version="1", lineage={"source": "base_docs", "op": "exact_hash"})


def ingest_delta(root: str):
    """Day-2 job: which delta documents are genuinely new vs the
    PERSISTED base index. Inputs are the index parquet (hash strings
    only) and the delta documents — base documents are never opened.
    Same exchange shape as dedup_incremental: one text_hash-keyed
    exchange, per-partition anti-join + min-doc_id dedup of the delta
    itself."""
    import ray.data

    from hebrew_ner_ray.ops.dedup import exact_hash_batch
    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    _ROW = {"doc_id": "int64", "text_hash": "object", "side": "int64"}

    def idx_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": np.zeros(len(b), dtype=np.int64),
             "text_hash": b["text_hash"].to_numpy(),
             "side": np.zeros(len(b), dtype=np.int64)}).astype(_ROW)

    def delta_rows(b: pd.DataFrame) -> pd.DataFrame:
        h = exact_hash_batch(b)
        g = (h.groupby("text_hash", as_index=False)
             .agg(doc_id=("doc_id", "min")))
        g["side"] = np.int64(1)
        return g[list(_ROW)].astype(_ROW)

    idx = read_parquet_clean(os.path.join(root, "base_index"),
                            file_extensions=["parquet"]).map_batches(
        idx_rows, batch_format="pandas")
    delta = read_parquet_clean(os.path.join(root, "delta_docs")).map_batches(
        delta_rows, batch_format="pandas")

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

    return bucketed_aggregate(idx.union(delta), ["text_hash"], anti,
                              coalesce=partitions_for())


def dedup_incremental_snapshot(sf_dir: str):
    """Registry query: end-to-end daily-ingest dedup over the REAL
    two-snapshot layout. First run materializes the layout and the base
    index (through the checkpoint manifest); subsequent runs skip both
    and go straight to the delta ingest. Shares dedup_incremental's
    exact oracle (identical parity split)."""
    root = snapshot_root(sf_dir)
    materialize_crawl(sf_dir, root)
    build_base_index(root)
    return ingest_delta(root)


# --- KG node-table snapshot (base graph persisted, delta merged in) ---


def _annotated_subset(sf_dir: str, emit: str, parity: int,
                      shard: int | None = None):
    """Annotation restricted to a doc subset, with the parity/shard
    filter applied BEFORE the annotate actor pool — base docs are never
    tagged during a delta build (and vice versa)."""
    import pyarrow as pa

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.pipelines.kg import text_spans
    from hebrew_ner_ray.pipelines.stages import AnnotateBatch
    from hebrew_ner_ray.runtime import default_concurrency

    def keep(b: pa.Table) -> pa.Table:
        ids = stable_ids(b.column("doc_id").to_pylist())
        m = ids % 2 == parity
        if shard is not None:
            m &= (ids // 2) % KG_SHARDS == shard
        return b.filter(pa.array(m))

    spans = text_spans(sf_dir).map_batches(keep, batch_format="pyarrow",
                                           num_cpus=0.9)
    return spans.map_batches(
        AnnotateBatch,
        fn_constructor_kwargs={"emit": emit, "synthetic_entities": False},
        batch_format="pyarrow",
        concurrency=default_concurrency(),
    )


def build_base_nodes(root: str, sf_dir: str) -> list[int]:
    """Day-1 job: persist the BASE corpus's node table, one manifest
    partition per doc shard (partial per-shard node tables; the
    entity_id keyed aggregate at merge time collapses cross-shard
    duplicates — the same associativity kg_nodes_incremental gates)."""
    from hebrew_ner_ray.kg.canonical import build_nodes
    from hebrew_ner_ray.state.checkpoint import run_partitioned

    def build(k: int):
        ms = _annotated_subset(sf_dir, "mentions", parity=0, shard=k)
        return build_nodes(ms, sort=False)

    return run_partitioned(
        os.path.join(root, "base_nodes"), range(KG_SHARDS), build,
        version="1", lineage={"source": "interleaved", "op": "build_nodes"})


def kg_nodes_incremental_snapshot(sf_dir: str):
    """Registry query: canonical node table via the true base/delta
    layout — yesterday's node table read back from its parquet snapshot
    (never re-annotated; the manifest skips its partitions), today's
    delta annotated fresh, one upsert merge. Bit-identical to the
    one-shot kg_nodes build (shared oracle)."""
    import ray.data

    from hebrew_ner_ray.kg.canonical import build_nodes, merge_node_tables

    root = snapshot_root(sf_dir)
    materialize_crawl(sf_dir, root)
    build_base_nodes(root, sf_dir)
    # project away the part=<k> partition column so the union with the
    # delta build is schema-identical (no drift warning on the exchange).
    # Block types must also match across the union — the node delta ends
    # in an ARROW stage (add_entity_ids), and the parquet read is arrow
    # already, so no conversion here (the EDGE path, whose delta ends in
    # a pandas reduce, normalizes to pandas instead); a mixed union trips
    # Ray's shuffle-reduce block-type assertion
    base = read_parquet_clean(
        os.path.join(root, "base_nodes"), file_extensions=["parquet"],
        columns=["entity_id", "canonical_form", "cat", "mention_count"])
    delta = build_nodes(_annotated_subset(sf_dir, "mentions", parity=1),
                        sort=False)
    return merge_node_tables(base, delta)


def build_base_edges(root: str, sf_dir: str) -> list[int]:
    """Edge-table twin of :func:`build_base_nodes`: persist the BASE
    corpus's weighted edge table, one manifest partition per doc shard
    (weight sums are associative, so cross-shard duplicates collapse in
    the merge-time keyed aggregate)."""
    from hebrew_ner_ray.kg.canonical import build_edges
    from hebrew_ner_ray.state.checkpoint import run_partitioned

    def build(k: int):
        ts = _annotated_subset(sf_dir, "triples", parity=0, shard=k)
        return build_edges(ts, sort=False)

    return run_partitioned(
        os.path.join(root, "base_edges"), range(KG_SHARDS), build,
        version="1", lineage={"source": "interleaved", "op": "build_edges"})


def kg_edges_incremental_snapshot(sf_dir: str):
    """Registry query: canonical edge table via the true base/delta
    layout — yesterday's edges read back from parquet (manifest-skipped),
    today's delta annotated fresh, one upsert merge. Shares the one-shot
    kg_edges oracle."""
    import ray.data

    from hebrew_ner_ray.kg.canonical import build_edges, merge_edge_tables

    root = snapshot_root(sf_dir)
    materialize_crawl(sf_dir, root)
    build_base_edges(root, sf_dir)
    # pandas-normalized for the same block-type reason as the node path
    base = read_parquet_clean(
        os.path.join(root, "base_edges"), file_extensions=["parquet"],
        columns=["subj_id", "pred", "obj_id", "weight"],
    ).map_batches(lambda b: b, batch_format="pandas")
    delta = build_edges(_annotated_subset(sf_dir, "triples", parity=1),
                        sort=False)
    return merge_edge_tables(base, delta)
