"""Keyed exchange + vectorized per-partition aggregation — the engine's
high-cardinality groupby.

Two Ray Data machinery pitfalls drive the design (both measured):

1. ``Dataset.groupby().aggregate()`` / per-group ``map_groups`` pay
   per-distinct-key Python overhead in the reduce phase; with millions of
   distinct keys that dominates wall time (1.1M pair keys → 253 s vs
   12 s with a partition-level pandas groupby at sf0.1).
2. The sort-based shuffle picks reducer boundaries from raw sample
   quantiles with no dedup (ray sort_task_spec.sample_boundaries);
   duplicate sampled values create EMPTY, SCHEMA-LESS output partitions
   that no downstream UDF can repair — Ray skips empty blocks in both
   map_groups and map_batches (verified empirically), so the schema
   drift warnings they cause are permanent once born.

The fix for both: the engine runs with
``DataContext.shuffle_strategy = HASH_SHUFFLE`` (hebrew_ner_ray/__init__)
and every wide aggregation is ONE deterministic hash exchange
(``repartition(n, keys=...)``) followed by a single vectorized pandas
groupby per partition. Hash partitioning removes the sampling LOTTERY:
empty partitions occur only in the deterministic, avoidable case of
partitions > distinct keys (which ``keyed_aggregate``'s size-aware
dispatch and per-callsite partition counts avoid) — NOT at random on
high-cardinality data. Empties that do slip through still propagate
schema-less past skipped UDFs, so the typed-empty guards in the agg fns
stay as defense in depth. Partition count scales with the cluster, never
with key cardinality.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

DEFAULT_PARTITIONS = 32
SMALL_AGG_ROWS = 200_000
# rows per hash partition the per-partition pandas groupby digests
# comfortably; drives partitions_for's size-aware count
PARTITION_TARGET_ROWS = 500_000
# hard per-partition memory bound: one partition = ONE block under the
# pinned hash-shuffle contract, so a partition must fit a worker heap —
# only this bound may push the partition count past the cpu count
PARTITION_MAX_ROWS = 4_000_000


def partitions_for(count: int | None = None, lo: int = 4) -> int:
    """Partition count for a keyed exchange, derived from the live
    cluster and (when known) the input row count — never a hard-coded
    constant (ADVICE r2: a fixed 16/32 means a per-task frame of
    ~data/16 at 100-TB scale).

    Each hash partition is one aggregator ACTOR in Ray 2.49 — more
    partitions than cores buys no reduce parallelism and the spin-up
    cost scales with the count. Measured on this host (32 CPUs, 20M-row
    exchange, round 4): 16 and 32 partitions ≈ 10 s; 64 and 128
    partitions ≈ 29 s — the cliff starts right past the core count
    (round 2 saw the same: 64 partitions turned dedup_jaccard's two
    exchanges from 5.5 s into 48 s). So:

    - ``count`` unknown: cpus/2 (leaves the other half of the node to
      the map side feeding the exchange; grows with the cluster).
    - ``count`` known: ceil(count / PARTITION_TARGET_ROWS) clamped to
      [lo, cpus] — tiny inputs pay a tiny exchange, big ones stop at
      the measured sweet spot — EXCEPT when count/cpus would overflow a
      partition's block-memory bound (PARTITION_MAX_ROWS): memory
      correctness beats spin-up cost, so the cap rises to exactly what
      the bound requires and no further.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:  # pragma: no cover - ray import always works in-engine
        cpus = 4
    base = max(lo, cpus // 2)
    if count is None:
        return base
    need = -(-max(count, 1) // PARTITION_TARGET_ROWS)
    mem_floor = -(-max(count, 1) // PARTITION_MAX_ROWS)
    return max(lo, min(need, max(cpus, mem_floor)))

# retained for callers that pre-bucket by hand / tests
DEFAULT_BUCKETS = 4096
_BUCKET_COL = "__bucket"


def add_key_bucket(batch: pd.DataFrame, key_cols: Sequence[str],
                   n_buckets: int = DEFAULT_BUCKETS) -> pd.DataFrame:
    """Vectorized coarse bucket of a composite key (hash_pandas_object)."""
    h = np.zeros(len(batch), dtype=np.uint64)
    for c in key_cols:
        h = h * np.uint64(1000003) + pd.util.hash_pandas_object(
            batch[c], index=False
        ).to_numpy(dtype=np.uint64)
    batch = batch.copy()
    batch[_BUCKET_COL] = (h % np.uint64(n_buckets)).astype(np.int64)
    return batch


def typed_empty(cols: dict[str, str]) -> pd.DataFrame:
    """Schema-stable zero-row frame — every partial/reduce fn returns this
    for empty input so no operator ever emits a column-less block."""
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def _strip_schema_metadata(t):
    """Drop schema-level metadata from an Arrow batch (pa.Table)."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _arrow_clean(ds):
    """Normalize blocks to Arrow with NO schema metadata before a hash
    exchange. Pandas-origin blocks convert to Arrow with a b'pandas'
    schema-metadata entry whose hash raises ``unhashable type: 'dict'``
    inside Ray 2.49's aggregator schema-dedup (`unify_schemas` early
    exit), so every HashShuffleAggregator logs 'Failed to hash the
    schemas (for deduplication)' — harmless but floods stderr and
    defeats the dedup fast path. The pandas→arrow conversion happens on
    the shuffle map side regardless (`try_convert_block_type` to ARROW),
    so doing it here in a fused zero-copy stage costs nothing, makes the
    schemas hashable, and normalizes mixed pandas/Arrow unions to one
    block type (Ray 2.49's shuffle-reduce asserts a single inferred
    block type)."""
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow",
                          zero_copy_batch=True)


def _hash_strategy_active() -> bool:
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        return DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    except ImportError:
        return False


def bucketed_aggregate(
    ds,
    key_cols: Sequence[str],
    agg: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = DEFAULT_BUCKETS,
    coalesce: int | None = None,
):
    """Keyed exchange on ``key_cols`` then the COMPLETE groupby-aggregate
    per partition: ``agg`` receives one partition's rows (every key wholly
    contained) and must aggregate all keys it sees — INCLUDING empty input
    (return the typed empty schema there).

    HASH strategy (engine default): one deterministic
    ``repartition(n, keys=...)`` — schema-stable empties, ~2 s fixed
    aggregator spin-up per exchange (amortized at scale).
    SORT strategy (GRAFT_SORT_SHUFFLE=1): the legacy coarse-bucket
    ``groupby(bucket).map_groups`` — lower fixed cost, but empty sort
    partitions from duplicate sampled boundaries emit schema-less blocks.

    ``coalesce`` sets the partition count (default DEFAULT_PARTITIONS).
    Per-partition work is one pandas groupby over ~keys/n of the data."""
    if _hash_strategy_active():
        n = coalesce or partitions_for()
        parts = _arrow_clean(ds).repartition(n, keys=list(key_cols))
        # PINNED ASSUMPTION (Ray 2.49): hash-shuffle finalize emits exactly
        # ONE block per partition (the Ray source carries a 'TODO break
        # down blocks to target size'), so batch_size=None hands ``agg``
        # every row of a partition in a single call. If a future Ray
        # splits oversized partitions into multiple blocks, non-idempotent
        # aggs would emit duplicate key rows — the canary test
        # tests/test_ops.py::test_hash_shuffle_one_block_per_partition
        # builds a partition several times target_max_block_size and fails
        # loudly the moment that contract changes.
        return parts.map_batches(agg, batch_format="pandas", batch_size=None)
    bucketed = ds.map_batches(
        lambda b: add_key_bucket(b, key_cols, n_buckets), batch_format="pandas"
    )
    if coalesce:
        bucketed = bucketed.repartition(min(coalesce, n_buckets))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        if _BUCKET_COL in g.columns:
            g = g.drop(columns=[_BUCKET_COL])
        return agg(g)

    return bucketed.groupby(_BUCKET_COL).map_groups(run, batch_format="pandas")


def grouped_exchange(
    ds,
    key_cols: Sequence[str],
    group_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_partitions: int | None = None,
):
    """Keyed exchange then ``group_fn`` applied to each COMPLETE key group
    (the map_groups shape): one task per partition, a python loop over
    that partition's groups, one concat. ``group_fn`` must return its
    typed empty frame for empty input (schema-stable empties).
    Falls back to sort-based ``groupby().map_groups`` under
    GRAFT_SORT_SHUFFLE=1."""
    keys = list(key_cols)
    if not _hash_strategy_active():
        return ds.groupby(keys).map_groups(group_fn, batch_format="pandas")
    parts = _arrow_clean(ds).repartition(n_partitions or partitions_for(),
                                         keys=keys)
    return parts.map_batches(_group_loop(keys, group_fn),
                             batch_format="pandas", batch_size=None)


def _group_loop(keys, group_fn):
    def run(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return group_fn(b)
        frames = [group_fn(g) for _, g in b.groupby(keys, sort=False)]
        return pd.concat(frames, ignore_index=True)

    return run


def keyed_aggregate(partials, key_cols: Sequence[str],
                    agg: Callable[[pd.DataFrame], pd.DataFrame],
                    coalesce: int | None = None,
                    count: int | None = None,
                    small_limit: int = SMALL_AGG_ROWS):
    """Size-aware final aggregation: when the caller knows the partial row
    count (e.g. from a materialized partial set) and it is small, reduce
    in ONE task — no exchange at all, exact, and never more partitions
    than keys. Otherwise the hash-partitioned aggregate. The
    dedup_clusters dispatch pattern applied to aggregation: degenerate
    corpora never pay an all-to-all, production cardinalities never
    collect to one task."""
    if count is not None and count <= small_limit:
        return small_key_aggregate(partials, agg)
    return bucketed_aggregate(partials, key_cols, agg, coalesce=coalesce or 16)


def sized_aggregate(partials, key_cols: Sequence[str],
                    agg: Callable[[pd.DataFrame], pd.DataFrame],
                    coalesce: int | None = None,
                    small_limit: int = SMALL_AGG_ROWS):
    """``keyed_aggregate`` for callers whose partial set is cheap to
    materialize (combiners already shrank it): materialize once, count for
    free, dispatch. Small partial sets skip the exchange entirely (no
    aggregator spin-up); large ones hash-partition as usual."""
    m = partials.materialize()
    return keyed_aggregate(m, key_cols, agg, coalesce=coalesce, count=m.count(),
                           small_limit=small_limit)


def small_key_aggregate(partials, agg: Callable[[pd.DataFrame], pd.DataFrame]):
    """Final combine for LOW-cardinality keys (TPC-H Q1's 6 groups, 25
    nations): partial aggregation has already shrunk the data to
    (#blocks × #keys) rows, so the exact final reduce is one task over one
    coalesced block. ``agg`` sees every partial row in a single call."""
    # NOTE: no _arrow_clean here — keyless repartition(1) is an
    # AllToAll (not a hash shuffle) that moves pandas blocks verbatim,
    # and forcing an Arrow conversion breaks partials whose object
    # columns hold numpy arrays (tensor-extension chunk mixing); the
    # unhashable-schema warning's actual source was the parquet read
    # (fixed in ops/io.py).
    return partials.repartition(1).map_batches(
        agg, batch_format="pandas", batch_size=None
    )


def to_pandas_typed(ds, cols: dict[str, str]) -> pd.DataFrame:
    """``Dataset.to_pandas()`` with the all-empty degenerate case made
    schema-stable.

    MEASURED Ray 2.49 limitation (pinned by
    tests/test_ops.py::test_empty_dataset_to_pandas_is_schemaless): an
    empty Dataset converts to a COLUMN-LESS frame no matter how its
    blocks were typed — pandas typed empties, Arrow empty tables, unions
    of either; Ray also skips empty blocks in ``map_batches``, so no UDF
    can repair it downstream. Every in-pipeline stage in this engine
    keeps schema-stable typed empties (``typed_empty``), but the final
    Dataset→pandas hop is outside library control. Consumers that must
    hand a typed relation to a caller (serving, jobs manifests) convert
    through this helper: a legitimately-zero-row answer (e.g. an
    anti-join where every key matched) comes back as the declared typed
    empty instead of a shapeless frame."""
    df = ds.to_pandas()
    if df.empty and len(df.columns) == 0:
        return typed_empty(cols)
    return df[list(cols)].astype(cols)
