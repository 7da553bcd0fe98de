"""Bucketed aggregation — the engine's high-cardinality groupby.

``Dataset.groupby(keys).aggregate(...)`` pays per-distinct-key Python
overhead in the reduce phase; with millions of distinct keys (near-dup
pairs, content hashes, entities at web scale) that dominates wall time
(measured: 1.1M pair keys → 253 s vs 12 s bucketed at sf0.1).

``bucketed_aggregate`` shuffles once on a COARSE deterministic bucket of
the key (vectorized ``pd.util.hash_pandas_object``) and runs the real
groupby VECTORIZED in pandas inside each bucket. Every key lives in
exactly one bucket, so the bucket-local aggregate is exact. Bucket count
scales with the cluster, not with key cardinality — this is the salted
shuffle pattern from SURVEY.md §4 applied to the reduce side.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

# Large bucket domain: sort boundaries are raw sample quantiles with no
# dedup (ray sort_task_spec.sample_boundaries), so low-cardinality bucket
# values with high multiplicity produce DUPLICATE boundaries -> empty,
# schema-less sort partitions. 1024 buckets keeps sampled values nearly
# distinct (boundaries unique) while per-group call overhead stays
# negligible (~0.3 ms x 1024 across the pool).
DEFAULT_BUCKETS = 1024
_BUCKET_COL = "__bucket"


def add_key_bucket(batch: pd.DataFrame, key_cols: Sequence[str],
                   n_buckets: int = DEFAULT_BUCKETS) -> pd.DataFrame:
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
    for empty input so no operator ever emits a column-less block
    (PandasBlockSchema(names=[]) drift, round-1 verdict item 7)."""
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def bucketed_aggregate(
    ds,
    key_cols: Sequence[str],
    agg: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = DEFAULT_BUCKETS,
    coalesce: int | None = None,
):
    """``agg`` receives one bucket's rows (bucket column removed) and must
    perform the full groupby-aggregate for the keys it sees — INCLUDING
    empty input (map_groups hands empty partitions a column-less frame;
    ``agg`` must return its typed empty schema there).

    ``coalesce``: repartition the bucketed rows to this many blocks before
    the groupby. The sort behind map_groups emits one output partition per
    input block; partitions holding no bucket come out as SCHEMA-LESS
    empty blocks (PandasBlockSchema(names=[]) drift). Keeping partitions ≤
    occupied buckets eliminates them — use for high-cardinality keys where
    every bucket is occupied (the KG pipeline's repartition-then-aggregate
    pattern). For ≲100-key finals use ``small_key_aggregate`` instead."""
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


def small_key_aggregate(partials, agg: Callable[[pd.DataFrame], pd.DataFrame]):
    """Final combine for LOW-cardinality keys (TPC-H Q1's 6 groups, 25
    nations): partial aggregation has already shrunk the data to
    (#blocks × #keys) rows, so the exact final reduce is one task over one
    coalesced block — no sort, no empty partitions, schema stable.
    ``agg`` sees every partial row in a single call."""
    return partials.repartition(1).map_batches(
        agg, batch_format="pandas", batch_size=None
    )
