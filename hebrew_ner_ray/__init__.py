"""hebrew_ner_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference
Hebrew-NER stack (Yu-val-weiss/hebrew-ner, read-only at /root/reference)
as idiomatic Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches``
over zero-copy Arrow batches, actor pools for stateful stages,
groupby/aggregate/sort for the wide steps.

This is a from-scratch build, not a port: the reference tells us WHAT to
compute (BIOSE label algebra, Hebrew tokenization, morphological lattice
pruning, token↔morpheme alignment, span extraction), and we re-express
each piece as a batch transform over Arrow data.
"""

__version__ = "0.2.0"


def enable_hash_shuffle() -> None:
    """Engine-wide shuffle strategy: HASH_SHUFFLE.

    The default sort-based shuffle picks reducer boundaries from raw
    sample quantiles with no dedup (ray sort_task_spec.sample_boundaries);
    duplicate sampled values create EMPTY, SCHEMA-LESS output partitions
    that no downstream UDF can repair (Ray skips empty blocks in both
    map_groups and map_batches — verified empirically). Hash shuffle
    partitions deterministically — no sampling, no empty-partition
    lottery — and is also what `Dataset.repartition(keys=...)` and
    `Dataset.join` require. Opt out with GRAFT_SORT_SHUFFLE=1.

    Called by the engine ENTRY POINTS (__ray_entry__, bench.py, jobs,
    serving, the test fixture) rather than at import time, so merely
    importing hebrew_ner_ray never mutates the process-global
    DataContext of a co-resident Ray Data workload. Library code that
    runs without it falls back to the sort-shuffle arm of
    ops/shuffle.py (correct, slower, cosmetic empty-partition
    warnings).
    """
    import os

    if os.environ.get("GRAFT_SORT_SHUFFLE"):
        return
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    except ImportError:  # older ray without the enum — keep the default
        pass

    # ops/shuffle.bucketed_aggregate pins a Ray 2.49 internal (hash-shuffle
    # finalize emits ONE block per partition). The canary test
    # (test_hash_shuffle_one_block_per_partition) proves it per-run, but
    # only when the suite runs — warn loudly at entry-point time on any
    # other Ray so an upgrade cannot silently bypass the canary.
    import ray

    if not ray.__version__.startswith("2.49."):
        import warnings

        warnings.warn(
            f"hebrew_ner_ray verified the hash-shuffle one-block-per-"
            f"partition contract on Ray 2.49.x only (running "
            f"{ray.__version__}); run tests/test_ops.py::"
            f"test_hash_shuffle_one_block_per_partition before trusting "
            f"keyed aggregates.", RuntimeWarning, stacklevel=2)
