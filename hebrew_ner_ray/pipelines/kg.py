"""End-to-end KG construction pipeline (the flagship).

    read ids → generate interleaved docs → flatten spans → filter text
    → annotate (actor pool) → mentions/triples → canonicalize (salted
    two-phase groupby) → sorted node/edge tables → parquet

Mirrors the reference's hybrid chain shape (SURVEY.md §3.2) extended with
the KG stages the north rule adds. Never calls ray.init — callers own the
session.
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

from hebrew_ner_ray.kg.canonical import build_edges, build_nodes
from hebrew_ner_ray.pipelines.stages import AnnotateBatch, filter_text_spans
from hebrew_ner_ray.sources.interleaved import flatten_spans, read_interleaved

DEFAULT_BATCH_SIZE = 4096  # spans per annotate dispatch; large enough that
# per-batch dispatch overhead amortizes, small enough for pool balance.
# ALSO the actor-pool task-bundling threshold: Ray glues upstream blocks
# into one task until reaching batch_size rows, so this must stay BELOW
# the ~7k-span generation block size or the pool's task count halves
# (measured: 8192 → 50 tasks / 2 waves on 28 actors; 4096 → one block
# per task, ~99 tasks, wave-imbalance tail gone)


def text_spans(sf_dir: str, replicas: int = 1, diversify: bool = False,
               entity_mix: int = 0):
    # media_refs=False: text-only consumers never see media spans, so the
    # per-span md5 is pruned at the source
    docs = read_interleaved(sf_dir, replicas=replicas, media_refs=False,
                            diversify=diversify, entity_mix=entity_mix)
    # num_cpus=0.9: keep the filter unfused from the downstream actor pool
    # (fused, the pool's batch_size counts pre-flatten doc rows and
    # collapses task parallelism — see sources/interleaved.py note)
    return flatten_spans(docs).map_batches(filter_text_spans, batch_format="pyarrow",
                                           num_cpus=0.9)


from hebrew_ner_ray.runtime import default_concurrency  # noqa: E402  (re-export;
# session-sized pools are shared engine policy — see runtime.py)


def annotated(sf_dir: str, emit: str, replicas: int = 1, concurrency=None,
              batch_size: int = DEFAULT_BATCH_SIZE, diversify: bool = False,
              entity_mix: int = 0):
    """Annotation over text spans — an autoscaling actor pool (stateful
    stage: the gazetteer index is built once per actor)."""
    spans = text_spans(sf_dir, replicas=replicas, diversify=diversify,
                       entity_mix=entity_mix)
    return spans.map_batches(
        AnnotateBatch,
        # the synthetic-entity rule follows the corpus mode that emits the
        # tokens it matches — never enabled on the plain corpus
        fn_constructor_kwargs={"emit": emit, "synthetic_entities": entity_mix > 0},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def annotated_crf(sf_dir: str, replicas: int = 1, concurrency=None,
                  batch_size: int = DEFAULT_BATCH_SIZE, diversify: bool = False):
    """CRF tagging over text spans — the model-shaped scorer path
    (pipelines/stages.py CrfAnnotateBatch; ner/crf.py)."""
    from hebrew_ner_ray.pipelines.stages import CrfAnnotateBatch

    spans = text_spans(sf_dir, replicas=replicas, diversify=diversify)
    return spans.map_batches(
        CrfAnnotateBatch,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def annotated_crf_nbest(sf_dir: str, nbest: int = 3, replicas: int = 1, concurrency=None,
                        batch_size: int = DEFAULT_BATCH_SIZE):
    """k-best CRF decoding as a relation (doc_id, span_ord, rank,
    score_ppm, labels) — the reference's nbest decode (`# score` header,
    utils/data.py:399-442) with the scores in exact ppm ints."""
    from hebrew_ner_ray.pipelines.stages import CrfAnnotateBatch

    spans = text_spans(sf_dir, replicas=replicas)
    return spans.map_batches(
        CrfAnnotateBatch,
        fn_constructor_kwargs={"nbest": nbest},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def build_graph(sf_dir: str, replicas: int = 1, concurrency=None, sort: bool = True,
                diversify: bool = False, entity_mix: int = 0,
                batch_size: int = DEFAULT_BATCH_SIZE):
    """(nodes_ds, edges_ds) for the corpus — single annotation pass
    (emit='kg' union rows), both aggregations off the shared rows.

    ``diversify``/``entity_mix`` select the non-degenerate benchmark
    corpus: all-distinct sentences and corpus-scaled entity cardinality."""
    from hebrew_ner_ray.kg.canonical import graph_from_kg_rows

    kg_rows = annotated(sf_dir, "kg", replicas, concurrency,
                        batch_size=batch_size,
                        diversify=diversify, entity_mix=entity_mix)
    return graph_from_kg_rows(kg_rows, sort=sort)


def write_graph(sf_dir: str, out_dir: str, replicas: int = 1, concurrency=None):
    """Materialize the graph through the single sink path
    (sources/lance_io.write_graph_tables — Lance when the wheel exists,
    parquet fallback otherwise; same resumable one-directory-per-table
    layout either way). The config-driven pipeline uses the same sink, so
    the format decision lives in exactly one place."""
    from hebrew_ner_ray.sources.lance_io import write_graph_tables

    nodes, edges = build_graph(sf_dir, replicas=replicas, concurrency=concurrency)
    return write_graph_tables(nodes, edges, out_dir)


def annotated_partition(sf_dir: str, emit: str, partition: int, n_partitions: int,
                        replicas: int = 1, concurrency=None,
                        diversify: bool = False, entity_mix: int = 0):
    """Annotation restricted to one doc-id hash partition — the unit of
    checkpointed work. The partition predicate is applied to the integer
    ids BEFORE span generation, so skipped partitions cost nothing (at
    real scale this is the input-fragment pruning step)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from hebrew_ner_ray.sources.interleaved import flatten_spans, generate_docs_batch

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    total = n * replicas
    ids_ds = ray.data.range(total, override_num_blocks=max(8, min(total // 4096 + 1, 2048)))

    def gen_partition(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("id").to_numpy()
        ids = ids[ids % n_partitions == partition]  # prune before generation
        return generate_docs_batch({"doc_id": ids}, media_refs=False,
                                   diversify=diversify, entity_mix=entity_mix)

    docs = ids_ds.map_batches(gen_partition, batch_format="pyarrow", batch_size=4096,
                              num_cpus=0.9)
    spans = flatten_spans(docs).map_batches(filter_text_spans, batch_format="pyarrow",
                                            num_cpus=0.9)
    return spans.map_batches(
        AnnotateBatch,
        fn_constructor_kwargs={"emit": emit, "synthetic_entities": entity_mix > 0},
        batch_format="pyarrow",
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=concurrency or default_concurrency(),
    )


def build_graph_resumable(sf_dir: str, work_dir: str, n_partitions: int = 8,
                          replicas: int = 1, concurrency=None,
                          diversify: bool = False, entity_mix: int = 0):
    """Checkpointed KG build: the expensive annotation stage is written per
    doc-id partition with an atomic-commit manifest (state/checkpoint.py);
    the cheap canonicalization/aggregation re-runs from the checkpoint.
    Re-invoking after a crash skips completed partitions.
    Returns (nodes_ds, edges_ds)."""
    import ray.data

    from hebrew_ner_ray.state.checkpoint import run_partitioned

    import hebrew_ner_ray

    lineage = {
        "input": sf_dir,
        "replicas": replicas,
        "n_partitions": n_partitions,
        "partitioner": "doc_id % n_partitions",
        "engine": f"hebrew_ner_ray {hebrew_ner_ray.__version__}",
        "diversify": diversify,
        "entity_mix": entity_mix,
    }
    for emit in ("mentions", "triples"):
        run_partitioned(
            f"{work_dir}/{emit}",
            range(n_partitions),
            lambda k, emit=emit: annotated_partition(
                sf_dir, emit, k, n_partitions, replicas=replicas,
                concurrency=concurrency, diversify=diversify, entity_mix=entity_mix
            ),
            lineage={**lineage, "emit": emit},
        )
    import os

    def _files(table: str):
        out = []
        for k in range(n_partitions):
            d = f"{work_dir}/{table}/part={k}"
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet"))
        return out

    mentions = read_parquet_clean(_files("mentions"))
    triples = read_parquet_clean(_files("triples"))
    return build_nodes(mentions), build_edges(triples)
