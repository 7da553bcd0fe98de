"""End-to-end KG construction pipeline (the flagship).

    read ids → generate interleaved docs → flatten spans → filter text
    → annotate (actor pool) → mentions/triples → canonicalize (salted
    two-phase groupby) → sorted node/edge tables → parquet

Mirrors the reference's hybrid chain shape (SURVEY.md §3.2) extended with
the KG stages the north rule adds. Never calls ray.init — callers own the
session.
"""

from __future__ import annotations

from hebrew_ner_ray.kg.canonical import build_edges, build_nodes
from hebrew_ner_ray.pipelines.stages import AnnotateBatch, filter_text_spans
from hebrew_ner_ray.sources.interleaved import flatten_spans, read_interleaved

DEFAULT_BATCH_SIZE = 2048


def text_spans(sf_dir: str, replicas: int = 1):
    docs = read_interleaved(sf_dir, replicas=replicas)
    return flatten_spans(docs).map_batches(filter_text_spans, batch_format="pyarrow")


def default_concurrency() -> tuple[int, int]:
    """Actor-pool bounds sized to the session: leave headroom for the read
    and shuffle stages so the pool doesn't starve them."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, cpus - 2))


def annotated(sf_dir: str, emit: str, replicas: int = 1, concurrency=None,
              batch_size: int = DEFAULT_BATCH_SIZE):
    """Annotation over text spans — an autoscaling actor pool (stateful
    stage: the gazetteer index is built once per actor)."""
    spans = text_spans(sf_dir, replicas=replicas)
    return spans.map_batches(
        AnnotateBatch,
        fn_constructor_kwargs={"emit": emit},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def build_graph(sf_dir: str, replicas: int = 1, concurrency=None, sort: bool = True):
    """(nodes_ds, edges_ds) for the corpus."""
    nodes = build_nodes(annotated(sf_dir, "mentions", replicas, concurrency), sort=sort)
    edges = build_edges(annotated(sf_dir, "triples", replicas, concurrency), sort=sort)
    return nodes, edges


def write_graph(sf_dir: str, out_dir: str, replicas: int = 1, concurrency=None):
    """Materialize the graph to partitioned parquet (resumable layout:
    one directory per table, many part files, idempotent rewrite)."""
    nodes, edges = build_graph(sf_dir, replicas=replicas, concurrency=concurrency)
    nodes.write_parquet(f"{out_dir}/nodes")
    edges.write_parquet(f"{out_dir}/edges")
    return out_dir
