"""Lance table IO — the north rule's storage format for the graph
materialize and the interleaved input.

The container has no ``lance``/``pylance`` wheel, so the Lance calls are
import-gated with a parquet fallback that preserves the layout contract
(one directory per table, many fragments, resumable). The Ray-side code
path — schema, partitioning, write sharding — is identical either way;
swapping in the real format is the one-line ``use_lance=True`` branch.

Ray Data has native ``read_lance`` / ``Dataset.write_lance`` wrappers
(backed by the same lance package), so on a cluster with the wheel the
fast path is those APIs; this module keeps the engine importable and the
layout stable without it.
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def write_table(ds, path: str) -> str:
    """Materialize a Dataset to a Lance table when the wheel is present,
    else to a parquet directory with the same name and layout contract."""
    if lance_available():
        ds.write_lance(path)  # ray.data native sink
    else:
        ds.write_parquet(path)
    return path


def read_interleaved_table(path: str):
    """Read an interleaved-documents table (doc_id, spans) from Lance or
    the parquet fallback. Columns are pruned at the read either way."""
    import ray.data

    if lance_available():
        return ray.data.read_lance(path, columns=["doc_id", "spans"])
    return read_parquet_clean(path, columns=["doc_id", "spans"])


def write_graph_tables(nodes, edges, out_dir: str) -> str:
    """Sorted node/edge tables → ``out_dir/nodes`` + ``out_dir/edges``
    (the north rule's 'sorted graph materialize into Lance edge/node
    tables')."""
    write_table(nodes, f"{out_dir}/nodes")
    write_table(edges, f"{out_dir}/edges")
    return out_dir
