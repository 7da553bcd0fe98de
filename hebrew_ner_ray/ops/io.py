"""Metadata-clean parquet reads.

Every parquet file the driver generates (and any file pandas ever
touched) carries a ``b'pandas'`` schema-metadata blob. ``pyarrow.Schema``
objects with ANY metadata are unhashable (``hash(schema)`` raises
``unhashable type: 'dict'``), which defeats Ray 2.49's schema-dedup fast
path in ``unify_schemas`` and makes every read/shuffle worker log
``Failed to hash the schemas (for deduplication)`` — harmless but it
floods stderr and skips the early-exit that avoids a full schema unify
per block.

``read_parquet_clean`` fixes this at the source: it reads the footer
schema once on the driver (one cheap metadata fetch), strips the
metadata, and passes the clean schema to ``ray.data.read_parquet`` so
every block the read emits hashes cleanly. Semantics are otherwise
identical — same columns, same types, same row order.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def _first_parquet(path: str) -> str | None:
    """The path itself if it is a parquet file, else the first
    ``*.parquet`` file found under it (our own sinks write homogeneous
    schemas, so any one file's footer is authoritative)."""
    if not isinstance(path, str):
        return None
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for dirpath, dirnames, filenames in sorted(os.walk(path)):
            for f in sorted(filenames):
                if f.endswith(".parquet"):
                    return os.path.join(dirpath, f)
    return None


def read_parquet_clean(path, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the footer schema's pandas
    metadata stripped (see module docstring). Callers that pass their
    own ``schema=`` are left alone."""
    import ray.data

    if "schema" not in kwargs:
        f = _first_parquet(path)
        if f is not None:
            try:
                s = pq.read_schema(f)
                if s.metadata:
                    s = s.remove_metadata()
                    if columns is not None:
                        # the datasource validates projected batches
                        # against the FULL given schema, so the schema
                        # must be pre-projected to the column selection
                        # (in selection order)
                        import pyarrow as pa

                        names = set(s.names)
                        if all(c in names for c in columns):
                            s = pa.schema([s.field(c) for c in columns])
                        else:
                            s = None  # partition col outside the footer
                    if s is not None:
                        kwargs["schema"] = s
            except Exception:
                pass  # unreadable footer: fall through to the plain read
    return ray.data.read_parquet(path, columns=columns, **kwargs)
