"""Content-addressed stable ids.

Entity resolution in the KG pipeline is hash-based: an entity's id is a
pure function of (category, normalized key). This removes the need for a
distributed id-assignment join — any task on any node derives the same id
independently, which is the scalable choice at 10^12 documents (no shared
counter, no shuffle to assign ids, idempotent on retry).

The hash is md5-derived so the DuckDB oracle can reproduce it exactly:
    python:  int(md5(s).hexdigest()[:15], 16)
    duckdb:  CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
(15 hex digits = 60 bits, always a positive int64 on both sides.)
"""

from __future__ import annotations

import hashlib

import numpy as np


def stable_id(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def entity_id(cat: str, norm_key: str) -> int:
    return stable_id(f"{cat}|{norm_key}")


def stable_ids(strings) -> np.ndarray:
    return np.asarray([stable_id(s) for s in strings], dtype=np.int64)


def sql_stable_id(expr: str) -> str:
    """DuckDB SQL expression computing :func:`stable_id` of ``expr``."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def sql_entity_id(cat_expr: str, key_expr: str) -> str:
    return sql_stable_id(f"{cat_expr} || '|' || {key_expr}")
