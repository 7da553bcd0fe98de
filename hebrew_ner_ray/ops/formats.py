"""Source-format plurality: the engine's pipelines over JSONL and CSV
inputs, not just parquet.

A real corpus arrives as line-delimited JSON crawls and CSV event dumps;
these queries materialize that layout ONCE under /tmp (streaming Ray
writes, marker-guarded) and then run the pipeline FROM the text formats —
``ray.data.read_json`` / ``read_csv`` — proving the operator surface is
storage-agnostic. Oracles read the original parquet: the roundtrip must
be lossless for the aggregate to hash-match.

CSV carries timestamps as epoch-µs int64 (a text format has no canonical
timestamp encoding; integers roundtrip exactly).
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

_JL_COLS = {"lang": "object", "n_docs": "int64", "total_chars": "int64"}
_CSV_COLS = {"event_type": "object", "n_events": "int64",
             "total_value_micro": "int64"}


def _format_root(sf_dir: str, kind: str) -> str:
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    name = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/hebrew_ner_ray_formats/{name}-{n}/{kind}"


def _materialize(sf_dir: str, kind: str, write) -> str:
    """Write the text-format snapshot once (atomic: tmp dir + rename)."""
    import shutil

    root = _format_root(sf_dir, kind)
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root
    os.makedirs(os.path.dirname(root), exist_ok=True)
    tmp = root + "_tmp"
    for p in (root, tmp):
        if os.path.exists(p):
            shutil.rmtree(p)
    data = os.path.join(tmp, "data")
    write(data)
    os.rename(tmp, root)
    with open(done, "w") as f:
        f.write("ok\n")
    return root


def docs_jsonl_stats(sf_dir: str):
    """Per-language doc count + character total, computed FROM a JSONL
    snapshot of the documents table (write_json → read_json roundtrip).
    The aggregate is the standard combiner → tiny keyed reduce."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    def write(path: str) -> None:
        (read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
         .write_json(path))

    root = _materialize(sf_dir, "docs_jsonl", write)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({"lang": b["lang"],
                              "chars": b["text"].str.len().astype("int64")})
                .groupby("lang", as_index=False)
                .agg(n_docs=("chars", "size"), total_chars=("chars", "sum")))

    ds = ray.data.read_json(os.path.join(root, "data"))

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_JL_COLS)
        out = (g.groupby("lang", as_index=False)
               .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")))
        return (out.sort_values("lang").reset_index(drop=True)
                [list(_JL_COLS)].astype(_JL_COLS))

    return small_key_aggregate(ds.map_batches(partial, batch_format="pandas"),
                               reduce)


def events_csv_stats(sf_dir: str):
    """Per-type event count + exact value sum, computed FROM a CSV
    snapshot of the events table (write_csv → read_csv roundtrip; value
    is converted to integer micro-units BEFORE the write so the text
    roundtrip is exact)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    def write(path: str) -> None:
        def project(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_id": b["event_id"].astype("int64"),
                "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
                "user_id": b["user_id"].astype("int64"),
                "event_type": b["event_type"],
                "value_micro": np.floor(
                    b["value"].to_numpy() * 1_000_000).astype(np.int64),
            })

        (read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type", "value"])
         .map_batches(project, batch_format="pandas")
         .write_csv(path))

    root = _materialize(sf_dir, "events_csv", write)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({"event_type": b["event_type"],
                              "v": b["value_micro"].astype("int64")})
                .groupby("event_type", as_index=False)
                .agg(n_events=("v", "size"), total_value_micro=("v", "sum")))

    ds = ray.data.read_csv(os.path.join(root, "data"))

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_CSV_COLS)
        out = (g.groupby("event_type", as_index=False)
               .agg(n_events=("n_events", "sum"),
                    total_value_micro=("total_value_micro", "sum")))
        return (out.sort_values("event_type").reset_index(drop=True)
                [list(_CSV_COLS)].astype(_CSV_COLS))

    return small_key_aggregate(ds.map_batches(partial, batch_format="pandas"),
                               reduce)
