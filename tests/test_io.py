"""ops/io.read_parquet_clean: metadata-free reads with exact projection."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from hebrew_ner_ray.ops.io import _first_parquet, read_parquet_clean


def _write_pandas_parquet(path):
    """A file the way the driver writes them: pandas → parquet, which
    embeds the b'pandas' schema-metadata blob."""
    df = pd.DataFrame({"a": np.arange(5, dtype=np.int64),
                       "b": ["x", "y", "z", "w", "v"],
                       "c": np.linspace(0, 1, 5)})
    df.to_parquet(path)
    assert pq.read_schema(path).metadata  # the premise of the module


def test_read_strips_schema_metadata(ray_session, tmp_path):
    p = str(tmp_path / "t.parquet")
    _write_pandas_parquet(p)
    ds = read_parquet_clean(p)
    t = pa.Table.from_pandas(ds.to_pandas())
    # the READ schema is hashable (the bug was hash(schema) raising)
    first = ds.take_batch(1, batch_format="pyarrow")
    assert set(first.column_names) == {"a", "b", "c"}
    assert hash(pq.read_schema(p).remove_metadata())  # sanity
    assert len(t) == 5


def test_read_projects_columns_in_order(ray_session, tmp_path):
    p = str(tmp_path / "t.parquet")
    _write_pandas_parquet(p)
    out = read_parquet_clean(p, columns=["c", "a"]).to_pandas()
    assert list(out.columns) == ["c", "a"]
    assert out["a"].tolist() == list(range(5))


def test_read_values_match_plain_read(ray_session, tmp_path):
    import ray.data

    p = str(tmp_path / "t.parquet")
    _write_pandas_parquet(p)
    clean = read_parquet_clean(p, columns=["a", "b"]).to_pandas()
    plain = ray.data.read_parquet(p, columns=["a", "b"]).to_pandas()
    pd.testing.assert_frame_equal(
        clean.sort_values("a").reset_index(drop=True),
        plain.sort_values("a").reset_index(drop=True))


def test_directory_read_uses_first_footer(ray_session, tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    _write_pandas_parquet(str(d / "part-0.parquet"))
    _write_pandas_parquet(str(d / "part-1.parquet"))
    assert _first_parquet(str(d)) == str(d / "part-0.parquet")
    out = read_parquet_clean(str(d)).to_pandas()
    assert len(out) == 10


def test_partition_column_outside_footer_falls_back(ray_session, tmp_path):
    """Hive layout: the requested partition column is absent from the
    file footer — the helper must NOT pass a schema (it would drop the
    column) and fall back to the plain read."""
    root = tmp_path / "hive"
    for k in (0, 1):
        sub = root / f"shard={k}"
        sub.mkdir(parents=True)
        pd.DataFrame({"a": [k * 10]}).to_parquet(sub / "f.parquet")
    out = read_parquet_clean(str(root), columns=["a", "shard"]).to_pandas()
    assert sorted(out["a"].tolist()) == [0, 10]
    assert set(out.columns) == {"a", "shard"}


def test_caller_schema_wins(ray_session, tmp_path):
    p = str(tmp_path / "t.parquet")
    _write_pandas_parquet(p)
    s = pa.schema([("a", pa.int64()), ("b", pa.string()),
                   ("c", pa.float64())], metadata={b"keep": b"me"})
    ds = read_parquet_clean(p, schema=s)
    assert ds.count() == 5  # passed through untouched, no crash


def test_first_parquet_missing_path():
    assert _first_parquet("/nonexistent/nowhere") is None
    assert _first_parquet(None) is None
