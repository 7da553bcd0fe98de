"""True base/delta two-snapshot incremental ingest (ops/incremental.py).

The hard claims, each pinned here:
1. day-2 ingest works with yesterday's RAW DOCUMENTS DELETED — only the
   persisted index is read (the "base is never re-scanned" proof),
2. a second index/node build executes ZERO partitions (manifest skip —
   the task-count assertion),
3. results are bit-identical to the parity-split queries that share the
   DuckDB oracles.
"""

import os
import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def snap_root(tmp_path):
    return str(tmp_path / "snap")


def test_snapshot_ingest_matches_parity_query_and_skips_base(ray_session, snap_root):
    from hebrew_ner_ray.ops.dedup import dedup_incremental
    from hebrew_ner_ray.ops.incremental import (
        build_base_index,
        ingest_delta,
        materialize_crawl,
    )

    materialize_crawl(SF, snap_root)
    ran = build_base_index(snap_root)
    assert sorted(ran) == list(range(8))  # day 1: every shard indexed

    # day 2, claim 2: the manifest skips every base partition
    assert build_base_index(snap_root) == []

    # claim 1: delete yesterday's raw documents entirely — the ingest
    # must still run (it reads only the index + delta files)
    shutil.rmtree(os.path.join(snap_root, "base_docs"))
    got = (ingest_delta(snap_root).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # claim 3: identical to the parity-split query (shared oracle)
    want = (dedup_incremental(SF).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_tiny_corpus_empty_shards_dont_wedge(ray_session, tmp_path):
    """A corpus too small to populate every base shard: empty shard=<k>
    partitions are backfilled before _CRAWL_DONE commits, so the day-1
    index build reads all BASE_SHARDS dirs without FileNotFoundError
    (regression: write_parquet(partition_cols) omits empty shards and a
    missing dir wedged the snapshot root AFTER the marker)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.incremental import (
        BASE_SHARDS,
        build_base_index,
        ingest_delta,
        materialize_crawl,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    docs = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                         "text": [f"doc {i}" for i in range(5)]})
    pq.write_table(pa.Table.from_pandas(docs),
                   str(sf / "documents.parquet"))
    root = str(tmp_path / "snap")
    materialize_crawl(str(sf), root)
    base_dirs = sorted(d for d in os.listdir(os.path.join(root, "base_docs"))
                       if d.startswith("shard="))
    assert base_dirs == sorted(f"shard={k}" for k in range(BASE_SHARDS))
    assert sorted(build_base_index(root)) == list(range(BASE_SHARDS))
    got = ingest_delta(root).to_pandas().sort_values("doc_id")
    h = stable_ids([str(i) for i in docs["doc_id"]])
    expect = sorted(int(i) for i in docs.loc[h % 2 == 1, "doc_id"])
    assert got["doc_id"].tolist() == expect  # texts unique → all kept


def test_crawl_materialization_is_idempotent(ray_session, snap_root):
    from hebrew_ner_ray.ops.incremental import materialize_crawl

    materialize_crawl(SF, snap_root)
    delta = os.path.join(snap_root, "delta_docs")
    before = sorted(os.listdir(delta))
    mtimes = {f: os.path.getmtime(os.path.join(delta, f)) for f in before}
    materialize_crawl(SF, snap_root)  # marker present → no rewrite
    assert sorted(os.listdir(delta)) == before
    assert all(os.path.getmtime(os.path.join(delta, f)) == m
               for f, m in mtimes.items())


def test_kg_nodes_snapshot_matches_one_shot_build(ray_session, snap_root):
    from hebrew_ner_ray.ops import incremental as inc

    # point the query at the isolated root (snapshot_root is /tmp-global)
    orig = inc.snapshot_root
    inc.snapshot_root = lambda sf_dir: snap_root
    try:
        got = (inc.kg_nodes_incremental_snapshot(SF).to_pandas()
               .reset_index(drop=True))
        got_e = (inc.kg_edges_incremental_snapshot(SF).to_pandas()
                 .reset_index(drop=True))
        # day 2: base node AND edge partitions all skipped
        assert inc.build_base_nodes(snap_root, SF) == []
        assert inc.build_base_edges(snap_root, SF) == []
    finally:
        inc.snapshot_root = orig

    from hebrew_ner_ray.kg.canonical import build_nodes
    from hebrew_ner_ray.pipelines.kg import annotated

    want = (build_nodes(annotated(SF, "mentions")).to_pandas()
            .reset_index(drop=True))
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)

    from hebrew_ner_ray.kg.canonical import build_edges

    want_e = (build_edges(annotated(SF, "triples")).to_pandas()
              .reset_index(drop=True))
    assert len(want_e) > 0
    pd.testing.assert_frame_equal(got_e, want_e)


def test_format_materialization_recovers_from_interrupted_write(ray_session, tmp_path, monkeypatch):
    """A crash mid-materialization leaves a _tmp dir and no marker; the
    next call must rebuild cleanly (tmp swept, marker written)."""
    from hebrew_ner_ray.ops import formats

    monkeypatch.setattr(formats, "_format_root",
                        lambda sf, kind: str(tmp_path / kind))
    # simulate the torn state
    torn = tmp_path / "docs_jsonl_tmp" / "data"
    torn.mkdir(parents=True)
    (torn / "garbage.json").write_text("{broken")
    out = (formats.docs_jsonl_stats(SF).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    assert len(out) > 0
    assert (tmp_path / "docs_jsonl" / "_DONE").exists()
    assert not (tmp_path / "docs_jsonl_tmp").exists()
