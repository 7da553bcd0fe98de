"""Ray pipeline integration tests over sf0.001 (session-scoped Ray)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph(ray_session):
    from hebrew_ner_ray.pipelines.kg import build_graph

    nodes, edges = build_graph(SF)
    return nodes.to_pandas(), edges.to_pandas()


def test_documents_ids_are_contiguous_range():
    # read_interleaved substitutes ray.data.range for the documents id
    # column (block parallelism); valid only while ids are exactly 0..n-1
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = sorted(t.column("doc_id").to_pylist())
    assert ids == list(range(len(ids)))


def test_docs_schema(ray_session):
    from hebrew_ner_ray.sources.interleaved import DOCS_SCHEMA, read_interleaved

    docs = read_interleaved(SF)
    batch = next(iter(docs.iter_batches(batch_size=8, batch_format="pyarrow")))
    assert batch.schema.equals(DOCS_SCHEMA)
    row = batch.to_pylist()[0]
    assert row["doc_id"].startswith("doc-")
    offs = [s["offset"] for s in row["spans"]]
    assert offs == sorted(offs)  # monotonically increasing (input_hint invariant)


def test_span_invariant_holds(ray_session):
    from hebrew_ner_ray.sources.interleaved import check_span_invariant, read_interleaved

    docs = read_interleaved(SF)
    checked = docs.map_batches(check_span_invariant, batch_format="pyarrow")
    assert checked.sum("ok") == checked.count()


def test_nodes_cover_all_categories(graph):
    nodes, _ = graph
    assert set(nodes["cat"]) == {"PER", "ORG", "LOC", "GPE", "FAC", "WOA", "EVE", "DUC", "ANG"}
    assert (nodes["mention_count"] > 0).all()
    # sorted materialize
    assert nodes["entity_id"].is_monotonic_increasing
    assert nodes["entity_id"].is_unique


def test_edges_reference_known_entities(graph):
    nodes, edges = graph
    ids = set(nodes["entity_id"])
    assert set(edges["subj_id"]) <= ids
    assert set(edges["obj_id"]) <= ids
    assert (edges["weight"] > 0).all()


def test_replicas_scale_linearly(ray_session):
    from hebrew_ner_ray.sources.interleaved import read_interleaved

    n1 = read_interleaved(SF).count()
    n3 = read_interleaved(SF, replicas=3).count()
    assert n3 == 3 * n1


def test_entity_ids_content_addressed(graph):
    from hebrew_ner_ray.kg.ids import entity_id

    nodes, _ = graph
    row = nodes[nodes["cat"] == "WOA"].iloc[0]
    # norm_key for the single WOA entity (תנך) — id derivable independently
    assert row["entity_id"] == entity_id("WOA", "תנכ")


def test_hybrid_query_matches_single(ray_session):
    from hebrew_ner_ray.pipelines.kg import annotated

    single = annotated(SF, "single").to_pandas()
    hybrid = annotated(SF, "hybrid").to_pandas()
    key = ["doc_id", "span_ord", "word_idx"]
    merged = single.merge(hybrid, on=key, suffixes=("_s", "_h"))
    assert len(merged) == len(single) == len(hybrid)
    assert (merged["label_s"] == merged["label_h"]).all()


def test_diversify_mode(ray_session):
    from hebrew_ner_ray.pipelines.kg import annotated

    df = annotated(SF, "single", diversify=True).to_pandas()
    base = annotated(SF, "single").to_pandas()
    # entities still tagged identically; extra numeric-suffix tokens are O
    key = ["doc_id", "span_ord", "word_idx"]
    merged = base.merge(df, on=key, suffixes=("_b", "_d"))
    assert (merged["label_b"] == merged["label_d"]).all()
    extra = df.merge(base[key], on=key, how="left", indicator=True)
    extra = extra[extra["_merge"] == "left_only"]
    assert (extra["label"] == "O").all()
    assert len(extra) > 0


def test_payload_library_reset():
    import numpy as np
    import pyarrow as pa

    from hebrew_ner_ray.pipelines.stages import AnnotateBatch

    ab = AnnotateBatch(emit="tokens")
    ab.LIB_ROW_LIMIT = 10  # force resets
    for r in range(5):
        texts = [f"גנן גידל דגן {r} {i} ." for i in range(8)]
        batch = pa.table(
            {
                "doc_id": pa.array([f"doc-{i:08d}" for i in range(8)]),
                "span_ord": pa.array(np.zeros(8, dtype=np.int64)),
                "kind": pa.array(["text"] * 8),
                "text": pa.array(texts),
                "media_ref": pa.array([""] * 8),
            }
        )
        out = ab(batch)
        assert out.num_rows == 8
    assert ab._lib_len <= 10 + 8  # bounded by limit + one batch


def test_mixed_cached_and_fresh_batch():
    import numpy as np
    import pyarrow as pa

    from hebrew_ner_ray.pipelines.stages import AnnotateBatch

    ab = AnnotateBatch(emit="single")
    t1 = "גנן גידל דגן בגן."
    mk = lambda texts: pa.table(
        {
            "doc_id": pa.array([f"doc-{i:08d}" for i in range(len(texts))]),
            "span_ord": pa.array(np.arange(len(texts), dtype=np.int64)),
            "kind": pa.array(["text"] * len(texts)),
            "text": pa.array(texts),
            "media_ref": pa.array([""] * len(texts)),
        }
    )
    first = ab(mk([t1])).to_pandas()
    # second batch mixes the cached sentence with fresh ones
    second = ab(mk(["משפת דוגמה אחת .", t1, "משפת דוגמה שתיים ."])).to_pandas()
    cached_rows = second[second["doc_id"] == "doc-00000001"]
    assert cached_rows["word"].tolist() == first["word"].tolist()
    assert cached_rows["label"].tolist() == first["label"].tolist()


def test_write_graph(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from hebrew_ner_ray.pipelines.kg import write_graph

    out = write_graph(SF, str(tmp_path / "graph"))
    for table in ("nodes", "edges"):
        d = os.path.join(out, table)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert files
        n = sum(pq.read_metadata(os.path.join(d, f)).num_rows for f in files)
        assert n > 0


@pytest.mark.gate
def test_write_graph_single_sink_layout(ray_session):
    """VERDICT r2 #5: write_graph and the config-driven path must share
    the lance_io sink and produce identical layouts."""
    import tempfile

    import pandas as pd

    from hebrew_ner_ray.config import build_pipeline
    from hebrew_ner_ray.pipelines.kg import write_graph

    d1 = tempfile.mkdtemp(prefix="wg_direct_")
    d2 = tempfile.mkdtemp(prefix="wg_config_")
    write_graph(SF, d1)
    build_pipeline({"pipeline": "kg", "sf_dir": SF, "out_dir": d2})

    import ray.data

    for sub in ("nodes", "edges"):
        a = ray.data.read_parquet(f"{d1}/{sub}").to_pandas()
        b = ray.data.read_parquet(f"{d2}/{sub}").to_pandas()
        key = [c for c in a.columns]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )
