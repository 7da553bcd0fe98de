"""Config-driven pipeline builder (hebrew_ner_ray/config.py) and the
Lance-or-parquet sink layout (sources/lance_io.py)."""

from __future__ import annotations

import os

import pytest

from hebrew_ner_ray.config import build_pipeline, config_file_to_dict, registry

SF = "/root/testdata/sf0.001"


def test_config_file_parsing(tmp_path):
    p = tmp_path / "ner.config"
    p.write_text(
        "# NCRF++-style config\n"
        "pipeline=ner\n"
        f"sf_dir={SF}  # suffix comment\n"
        "emit=tokens\n"
        "replicas=1\n"
        "bogus_key_the_reference_would_ignore=x\n"
    )
    cfg = config_file_to_dict(str(p))
    assert cfg["pipeline"] == "ner" and cfg["sf_dir"] == SF
    assert cfg["emit"] == "tokens"


def test_build_ner_from_config_file(ray_session, tmp_path):
    p = tmp_path / "ner.config"
    p.write_text(f"pipeline=ner\nsf_dir={SF}\nemit=tokens\n")
    ds = build_pipeline(str(p))
    df = ds.to_pandas()
    assert len(df) > 0 and set(df.columns) == {"doc_id", "span_ord", "token_str", "n_tokens"}


def test_build_kg_with_sink(ray_session, tmp_path):
    out = str(tmp_path / "graph")
    got = build_pipeline({"pipeline": "kg", "sf_dir": SF, "out_dir": out})
    assert got == out
    assert os.path.isdir(f"{out}/nodes") and os.path.isdir(f"{out}/edges")
    import ray.data

    nodes = ray.data.read_parquet(f"{out}/nodes").to_pandas()
    assert {"entity_id", "canonical_form", "cat", "mention_count"} <= set(nodes.columns)
    assert len(nodes) > 0


def test_unknown_pipeline():
    with pytest.raises(ValueError, match="unknown pipeline"):
        build_pipeline({"pipeline": "nope", "sf_dir": SF})


def test_registry_names():
    assert set(registry()) == {"ner", "crf", "kg", "kg_resumable", "curation", "eval_vs_gold"}


def test_config_query_surface(ray_session, tmp_path):
    from hebrew_ner_ray.config import build_pipeline

    out = build_pipeline({"pipeline": "query", "query": "dedup_exact",
                          "sf_dir": "/root/testdata/sf0.001"}).to_pandas()
    assert len(out) > 0 and "text_hash" in out.columns

    cfgf = tmp_path / "q.config"
    cfgf.write_text("pipeline=query  # comment\nquery=corpus_card\n"
                    "sf_dir=/root/testdata/sf0.001\n")
    card = build_pipeline(str(cfgf)).to_pandas()
    assert card["n_docs"].iloc[0] == 500

    import pytest

    with pytest.raises(ValueError, match="unknown query"):
        build_pipeline({"pipeline": "query", "query": "nope",
                        "sf_dir": "/root/testdata/sf0.001"})
