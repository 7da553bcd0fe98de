"""Config-driven pipeline construction — the reference's §2.9 surface
(utils/data.py:445-619 ``read_config`` over ``key=value`` files,
ner_app.py:24-57 model registry) re-expressed as a flat-config →
Dataset-pipeline builder.

Format: the reference's NCRF++-style config — one ``key=value`` per
line, ``#`` comments (line- and suffix-level), unknown keys ignored
(utils/data.py:622-660 semantics, minus the torch ``feature`` blocks the
engine has no use for). The same dict can be passed directly.

Keys:
    pipeline   ner | crf | kg | kg_resumable | curation | eval_vs_gold
    sf_dir     testdata directory (required)
    emit       AnnotateBatch emit mode for pipeline=ner (default single)
    replicas   corpus replication factor (default 1)
    diversify  true/false — all-distinct sentence mode
    entity_mix int — synthetic-entity cardinality (mixed corpus)
    batch_size annotation dispatch size
    out_dir    output directory for pipeline=kg (graph materialize) /
               work dir for kg_resumable
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_TRUE = {"true", "1", "yes"}


def config_file_to_dict(path: str) -> Dict[str, str]:
    """Reference parser semantics (utils/data.py:622-629): skip ``#``
    lines, strip suffix comments, split on the first ``=``."""
    config: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            body = line.strip().split("#", 1)[0]
            # skip when the only '=' lived in the comment (the reference
            # parser crashes there — utils/data.py:628-630; we skip)
            if not body or "=" not in body:
                continue
            item, value = body.split("=", 1)
            config[item.strip()] = value.strip()
    return config


def _common(cfg: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if "replicas" in cfg:
        out["replicas"] = int(cfg["replicas"])
    if "batch_size" in cfg:
        out["batch_size"] = int(cfg["batch_size"])
    if "diversify" in cfg:
        out["diversify"] = str(cfg["diversify"]).lower() in _TRUE
    return out


def build_pipeline(cfg: "Dict[str, Any] | str") -> Any:
    """Config → executed-on-demand Dataset (or (nodes, edges) for kg).

    Accepts a dict or a path to a ``key=value`` config file."""
    if isinstance(cfg, str):
        cfg = config_file_to_dict(cfg)
    sf_dir = cfg["sf_dir"]
    kind = cfg.get("pipeline", "ner")

    from hebrew_ner_ray.pipelines import kg as kgp

    if kind == "ner":
        return kgp.annotated(sf_dir, cfg.get("emit", "single"), **_common(cfg))
    if kind == "crf":
        return kgp.annotated_crf(sf_dir, **_common(cfg))
    if kind == "kg":
        common = _common(cfg)
        if "entity_mix" in cfg:
            common["entity_mix"] = int(cfg["entity_mix"])
        nodes, edges = kgp.build_graph(sf_dir, **common)
        if "out_dir" in cfg:
            from hebrew_ner_ray.sources.lance_io import write_graph_tables

            return write_graph_tables(nodes, edges, cfg["out_dir"])
        return nodes, edges
    if kind == "kg_resumable":
        return kgp.build_graph_resumable(
            sf_dir, cfg["out_dir"], n_partitions=int(cfg.get("n_partitions", 8)),
            replicas=int(cfg.get("replicas", 1)),
        )
    if kind == "curation":
        from hebrew_ner_ray.ops.curation import curated_docs

        return curated_docs(sf_dir)
    if kind == "eval_vs_gold":
        from hebrew_ner_ray.pipelines.evaljoin import eval_vs_gold

        return eval_vs_gold(sf_dir)
    if kind == "query":
        # every scale-ops registry query by name: pipeline=query,
        # query=<name> (dedup_jaccard, text_bm25_topk, events_sessions, …)
        from hebrew_ner_ray.ops.registry import ops_queries

        qs = ops_queries()
        name = cfg.get("query", "")
        if name not in qs:
            raise ValueError(
                f"unknown query '{name}' — one of {sorted(qs)[:8]}… "
                f"({len(qs)} total; see OPERATORS.md)")
        return qs[name](sf_dir)
    raise ValueError(f"unknown pipeline '{kind}' — expected one of "
                     "ner|crf|kg|kg_resumable|curation|eval_vs_gold|query")


def registry() -> Dict[str, Callable[..., Any]]:
    """The ModelEnum analogue (ner_app.py:24-28): name → builder."""
    return {name: (lambda n: (lambda **kw: build_pipeline({"pipeline": n, **kw})))(name)
            for name in ("ner", "crf", "kg", "kg_resumable", "curation", "eval_vs_gold")}
