"""Entity canonicalization + graph materialization (the wide stages).

Canonicalization is the salted two-phase aggregate mandated by the north
rule: phase 1 collapses each Arrow batch to one row per (cat, norm_key)
inside ``map_batches`` (the "salt" is the batch — a head key contributes
at most one row per batch), phase 2 is a small ``groupby().aggregate``
over the partials. Head entities (Zipfian surface forms, SURVEY.md §4)
therefore never concentrate on one reducer.

Entity ids are content-addressed (kg/ids.py) so edge building needs NO
join against the node table — both sides derive ids independently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hebrew_ner_ray.pipelines.stages import add_entity_ids, edge_partials, mention_partials


def _rename_for(table: pa.Table, mapping: dict[str, str]) -> pa.Table:
    return table.rename_columns([mapping.get(c, c) for c in table.column_names])


def _coalesce_blocks() -> int:
    """Partial tables are tiny but inherit one block per upstream task;
    coalesce before aggregation so downstream stages don't pay per-block
    scheduling (measured 85s → 2s on a 36.9k-row aggregate)."""
    import ray

    return max(8, int(ray.cluster_resources().get("CPU", 8)))


def kg_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner over single-pass ``emit='kg'`` rows: collapses
    BOTH aggregate families (node counts, edge weights) into one small
    union table tagged ``ptype`` — the annotate output is consumed in ONE
    streaming pass and only these partials (≈ distinct keys per batch) are
    ever materialized, so the big intermediate never pins memory."""
    import pyarrow.compute as pc

    m = batch.filter(pc.equal(batch.column("row_type"), "m"))
    t = batch.filter(pc.equal(batch.column("row_type"), "t"))
    mp = mention_partials(m)  # cat, norm_key, canonical_form, n
    tp = pa.Table.from_arrays(
        [t.column("norm_key"), t.column("cat"), t.column("pred"),
         t.column("obj"), t.column("obj_cat")],
        names=["subj", "subj_cat", "pred", "obj", "obj_cat"],
    )
    ep = edge_partials(tp)  # subj_id, pred, obj_id, n
    n_m, n_e = mp.num_rows, ep.num_rows
    return pa.table(
        {
            "ptype": pa.array(["node"] * n_m + ["edge"] * n_e),
            "cat": pa.concat_arrays([mp.column("cat").combine_chunks(),
                                     pa.nulls(n_e, pa.string())]),
            "norm_key": pa.concat_arrays([mp.column("norm_key").combine_chunks(),
                                          pa.nulls(n_e, pa.string())]),
            "canonical_form": pa.concat_arrays([mp.column("canonical_form").combine_chunks(),
                                                pa.nulls(n_e, pa.string())]),
            "subj_id": pa.concat_arrays([pa.nulls(n_m, pa.int64()),
                                         ep.column("subj_id").combine_chunks()]),
            "pred": pa.concat_arrays([pa.nulls(n_m, pa.string()),
                                      ep.column("pred").combine_chunks()]),
            "obj_id": pa.concat_arrays([pa.nulls(n_m, pa.int64()),
                                        ep.column("obj_id").combine_chunks()]),
            "n": pa.concat_arrays([mp.column("n").combine_chunks().cast(pa.int64()),
                                   ep.column("n").combine_chunks().cast(pa.int64())]),
        }
    )


def graph_from_kg_rows(kg_ds, sort: bool = True):
    """(nodes, edges) from a single-pass ``emit='kg'`` dataset: one
    streaming consumption producing combined partials; only the partials
    are materialized for the two final aggregations."""
    import pandas as pd
    import pyarrow.compute as pc

    from hebrew_ner_ray.ops.shuffle import keyed_aggregate

    import ray

    partials = (
        kg_ds.map_batches(kg_partials, batch_format="pyarrow")
        .repartition(_coalesce_blocks())
        .materialize()
    )
    n_partials = partials.count()  # free: materialized

    node_part = partials.map_batches(
        lambda b: b.filter(pc.equal(b.column("ptype"), "node")).select(
            ["cat", "norm_key", "canonical_form", "n"]
        ),
        batch_format="pyarrow",
    )

    def node_reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            from hebrew_ner_ray.ops.shuffle import typed_empty

            return typed_empty({"cat": "object", "norm_key": "object",
                                "mention_count": "int64", "canonical_form": "object"})
        out = g.groupby(["cat", "norm_key"], as_index=False).agg(
            mention_count=("n", "sum"), canonical_form=("canonical_form", "min")
        )
        out["mention_count"] = out["mention_count"].astype("int64")
        return out

    nodes = keyed_aggregate(node_part, ["cat", "norm_key"], node_reduce,
                            count=n_partials)
    nodes = nodes.map_batches(add_entity_ids, batch_format="pyarrow").select_columns(
        ["entity_id", "canonical_form", "cat", "mention_count"]
    )

    edge_part = partials.map_batches(
        lambda b: b.filter(pc.equal(b.column("ptype"), "edge")).select(
            ["subj_id", "pred", "obj_id", "n"]
        ),
        batch_format="pyarrow",
    )

    def edge_reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            from hebrew_ner_ray.ops.shuffle import typed_empty

            return typed_empty({"subj_id": "object", "pred": "object",
                                "obj_id": "object", "weight": "int64"})
        out = g.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(weight=("n", "sum"))
        out["weight"] = out["weight"].astype("int64")
        return out

    edges = keyed_aggregate(edge_part, ["subj_id", "pred", "obj_id"], edge_reduce,
                            count=n_partials)
    edges = edges.select_columns(["subj_id", "pred", "obj_id", "weight"])
    if sort:
        # _arrow_clean before every sort of a pandas-origin table: the
        # Project conversion re-attaches b'pandas' schema metadata, which
        # is unhashable inside the Sort's unify_schemas (ops/shuffle.py)
        from hebrew_ner_ray.ops.shuffle import _arrow_clean

        nodes = _arrow_clean(nodes).sort("entity_id")
        edges = _arrow_clean(edges).sort(["subj_id", "pred", "obj_id"])
    return nodes, edges


def build_nodes(mentions_ds, sort: bool = True):
    """mentions → nodes(entity_id, canonical_form, cat, mention_count).

    Entity cardinality grows with the corpus, so the final reduce is a
    bucketed aggregate (ops/shuffle.py) rather than Dataset.aggregate."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import keyed_aggregate

    partials = mentions_ds.map_batches(mention_partials, batch_format="pyarrow").repartition(
        _coalesce_blocks()
    ).materialize()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            from hebrew_ner_ray.ops.shuffle import typed_empty

            return typed_empty({"cat": "object", "norm_key": "object",
                                "mention_count": "int64", "canonical_form": "object"})
        out = g.groupby(["cat", "norm_key"], as_index=False).agg(
            mention_count=("n", "sum"), canonical_form=("canonical_form", "min")
        )
        out["mention_count"] = out["mention_count"].astype("int64")
        return out

    agg = keyed_aggregate(partials, ["cat", "norm_key"], reduce, count=partials.count())
    nodes = agg.map_batches(add_entity_ids, batch_format="pyarrow").select_columns(
        ["entity_id", "canonical_form", "cat", "mention_count"]
    )
    return nodes.sort("entity_id") if sort else nodes


def build_edges(triples_ds, sort: bool = True):
    """triples → edges(subj_id, pred, obj_id, weight)."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import keyed_aggregate

    partials = triples_ds.map_batches(edge_partials, batch_format="pyarrow").repartition(
        _coalesce_blocks()
    ).materialize()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            from hebrew_ner_ray.ops.shuffle import typed_empty

            return typed_empty({"subj_id": "object", "pred": "object",
                                "obj_id": "object", "weight": "int64"})
        out = g.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
            weight=("n", "sum")
        )
        out["weight"] = out["weight"].astype("int64")
        return out

    edges = keyed_aggregate(partials, ["subj_id", "pred", "obj_id"], reduce,
                            count=partials.count())
    edges = edges.select_columns(["subj_id", "pred", "obj_id", "weight"])
    from hebrew_ner_ray.ops.shuffle import _arrow_clean

    return (_arrow_clean(edges).sort(["subj_id", "pred", "obj_id"])
            if sort else edges)


_NODE_COLS = {"entity_id": "int64", "canonical_form": "object",
              "cat": "object", "mention_count": "int64"}
_EDGE_COLS = {"subj_id": "int64", "pred": "object", "obj_id": "int64",
              "weight": "int64"}


def merge_node_tables(a, b, sort: bool = True):
    """Incremental upsert of two node tables (yesterday's graph + today's
    delta). Because entity ids are content-addressed and every node
    aggregate is associative (count: sum, canonical_form: min), the merge
    is a pure keyed aggregate on ``entity_id`` — no norm_key re-derivation,
    no join, and merging half-builds is bit-identical to one full build
    (CORRECTNESS-gated: kg_nodes_incremental shares kg_nodes' oracle)."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import _arrow_clean, keyed_aggregate, typed_empty

    # normalize both halves to metadata-free Arrow before the union
    # materializes: pandas-origin blocks that crossed a native Project/
    # Sort carry b'pandas' schema metadata, which is unhashable inside
    # downstream unify_schemas (see ops/shuffle.py._arrow_clean)
    u = _arrow_clean(a.union(b)).materialize()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_NODE_COLS)
        out = g.groupby("entity_id", as_index=False).agg(
            canonical_form=("canonical_form", "min"),
            cat=("cat", "min"),  # cat is a function of the id — identity
            mention_count=("mention_count", "sum"))
        return out[list(_NODE_COLS)].astype(_NODE_COLS)

    merged = keyed_aggregate(u, ["entity_id"], reduce, count=u.count())
    merged = merged.select_columns(list(_NODE_COLS))
    # _arrow_clean: the reduce emits pandas blocks whose Arrow conversion
    # carries b'pandas' schema metadata — unhashable inside the Sort's
    # unify_schemas dedup (see ops/shuffle.py); columns here are plain
    # int64/str so the zero-copy strip is tensor-safe
    from hebrew_ner_ray.ops.shuffle import _arrow_clean
    return _arrow_clean(merged).sort("entity_id") if sort else merged


def merge_edge_tables(a, b, sort: bool = True):
    """Edge-table twin of :func:`merge_node_tables`: weight sums are
    associative, so the upsert is one keyed aggregate on the edge key."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import _arrow_clean, keyed_aggregate, typed_empty

    u = _arrow_clean(a.union(b)).materialize()  # see merge_node_tables

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_EDGE_COLS)
        out = g.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
            weight=("weight", "sum"))
        return out[list(_EDGE_COLS)].astype(_EDGE_COLS)

    merged = keyed_aggregate(u, ["subj_id", "pred", "obj_id"], reduce,
                             count=u.count())
    merged = merged.select_columns(list(_EDGE_COLS))
    from hebrew_ner_ray.ops.shuffle import _arrow_clean
    return (_arrow_clean(merged).sort(["subj_id", "pred", "obj_id"])
            if sort else merged)


_MEDIA_EDGE_COLS = {"entity_id": "int64", "media_ref": "object",
                    "weight": "int64"}


def build_media_edges(mentions_ds, media_ds, sort: bool = True):
    """(entity)→(media_ref) co-occurrence edges: the KG covers the
    interleaved corpus's multimodal column end-to-end (north-rule input
    schema — every doc interleaves text and media spans).

    weight = the entity's mention count in the media span's document
    (a media_ref is content-addressed to one (doc, span), so each
    (entity_id, media_ref) pair lives wholly inside ONE doc partition
    and a single doc_id-keyed exchange produces final weights — no
    second aggregate). Mentions ship as per-batch (doc, entity, n)
    combiners; media rows are (doc, ref) pairs.
    """
    import pandas as pd

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    _ROW = {"doc_id": "object", "entity_id": "int64", "media_ref": "object",
            "n": "int64", "side": "int64"}

    def mention_rows(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["doc_id", "cat", "norm_key"], as_index=False)
             .agg(n=("doc_id", "size")))
        eids = stable_ids([f"{c}|{k}" for c, k in
                           zip(g["cat"], g["norm_key"])])
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(),
             "entity_id": eids,
             "media_ref": np.full(len(g), "", dtype=object),
             "n": g["n"].to_numpy(dtype=np.int64),
             "side": np.zeros(len(g), dtype=np.int64)}).astype(_ROW)

    def media_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["kind"] != "text"]
        m = len(b)
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(),
             "entity_id": np.zeros(m, dtype=np.int64),
             "media_ref": b["media_ref"].to_numpy(),
             "n": np.zeros(m, dtype=np.int64),
             "side": np.ones(m, dtype=np.int64)}).astype(_ROW)

    ments = mentions_ds.map_batches(mention_rows, batch_format="pandas")
    media = media_ds.map_batches(media_rows, batch_format="pandas")

    def join(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_MEDIA_EDGE_COLS)
        # mention_rows ships PER-BATCH partials: a doc whose mentions
        # straddle a map_batches boundary yields several (doc, entity, n)
        # rows — re-sum per (doc_id, entity_id) before the merge or each
        # partial would pair with the media refs separately (duplicate
        # edges with split weights).
        m = (p[p["side"] == 0][["doc_id", "entity_id", "n"]]
             .groupby(["doc_id", "entity_id"], as_index=False)["n"].sum())
        r = p[p["side"] == 1][["doc_id", "media_ref"]]
        out = m.merge(r, on="doc_id")
        if out.empty:
            return typed_empty(_MEDIA_EDGE_COLS)
        out = out.rename(columns={"n": "weight"})
        return out[list(_MEDIA_EDGE_COLS)].astype(_MEDIA_EDGE_COLS)

    edges = bucketed_aggregate(ments.union(media), ["doc_id"], join,
                               coalesce=partitions_for())
    from hebrew_ner_ray.ops.shuffle import _arrow_clean

    return (_arrow_clean(edges).sort(["entity_id", "media_ref"])
            if sort else edges)


ENTITY_PAIR_DOC_CAP = 64  # docs with more distinct entities are excluded
# (pair blowup is quadratic in per-doc entities — the hot-shingle-cap
# idiom from dedup_jaccard, mirrored exactly by the SQL twin's HAVING)
_COOC_COLS = {"a_id": "int64", "b_id": "int64", "weight": "int64"}


def build_entity_cooccurrence(mentions_ds, sort: bool = True):
    """Doc-level entity co-occurrence graph: (a_id, b_id, weight) for
    every unordered pair of DISTINCT entities sharing a document,
    weight = number of shared documents — the doc-window companion to
    the sentence-window triple edges.

    Two exchanges: doc_id co-locates a document's mentions (distinct
    entity set + pair expansion happen inside the complete-doc
    partition, bounded by ENTITY_PAIR_DOC_CAP), then a pair-keyed
    exchange sums weights across documents."""
    import pandas as pd

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    _ME = {"doc_id": "object", "entity_id": "int64"}

    def ment_rows(b: pd.DataFrame) -> pd.DataFrame:
        g = b[["doc_id", "cat", "norm_key"]].drop_duplicates()
        eids = stable_ids([f"{c}|{k}" for c, k in zip(g["cat"], g["norm_key"])])
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "entity_id": eids}).astype(_ME)

    def pairs(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_COOC_COLS)
        p = p.drop_duplicates()  # cross-batch duplicate (doc, entity) rows
        rows_a, rows_b = [], []
        for _, grp in p.groupby("doc_id", sort=False):
            e = np.sort(grp["entity_id"].to_numpy())
            if len(e) < 2 or len(e) > ENTITY_PAIR_DOC_CAP:
                continue
            i, j = np.triu_indices(len(e), k=1)
            rows_a.append(e[i])
            rows_b.append(e[j])
        if not rows_a:
            return typed_empty(_COOC_COLS)
        out = (pd.DataFrame({"a_id": np.concatenate(rows_a),
                             "b_id": np.concatenate(rows_b)})
               .groupby(["a_id", "b_id"], as_index=False).size()
               .rename(columns={"size": "weight"}))
        return out[list(_COOC_COLS)].astype(_COOC_COLS)

    ments = mentions_ds.map_batches(ment_rows, batch_format="pandas")
    partials = bucketed_aggregate(ments, ["doc_id"], pairs,
                                  coalesce=partitions_for())

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_COOC_COLS)
        return (g.groupby(["a_id", "b_id"], as_index=False)
                .agg(weight=("weight", "sum"))[list(_COOC_COLS)]
                .astype(_COOC_COLS))

    edges = bucketed_aggregate(partials, ["a_id", "b_id"], reduce,
                               coalesce=partitions_for())
    from hebrew_ner_ray.ops.shuffle import _arrow_clean

    return _arrow_clean(edges).sort(["a_id", "b_id"]) if sort else edges
