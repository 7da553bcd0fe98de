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

import pyarrow as pa

from hebrew_ner_ray.pipelines.stages import add_entity_ids, edge_partials, mention_partials


def _rename_for(table: pa.Table, mapping: dict[str, str]) -> pa.Table:
    return table.rename_columns([mapping.get(c, c) for c in table.column_names])


def graph_from_kg_rows(kg_ds, sort: bool = True):
    """(nodes, edges) from a single-pass ``emit='kg'`` dataset (union rows
    tagged ``row_type`` 'm'/'t') — annotation runs ONCE for the whole
    graph build; the two aggregations read the shared materialized rows.
    """
    import pyarrow.compute as pc

    kg_ds = kg_ds.materialize()  # reused by both branches; at petabyte scale
    # this is a parquet checkpoint instead (build_graph_resumable)

    def only(row_type):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("row_type"), row_type))

        return f

    mentions = kg_ds.map_batches(only("m"), batch_format="pyarrow")

    def as_triples(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("row_type"), "t"))
        return pa.Table.from_arrays(
            [t.column("norm_key"), t.column("cat"), t.column("pred"),
             t.column("obj"), t.column("obj_cat")],
            names=["subj", "subj_cat", "pred", "obj", "obj_cat"],
        )

    triples = kg_ds.map_batches(as_triples, batch_format="pyarrow")
    return build_nodes(mentions, sort=sort), build_edges(triples, sort=sort)


def build_nodes(mentions_ds, sort: bool = True):
    """mentions → nodes(entity_id, canonical_form, cat, mention_count).

    Entity cardinality grows with the corpus, so the final reduce is a
    bucketed aggregate (ops/shuffle.py) rather than Dataset.aggregate."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate

    partials = mentions_ds.map_batches(mention_partials, batch_format="pyarrow")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cat", "norm_key"], as_index=False).agg(
            mention_count=("n", "sum"), canonical_form=("canonical_form", "min")
        )
        out["mention_count"] = out["mention_count"].astype("int64")
        return out

    agg = bucketed_aggregate(partials, ["cat", "norm_key"], reduce)
    nodes = agg.map_batches(add_entity_ids, batch_format="pyarrow").select_columns(
        ["entity_id", "canonical_form", "cat", "mention_count"]
    )
    return nodes.sort("entity_id") if sort else nodes


def build_edges(triples_ds, sort: bool = True):
    """triples → edges(subj_id, pred, obj_id, weight)."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate

    partials = triples_ds.map_batches(edge_partials, batch_format="pyarrow")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
            weight=("n", "sum")
        )
        out["weight"] = out["weight"].astype("int64")
        return out

    edges = bucketed_aggregate(partials, ["subj_id", "pred", "obj_id"], reduce)
    edges = edges.select_columns(["subj_id", "pred", "obj_id", "weight"])
    return edges.sort(["subj_id", "pred", "obj_id"]) if sort else edges
