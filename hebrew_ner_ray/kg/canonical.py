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


def build_nodes(mentions_ds, sort: bool = True):
    """mentions → nodes(entity_id, canonical_form, cat, mention_count)."""
    from ray.data.aggregate import Min, Sum

    partials = mentions_ds.map_batches(mention_partials, batch_format="pyarrow")
    agg = partials.groupby(["cat", "norm_key"]).aggregate(
        Sum("n", alias_name="mention_count"),
        Min("canonical_form", alias_name="canonical_form"),
    )
    nodes = agg.map_batches(add_entity_ids, batch_format="pyarrow").select_columns(
        ["entity_id", "canonical_form", "cat", "mention_count"]
    )
    return nodes.sort("entity_id") if sort else nodes


def build_edges(triples_ds, sort: bool = True):
    """triples → edges(subj_id, pred, obj_id, weight)."""
    from ray.data.aggregate import Sum

    partials = triples_ds.map_batches(edge_partials, batch_format="pyarrow")
    agg = partials.groupby(["subj_id", "pred", "obj_id"]).aggregate(
        Sum("n", alias_name="weight")
    )
    edges = agg.select_columns(["subj_id", "pred", "obj_id", "weight"])
    return edges.sort(["subj_id", "pred", "obj_id"]) if sort else edges
