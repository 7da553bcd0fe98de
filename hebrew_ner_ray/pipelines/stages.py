"""Ray Data stages for the KG pipeline.

Every stage is a ``map_batches`` transform over Arrow batches. The
annotation stage is a callable CLASS (actor pool): the gazetteer index and
compiled tokenizer patterns are built once per actor in ``__init__``
(reference analogue: model loading in the FastAPI lifespan,
ner_app.py:34-61), and ``__call__`` handles one Arrow batch.

Rows carry explicit keys (doc_id, span_ord, word_idx) end-to-end — the
reference's positional zips (ner_app.py:291, utils/yap_graph.py:89) become
key-carrying data (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from hebrew_ner_ray.kg.ids import entity_id
from hebrew_ner_ray.kg.mentions import mentions_from_sentence
from hebrew_ner_ray.kg.relations import triples_from_mentions
from hebrew_ner_ray.morph.align import hybrid_tag_sentence
from hebrew_ner_ray.ner.tagger import SentenceTagger
from hebrew_ner_ray.text.tokenizer import text_to_token_sentences

EMIT_MODES = ("tokens", "single", "multi", "morph", "hybrid", "mentions", "triples",
              "eval", "groupings")


class AnnotateBatch:
    """Actor-pool annotation stage.

    ``emit`` selects the output relation (one of EMIT_MODES); the heavy
    state (gazetteer index) is constructed once per actor. Input batches
    are flattened span rows (doc_id, span_ord, kind, text, ...); non-text
    spans must already be filtered out.
    """

    def __init__(self, emit: str = "single"):
        assert emit in EMIT_MODES, emit
        self.emit = emit
        self.tagger = SentenceTagger()
        self.index = self.tagger.index

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        span_ords = batch.column("span_ord").to_pylist()
        texts = batch.column("text").to_pylist()

        emit = self.emit
        cols: dict[str, List] = {}

        def add(**kw):
            for k, v in kw.items():
                cols.setdefault(k, []).append(v)

        for doc_id, span_ord, text in zip(doc_ids, span_ords, texts):
            tokens = [t for sent in text_to_token_sentences(text) for t in sent]
            if emit == "tokens":
                add(doc_id=doc_id, span_ord=span_ord, token_str=" ".join(tokens),
                    n_tokens=len(tokens))
                continue
            if emit == "hybrid":
                labels, _f, _m, _o = hybrid_tag_sentence(tokens, self.index)
                for w, (tok, lab) in enumerate(zip(tokens, labels)):
                    add(doc_id=doc_id, span_ord=span_ord, word_idx=w, word=tok, label=lab)
                continue
            if emit == "eval":
                # distributed P/R/F partials: hybrid predictions vs the
                # token_single "gold" (A8/A9 pattern — only counters move)
                from hebrew_ner_ray.eval.metrics import sentence_counts

                pred, _f, _m, _o = hybrid_tag_sentence(tokens, self.index)
                gold = self.tagger.tag_single(tokens)
                ct, nt, np_, ng, nc = sentence_counts(pred, gold)
                add(doc_id=doc_id, span_ord=span_ord, corr_tok=ct, n_tok=nt,
                    n_pred=np_, n_gold=ng, n_correct=nc)
                continue
            if emit == "groupings":
                from hebrew_ner_ray.morph.groupings import make_groupings

                forms, _labels, _orig = self.tagger.tag_morph(tokens)
                groups, words = make_groupings(forms)
                for k, (g, w) in enumerate(zip(groups, words)):
                    add(doc_id=doc_id, span_ord=span_ord, group_ord=k,
                        grouped_word=w, n_morphs=len(g))
                continue
            matches = self.tagger.match(tokens)
            if emit == "single":
                from hebrew_ner_ray.ner.tagger import token_single_labels

                for w, (tok, lab) in enumerate(zip(tokens, token_single_labels(len(tokens), matches))):
                    add(doc_id=doc_id, span_ord=span_ord, word_idx=w, word=tok, label=lab)
            elif emit == "multi":
                from hebrew_ner_ray.ner.tagger import token_multi_labels

                for w, (tok, lab) in enumerate(zip(tokens, token_multi_labels(tokens, matches))):
                    add(doc_id=doc_id, span_ord=span_ord, word_idx=w, word=tok, label=lab)
            elif emit == "morph":
                from hebrew_ner_ray.ner.tagger import morph_labels_for_segmentation, sentence_segmentation

                segs = sentence_segmentation(tokens, matches)
                forms, labels, origins = morph_labels_for_segmentation(tokens, segs, matches)
                for m, (form, lab, orig) in enumerate(zip(forms, labels, origins)):
                    add(doc_id=doc_id, span_ord=span_ord, morph_idx=m, form=form,
                        label=lab, origin=orig)
            elif emit == "mentions":
                for k, mn in enumerate(mentions_from_sentence(tokens, matches)):
                    add(doc_id=doc_id, span_ord=span_ord, mention_ord=k, cat=mn.cat,
                        lo=mn.lo, hi=mn.hi, surface=mn.surface,
                        core_surface=mn.core_surface, norm_key=mn.norm_key)
            elif emit == "triples":
                mentions = mentions_from_sentence(tokens, matches)
                for k, tr in enumerate(triples_from_mentions(tokens, mentions)):
                    add(doc_id=doc_id, span_ord=span_ord, triple_ord=k,
                        subj=tr.subj, pred=tr.pred, obj=tr.obj,
                        subj_cat=tr.subj_cat, obj_cat=tr.obj_cat)

        if not cols:
            return _empty_table(emit)
        table = pa.table(cols)
        return _cast_int64(table)


_INT_COLS = {"span_ord", "word_idx", "morph_idx", "origin", "mention_ord", "triple_ord",
             "lo", "hi", "n_tokens", "corr_tok", "n_tok", "n_pred", "n_gold", "n_correct",
             "group_ord", "n_morphs"}


def _cast_int64(table: pa.Table) -> pa.Table:
    arrays = []
    for name, col in zip(table.column_names, table.columns):
        if name in _INT_COLS:
            arrays.append(col.cast(pa.int64()))
        else:
            arrays.append(col)
    return pa.Table.from_arrays(arrays, names=table.column_names)


_EMIT_SCHEMAS = {
    "tokens": [("doc_id", pa.string()), ("span_ord", pa.int64()),
               ("token_str", pa.string()), ("n_tokens", pa.int64())],
    "single": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("word_idx", pa.int64()),
               ("word", pa.string()), ("label", pa.string())],
    "multi": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("word_idx", pa.int64()),
              ("word", pa.string()), ("label", pa.string())],
    "hybrid": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("word_idx", pa.int64()),
               ("word", pa.string()), ("label", pa.string())],
    "morph": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("morph_idx", pa.int64()),
              ("form", pa.string()), ("label", pa.string()), ("origin", pa.int64())],
    "mentions": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("mention_ord", pa.int64()),
                 ("cat", pa.string()), ("lo", pa.int64()), ("hi", pa.int64()),
                 ("surface", pa.string()), ("core_surface", pa.string()),
                 ("norm_key", pa.string())],
    "triples": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("triple_ord", pa.int64()),
                ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
                ("subj_cat", pa.string()), ("obj_cat", pa.string())],
    "eval": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("corr_tok", pa.int64()),
             ("n_tok", pa.int64()), ("n_pred", pa.int64()), ("n_gold", pa.int64()),
             ("n_correct", pa.int64())],
    "groupings": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("group_ord", pa.int64()),
                  ("grouped_word", pa.string()), ("n_morphs", pa.int64())],
}


def _empty_table(emit: str) -> pa.Table:
    return pa.Table.from_pydict({n: [] for n, _ in _EMIT_SCHEMAS[emit]},
                                schema=pa.schema(_EMIT_SCHEMAS[emit]))


def filter_text_spans(batch: pa.Table) -> pa.Table:
    """Vectorized predicate inside map_batches (cheaper than ds.filter(row_fn))."""
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch.column("kind"), "text"))


def mention_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for canonicalization: collapse this batch's
    mentions to one row per (cat, norm_key) with a local count and local
    min(core_surface). This is the skew shield: downstream shuffle volume
    is bounded by distinct-keys-per-batch, not by mention count, so a
    Zipf-head entity (SURVEY.md §4) costs one row per batch instead of
    millions of rows in one reducer."""
    import pyarrow.compute as pc

    grouped = batch.group_by(["cat", "norm_key"]).aggregate(
        [("core_surface", "min"), ("cat", "count")]
    )
    return grouped.rename_columns(["cat", "norm_key", "canonical_form", "n"])


def edge_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for edge weights keyed (subj_id, pred, obj_id)."""
    ids_s = np.asarray([entity_id(c, k) for c, k in
                        zip(batch.column("subj_cat").to_pylist(), batch.column("subj").to_pylist())],
                       dtype=np.int64)
    ids_o = np.asarray([entity_id(c, k) for c, k in
                        zip(batch.column("obj_cat").to_pylist(), batch.column("obj").to_pylist())],
                       dtype=np.int64)
    t = pa.table({
        "subj_id": pa.array(ids_s),
        "pred": batch.column("pred"),
        "obj_id": pa.array(ids_o),
    })
    grouped = t.group_by(["subj_id", "pred", "obj_id"]).aggregate([("pred", "count")])
    return grouped.rename_columns(["subj_id", "pred", "obj_id", "n"])


def add_entity_ids(batch: pa.Table) -> pa.Table:
    ids = np.asarray(
        [entity_id(c, k) for c, k in
         zip(batch.column("cat").to_pylist(), batch.column("norm_key").to_pylist())],
        dtype=np.int64,
    )
    return batch.append_column("entity_id", pa.array(ids))
