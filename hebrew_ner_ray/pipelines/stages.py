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
              "eval", "groupings", "kg")


class AnnotateBatch:
    """Actor-pool annotation stage.

    ``emit`` selects the output relation (one of EMIT_MODES); the heavy
    state (gazetteer index) is constructed once per actor. Input batches
    are flattened span rows (doc_id, span_ord, kind, text, ...); non-text
    spans must already be filtered out.

    Per batch, annotation runs once per DISTINCT sentence text and the
    per-sentence payload is replicated to all occurrences with numpy
    repeat/tile (dedup-before-expensive-op — web corpora repeat
    boilerplate sentences heavily; with fully distinct texts the dedup
    costs one hash pass). A bounded per-actor LRU carries payloads across
    batches.
    """

    def __init__(self, emit: str = "single", synthetic_entities: bool = False):
        assert emit in EMIT_MODES, emit
        self.emit = emit
        # synthetic_entities: benchmark-corpus mode only (entity_mix) — the
        # פלוני<digits> rule must not reach real-text serving/eval paths
        self.tagger = SentenceTagger(synthetic_entities=synthetic_entities)
        self.index = self.tagger.index
        self._cache: dict[str, tuple[int, int]] = {}
        self._lib_parts: List[pa.Table] = []
        self._lib: pa.Table | None = None
        self._lib_len = 0
        self._lib_dirty = True

    # --- per-sentence payload: token-level (or row-level) columns, no keys ---

    def _compute_payload(self, text: str) -> dict:
        tokens = [t for sent in text_to_token_sentences(text) for t in sent]
        emit = self.emit
        if emit == "tokens":
            return {"token_str": [" ".join(tokens)], "n_tokens": [len(tokens)]}
        if emit == "hybrid":
            labels, _f, _m, _o = hybrid_tag_sentence(tokens, self.index)
            return {"word_idx": list(range(len(tokens))), "word": tokens, "label": labels}
        if emit == "eval":
            from hebrew_ner_ray.eval.metrics import sentence_counts

            pred, _f, _m, _o = hybrid_tag_sentence(tokens, self.index)
            gold = self.tagger.tag_single(tokens)
            ct, nt, np_, ng, nc = sentence_counts(pred, gold)
            return {"corr_tok": [ct], "n_tok": [nt], "n_pred": [np_],
                    "n_gold": [ng], "n_correct": [nc]}
        if emit == "groupings":
            from hebrew_ner_ray.morph.groupings import make_groupings

            forms, _labels, _orig = self.tagger.tag_morph(tokens)
            groups, words = make_groupings(forms)
            # the reference's pronoun-fallback branch can append a word
            # without opening a group (utils/ner.py:390-392), so pair up to
            # the shorter of the two — same truncation as zip()
            n = min(len(groups), len(words))
            return {"group_ord": list(range(n)), "grouped_word": words[:n],
                    "n_morphs": [len(g) for g in groups[:n]]}
        matches = self.tagger.match(tokens)
        if emit == "single":
            from hebrew_ner_ray.ner.tagger import token_single_labels

            return {"word_idx": list(range(len(tokens))), "word": tokens,
                    "label": token_single_labels(len(tokens), matches)}
        if emit == "multi":
            from hebrew_ner_ray.ner.tagger import token_multi_labels

            return {"word_idx": list(range(len(tokens))), "word": tokens,
                    "label": token_multi_labels(tokens, matches)}
        if emit == "morph":
            from hebrew_ner_ray.ner.tagger import (
                morph_labels_for_segmentation,
                sentence_segmentation,
            )

            segs = sentence_segmentation(tokens, matches)
            forms, labels, origins = morph_labels_for_segmentation(tokens, segs, matches)
            return {"morph_idx": list(range(len(forms))), "form": forms,
                    "label": labels, "origin": origins}
        if emit == "mentions":
            ms = mentions_from_sentence(tokens, matches)
            return {"mention_ord": list(range(len(ms))), "cat": [m.cat for m in ms],
                    "lo": [m.lo for m in ms], "hi": [m.hi for m in ms],
                    "surface": [m.surface for m in ms],
                    "core_surface": [m.core_surface for m in ms],
                    "norm_key": [m.norm_key for m in ms]}
        if emit == "triples":
            ms = mentions_from_sentence(tokens, matches)
            ts = triples_from_mentions(tokens, ms)
            return {"triple_ord": list(range(len(ts))), "subj": [t.subj for t in ts],
                    "pred": [t.pred for t in ts], "obj": [t.obj for t in ts],
                    "subj_cat": [t.subj_cat for t in ts], "obj_cat": [t.obj_cat for t in ts]}
        # kg: mentions + triples in ONE pass (union rows tagged by row_type) —
        # halves the expensive annotation stage for the full graph build
        ms = mentions_from_sentence(tokens, matches)
        ts = triples_from_mentions(tokens, ms)
        return {
            "row_type": ["m"] * len(ms) + ["t"] * len(ts),
            "cat": [m.cat for m in ms] + [t.subj_cat for t in ts],
            "norm_key": [m.norm_key for m in ms] + [t.subj for t in ts],
            "core_surface": [m.core_surface for m in ms] + [""] * len(ts),
            "pred": [""] * len(ms) + [t.pred for t in ts],
            "obj": [""] * len(ms) + [t.obj for t in ts],
            "obj_cat": [""] * len(ms) + [t.obj_cat for t in ts],
        }

    LIB_ROW_LIMIT = 2_000_000  # reset the payload library past this many
    # rows — bounds actor memory on fully-distinct corpora (cache hit rate
    # is then ~0 anyway and compute dominates, which is correct)

    def _library(self) -> pa.Table:
        # rebuilt lazily, and ONLY when a cached entry actually needs it —
        # on fully-distinct corpora every batch serves itself locally and
        # this concat never runs (it would be quadratic per batch otherwise)
        if self._lib_dirty:
            self._lib = pa.concat_tables(self._lib_parts).combine_chunks()
            self._lib_dirty = False
        return self._lib

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()

        import pandas as pd

        codes, uniques = pd.factorize(pd.array(texts), use_na_sentinel=False)

        if self._lib_len > self.LIB_ROW_LIMIT:
            self._cache.clear()
            self._lib_parts = []
            self._lib = None
            self._lib_len = 0
            self._lib_dirty = True

        # resolve each distinct text: cached (library offsets) or computed
        # fresh this batch (offsets past the library end). Fresh payloads
        # accumulate into per-column python buffers and become ONE Arrow
        # table per batch — a per-sentence Table.from_pydict costs ~1 ms,
        # which would dominate on fully-distinct corpora.
        cols = _EMIT_SCHEMAS[self.emit][2:]
        buffers: dict[str, list] = {name: [] for name, _ in cols}
        local_len = 0
        starts = np.empty(len(uniques), dtype=np.int64)
        lens = np.empty(len(uniques), dtype=np.int64)
        any_cached = False
        for u, text in enumerate(uniques):
            hit = self._cache.get(text)
            if hit is not None:
                starts[u], lens[u] = hit
                any_cached = True
                continue
            p = self._compute_payload(text)
            k = len(next(iter(p.values()))) if p else 0
            for name, _t in cols:
                buffers[name].extend(p[name])
            start = self._lib_len + local_len
            starts[u], lens[u] = start, k
            local_len += k
            self._cache[text] = (start, k)

        row_starts = starts[codes]
        row_lens = lens[codes]
        total = int(row_lens.sum())

        local = (
            pa.Table.from_pydict(
                {name: pa.array(buffers[name], type=t) for name, t in cols},
                schema=pa.schema(cols),
            )
            if local_len
            else None
        )

        # source view = [library rows 0.._lib_len) ++ local rows]; the local
        # part is appended to the library only AFTER the source is built so
        # a rebuild never double-counts this batch's rows
        if total == 0:
            source = None
        elif any_cached:
            source = (
                pa.concat_tables([self._library(), local]) if local is not None else self._library()
            )
        else:
            source = local
            row_starts = row_starts - self._lib_len

        if local is not None:
            self._lib_parts.append(local)
            self._lib_len += local_len
            self._lib_dirty = True

        if total == 0:
            return _empty_table(self.emit)

        # gather indices into the payload source (vectorized ragged arange)
        seg_starts = np.cumsum(row_lens) - row_lens
        gather = (
            np.repeat(row_starts, row_lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(seg_starts, row_lens)
        )
        row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), row_lens)

        payload = source.take(pa.array(gather))
        out = {
            "doc_id": batch.column("doc_id").take(pa.array(row_idx)),
            "span_ord": batch.column("span_ord").take(pa.array(row_idx)).cast(pa.int64()),
        }
        for name in payload.column_names:
            out[name] = payload.column(name)
        return pa.table(out)


class CrfAnnotateBatch:
    """Actor-pool CRF tagging stage (the model-shaped scorer, ST2/ST3/ST6).

    The CRFModel (feature-hashed emissions + transition matrix, ner/crf.py)
    is built once per actor; per batch, DISTINCT sentence texts are
    tokenized and decoded in ONE length-sorted padded Viterbi call (the
    reference's batchify collation, ncrf_main.py:197-288), then payloads
    replicate to row occurrences with the same vectorized ragged gather as
    AnnotateBatch. Per-sentence results are batch-composition-independent
    (mask-guarded padding), which is what lets the DuckDB oracle join
    per-template outputs.
    """

    CACHE_MAX = 200_000  # bound per-actor memory on distinct-text corpora
    # (same reason as AnnotateBatch.LIB_ROW_LIMIT: the actor is long-lived)

    def __init__(self, nbest: int | None = None):
        from hebrew_ner_ray.ner.crf import CRFModel

        self.model = CRFModel()
        self.nbest = nbest
        self._cache: dict[str, tuple] = {}  # text -> (words, labels) | nbest rows

    def _decode_fresh(self, fresh):
        tok_lists = [
            [t for sent in text_to_token_sentences(x) for t in sent] for x in fresh
        ]
        if self.nbest:
            scores, hyps = self.model.decode_nbest(tok_lists, self.nbest)
            for x, ss, hh in zip(fresh, scores, hyps):
                # one row per hypothesis: (rank, score_ppm, labels joined)
                self._cache[x] = (
                    list(range(len(hh))),
                    [int(round(s * 1_000_000)) for s in ss],
                    [" ".join(h) for h in hh],
                )
            return
        labelings = self.model.decode(tok_lists)
        for x, toks, labs in zip(fresh, tok_lists, labelings):
            self._cache[x] = (toks, labs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        import pandas as pd

        codes, uniques = pd.factorize(pd.array(texts), use_na_sentinel=False)
        if len(self._cache) > self.CACHE_MAX:
            self._cache.clear()
        fresh = [t for t in uniques if t not in self._cache]
        if fresh:
            self._decode_fresh(fresh)

        if self.nbest:
            return self._emit_nbest(batch, codes, uniques)

        words, labels, starts, lens = [], [], np.empty(len(uniques), np.int64), np.empty(len(uniques), np.int64)
        pos = 0
        for u, text in enumerate(uniques):
            toks, labs = self._cache[text]
            words.extend(toks)
            labels.extend(labs)
            starts[u], lens[u] = pos, len(toks)
            pos += len(toks)

        row_starts = starts[codes]
        row_lens = lens[codes]
        total = int(row_lens.sum())
        if total == 0:
            return pa.Table.from_pydict(
                {n: [] for n, _ in _EMIT_SCHEMAS["single"]},
                schema=pa.schema(_EMIT_SCHEMAS["single"]),
            )
        seg_starts = np.cumsum(row_lens) - row_lens
        gather = (
            np.repeat(row_starts, row_lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(seg_starts, row_lens)
        )
        row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), row_lens)
        word_arr = pa.array(words, type=pa.string()).take(pa.array(gather))
        label_arr = pa.array(labels, type=pa.string()).take(pa.array(gather))
        word_idx = gather - np.repeat(row_starts, row_lens)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(row_idx)),
                "span_ord": batch.column("span_ord").take(pa.array(row_idx)).cast(pa.int64()),
                "word_idx": pa.array(word_idx, type=pa.int64()),
                "word": word_arr,
                "label": label_arr,
            }
        )

    def _emit_nbest(self, batch: pa.Table, codes, uniques) -> pa.Table:
        """(doc_id, span_ord, rank, score_ppm, labels) — one row per
        hypothesis per span, the `# score` nbest contract as a relation."""
        ranks, ppms, labstrs = [], [], []
        starts = np.empty(len(uniques), np.int64)
        lens = np.empty(len(uniques), np.int64)
        pos = 0
        for u, text in enumerate(uniques):
            r, p, ls = self._cache[text]
            ranks.extend(r)
            ppms.extend(p)
            labstrs.extend(ls)
            starts[u], lens[u] = pos, len(r)
            pos += len(r)
        row_starts = starts[codes]
        row_lens = lens[codes]
        total = int(row_lens.sum())
        if total == 0:
            return pa.Table.from_pydict(
                {"doc_id": [], "span_ord": [], "rank": [], "score_ppm": [], "labels": []},
                schema=pa.schema([("doc_id", pa.string()), ("span_ord", pa.int64()),
                                  ("rank", pa.int64()), ("score_ppm", pa.int64()),
                                  ("labels", pa.string())]),
            )
        seg_starts = np.cumsum(row_lens) - row_lens
        gather = (np.repeat(row_starts, row_lens)
                  + np.arange(total, dtype=np.int64)
                  - np.repeat(seg_starts, row_lens))
        row_idx = np.repeat(np.arange(len(codes), dtype=np.int64), row_lens)
        g = pa.array(gather)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(row_idx)),
                "span_ord": batch.column("span_ord").take(pa.array(row_idx)).cast(pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()).take(g),
                "score_ppm": pa.array(ppms, type=pa.int64()).take(g),
                "labels": pa.array(labstrs, type=pa.string()).take(g),
            }
        )


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
    "kg": [("doc_id", pa.string()), ("span_ord", pa.int64()), ("row_type", pa.string()),
           ("cat", pa.string()), ("norm_key", pa.string()), ("core_surface", pa.string()),
           ("pred", pa.string()), ("obj", pa.string()), ("obj_cat", pa.string())],
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
    out = batch.append_column("entity_id", pa.array(ids))
    # pandas-origin input batches carry b'pandas' schema metadata, which
    # is unhashable downstream (Sort/shuffle unify_schemas) — strip it
    # here so the node table's blocks always hash cleanly
    return out.replace_schema_metadata(None) if out.schema.metadata else out
