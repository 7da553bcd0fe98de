"""Numpy linear-emission + CRF-transition sequence model (ST3/ST6).

A real model-shaped scorer standing in for the reference's NCRF++ stack
(model/seqlabel.py:53-80 ``SeqLabel.forward``/``decode_nbest``,
model/crf.py:104-250 ``_viterbi_decode`` and :267-417
``_viterbi_decode_nbest``): feature-hashed linear emissions, a learned-
shape transition matrix with BIOES structural constraints, batched
length-sorted padding/collation (the reference's batchify semantics,
ncrf_main.py:197-288), exact batched Viterbi decoding, and k-best
decoding whose per-sentence scores are the softmax of the k final path
scores (model/crf.py:409-415) — the numbers written into the ``# s1 s2``
nbest header (utils/data.py:399-442).

Weights are generated deterministically (md5-seeded numpy RNG), so every
decode is bit-reproducible across actors and sessions — which is what
lets the DuckDB oracle carry per-template CRF outputs as join gold.
No torch: the environment has none, and for inference-sized tag sets a
numpy Viterbi is faster than tensor dispatch anyway.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from hebrew_ner_ray.kg.ids import stable_id

CATEGORIES = ("PER", "ORG", "LOC", "GPE", "FAC", "WOA", "EVE", "DUC", "ANG")
LABELS: Tuple[str, ...] = ("O",) + tuple(
    f"{p}-{c}" for c in CATEGORIES for p in "BIES"
)
N_LABELS = len(LABELS)  # 37
START = N_LABELS  # NCRF++ appends START/STOP to the tag set (crf.py:14-16)
STOP = N_LABELS + 1
N_TAGS = N_LABELS + 2

HASH_DIM = 4096
NEG = -10_000.0  # structural -inf (finite so nbest softmax stays defined)
GAZ_BIAS = 3.0  # emission bonus on the gazetteer-informed label — sized so
# hash-feature noise overrides it on ~20% of tokens (the CRF genuinely
# arbitrates; bias 8 makes it degenerate into the gazetteer and the
# eval_vs_gold join collapses to P=R=F=1)


def _seeded(name: str, *shape: int, scale: float = 1.0) -> np.ndarray:
    rng = np.random.default_rng(stable_id(f"crf|{name}") % 2**32)
    return rng.standard_normal(shape) * scale


def _label_parts(i: int) -> Tuple[str, str]:
    lab = LABELS[i]
    if lab == "O":
        return "O", ""
    p, c = lab.split("-", 1)
    return p, c


def build_transitions() -> np.ndarray:
    """transitions[from, to] — seeded noise + BIOES validity mask:
    I-x/E-x may only follow B-x/I-x of the same category; B-x/I-x must
    continue their span (only I-x/E-x of the same category may follow,
    and they cannot precede STOP); START emits only O/B-x/S-x."""
    t = _seeded("transitions", N_TAGS, N_TAGS, scale=0.1)
    for i in range(N_TAGS):
        pi, ci = _label_parts(i) if i < N_LABELS else (("START", "") if i == START else ("STOP", ""))
        for j in range(N_TAGS):
            pj, cj = _label_parts(j) if j < N_LABELS else (("START", "") if j == START else ("STOP", ""))
            ok = True
            if pj == "START" or pi == "STOP":
                ok = False
            elif pj in ("I", "E"):
                ok = pi in ("B", "I") and ci == cj
            elif pi in ("B", "I"):
                ok = pj in ("I", "E") and ci == cj
            if not ok and not (pi == "START" and pj in ("O", "B", "S")):
                t[i, j] = NEG
    return t


class CRFModel:
    """Deterministic feature-hashed emissions + CRF Viterbi/nbest.

    Per-instance state: the three hashed weight tables, the transition
    matrix, and a word→emission-row cache (the Alphabet analogue, ST4).
    Build once per actor (__init__), decode per batch (__call__ path).
    """

    EMIS_CACHE_MAX = 262_144  # bounded like gazetteer._CAND_CACHE — the
    # actor is long-lived and distinct-vocabulary corpora would otherwise
    # grow the cache without limit

    def __init__(self, use_gazetteer: bool = True):
        self.W_word = _seeded("w_word", HASH_DIM, N_LABELS, scale=1.0)
        self.W_pre = _seeded("w_pre", HASH_DIM, N_LABELS, scale=0.5)
        self.W_suf = _seeded("w_suf", HASH_DIM, N_LABELS, scale=0.5)
        self.transitions = build_transitions()
        self._emis_cache: dict[str, np.ndarray] = {}
        self.tagger = None
        if use_gazetteer:
            from hebrew_ner_ray.ner.tagger import SentenceTagger

            self.tagger = SentenceTagger()

    # --- emissions ---

    def _word_emission(self, word: str) -> np.ndarray:
        e = self._emis_cache.get(word)
        if e is None:
            e = (
                self.W_word[stable_id(f"w|{word}") % HASH_DIM]
                + self.W_pre[stable_id(f"p|{word[:2]}") % HASH_DIM]
                + self.W_suf[stable_id(f"s|{word[-2:]}") % HASH_DIM]
            )
            if len(self._emis_cache) >= self.EMIS_CACHE_MAX:
                # clear-on-full (same policy as CrfAnnotateBatch): keeps
                # amortization for the CURRENT working set instead of
                # permanently pinning the first-seen vocabulary
                self._emis_cache.clear()
            self._emis_cache[word] = e
        return e

    def emissions(self, tokens: Sequence[str]) -> np.ndarray:
        """(len, N_TAGS) — word-hash features + gazetteer-context bias;
        START/STOP columns are NEG (never emitted), as in NCRF++."""
        n = len(tokens)
        out = np.full((n, N_TAGS), NEG, dtype=np.float64)
        if n == 0:  # empty sentence: (0, N_TAGS) — callers slice to []
            return out
        out[:, :N_LABELS] = [self._word_emission(w) for w in tokens]
        if self.tagger is not None:
            from hebrew_ner_ray.ner.tagger import token_single_labels

            idx = {lab: k for k, lab in enumerate(LABELS)}
            for w, lab in enumerate(token_single_labels(n, self.tagger.match(tokens))):
                out[w, idx[lab]] += GAZ_BIAS
        return out

    # --- batched decode with length-sorted padding (ST6) ---

    def _collate(self, sentences: Sequence[Sequence[str]]):
        """Sort by length desc (stable), pad emissions to (B, T, N_TAGS),
        build the mask — the reference's batchify_sequence_labeling_
        with_label shape. Returns (emit, mask, recover_order)."""
        order = sorted(range(len(sentences)), key=lambda i: -len(sentences[i]))
        # sorted row k holds original sentence order[k]; writing results back
        # through `order` restores input order (the batchify word_recover)
        recover = np.asarray(order, dtype=np.int64)
        lens = np.asarray([len(sentences[i]) for i in order], dtype=np.int64)
        b, t_max = len(order), int(lens.max()) if len(lens) else 0
        emit = np.full((b, t_max, N_TAGS), 0.0)
        mask = np.zeros((b, t_max), dtype=bool)
        for k, i in enumerate(order):
            e = self.emissions(sentences[i])
            emit[k, : len(e)] = e
            mask[k, : len(e)] = True
        return emit, mask, lens, recover

    def decode(self, sentences: Sequence[Sequence[str]]) -> List[List[str]]:
        """Batched exact Viterbi (reference _viterbi_decode semantics)."""
        if not sentences:
            return []
        emit, mask, lens, recover = self._collate(sentences)
        b, t_max, _ = emit.shape
        if t_max == 0:
            return [[] for _ in sentences]
        trans = self.transitions
        # partition[b, tag]: best score ending in tag; init from START
        partition = trans[START, :N_TAGS] + emit[:, 0]
        back = np.zeros((t_max, b, N_TAGS), dtype=np.int64)
        for t in range(1, t_max):
            cur = partition[:, :, None] + trans[None, :, :]  # (b, from, to)
            bp = np.argmax(cur, axis=1)
            new = np.take_along_axis(cur, bp[:, None, :], axis=1)[:, 0, :] + emit[:, t]
            live = mask[:, t]
            partition = np.where(live[:, None], new, partition)
            back[t] = np.where(live[:, None], bp, np.arange(N_TAGS)[None, :])
        # close to STOP at each sentence's true last position
        end_tag = np.argmax(partition + trans[None, :, STOP], axis=1)
        paths = np.zeros((b, t_max), dtype=np.int64)
        ptr = end_tag
        for t in range(t_max - 1, -1, -1):
            paths[:, t] = ptr
            if t:
                ptr = back[t][np.arange(b), ptr]
        out: List[List[str]] = [None] * len(sentences)  # type: ignore[list-item]
        for k in range(b):
            out[int(recover[k])] = [LABELS[j] for j in paths[k, : lens[k]]]
        return out

    def decode_nbest(
        self, sentences: Sequence[Sequence[str]], nbest: int
    ) -> Tuple[List[List[float]], List[List[List[str]]]]:
        """k-best Viterbi (reference _viterbi_decode_nbest semantics):
        returns (scores, labelings); scores are the softmax of the k final
        path scores per sentence (model/crf.py:409-415), labelings[i][k]
        is the k-th label sequence. Exact for k ≤ distinct paths; scores
        are monotonically non-increasing."""
        if not sentences:
            return [], []
        emit, mask, lens, recover = self._collate(sentences)
        b, t_max, _ = emit.shape
        if t_max == 0:
            return [[1.0] for _ in sentences], [[[]] for _ in sentences]
        trans = self.transitions
        k = nbest
        # partition[b, tag, k]
        partition = np.full((b, N_TAGS, k), NEG * 4, dtype=np.float64)
        partition[:, :, 0] = trans[START, :N_TAGS] + emit[:, 0]
        back = np.zeros((t_max, b, N_TAGS, k), dtype=np.int64)  # from-index in tag*k space
        for t in range(1, t_max):
            # cur[b, from*k, to]
            cur = (partition.reshape(b, N_TAGS * k, 1)
                   + np.repeat(trans[:, None, :], k, axis=1).reshape(1, N_TAGS * k, N_TAGS))
            top = np.argsort(-cur, axis=1, kind="stable")[:, :k, :]  # (b, k, to)
            scores_top = np.take_along_axis(cur, top, axis=1)  # (b, k, to)
            new_part = (scores_top + emit[:, t][:, None, :]).transpose(0, 2, 1)  # (b, to, k)
            new_back = top.transpose(0, 2, 1)  # (b, to, k)
            live = mask[:, t]
            partition = np.where(live[:, None, None], new_part, partition)
            keep = (np.arange(N_TAGS)[None, :, None] * k
                    + np.arange(k)[None, None, :]) * np.ones((b, 1, 1), dtype=np.int64)
            back[t] = np.where(live[:, None, None], new_back, keep)
        finals = partition + trans[None, :, STOP, None]  # (b, tag, k)
        flat = finals.reshape(b, N_TAGS * k)
        top_end = np.argsort(-flat, axis=1, kind="stable")[:, :k]  # (b, k)
        end_scores = np.take_along_axis(flat, top_end, axis=1)
        # softmax over the k best final scores (reference path_score)
        m = end_scores.max(axis=1, keepdims=True)
        p = np.exp(end_scores - m)
        probs = p / p.sum(axis=1, keepdims=True)

        paths = np.zeros((b, k, t_max), dtype=np.int64)
        ptr = top_end  # indices in tag*k space
        for t in range(t_max - 1, -1, -1):
            paths[:, :, t] = ptr // k
            if t:
                ptr = np.take_along_axis(back[t].reshape(b, N_TAGS * k), ptr, axis=1)
        scores_out: List[List[float]] = [None] * len(sentences)  # type: ignore[list-item]
        labelings: List[List[List[str]]] = [None] * len(sentences)  # type: ignore[list-item]
        for kk in range(b):
            i = int(recover[kk])
            n = int(lens[kk])
            if n == 0:
                # canonical empty-sentence result, independent of batch
                # composition (matches the all-empty shortcut above) — a
                # zero-token span must not get k garbage-score hypotheses
                # just because it shared a batch with real sentences
                scores_out[i] = [1.0]
                labelings[i] = [[]]
                continue
            scores_out[i] = [float(round(s, 10)) for s in probs[kk]]
            labelings[i] = [[LABELS[j] for j in paths[kk, h, :n]] for h in range(k)]
        return scores_out, labelings
