"""CRF scorer (ner/crf.py) — determinism, batch-collation independence,
BIOES structural validity, nbest contract, and the Ray stage."""

from __future__ import annotations

import random

import pytest

from hebrew_ner_ray.fixtures.pool import TEMPLATES
from hebrew_ner_ray.ner.crf import CRFModel, LABELS, N_LABELS
from hebrew_ner_ray.sources.bmes import nbest_lines
from hebrew_ner_ray.text.tokenizer import text_to_token_sentences


@pytest.fixture(scope="module")
def model():
    return CRFModel()


@pytest.fixture(scope="module")
def sents():
    return [text_to_token_sentences(t)[0] for t in TEMPLATES]


def _valid_bioes(seq):
    prev_p, prev_c = "O", ""
    for lab in seq:
        p, c = ("O", "") if lab == "O" else tuple(lab.split("-", 1))
        if p in ("I", "E") and not (prev_p in ("B", "I") and prev_c == c):
            return False
        if prev_p in ("B", "I") and not (p in ("I", "E") and prev_c == c):
            return False
        prev_p, prev_c = p, c
    return prev_p not in ("B", "I")


def test_deterministic_across_instances(model, sents):
    assert CRFModel().decode(sents) == model.decode(sents)


def test_batch_composition_independence(model, sents):
    """Per-sentence output must not depend on what else is in the batch
    (mask-guarded padding) — the property the template-join oracle relies
    on."""
    full = model.decode(sents)
    singles = [model.decode([s])[0] for s in sents]
    assert full == singles
    rng = random.Random(7)
    for _ in range(5):
        sub = rng.sample(range(len(sents)), 5)
        got = model.decode([sents[i] for i in sub])
        assert got == [full[i] for i in sub]


def test_structurally_valid_bioes(model, sents):
    for labs in model.decode(sents):
        assert _valid_bioes(labs), labs
    # fuzz: random token soup must still produce valid label sequences
    rng = random.Random(3)
    vocab = [w for s in sents for w in s]
    soup = [[rng.choice(vocab) for _ in range(rng.randint(1, 25))] for _ in range(50)]
    for labs in model.decode(soup):
        assert _valid_bioes(labs)


def test_nbest_contract(model, sents):
    scores, hyps = model.decode_nbest(sents, 3)
    best = model.decode(sents)
    for i, s in enumerate(sents):
        assert hyps[i][0] == best[i], "1-best of nbest must equal Viterbi"
        assert len(hyps[i]) == 3 and all(len(h) == len(s) for h in hyps[i])
        assert scores[i][0] >= scores[i][1] >= scores[i][2]
        assert abs(sum(scores[i]) - 1.0) < 1e-9  # softmax (model/crf.py:409-415)


def test_nbest_lines_reference_format(model, sents):
    """Round-trip against the reference writer's format
    (utils/data.py:399-442): `# s1 s2 …` header with 4-decimal scores,
    then one line per token `word lab1 lab2 …`, blank line between
    sentences."""
    scores, hyps = model.decode_nbest(sents[:4], 2)
    text = nbest_lines(sents[:4], hyps, scores)
    blocks = text.strip().split("\n\n")
    assert len(blocks) == 4
    for block, toks, hh, ss in zip(blocks, sents[:4], hyps, scores):
        lines = block.split("\n")
        assert lines[0] == ("# " + " ".join(format(x, ".4f") for x in ss)).strip()
        assert len(lines) == 1 + len(toks)
        for idy, line in enumerate(lines[1:]):
            parts = line.split(" ")
            assert parts[0] == toks[idy]
            assert parts[1:] == [h[idy] for h in hh]


def test_label_space():
    assert LABELS[0] == "O" and N_LABELS == 1 + 9 * 4


def test_nbest_batch_composition_independence(model, sents):
    """Same property as decode: the k-best output of a sentence must not
    depend on batch composition (the nbest oracle joins per-template)."""
    full_s, full_h = model.decode_nbest(sents, 3)
    for i in (0, 5, 15):
        ss, hh = model.decode_nbest([sents[i]], 3)
        assert hh[0] == full_h[i]
        assert all(abs(a - b) < 1e-12 for a, b in zip(ss[0], full_s[i]))


def test_crf_nbest_stage(ray_session):
    """ner_crf_nbest relation: one row per hypothesis per span, ppm scores
    summing to ~1e6, rank-0 labels equal to the 1-best decode."""
    from hebrew_ner_ray.pipelines.kg import annotated_crf, annotated_crf_nbest

    SF = "/root/testdata/sf0.001"
    nb = annotated_crf_nbest(SF).to_pandas()
    assert set(nb.columns) == {"doc_id", "span_ord", "rank", "score_ppm", "labels"}
    per_span = nb.groupby(["doc_id", "span_ord"])
    assert (per_span["rank"].count() == 3).all()
    sums = per_span["score_ppm"].sum()
    assert ((sums - 1_000_000).abs() <= 3).all()  # rounding slack
    best = annotated_crf(SF).to_pandas()
    joined = (
        best.sort_values(["doc_id", "span_ord", "word_idx"])
        .groupby(["doc_id", "span_ord"])["label"].agg(" ".join)
        .rename("labels_best").reset_index()
    )
    r0 = nb[nb["rank"] == 0].merge(joined, on=["doc_id", "span_ord"])
    assert (r0["labels"] == r0["labels_best"]).all()


def test_crf_stage_matches_direct(ray_session):
    """The distributed stage (actor pool, sf0.001) agrees row-for-row with
    a direct in-process decode of the same corpus."""
    import pandas as pd

    from hebrew_ner_ray.pipelines.kg import annotated_crf, text_spans

    SF = "/root/testdata/sf0.001"
    got = (
        annotated_crf(SF)
        .to_pandas()
        .sort_values(["doc_id", "span_ord", "word_idx"])
        .reset_index(drop=True)
    )
    spans = text_spans(SF).to_pandas()
    model = CRFModel()
    rows = []
    cache = {}
    for _, r in spans.iterrows():
        if r["text"] not in cache:
            toks = [t for s in text_to_token_sentences(r["text"]) for t in s]
            cache[r["text"]] = (toks, model.decode([toks])[0])
        toks, labs = cache[r["text"]]
        for w, (tok, lab) in enumerate(zip(toks, labs)):
            rows.append((r["doc_id"], r["span_ord"], w, tok, lab))
    want = (
        pd.DataFrame(rows, columns=["doc_id", "span_ord", "word_idx", "word", "label"])
        .astype({"span_ord": "int64", "word_idx": "int64"})
        .sort_values(["doc_id", "span_ord", "word_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_nbest_empty_sentence_batch_independent(model):
    """A zero-token sentence gets the canonical ([1.0], [[]]) nbest result
    regardless of batch composition."""
    solo = model.decode_nbest([[]], 3)
    mixed = model.decode_nbest([["שלום"], []], 3)
    assert solo[0][0] == [1.0] and solo[1][0] == [[]]
    assert mixed[0][1] == solo[0][0] and mixed[1][1] == solo[1][0]
