"""Evaluation utilities: span-set counts, bootstrap CI, morpheme composite,
splitting-based merge, lattice TSV round-trip."""

import pandas as pd
import pytest

from hebrew_ner_ray.eval.metrics import (
    bootstrap_ci,
    evaluate_morpheme_composite,
    finalize,
    normal_approx_interval,
    sentence_counts,
)
from hebrew_ner_ray.morph.align import merge_labels_by_splitting
from hebrew_ner_ray.morph.lattice import LatticeEdge
from hebrew_ner_ray.morph.serialize import lattice_to_tsv, tsv_to_lattice


def test_sentence_counts_exact_match_semantics():
    pred = ["O", "B-ORG", "E-ORG", "O", "S-GPE"]
    gold = ["O", "B-ORG", "E-ORG", "S-PER", "S-GPE"]
    ct, nt, np_, ng, nc = sentence_counts(pred, gold)
    assert (ct, nt) == (4, 5)
    assert (np_, ng, nc) == (2, 3, 2)


def test_sentence_counts_multi_tok_collapse():
    pred = ["O^S-GPE", "O"]
    gold = ["O^S-GPE", "O"]
    ct, nt, np_, ng, nc = sentence_counts(pred, gold, multi_tok=True)
    assert (np_, ng, nc) == (1, 1, 1)


def test_finalize_ppm():
    df = finalize({"corr_tok": 90, "n_tok": 100, "n_pred": 8, "n_gold": 10, "n_correct": 8})
    assert df["precision_ppm"].iloc[0] == 1_000_000
    assert df["recall_ppm"].iloc[0] == 800_000
    assert df["f1_ppm"].iloc[0] == int(2 * 1.0 * 0.8 / 1.8 * 1_000_000)


def test_bootstrap_ci_bounds():
    partials = pd.DataFrame(
        {"n_pred": [2, 1, 3, 1], "n_gold": [2, 2, 3, 1], "n_correct": [2, 1, 2, 1]}
    )
    lo, hi = bootstrap_ci(partials, n_boot=200)
    assert 0.0 <= lo <= hi <= 1.0
    # deterministic for a fixed seed
    assert (lo, hi) == bootstrap_ci(partials, n_boot=200)


def test_normal_approx_interval():
    assert normal_approx_interval(1.0, 100) == 0.0
    assert 0.0 < normal_approx_interval(0.8, 100) < 0.1


def test_merge_labels_by_splitting():
    words = ["ב", "בית", "ספר"]
    labels = ["O", "B-ORG", "E-ORG"]
    merged = merge_labels_by_splitting(words, labels, [2, 1], validate=True)
    assert merged == [("ב^בית", "B-ORG"), ("ספר", "E-ORG")]
    raw = merge_labels_by_splitting(words, labels, [2, 1], validate=False)
    assert raw == [("ב^בית", "O^B-ORG"), ("ספר", "E-ORG")]


def test_evaluate_morpheme_composite():
    pred = [["O", "B-ORG", "E-ORG"]]
    gold = [["O", "B-ORG", "E-ORG"]]
    m2m, m2s = evaluate_morpheme_composite(pred, gold, [[1, 2]])
    assert m2m[4] == m2m[2] == m2m[3]  # all spans correct
    assert m2s[1] == 2  # two merged tokens


def test_lattice_tsv_roundtrip():
    sents = [
        [LatticeEdge(0, 1, "ב", 1), LatticeEdge(1, 2, "בית", 1)],
        [LatticeEdge(0, 1, "גן", 1)],
    ]
    text = lattice_to_tsv(sents)
    back = tsv_to_lattice(text)
    assert back == sents


def test_evaluate_datasets_empty_is_zero_metrics(ray_session):
    """ADVICE r2: Dataset.sum returns None on an empty dataset — an empty
    or fully-filtered corpus must evaluate to zero counts, not TypeError."""
    import ray.data

    from hebrew_ner_ray.eval.metrics import evaluate_datasets

    empty = ray.data.from_pandas(
        pd.DataFrame({c: pd.Series(dtype="int64")
                      for c in ("corr_tok", "n_tok", "n_pred", "n_gold", "n_correct")})
    )
    out = evaluate_datasets(empty)
    assert int(out["n_tok"].iloc[0]) == 0
    assert int(out["f1_ppm"].iloc[0]) == 0
