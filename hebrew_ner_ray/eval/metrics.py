"""Distributed NER evaluation — the reference's span-set P/R/F
(utils/ner.py:450-536, utils/metric.py:15-63) as a partial+final
aggregate: per-sentence counts computed inside ``map_batches`` (no labels
ever collected to the driver), finalized with ``Dataset.sum``.

This is the A8/A9 pattern from SURVEY.md §2.5: the only data crossing the
cluster is five int64 counters per block.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from hebrew_ner_ray.labels.algebra import make_spans, validate_multi_to_single


def sentence_counts(pred: Sequence[str], gold: Sequence[str], multi_tok: bool = False):
    """(corr_tok, n_tok, n_pred, n_gold, n_correct) for one sentence —
    exact reference semantics incl. span-key intersection."""
    corr_tok = sum(p == g for p, g in zip(pred, gold))
    if multi_tok:
        pred = [validate_multi_to_single(p)[0] for p in pred]
        gold = [validate_multi_to_single(g)[0] for g in gold]
    ps, gs = make_spans(pred), make_spans(gold)
    n_correct = len(set(ps).intersection(gs))
    return corr_tok, len(pred), len(ps), len(gs), n_correct


def finalize(totals: dict) -> pd.DataFrame:
    """Corpus P/R/F from summed partials, reported in exact ppm ints."""
    corr_tok, n_tok = totals["corr_tok"], totals["n_tok"]
    n_pred, n_gold, n_corr = totals["n_pred"], totals["n_gold"], totals["n_correct"]
    precision = n_corr / n_pred if n_pred else 0.0
    recall = n_corr / n_gold if n_gold else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0
    return pd.DataFrame(
        {
            "n_tok": [int(n_tok)],
            "corr_tok": [int(corr_tok)],
            "n_pred_spans": [int(n_pred)],
            "n_gold_spans": [int(n_gold)],
            "n_correct_spans": [int(n_corr)],
            "precision_ppm": [int(precision * 1_000_000)],
            "recall_ppm": [int(recall * 1_000_000)],
            "f1_ppm": [int(f1 * 1_000_000)],
        }
    )


def evaluate_datasets(partials_ds) -> pd.DataFrame:
    """Sum a dataset of per-sentence partial-count rows and finalize.

    The partials are materialized FIRST: ``Dataset.sum`` is an action that
    re-executes the upstream plan, so five per-column sums over the lazy
    pipeline would run the whole annotation/join chain five times. The
    materialized counter rows are tiny (five int64s per sentence)."""
    cols = ("corr_tok", "n_tok", "n_pred", "n_gold", "n_correct")
    m = partials_ds.materialize()
    if m.count() == 0:
        # Dataset.sum returns None on an empty dataset — an empty or
        # fully-filtered corpus evaluates to zero counts, not a TypeError
        return finalize({c: 0 for c in cols})
    sums = m.sum(on=list(cols))  # ONE action for all five totals
    totals = {c: sums[f"sum({c})"] for c in cols}
    return finalize(totals)


def _f1(n_pred: int, n_gold: int, n_corr: int) -> float:
    p = n_corr / n_pred if n_pred else 0.0
    r = n_corr / n_gold if n_gold else 0.0
    return 2 * p * r / (p + r) if (p + r) else 0.0


def bootstrap_ci(partials: pd.DataFrame, n_boot: int = 1000, alpha: float = 0.05,
                 seed: int = 42):
    """Percentile bootstrap CI over per-sentence partial counts —
    reference `bootstrap` (utils/eval/conf_interval.py:17-31): resample
    sentences with replacement, recompute F1, take the (α/2, 1-α/2)
    percentiles. Driver-side by design (eval corpora are small); the
    per-sentence counts themselves come from the distributed pass.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(partials)
    cols = partials[["n_pred", "n_gold", "n_correct"]].to_numpy()
    f1s = np.empty(n_boot)
    for b in range(n_boot):
        idx = rng.integers(0, n, n)
        s = cols[idx].sum(axis=0)
        f1s[b] = _f1(int(s[0]), int(s[1]), int(s[2]))
    lo, hi = np.percentile(f1s, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return float(lo), float(hi)


def normal_approx_interval(f1: float, n_gold: int, alpha_z: float = 1.96):
    """Normal-approximation CI half-width for an F-score — reference
    `norm_approx_int` (utils/eval/conf_interval.py:34-45)."""
    import math

    return alpha_z * math.sqrt(f1 * (1 - f1) / max(n_gold, 1))


def evaluate_morpheme_composite(morph_pred, morph_gold, splitting):
    """A10 (utils/ner.py:539-553): morph-vs-morph plus merged-to-single
    metrics, given per-sentence morpheme label lists and the per-sentence
    morphemes-per-token splitting."""
    from hebrew_ner_ray.labels.algebra import MULTI_DELIM

    m2m = sentence_counts([l for s in morph_pred for l in s],
                          [l for s in morph_gold for l in s])

    def merge(labels_sent, split_sent):
        out, pos = [], 0
        for k in split_sent:
            joined = MULTI_DELIM.join(labels_sent[pos : pos + k])
            out.append(validate_multi_to_single(joined)[0])
            pos += k
        return out

    merged_pred = [l for mp, sp in zip(morph_pred, splitting) for l in merge(mp, sp)]
    merged_gold = [l for mg, sp in zip(morph_gold, splitting) for l in merge(mg, sp)]
    m2s = sentence_counts(merged_pred, merged_gold)
    return m2m, m2s
