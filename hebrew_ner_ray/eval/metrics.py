"""Distributed NER evaluation — the reference's span-set P/R/F
(utils/ner.py:450-536, utils/metric.py:15-63) as a partial+final
aggregate: per-sentence counts computed inside ``map_batches`` (no labels
ever collected to the driver), finalized with ``Dataset.sum``.

This is the A8/A9 pattern from SURVEY.md §2.5: the only data crossing the
cluster is five int64 counters per block.
"""

from __future__ import annotations

from typing import List, Sequence

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
    """Sum a dataset of per-sentence partial-count rows and finalize."""
    totals = {
        c: partials_ds.sum(c)
        for c in ("corr_tok", "n_tok", "n_pred", "n_gold", "n_correct")
    }
    return finalize(totals)
