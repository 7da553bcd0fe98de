"""Dataset-level pred↔gold evaluation join — the reference's J3 shape
(utils/eval/conf_interval.py:20 ``pd.merge`` of prediction and gold
DataFrames on sentence/word keys), expressed as a real ``Dataset.join``:

    pred (gazetteer single labels)  ⋈  gold (CRF labels)
        on (doc_id, span_ord, word_idx)
    → per-sentence span counts (groupby + map_groups)
    → five int64 counters summed → P/R/F row

This is the one reference join shape round 1 lacked: two corpus-sized
datasets hash-joined on explicit keys (no broadcast — both sides scale
with the corpus), then the standard partial+final metric aggregate
(eval/metrics.py). At 10^12 docs the join is the bottleneck-by-design
stage: `num_partitions` scales with the cluster and each partition holds
only its key range.
"""

from __future__ import annotations

import pandas as pd

_COUNT_COLS = {"corr_tok": "int64", "n_tok": "int64", "n_pred": "int64",
               "n_gold": "int64", "n_correct": "int64"}


def _sentence_counts_group(g: pd.DataFrame) -> pd.DataFrame:
    from hebrew_ner_ray.eval.metrics import sentence_counts
    from hebrew_ner_ray.ops.shuffle import typed_empty

    if g.empty:
        return typed_empty(_COUNT_COLS)
    g = g.sort_values("word_idx")
    ct, nt, np_, ng, nc = sentence_counts(
        list(g["label"]), list(g["label_gold"])
    )
    return pd.DataFrame({"corr_tok": [ct], "n_tok": [nt], "n_pred": [np_],
                         "n_gold": [ng], "n_correct": [nc]}).astype(_COUNT_COLS)


def eval_vs_gold(sf_dir: str, num_partitions: int | None = None):
    """P/R/F of the gazetteer single tagger against CRF gold labels, via a
    distributed inner join on (doc_id, span_ord, word_idx)."""
    import ray

    from hebrew_ner_ray.eval.metrics import evaluate_datasets
    from hebrew_ner_ray.pipelines.kg import annotated, annotated_crf

    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))

    pred = annotated(sf_dir, "single")
    gold = annotated_crf(sf_dir).drop_columns(["word"])
    joined = pred.join(
        gold,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id", "span_ord", "word_idx"),
        right_suffix="_gold",
    )
    from hebrew_ner_ray.ops.shuffle import grouped_exchange

    partials = grouped_exchange(joined, ["doc_id", "span_ord"], _sentence_counts_group,
                                n_partitions=num_partitions)
    return evaluate_datasets(partials)


GOLD_BMES_FIXTURE = "gold_eval.bmes"


def gold_bmes_path() -> str:
    """The committed gold BMES fixture — the engine's analogue of the
    reference's utils_eval_files/ conformance corpus: one sentence per
    fixture template, labels = the CRF gold sequence."""
    import os

    import hebrew_ner_ray.fixtures as fx

    return os.path.join(os.path.dirname(fx.__file__), "data", GOLD_BMES_FIXTURE)


def eval_bmes_files(sf_dir: str, out_dir: str | None = None,
                    num_partitions: int | None = None):
    """The reference's FILE-based evaluation flow (utils/ner.py:32-55
    write_decoded_results → utils/eval/eval_single.py:6-16 read + score)
    at corpus scale: tag the corpus, write partitioned BMES files, read
    them back with the S1–S3 reader, score every sentence against the
    committed gold BMES fixture, and sum to one P/R/F row.

    Scale shape: the write is one keyed exchange (one file per
    partition, content-hash named, atomic rename); the read streams the
    files; the gold side is a tiny broadcast (ray.put once); per-sentence
    counts flow through the standard partial+final metric aggregate.
    Matches eval_vs_gold's oracle exactly — the BMES roundtrip must be
    lossless and the file gold IS the CRF gold per template."""
    import tempfile

    import ray

    from hebrew_ner_ray.eval.metrics import evaluate_datasets, sentence_counts
    from hebrew_ner_ray.ops.shuffle import grouped_exchange, typed_empty
    from hebrew_ner_ray.pipelines.kg import annotated
    from hebrew_ner_ray.sources.bmes import read_bmes, write_bmes_partitioned

    pred = annotated(sf_dir, "single")
    out_dir = out_dir or tempfile.mkdtemp(prefix="bmes_eval_")
    manifest = write_bmes_partitioned(pred, out_dir,
                                      n_partitions=num_partitions).materialize()
    paths = sorted(manifest.to_pandas()["path"])  # one row per partition

    gold = read_bmes([gold_bmes_path()]).to_pandas()  # one sentence per template
    gold_map = {
        " ".join(grp.sort_values("word_idx")["word"]): list(grp.sort_values("word_idx")["label"])
        for _, grp in gold.groupby("sent_id")
    }
    gold_ref = ray.put(gold_map)

    def score_sentence(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_COUNT_COLS)
        g = g.sort_values("word_idx")
        labels_gold = ray.get(gold_ref)[" ".join(g["word"])]
        ct, nt, np_, ng, nc = sentence_counts(list(g["label"]), labels_gold)
        return pd.DataFrame({"corr_tok": [ct], "n_tok": [nt], "n_pred": [np_],
                             "n_gold": [ng], "n_correct": [nc]}).astype(_COUNT_COLS)

    rows = read_bmes(paths)
    partials = grouped_exchange(rows, ["path", "sent_id"], score_sentence,
                                n_partitions=num_partitions)
    return evaluate_datasets(partials)
