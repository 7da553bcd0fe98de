"""BMES file source/sink — the reference's line-oriented fixture format
(word SPACE label; blank line = sentence boundary; '#' comments), mapped
to Ray Data.

Files are parsed WHOLE-FILE inside the read tasks (read_binary_files with
paths) because sentence boundaries are blank lines — splitting a file
across blocks would cut sentences (SURVEY.md §2.1 S2: boundary-aware scan
per file). One task per file is also the right parallel grain: a corpus is
many files.

Reference semantics: utils/ner.py:32-115 (read_file,
read_file_to_sentences, read_file_to_sentences_df,
read_token_origins_to_df — incl. the 1-based→0-based origin shift and the
rsplit-once word/label split), utils/data.py:340-366 (decode writer).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa


def parse_bmes_text(content: str, comment_delim: str = "#", word_label_delim: str = " "):
    """BMES text → (sent_id, word_idx, word, label) tuples.

    Mirrors read_file_to_sentences_df (utils/ner.py:57-83): running
    sentence counter, per-sentence word index, rsplit once so words may
    contain the delimiter.
    """
    rows = []
    sent, word_idx = 0, 0
    for line in content.splitlines():
        if line.startswith(comment_delim):
            continue
        line = line.strip()
        if line:
            word, label = line.rsplit(word_label_delim, maxsplit=1)
            rows.append((sent, word_idx, word, label))
            word_idx += 1
        else:
            sent += 1
            word_idx = 0
    return rows


def parse_bmes_features_text(content: str, comment_delim: str = "#"):
    """Feature-columned BMES text → (sent_id, word_idx, word, feats, label)
    with feats a list of the middle-column VALUES.

    Reference semantics (utils/functions.py:115-121 ``read_instance`` +
    utils/data.py:206-232 ``initial_feature_alphabets``): columns between
    the word and the label are features; the value is
    ``col.split(']', 1)[-1]`` — so ``[POS]NN`` → ``NN``, a further ``]``
    stays in the value, and a column WITHOUT a bracket prefix passes
    through whole (the reference quirk, pinned in tests)."""
    rows = []
    sent, word_idx = 0, 0
    for line in content.splitlines():
        if line.startswith(comment_delim):
            continue
        line = line.strip()
        if line:
            parts = line.split()
            word, label = parts[0], parts[-1]
            feats = [p.split("]", 1)[-1] for p in parts[1:-1]]
            rows.append((sent, word_idx, word, feats, label))
            word_idx += 1
        else:
            sent += 1
            word_idx = 0
    return rows


def feature_names(content: str, comment_delim: str = "#") -> list:
    """Feature-column NAMES from the first data line — the reference's
    ``initial_feature_alphabets`` (utils/data.py:206-218): prefix up to
    and including the first ``]``."""
    for line in content.splitlines():
        if line.startswith(comment_delim) or not line.strip():
            continue
        parts = line.strip().split()
        return [p.split("]", 1)[0] + "]" for p in parts[1:-1]]
    return []


def read_bmes_features(paths) -> "object":
    """Dataset of (path, sent_id, word_idx, word, feats, label) rows —
    ``feats`` an Arrow list<string> column, positional like the
    reference's feature alphabets."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out = {"path": [], "sent_id": [], "word_idx": [], "word": [],
               "feats": [], "label": []}
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            for s, w, word, feats, label in parse_bmes_features_text(data.decode("utf-8")):
                out["path"].append(path)
                out["sent_id"].append(s)
                out["word_idx"].append(w)
                out["word"].append(word)
                out["feats"].append(feats)
                out["label"].append(label)
        return pa.table(
            {
                "path": pa.array(out["path"], type=pa.string()),
                "sent_id": pa.array(out["sent_id"], type=pa.int64()),
                "word_idx": pa.array(out["word_idx"], type=pa.int64()),
                "word": pa.array(out["word"], type=pa.string()),
                "feats": pa.array(out["feats"], type=pa.list_(pa.string())),
                "label": pa.array(out["label"], type=pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def parse_origins_text(content: str, comment_delim: str = "#"):
    """Token-origin file → (sent_id, morph_idx, origin) with the
    reference's 1-based→0-based correction (utils/ner.py:86-115)."""
    rows = []
    sent, idx = 0, 0
    for line in content.splitlines():
        if line.startswith(comment_delim):
            continue
        line = line.strip()
        if line:
            rows.append((sent, idx, int(line) - 1))
            idx += 1
        else:
            sent += 1
            idx = 0
    return rows


def read_bmes(paths) -> "object":
    """Dataset of (path, sent_id, word_idx, word, label) rows."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out = {"path": [], "sent_id": [], "word_idx": [], "word": [], "label": []}
        for path, data in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            for s, w, word, label in parse_bmes_text(data.decode("utf-8")):
                out["path"].append(path)
                out["sent_id"].append(s)
                out["word_idx"].append(w)
                out["word"].append(word)
                out["label"].append(label)
        return pa.table(
            {
                "path": pa.array(out["path"], type=pa.string()),
                "sent_id": pa.array(out["sent_id"], type=pa.int64()),
                "word_idx": pa.array(out["word_idx"], type=pa.int64()),
                "word": pa.array(out["word"], type=pa.string()),
                "label": pa.array(out["label"], type=pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def read_origins(paths) -> "object":
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out = {"path": [], "sent_id": [], "morph_idx": [], "origin": []}
        for path, data in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            for s, i, o in parse_origins_text(data.decode("utf-8")):
                out["path"].append(path)
                out["sent_id"].append(s)
                out["morph_idx"].append(i)
                out["origin"].append(o)
        return pa.table(
            {
                "path": pa.array(out["path"], type=pa.string()),
                "sent_id": pa.array(out["sent_id"], type=pa.int64()),
                "morph_idx": pa.array(out["morph_idx"], type=pa.int64()),
                "origin": pa.array(out["origin"], type=pa.int64()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def bmes_lines(sentences: List[List[tuple]]) -> str:
    """Sentences of (word, label) → BMES text (decode-file format,
    utils/data.py:340-366)."""
    blocks = ["\n".join(f"{w} {l}" for w, l in sent) for sent in sentences]
    return "\n\n".join(blocks) + "\n\n"


def nbest_lines(sentences, labelings, scores) -> str:
    """N-best decode format (reference utils/data.py:399-442
    `write_nbest_decoded_results`): per sentence a ``# s1 s2 …`` score
    header (4 decimals), then one line per token with the word followed by
    its label under each of the n hypotheses, blank line between sentences.

    ``sentences``: list of token lists; ``labelings``: per sentence a list
    of n label-sequences; ``scores``: per sentence a list of n floats.
    """
    blocks = []
    for tokens, hyps, ss in zip(sentences, labelings, scores):
        header = "# " + " ".join(format(s, ".4f") for s in ss)
        lines = [header.strip()]
        for idy, tok in enumerate(tokens):
            lines.append((tok + " " + " ".join(h[idy] for h in hyps)).strip())
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks) + "\n"


def nbest_from_matches(tokens, matches) -> tuple:
    """Deterministic n-best hypotheses from gazetteer matches: the k-th
    hypothesis drops the k rightmost matches (scores decay geometrically).
    A stand-in for CRF ``decode_nbest`` (reference model/seqlabel.py:72-80)
    with the same output contract."""
    from hebrew_ner_ray.ner.tagger import token_single_labels

    hyps, scores = [], []
    ms = sorted(matches, key=lambda m: m.lo)
    for k in range(len(ms), -1, -1):
        hyps.append(token_single_labels(len(tokens), ms[:k]))
        scores.append(round(0.5 ** (len(ms) - k), 4))
    return hyps, scores


def write_bmes_partitioned(token_rows, out_dir: str, n_partitions: int | None = None):
    """``write_decoded_results`` (utils/ner.py:32-55) at corpus scale:
    token rows keyed (doc_id, span_ord, word_idx) are hash-partitioned by
    sentence key and each partition task renders + atomically writes ONE
    BMES file — nothing corpus-shaped touches the driver, the output is
    a resumable partitioned layout, and the file name is a content hash
    of the partition's sentence keys (deterministic across retries).

    Returns the manifest Dataset (path, n_sentences); materialize it to
    barrier on the writes before reading the files back."""
    import hashlib
    import os

    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _MANIFEST = {"path": "object", "n_sentences": "int64"}

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_MANIFEST)
        g = g.sort_values(["doc_id", "span_ord", "word_idx"], kind="stable")
        sents, keys = [], []
        for (d, s), grp in g.groupby(["doc_id", "span_ord"], sort=True):
            sents.append(list(zip(grp["word"], grp["label"])))
            keys.append(f"{d}:{s}")
        name = hashlib.md5("|".join(keys).encode()).hexdigest()[:16] + ".bmes"
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(bmes_lines(sents))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "n_sentences": [len(keys)]}).astype(_MANIFEST)

    return bucketed_aggregate(token_rows, ["doc_id", "span_ord"], write_part,
                              coalesce=n_partitions or partitions_for())


def write_bmes(ds, path: str) -> None:
    """Materialize a (sent_id, word_idx, word, label) dataset to one BMES
    file (conformance-fixture sink — small outputs only; the corpus-scale
    sink is :func:`write_bmes_partitioned`)."""
    import pandas as pd

    df = ds.to_pandas().sort_values(["sent_id", "word_idx"])
    sents = [
        list(zip(g["word"], g["label"]))
        for _, g in df.groupby("sent_id", sort=True)
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write(bmes_lines(sents))
