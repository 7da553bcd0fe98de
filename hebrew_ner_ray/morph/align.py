"""Token↔morpheme alignment and the hybrid tagging chain.

Re-expresses the reference's hybrid `/predict` composite
(ner_app.py:261-297, SURVEY.md §3.2) as a pure per-sentence function:

  1. token_multi labels → per-token morpheme arity     (utils/ner.py:162-174)
  2. rule-based MA lattice                             (replaces yap_ma_api)
  3. prune by arity, fallback=True                     (utils/yap_graph.py:86-105)
  4. first-path disambiguation → MD                    (replaces yap joint)
  5. morph tagging over MD forms                       (replaces morph model)
  6. MD → token origins (1-based → 0-based)            (utils/yap.py:172-202)
  7. merge morph labels per origin with '^', validate  (utils/ner.py:145-160)

The whole chain is row-local: it runs inside ``map_batches`` with no
shuffle, because a sentence's lattice never leaves its row (SURVEY.md §7.1
design decision 1 — positional grafts become key-carrying data).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from hebrew_ner_ray.labels.algebra import MULTI_DELIM, multi_splitting, validate_multi_to_single
from hebrew_ner_ray.morph.lattice import LatticeEdge, disambiguate, prune_lattice, sentence_lattice
from hebrew_ner_ray.ner.gazetteer import GazetteerIndex
from hebrew_ner_ray.ner.tagger import morph_labels_for_forms, token_multi_labels


def md_origins(md_edges: Sequence[LatticeEdge]) -> List[int]:
    """0-based source-token index per MD morpheme (utils/yap.py:172-202)."""
    return [e.token - 1 for e in md_edges]


def merge_labels_by_origin(
    morph_labels: Sequence[str], origins: Sequence[int], n_tokens: int,
    validate: bool = True, delim: str = MULTI_DELIM,
) -> List[str]:
    """Group morpheme labels by source token and caret-join them
    (utils/ner.py:145-160 `merge_morph_from_token_origins`)."""
    per_token: List[List[str]] = [[] for _ in range(n_tokens)]
    for lab, o in zip(morph_labels, origins):
        per_token[o].append(lab)
    out: List[str] = []
    for labs in per_token:
        joined = delim.join(labs) if labs else "O"
        out.append(validate_multi_to_single(joined, delim)[0] if validate else joined)
    return out


def merge_labels_by_splitting(
    morph_words: Sequence[str], morph_labels: Sequence[str], splitting: Sequence[int],
    validate: bool = False, delim: str = MULTI_DELIM,
) -> List[Tuple[str, str]]:
    """Consume the morpheme stream according to a per-token morpheme-count
    list, emitting (merged_word, joined_label) per token — the reference's
    `merge_morph_from_multi_spliting` (utils/ner.py:117-143) queue logic,
    including the caret-joined merged word."""
    out: List[Tuple[str, str]] = []
    pos = 0
    for split in splitting:
        words = list(morph_words[pos : pos + split])
        labels = list(morph_labels[pos : pos + split])
        pos += split
        lab = delim.join(labels)
        if validate:
            lab = validate_multi_to_single(lab, delim)[0]
        out.append((delim.join(words), lab))
    return out


def merge_words_by_origin(forms: Sequence[str], origins: Sequence[int], n_tokens: int) -> List[str]:
    """Reassemble token surfaces from morpheme forms (same grouping)."""
    per_token: List[List[str]] = [[] for _ in range(n_tokens)]
    for f, o in zip(forms, origins):
        per_token[o].append(f)
    return ["".join(fs) for fs in per_token]


def hybrid_tag_sentence(
    tokens: Sequence[str], index: GazetteerIndex, fallback: bool = True
) -> Tuple[List[str], List[str], List[str], List[int]]:
    """Full hybrid chain for one tokenized sentence.

    Returns (token_labels, md_forms, morph_labels, origins). The returned
    token_labels are single BIOSE labels — the reference's hybrid contract
    is that they agree with token_single on its golden sentences
    (ner_app_test.py:80-81), which tests/test_hybrid.py asserts for every
    template.
    """
    matches = index.match(tokens)
    multi = token_multi_labels(tokens, matches)
    arities = [multi_splitting(m) for m in multi]

    ma = sentence_lattice(tokens)
    pruned = prune_lattice(ma, arities, fallback=fallback)
    md = disambiguate(pruned, arities)

    forms = [e.form for e in md]
    morph_labels = morph_labels_for_forms(index, forms)
    origins = md_origins(md)
    token_labels = merge_labels_by_origin(morph_labels, origins, len(tokens), validate=True)
    return token_labels, forms, morph_labels, origins
