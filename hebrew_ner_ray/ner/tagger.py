"""Sentence-level tagging: token_single / token_multi / morph granularities.

Produces the same three label granularities as the reference's model trio
(ner_app.py:24-28 ModelEnum), deterministically from gazetteer matches:

- ``token_single``: one BIOSE label per token (reference token_single model).
- ``token_multi``: caret-joined BIOSE per token, one component per
  morpheme of the token's segmentation (reference token_multi model;
  label format per SURVEY.md §1.1 / utils/ner.py:16-21).
- ``morph``: one BIOSE label per morpheme of the segmented sentence
  (reference morph model over YAP-segmented forms).

All functions are pure; the Ray stage wraps them in an actor-pool
``map_batches`` class (stages.py) so the gazetteer index is built once per
actor.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from hebrew_ner_ray.morph.prefixes import PARTICLE_FORMS, default_split
from hebrew_ner_ray.ner.gazetteer import GazetteerIndex, Match
from hebrew_ner_ray.text.hebrew import collapse_leading_double_vav, normalise_final_letters

MULTI_DELIM = "^"


def _span_positions(length: int) -> List[str]:
    if length == 1:
        return ["S"]
    return ["B"] + ["I"] * (length - 2) + ["E"]


def token_single_labels(n_tokens: int, matches: Sequence[Match]) -> List[str]:
    labels = ["O"] * n_tokens
    for m in matches:
        for pos, idx in zip(_span_positions(m.hi - m.lo + 1), range(m.lo, m.hi + 1)):
            labels[idx] = f"{pos}-{m.cat}"
    return labels


def sentence_segmentation(tokens: Sequence[str], matches: Sequence[Match]) -> List[Tuple[Tuple[str, ...], str]]:
    """Per-token (prefix_morphs, core) segmentation.

    Matched tokens segment according to the gazetteer match; unmatched
    tokens by the default particle rule (morph/prefixes.py).
    """
    segs: List[Tuple[Tuple[str, ...], str]] = [None] * len(tokens)  # type: ignore[list-item]
    for m in matches:
        for k, idx in enumerate(range(m.lo, m.hi + 1)):
            segs[idx] = (m.prefixes[k], m.cores[k])
    for i, tok in enumerate(tokens):
        if segs[i] is None:
            segs[i] = default_split(tok)
    return segs


def token_multi_labels(tokens: Sequence[str], matches: Sequence[Match]) -> List[str]:
    """Caret-joined per-morpheme labels at token granularity.

    A matched token's prefix morphemes are O and its core carries the span
    position; morphemes of in-span tokens between cores inherit I (mirrors
    NEMO morpheme-level gold, e.g. the ORG span in ner_app_test.py:55-56).
    """
    single = token_single_labels(len(tokens), matches)
    segs = sentence_segmentation(tokens, matches)
    out: List[str] = []
    for i, tok in enumerate(tokens):
        prefix, _core = segs[i]
        n_pre = len(prefix)
        lab = single[i]
        if lab == "O":
            out.append(MULTI_DELIM.join(["O"] * (n_pre + 1)))
            continue
        pos, cat = lab.split("-", 1)
        if pos in ("S", "B"):
            pre_labels = ["O"] * n_pre          # prefixes before a span start are outside it
        else:
            pre_labels = [f"I-{cat}"] * n_pre   # inside a span, particles are I
        out.append(MULTI_DELIM.join(pre_labels + [f"{pos}-{cat}"]))
    return out


def morph_labels_for_segmentation(
    tokens: Sequence[str], segs: Sequence[Tuple[Tuple[str, ...], str]], matches: Sequence[Match]
) -> Tuple[List[str], List[str], List[int]]:
    """(morph_forms, morph_labels, origins) for a segmented sentence.

    ``origins[j]`` is the 0-based source-token index of morpheme ``j``
    (the reference's token-origin convention, utils/ner.py:86-115 after its
    1-based correction).
    """
    forms: List[str] = []
    origins: List[int] = []
    core_pos: List[int] = []  # morpheme index of each token's core
    for i, (prefix, core) in enumerate(segs):
        for p in prefix:
            forms.append(p)
            origins.append(i)
        core_pos.append(len(forms))
        forms.append(core)
        origins.append(i)
    labels = ["O"] * len(forms)
    for m in matches:
        first_core = core_pos[m.lo]
        last_core = core_pos[m.hi]
        span = range(first_core, last_core + 1)
        positions = _span_positions(len(span))
        for pos, j in zip(positions, span):
            labels[j] = f"{pos}-{m.cat}"
        # interior morphemes (particles between cores) are Inside
        for j in span:
            if labels[j].startswith(("B-", "E-", "S-")):
                continue
            labels[j] = f"I-{m.cat}"
    return forms, labels, origins


class SentenceTagger:
    """Stateful tagger: gazetteer index built once, then pure per-sentence calls.

    This is the object a Ray actor holds; one instance per map_batches actor.
    """

    def __init__(self, index: GazetteerIndex | None = None,
                 synthetic_entities: bool = False):
        if index is not None and synthetic_entities:
            raise ValueError("pass synthetic_entities on the GazetteerIndex "
                             "itself when supplying an explicit index")
        self.index = index or GazetteerIndex(synthetic_entities=synthetic_entities)

    def match(self, tokens: Sequence[str]) -> List[Match]:
        return self.index.match(tokens)

    def tag_single(self, tokens: Sequence[str]) -> List[str]:
        return token_single_labels(len(tokens), self.match(tokens))

    def tag_multi(self, tokens: Sequence[str]) -> List[str]:
        return token_multi_labels(tokens, self.match(tokens))

    def tag_morph(self, tokens: Sequence[str]) -> Tuple[List[str], List[str], List[int]]:
        matches = self.match(tokens)
        segs = sentence_segmentation(tokens, matches)
        return morph_labels_for_segmentation(tokens, segs, matches)


def match_morph_phrase(
    index: GazetteerIndex, forms: Sequence[str]
) -> List[Tuple[int, int, str]]:
    """Match gazetteer phrases directly over morpheme FORMS (for the hybrid
    chain, where labels are assigned to disambiguated morphemes and only
    then merged back to tokens — reference ner_app.py:283-287).

    Between consecutive phrase cores, particle morphemes (ב/ל/כ/מ/ש/ה/ו/כש)
    are skipped. Returns (first_morph, last_morph, cat) spans.
    """
    norm_forms = [normalise_final_letters(collapse_leading_double_vav(f)) for f in forms]
    spans: List[Tuple[int, int, str]] = []
    n = len(forms)
    i = 0
    while i < n:
        hit = None
        for cores, cat in index._by_first.get(norm_forms[i], ()):  # longest first
            j = i
            last = i
            ok = True
            for k in range(1, len(cores)):
                j += 1
                while j < n and forms[j] in PARTICLE_FORMS:
                    j += 1
                if j >= n or norm_forms[j] != normalise_final_letters(cores[k]):
                    ok = False
                    break
                last = j
            if ok:
                hit = (i, last, cat)
                break
        if hit is not None:
            spans.append(hit)
            i = hit[1] + 1
        else:
            i += 1
    return spans


def morph_labels_for_forms(index: GazetteerIndex, forms: Sequence[str]) -> List[str]:
    """BIOSE labels over raw morpheme forms (hybrid chain's morph stage)."""
    labels = ["O"] * len(forms)
    for lo, hi, cat in match_morph_phrase(index, forms):
        span = range(lo, hi + 1)
        for pos, j in zip(_span_positions(len(span)), span):
            labels[j] = f"{pos}-{cat}"
        for j in span:
            if not labels[j].startswith(("B-", "E-", "S-")):
                labels[j] = f"I-{cat}"
    return labels
