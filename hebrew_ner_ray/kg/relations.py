"""Relation extraction: mentions in a sentence → (subj, pred, obj) triples.

The reference declares CoNLL dependency columns but never consumes
HEAD/DEPREL/LEMMA (utils/yap.py:23-36, SURVEY.md §2.7 KG row), so the
engine defines its own deterministic sentence-window extractor:
consecutive mention pairs become triples whose predicate is the LEMMA of
the first non-punctuation token strictly between them (``_adj`` when the
mentions are adjacent). The lemma comes from the in-process morphological
segmentation (morph/prefixes.default_split): prefix particles ו/כש are
stripped, so a connecting token and its conjoined form ('נסע' / 'ונסע')
yield the SAME predicate — the dep-window upgrade consuming the
segmentation surface the reference declares but never reads. Pure
per-sentence function — runs inside ``map_batches``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from hebrew_ner_ray.kg.mentions import Mention

_PUNCT = set(",.;:!?-()[]{}'\"`")

ADJACENT_PRED = "_adj"


@dataclass(frozen=True)
class Triple:
    subj: str      # subject mention norm_key
    pred: str      # predicate surface token (or _adj)
    obj: str       # object mention norm_key
    subj_cat: str
    obj_cat: str


def pred_lemma(token: str) -> str:
    """Predicate lemma: the CORE of the token's deterministic
    segmentation (prefix particles stripped)."""
    from hebrew_ner_ray.morph.prefixes import default_split

    _, core = default_split(token)
    return core


def triples_from_mentions(tokens: Sequence[str], mentions: Sequence[Mention]) -> List[Triple]:
    out: List[Triple] = []
    ms = sorted(mentions, key=lambda m: m.lo)
    for a, b in zip(ms, ms[1:]):
        pred = ADJACENT_PRED
        for i in range(a.hi + 1, b.lo):
            if tokens[i] not in _PUNCT:
                pred = pred_lemma(tokens[i])
                break
        out.append(Triple(subj=a.norm_key, pred=pred, obj=b.norm_key,
                          subj_cat=a.cat, obj_cat=b.cat))
    return out
