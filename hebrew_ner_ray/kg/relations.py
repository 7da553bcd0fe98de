"""Relation extraction: mentions in a sentence → (subj, pred, obj) triples.

The reference declares CoNLL dependency columns but never consumes
HEAD/DEPREL (utils/yap.py:23-36, SURVEY.md §2.7 KG row), so the engine
defines its own deterministic sentence-window extractor: consecutive
mention pairs become triples whose predicate is the first non-punctuation
token strictly between them (``_adj`` when the mentions are adjacent).
Pure per-sentence function — runs inside ``map_batches``.
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


def triples_from_mentions(tokens: Sequence[str], mentions: Sequence[Mention]) -> List[Triple]:
    out: List[Triple] = []
    ms = sorted(mentions, key=lambda m: m.lo)
    for a, b in zip(ms, ms[1:]):
        pred = ADJACENT_PRED
        for i in range(a.hi + 1, b.lo):
            if tokens[i] not in _PUNCT:
                pred = tokens[i]
                break
        out.append(Triple(subj=a.norm_key, pred=pred, obj=b.norm_key,
                          subj_cat=a.cat, obj_cat=b.cat))
    return out
