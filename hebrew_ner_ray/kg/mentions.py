"""Mention extraction: tagged sentence → typed entity mentions.

The KG pipeline's mention unit corresponds to the reference's entity-span
key ``CAT@[lo,hi]`` (utils/ner.py:398-419 `make_spans`); here each span is
materialized with its raw surface, its prefix-stripped core surface, and a
normalized entity-linking key (final-letter normalization + prefix strip +
trailing-yud removal per FIXTURES.md F4, built from the reference's
normalizer trio utils/ner.py:226-258).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from hebrew_ner_ray.labels.algebra import span_tuples
from hebrew_ner_ray.ner.gazetteer import Match
from hebrew_ner_ray.text.hebrew import mention_norm_key


@dataclass(frozen=True)
class Mention:
    cat: str
    lo: int
    hi: int
    surface: str       # raw token text joined by space (with prefix particles)
    core_surface: str  # prefix-stripped core forms joined by space
    norm_key: str      # normalized entity-linking key


def mentions_from_sentence(tokens: Sequence[str], matches: Sequence[Match]) -> List[Mention]:
    """Mentions straight from gazetteer matches (carries exact cores)."""
    out: List[Mention] = []
    for m in sorted(matches, key=lambda m: m.lo):
        cores = list(m.cores)
        out.append(
            Mention(
                cat=m.cat,
                lo=m.lo,
                hi=m.hi,
                surface=" ".join(tokens[m.lo : m.hi + 1]),
                core_surface=" ".join(cores),
                norm_key=mention_norm_key(cores),
            )
        )
    return out


def mentions_from_labels(tokens: Sequence[str], labels: Sequence[str]) -> List[Mention]:
    """Mentions from an arbitrary BIOSE sequence (model-agnostic path).

    Used when labels come from a tagger that does not expose match cores
    (e.g. a trained model): cores fall back to the raw token surfaces, so
    norm keys are computed from the unstripped tokens.
    """
    out: List[Mention] = []
    for cat, lo, hi in span_tuples(labels):
        toks = list(tokens[lo : hi + 1])
        out.append(
            Mention(
                cat=cat,
                lo=lo,
                hi=hi,
                surface=" ".join(toks),
                core_surface=" ".join(toks),
                norm_key=mention_norm_key(toks),
            )
        )
    return out
