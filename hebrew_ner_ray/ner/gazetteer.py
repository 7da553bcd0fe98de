"""Deterministic gazetteer NER — the pluggable stand-in for the reference's
learned taggers.

The reference loads three trained NCRF++ models (token_single,
token_multi, morph — ner_app.py:39-57) whose weights are not available in
this environment; the engine therefore ships a deterministic
gazetteer-matching tagger with the same OBSERVABLE contract: BIOSE labels
over the NEMO category set {PER ORG LOC GPE FAC WOA EVE DUC ANG}
(SURVEY.md §1.3), caret-joined multi labels, and morpheme-level labels.
A trained-model actor can be dropped into the same stage interface later.

Matching is greedy longest-phrase-first over token positions; a token
position matches a phrase core if the core equals any prefix-stripped,
vav-collapsed, final-letter-normalized candidate of the token (the particle
inventory is the reference's: utils/ner.py:260-396).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from hebrew_ner_ray.morph.prefixes import prefix_splits
from hebrew_ner_ray.text.hebrew import collapse_leading_double_vav, normalise_final_letters

# (phrase cores, category) — cores are prefix-stripped canonical forms.
GAZETTEER: List[Tuple[Tuple[str, ...], str]] = [
    (("ישראל",), "GPE"),
    (("תאילנד",), "GPE"),
    (("טקסס",), "GPE"),
    (("ירושלים",), "GPE"),
    (("צרפת",), "GPE"),
    (("תל", "אביב"), "GPE"),
    (("כנסת",), "ORG"),
    (("ועדת", "עבודה", "רווחה"), "ORG"),
    (("בנק", "פועלים"), "ORG"),
    (("קלייטון", "ויליאמס"), "PER"),
    (("דוד", "בן", "גוריון"), "PER"),
    (("רבין",), "PER"),
    (("הר", "כרמל"), "LOC"),
    (("מגדל", "שלום"), "FAC"),
    (("קריה",), "FAC"),
    (("תנך",), "WOA"),
    (("מלחמת", "ששת", "ימים"), "EVE"),
    (("מרצדס",), "DUC"),
    (("עברית",), "ANG"),
    (("אנגלית",), "ANG"),
]


@dataclass(frozen=True)
class Match:
    """A gazetteer phrase match over a token sentence."""

    lo: int                      # first token index (inclusive)
    hi: int                      # last token index (inclusive)
    cat: str
    cores: Tuple[str, ...]       # matched core surface per token (stripped, vav-collapsed)
    prefixes: Tuple[Tuple[str, ...], ...]  # prefix morphemes per token


def _norm(s: str) -> str:
    return normalise_final_letters(s)


def token_candidates(token: str) -> List[Tuple[str, Tuple[str, ...]]]:
    """(core_variant, prefix_morphs) candidates for one token.

    Memoized per process (bounded): vocabulary repeats across sentences
    even when sentences are all distinct, so this is the hot token-level
    cache under the sentence-level payload cache.
    """
    hit = _CAND_CACHE.get(token)
    if hit is not None:
        return hit
    cands: List[Tuple[str, Tuple[str, ...]]] = []
    seen = set()
    for prefix, core in prefix_splits(token):
        for variant in (core, collapse_leading_double_vav(core)):
            key = (variant, prefix)
            if key not in seen:
                seen.add(key)
                cands.append((variant, prefix))
    if len(_CAND_CACHE) < _CAND_CACHE_MAX:
        _CAND_CACHE[token] = cands
    return cands


_CAND_CACHE: Dict[str, List[Tuple[str, Tuple[str, ...]]]] = {}
_CAND_CACHE_MAX = 262144


def _norm_candidates(token: str) -> Dict[str, Tuple[str, Tuple[str, ...]]]:
    """normalized core → (core, prefix) for one token, memoized.

    Built with reversed candidate order so the no-split candidate wins on
    normalized-core collisions (it is written last).
    """
    hit = _NORM_CACHE.get(token)
    if hit is not None:
        return hit
    d = {_norm(core): (core, prefix) for core, prefix in reversed(token_candidates(token))}
    if len(_NORM_CACHE) < _CAND_CACHE_MAX:
        _NORM_CACHE[token] = d
    return d


_NORM_CACHE: Dict[str, Dict[str, Tuple[str, Tuple[str, ...]]]] = {}

_SYNTH = __import__("re").compile(r"^פלוני\d+$")


class GazetteerIndex:
    """Phrase index: normalized first-core → entries sorted longest first.

    Build once per actor (``__init__`` of the tagging stage); ``match`` is
    called per sentence inside the batch loop.
    """

    def __init__(self, entries: Sequence[Tuple[Tuple[str, ...], str]] = tuple(GAZETTEER),
                 synthetic_entities: bool = False):
        # synthetic_entities: recognize פלוני<digits> tokens as S-PER — the
        # BENCHMARK corpus mode (sources/interleaved.py entity_mix) that
        # scales entity cardinality with the corpus. OFF by default: פלוני
        # is a real Hebrew word (legal John Doe), so the rule must never
        # leak into serving/eval on real text.
        self.synthetic_entities = synthetic_entities
        self._by_first: Dict[str, List[Tuple[Tuple[str, ...], str]]] = {}
        for cores, cat in entries:
            self._by_first.setdefault(_norm(cores[0]), []).append((cores, cat))
        for v in self._by_first.values():
            v.sort(key=lambda e: -len(e[0]))

    def match(self, tokens: Sequence[str]) -> List[Match]:
        norm_cands = [_norm_candidates(t) for t in tokens]
        matches: List[Match] = []
        i = 0
        n = len(tokens)
        while i < n:
            # synthetic-entity rule (opt-in, see __init__): פלוני<digits>
            # tokens are unbounded-cardinality PER entities for the mixed
            # benchmark corpus
            if self.synthetic_entities and _SYNTH.match(tokens[i]):
                matches.append(Match(lo=i, hi=i, cat="PER",
                                     cores=(tokens[i],), prefixes=((),)))
                i += 1
                continue
            hit = None
            for norm_core, (core, prefix) in norm_cands[i].items():
                for cores, cat in self._by_first.get(norm_core, ()):  # longest first
                    if i + len(cores) > n:
                        continue
                    picked = [(core, prefix)]
                    ok = True
                    for k in range(1, len(cores)):
                        got = norm_cands[i + k].get(_norm(cores[k]))
                        if got is None:
                            ok = False
                            break
                        picked.append(got)
                    if ok and (hit is None or len(cores) > len(hit[0])):
                        hit = (cores, cat, picked)
            if hit is not None:
                cores, cat, picked = hit
                matches.append(
                    Match(
                        lo=i,
                        hi=i + len(cores) - 1,
                        cat=cat,
                        cores=tuple(c for c, _ in picked),
                        prefixes=tuple(p for _, p in picked),
                    )
                )
                i += len(cores)
            else:
                i += 1
        return matches
