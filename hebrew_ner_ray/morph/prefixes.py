"""Prefix-particle enumeration — the rule-based stand-in for YAP's
morphological analyzer.

The reference consults an external YAP service for segmentation
(utils/yap.py:38-135) but ships its own rule system proving prefix
particles ב/ל/כ/ה/ש/ו/מ/כש drive token↔morpheme grouping
(utils/ner.py:260-396 `make_groupings_linguistically`). This module turns
those rules into a generative enumerator: for a surface token, produce the
candidate (prefix-morphemes, core) segmentations that form the per-token
morphological lattice.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

# single-morpheme particles, in deterministic enumeration order
SINGLE_PARTICLES = ("ו", "ב", "ל", "כ", "מ", "ש", "ה")
# two-level prefix chains observed in the reference's grouping rules
# (utils/ner.py:302-325): ו/ש may be followed by ה or another particle,
# and כש acts as one accumulated prefix unit.
CHAIN_PREFIXES: Tuple[Tuple[str, ...], ...] = (
    ("כש",),
    ("ו", "ה"),
    ("ש", "ה"),
    ("ו", "ב"),
    ("ו", "ל"),
    ("ו", "כ"),
    ("ו", "מ"),
    ("ו", "ש"),
    ("ו", "כש"),
)

PARTICLE_FORMS = frozenset(SINGLE_PARTICLES) | {"כש"}

_MIN_CORE_LEN = 2


def _is_hebrew(s: str) -> bool:
    return bool(s) and all("א" <= c <= "ת" or c == '"' or c == "'" for c in s)


def prefix_splits(token: str) -> List[Tuple[Tuple[str, ...], str]]:
    """All candidate segmentations of ``token`` as (prefix_morphs, core).

    The no-split candidate comes first, then 1-morpheme prefixes, then
    chained prefixes — a deterministic order that downstream
    disambiguation relies on (first surviving path wins).
    """
    out: List[Tuple[Tuple[str, ...], str]] = [((), token)]
    if not _is_hebrew(token):
        return out
    for p in SINGLE_PARTICLES:
        if token.startswith(p) and len(token) - len(p) >= _MIN_CORE_LEN:
            out.append(((p,), token[len(p):]))
    for chain in CHAIN_PREFIXES:
        joined = "".join(chain)
        if token.startswith(joined) and len(token) - len(joined) >= _MIN_CORE_LEN:
            out.append((chain, token[len(joined):]))
    return out


def default_arity(token: str) -> int:
    """Morpheme count assumed for a token with no gazetteer evidence.

    Conjunction ו and subordinator כש are split off when the remainder is a
    plausible word; everything else stays a single morpheme. (The learned
    token_multi model plays this role in the reference; this is the
    deterministic engine-side analogue.)
    """
    if token.startswith("כש") and len(token) >= 4 and _is_hebrew(token):
        return 2
    if token.startswith("ו") and len(token) >= 4 and _is_hebrew(token):
        return 2
    return 1


def default_split(token: str) -> Tuple[Tuple[str, ...], str]:
    """The segmentation matching :func:`default_arity`."""
    if token.startswith("כש") and len(token) >= 4 and _is_hebrew(token):
        return ("כש",), token[2:]
    if token.startswith("ו") and len(token) >= 4 and _is_hebrew(token):
        return ("ו",), token[1:]
    return (), token


def split_for_core(token: str, core_candidates: Sequence[str]) -> Tuple[Tuple[str, ...], str]:
    """Return the split of ``token`` whose (normalized) core is in
    ``core_candidates``; falls back to :func:`default_split`."""
    from hebrew_ner_ray.text.hebrew import collapse_leading_double_vav, normalise_final_letters

    wanted = {normalise_final_letters(c) for c in core_candidates}
    for prefix, core in prefix_splits(token):
        for variant in (core, collapse_leading_double_vav(core)):
            if normalise_final_letters(variant) in wanted:
                return prefix, variant
    return default_split(token)
