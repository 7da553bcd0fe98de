"""Checked-in reference-gold conformance (ADVICE r1, item 5).

tests/data/reference_gold.json was generated ONCE by executing the
reference implementation (utils/tokenizer.py scanner, utils/ner.py
groupings) — see the file's comment field. These tests run WITHOUT the
reference checkout, so reference fidelity is guarded even where
/root/reference is absent (unlike test_reference_differential, which
execs the reference live and skips without it).

Engine-side deviations from the reference splitter are deliberate and
documented (tokenizer.split_sentences docstring), so the tokenizer check
compares FLATTENED per-sentence token streams on texts where the
splitter deviations don't trigger, plus the full token stream per text.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from hebrew_ner_ray.morph.groupings import make_groupings
from hebrew_ner_ray.text.tokenizer import text_to_token_sentences

GOLD = json.loads((Path(__file__).parent / "data" / "reference_gold.json").read_text())


@pytest.mark.parametrize("case", GOLD["tokenize"], ids=lambda c: c["text"][:25])
def test_tokenize_matches_reference_gold(case):
    """``exact`` cases (18/24) match the reference byte-for-byte; the
    other 6 hit the reference's documented data-dropping bugs (no final
    flush, 1-char leftover drop, legal-token slice truncation — see
    tokenizer.split_sentences docstring) and are pinned to the reviewed
    ``engine_tokens`` stream instead, so any UNINTENDED drift still
    fails."""
    got = text_to_token_sentences(case["text"])
    assert got == case["engine_tokens"], (got, case["engine_tokens"])
    if case["exact"]:
        flat_got = [t for s in got for t in s]
        flat_gold = [t for s in case["tokens"] for t in s]
        assert flat_got == flat_gold


@pytest.mark.parametrize("case", GOLD["groupings"], ids=lambda c: "+".join(c["morph"])[:25])
def test_groupings_match_reference_gold(case):
    if "raises" in case:
        if case["raises"] == "IndexError":
            # documented deviation: engine guards the sentence[-2] access
            make_groupings(case["morph"])
            return
        with pytest.raises(AssertionError):
            make_groupings(case["morph"])
        return
    groups, tokens = make_groupings(case["morph"])
    assert [list(g) for g in groups] == case["groups"]
    assert tokens == case["tokens"]
