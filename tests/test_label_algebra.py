"""Label algebra unit cases — FIXTURES.md F6 plus scheme conversions
(reference utils/ner.py:178-222, :398-419; utils/tagSchemeConverter.py)."""

import pytest

from hebrew_ner_ray.labels.algebra import (
    bio_to_bioes,
    bioes_to_bio,
    iob_to_bio,
    make_spans,
    multi_splitting,
    span_tuples,
    validate_multi_to_single,
)


@pytest.mark.parametrize(
    "tag, expected, valid",
    [
        ("O^O", "O", True),
        ("O^B-ORG^I-ORG", "B-ORG", True),
        ("I-PER^I-PER", "I-PER", True),
        ("O^S-GPE^O", "S-GPE", True),
        ("B-LOC^I-LOC^E-LOC", "S-LOC", True),
        ("I-ORG^E-ORG^O", "E-ORG", True),
        ("O", "O", True),
        ("S-GPE", "S-GPE", True),
    ],
)
def test_validate_valid(tag, expected, valid):
    got, got_valid = validate_multi_to_single(tag)
    assert got == expected
    assert got_valid is valid


@pytest.mark.parametrize(
    "tag, expected, valid",
    [
        # NOTE: the reference's validity check uses re.match (prefix match,
        # utils/ner.py:184), so sequences like "EB" count as valid via the
        # I*EO* prefix and fall through every fullmatch collapse rule,
        # yielding a bare "-CAT". Verified against the reference code; the
        # paper's Fig.-11 relaxed branch is unreachable for these inputs.
        ("E-PER^B-PER", "-PER", True),
        ("E-GPE^O^S-GPE", "-GPE", True),
        ("I-ORG^O^I-ORG", "-ORG", True),
        ("E-GPE^O^O", "E-GPE", True),
    ],
)
def test_validate_invalid_relaxed(tag, expected, valid):
    got, got_valid = validate_multi_to_single(tag)
    assert got == expected
    assert got_valid is valid


def test_validate_prefix_match_quirk():
    # The reference uses re.match (prefix match), so "OI" counts as valid
    # via O+ even though no collapse rule fullmatches — the collapsed label
    # is then "-CAT" (reference utils/ner.py:184,219-221). We preserve it.
    got, valid = validate_multi_to_single("O^I-ORG")
    assert valid is True
    assert got == "-ORG"


def test_make_spans():
    labels = ["O", "B-ORG", "I-ORG", "E-ORG", "O", "S-GPE", "O"]
    assert make_spans(labels) == ["ORG@[1,3]", "GPE@[5]"]
    assert span_tuples(labels) == [("ORG", 1, 3), ("GPE", 5, 5)]


def test_make_spans_unclosed_b_dropped_in_tuples():
    labels = ["B-PER", "O"]
    assert make_spans(labels) == ["PER@[0"]
    assert span_tuples(labels) == []


def test_multi_splitting():
    assert multi_splitting("O") == 1
    assert multi_splitting("O^B-ORG^I-ORG") == 3


def test_bio_bioes_roundtrip():
    bio = ["O", "B-ORG", "I-ORG", "I-ORG", "O", "B-GPE", "O"]
    bioes = bio_to_bioes(bio)
    assert bioes == ["O", "B-ORG", "I-ORG", "E-ORG", "O", "S-GPE", "O"]
    assert bioes_to_bio(bioes) == bio


def test_iob_to_bio():
    iob = ["I-ORG", "I-ORG", "O", "I-PER"]
    assert iob_to_bio(iob) == ["B-ORG", "I-ORG", "O", "B-PER"]
