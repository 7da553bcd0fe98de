"""Property-based tests (hypothesis) for the pure kernels."""

import string

import pytest
from hypothesis import given, settings

# hypothesis suites are gate-tier: full coverage via `pytest -m gate`
pytestmark = pytest.mark.gate
from hypothesis import strategies as st

from hebrew_ner_ray.labels.algebra import (
    bio_to_bioes,
    bioes_to_bio,
    make_spans,
    span_tuples,
    validate_multi_to_single,
)
from hebrew_ner_ray.morph.lattice import all_paths, build_adjacency, sentence_lattice
from hebrew_ner_ray.morph.prefixes import prefix_splits
from hebrew_ner_ray.text.hebrew import correct_final_letters, normalise_final_letters
from hebrew_ner_ray.text.tokenizer import split_sentences, tokenize

CATS = ["PER", "ORG", "LOC", "GPE", "FAC", "WOA", "EVE", "DUC", "ANG"]
labels_st = st.lists(
    st.one_of(
        st.just("O"),
        st.builds(lambda p, c: f"{p}-{c}", st.sampled_from("BIES"), st.sampled_from(CATS)),
    ),
    min_size=1,
    max_size=12,
)

heb_word = st.text(alphabet="אבגדהוזחטיכלמנסעפצקרשת", min_size=1, max_size=8)
heb_text = st.lists(heb_word, min_size=1, max_size=12).map(" ".join)


@given(labels_st)
def test_validate_total_and_stable(labels):
    tag = "^".join(labels)
    single, valid = validate_multi_to_single(tag)
    assert isinstance(valid, bool)
    # collapse is idempotent for WELL-FORMED outputs; the reference's
    # prefix-match quirk can emit degenerate "-CAT" labels (see
    # test_label_algebra.test_validate_prefix_match_quirk) which are not
    assert single == "O" or single.startswith("-") or "-" in single or single in "BIES"
    if single and not single.startswith("-"):
        single2, _ = validate_multi_to_single(single)
        assert single2 == single


@given(labels_st)
def test_span_tuples_subset_of_span_keys(labels):
    keys = set(make_spans(labels))
    for cat, lo, hi in span_tuples(labels):
        key = f"{cat}@[{lo}]" if lo == hi else f"{cat}@[{lo},{hi}]"
        assert key in keys


@given(labels_st)
def test_bioes_bio_roundtrip_wellformed(labels):
    # converting to BIO and back to BIOES is stable on its own output
    bio = bioes_to_bio(labels)
    bioes = bio_to_bioes(bio)
    assert bioes_to_bio(bioes) == bio


@given(heb_word)
def test_final_letter_normalization_involution(word):
    n = normalise_final_letters(word)
    assert normalise_final_letters(n) == n  # idempotent
    c = correct_final_letters(n)
    assert normalise_final_letters(c) == n  # correcting then normalising returns


@given(heb_word)
def test_prefix_splits_reassemble(word):
    for prefix, core in prefix_splits(word):
        assert "".join(prefix) + core == word
        assert len(core) >= 1


@given(heb_text)
@settings(max_examples=50)
def test_tokenize_no_whitespace_tokens(text):
    for tok in tokenize(text):
        assert tok
        assert not any(c.isspace() for c in tok)


@given(heb_text)
@settings(max_examples=50)
def test_split_sentences_preserves_nonspace_chars(text):
    sents = split_sentences(text)
    joined = "".join("".join(s.split()) for s in sents)
    assert joined == "".join(text.split())


@given(st.lists(heb_word, min_size=1, max_size=6))
@settings(max_examples=50)
def test_sentence_lattice_every_token_has_path(tokens):
    edges = sentence_lattice(tokens)
    by_token = {}
    for e in edges:
        by_token.setdefault(e.token, []).append(e)
    assert set(by_token) == set(range(1, len(tokens) + 1))
    for tok_edges in by_token.values():
        adj = build_adjacency(tok_edges)
        src, dst = tok_edges[0].from_, tok_edges[-1].to
        paths = list(all_paths(adj, src, dst))
        assert paths, "every token lattice must have >=1 path"
        # the no-split path always exists
        assert [src, dst] in paths


# --- distributed sessionization: partition-invariance property ---

@given(
    st.lists(
        st.tuples(st.integers(0, 4),                    # user
                  st.integers(0, 10**7),                # seconds offset
                  st.integers(-1000, 1000)),            # value milli-ish
        min_size=1, max_size=60,
    ),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_session_merge_partition_invariant(events, data):
    """1-D single-linkage associativity: sessionizing arbitrary batch
    partitions then interval-merging equals sessionizing everything at
    once — the exactness claim ops/windows.py's combiner rests on."""
    import pandas as pd

    from hebrew_ner_ray.ops.windows import _merge_session_partials, _session_partials

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime([e[1] for e in events], unit="s"),
            "user_id": [e[0] for e in events],
            "value": [e[2] / 7.0 for e in events],
        }
    )
    direct = _merge_session_partials(_session_partials(df)).reset_index(drop=True)
    # random partition into 1..4 batches
    labels = [data.draw(st.integers(0, 3)) for _ in range(len(df))]
    parts = [
        _session_partials(df[[l == k for l in labels]])
        for k in range(4)
    ]
    merged = _merge_session_partials(pd.concat(parts, ignore_index=True)).reset_index(drop=True)
    pd.testing.assert_frame_equal(direct, merged)
