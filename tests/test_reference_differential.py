"""Differential fuzz harness: engine vs the reference implementation.

Round-1 verdict found a fidelity deviation in `make_groupings`
(SINGLE_STYLE_PREPS branch) that the engine's self-generated oracles could
never catch — they validate distributed plumbing, not reference semantics.
This module closes that hole by executing the reference's own functions
(extracted from /root/reference, which is read-only data here, NOT an
import dependency of the engine) and asserting 0 mismatches over a seeded
fuzz corpus whose vocabulary deliberately includes final-letter
prepositions before pronouns, the על-יד bigram, the ממן/עם/את/כמו/לפי
contraction families, and every particle the rule chain dispatches on.

Reference files exercised:
  utils/ner.py:226-396   (normalise/correct final letters, groupings)
  utils/tokenizer.py:1-211 (scanner tokenizer)
"""

from __future__ import annotations

import ast
import random
import string
from pathlib import Path
from typing import List, Tuple

import pytest

from hebrew_ner_ray.morph.groupings import make_groupings
from hebrew_ner_ray.text.tokenizer import tokenize

REF = Path("/root/reference")

# Integrity pins: the harness EXECUTES code read from the (untrusted,
# read-only) reference checkout. Refuse to exec anything whose bytes
# differ from the audited snapshot — a tampered checkout must not gain
# code execution in CI; a legitimately updated reference must be
# re-audited and re-pinned here.
_REF_SHA256 = {
    "utils/ner.py": "35ea5ebdd2aa98ba1ba965910a7dd57e9bc87060679fa70090f855d6a8355946",
    "utils/tokenizer.py": "5c0f25c4a159e83fe12bb779df3a2a9e75aa94a8641c04ab88d4f56c8422fcb6",
}


def _pinned_source(rel: str) -> str:
    import hashlib

    data = (REF / rel).read_bytes()
    got = hashlib.sha256(data).hexdigest()
    if got != _REF_SHA256[rel]:
        pytest.fail(
            f"reference file {rel} does not match its pinned sha256 "
            f"(got {got}) — refusing to exec unaudited code; re-audit and re-pin"
        )
    return data.decode()


pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not present"
)


def _load_reference_fns(names: set):
    """AST-extract arbitrary pure functions from reference utils/ner.py."""
    src = _pinned_source("utils/ner.py")
    tree = ast.parse(src)
    module = ast.Module(
        body=[n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in names],
        type_ignores=[],
    )
    ns = {
        "string": string, "List": List, "Tuple": Tuple, "re": __import__("re"),
        "Iterable": __import__("typing").Iterable,
    }
    exec(compile(module, "<reference utils/ner.py>", "exec"), ns)
    assert names <= set(ns)
    return ns


def _load_reference_groupings():
    """Extract the grouping rule functions from the reference source by AST
    (utils/ner.py imports yap/config/pandas at module level, so a plain
    import is impossible; the functions themselves are pure)."""
    src = _pinned_source("utils/ner.py")
    tree = ast.parse(src)
    wanted = {
        "normalise_final_letters",
        "correct_final_letters",
        "remove_trailing_yud",
        "make_groupings_linguistically",
    }
    module = ast.Module(
        body=[n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in wanted],
        type_ignores=[],
    )
    ns = {"string": string, "List": List, "Tuple": Tuple, "re": __import__("re")}
    exec(compile(module, "<reference utils/ner.py>", "exec"), ns)
    assert wanted <= set(ns), "reference source changed shape"
    return ns["make_groupings_linguistically"]


def _load_reference_tokenizer():
    """utils/tokenizer.py is self-contained (re + typing); its module-level
    code builds the scanner tables the functions need, so it is exec'd
    whole — gated on the sha256 pin above."""
    import types

    src = _pinned_source("utils/tokenizer.py")
    mod = types.ModuleType("_ref_tokenizer")
    exec(compile(src, "<reference utils/tokenizer.py>", "exec"), mod.__dict__)
    return mod


# Vocabulary engineered to hit every branch of the rule chain, including the
# final-letter prepositions (למען, לשם, בתוך) that round 1's fuzz missed.
PRONOUNS = ["אני", "אתה", "את", "הוא", "היא", "אנחנו", "אתם", "אתן", "הם", "הן"]
PREPS = [
    "אצל", "בגלל", "בשביל", "בעד", "בתוך", "זולת", "ליד", "כמות", "של",
    "מאת", "למען", "לעמת", "לקראת", "לשם", "מול", "נגד", "נכח", "לעבר",
    "כלפי", "בידי", "בלעדי", "לגבי", "לפני", "בעקבות", "על", "עד", "תחת",
    "אחרי", "אל", "ממן", "מ", "עם", "אות", "כמו", "לפי", "יד", "עץ",
]
PARTICLES = ["ב", "ל", "כ", "ה", "ש", "ו", "מ", "כש", "הכל"]
WORDS = ["בית", "ילד", "ספר", "ארץ", "שלום", "דרך", "סוף", "חלון", "אדם", "עיר"]
PUNCT = [".", ",", "!", "?"]
POOL = PRONOUNS + PREPS + PARTICLES + WORDS + PUNCT


def _run(fn, morph):
    """Call fn on a private copy (the reference mutates its input) and
    normalize crashes to a comparable sentinel."""
    try:
        groups, tokens = fn(list(morph))
        return ("ok", [list(g) for g in groups], list(tokens))
    except (AssertionError, IndexError) as e:
        return ("raise", type(e).__name__)


def test_groupings_differential_30k():
    ref_fn = _load_reference_groupings()
    rng = random.Random(0xD1FF)
    mismatches = []
    ref_crashes = 0
    for trial in range(30_000):
        n = rng.randint(1, 8)
        morph = [rng.choice(POOL) for _ in range(n)]
        ref = _run(ref_fn, morph)
        if ref[0] == "raise":
            # the reference crashes (ה-last assert, יד-first sentence[-2]);
            # the engine must not crash, and we don't compare outputs.
            ref_crashes += 1
            if ref[1] == "IndexError":
                _run(make_groupings, morph)  # must not raise IndexError
            continue
        got = _run(make_groupings, morph)
        if got != ref:
            mismatches.append((morph, ref, got))
    assert not mismatches, (
        f"{len(mismatches)}/30000 grouping mismatches; first 3: {mismatches[:3]}"
    )
    # sanity: the fuzz actually exercises crash branches too
    assert ref_crashes > 0


def test_groupings_final_letter_preps_pinned():
    """The exact cases from the round-1 verdict/advice (reference's dead
    normalise_final_letters assignment, utils/ner.py:330-334)."""
    ref_fn = _load_reference_groupings()
    for prep, pron in [("בתוך", "הוא"), ("למען", "אני"), ("לשם", "הם")]:
        _, ref_tokens = ref_fn([prep, pron])
        _, got_tokens = make_groupings([prep, pron])
        assert got_tokens == ref_tokens, (prep, pron, got_tokens, ref_tokens)
    # and the documented surface: בתוך+הוא keeps the final ך
    assert make_groupings(["בתוך", "הוא"])[1] == ["בתוךו"]
    assert make_groupings(["למען", "אני"])[1] == ["למעןי"]


def _flat(tokens):
    out = []
    for t in tokens:
        out.extend(t.split())
    return out


def test_tokenizer_differential():
    """Scanner-level differential: flattened whitespace-split token streams
    must agree (the reference emits multi-part tokens like '" אב' and
    ' - ' pre-split; both sides are compared flattened)."""
    ref = _load_reference_tokenizer()
    rng = random.Random(0x70CE)
    atoms = (
        WORDS
        + PREPS
        + ["1990", "(שנת", "1990)", "(5)", 'צה"ל', "א.ב.ג", "1.", "2.3", "50%",
           "abc", "http://x.co/y", "שבע-עשרה", "לב'ב", "3,000", "12:30", "..." ,
           "?!", "(", ")", "'", '"', "א", "5x", "@#"]
    )
    mismatches = []
    for trial in range(5_000):
        sent = " ".join(rng.choice(atoms) for _ in range(rng.randint(1, 7)))
        try:
            ref_tokens = [t for (_k, t) in ref.tokenize(sent)]
        except AssertionError:
            continue  # scanner remainder — reference rejects the input
        got = tokenize(sent)
        if _flat(got) != _flat(ref_tokens):
            mismatches.append((sent, _flat(ref_tokens), _flat(got)))
    assert not mismatches, (
        f"{len(mismatches)}/5000 tokenize mismatches; first 3: {mismatches[:3]}"
    )


def test_tokenizer_advice_cases():
    """Pinned cases from ADVICE.md: parenthesized numerics."""
    assert tokenize("(שנת 1990)") == ["(", "שנת", "1990", ")"]
    assert tokenize("(5)") == ["(", "5", ")"]


def _random_biose(rng, n):
    cats = ["PER", "ORG", "LOC", "GPE"]
    out = []
    i = 0
    while i < n:
        r = rng.random()
        if r < 0.45:
            out.append("O"); i += 1
        elif r < 0.6:
            out.append(f"S-{rng.choice(cats)}"); i += 1
        else:
            c = rng.choice(cats)
            ln = min(rng.randint(2, 4), n - i)
            if ln < 2:
                out.append("O"); i += 1
                continue
            out.extend([f"B-{c}"] + [f"I-{c}"] * (ln - 2) + [f"E-{c}"])
            i += ln
        # occasionally corrupt the sequence (the fns must agree on invalid
        # input too)
        if rng.random() < 0.1 and out:
            out[-1] = rng.choice(["I-PER", "E-ORG", "B-LOC", "O", "S-GPE"])
    return out[:n]


def test_spans_and_multi_validate_differential():
    """make_spans (utils/ner.py:398-448) and validate_multi_to_single
    (utils/ner.py:178-225) against the engine's labels/algebra.py over
    10k random (including corrupted) label sequences."""
    from hebrew_ner_ray.labels.algebra import (
        make_spans as eng_spans,
        validate_multi_to_single as eng_validate,
    )

    ns = _load_reference_fns({"make_spans", "validate_multi_to_single"})
    ref_spans, ref_validate = ns["make_spans"], ns["validate_multi_to_single"]
    rng = random.Random(0x5BA5)
    for _ in range(10_000):
        labels = _random_biose(rng, rng.randint(1, 12))
        assert eng_spans(labels) == ref_spans(labels), labels
        multi = "^".join(labels)
        assert eng_validate(multi) == tuple(ref_validate(multi)), multi
