"""Hebrew orthography normalizers.

Semantics match the reference's scalar helpers (cited per function); the
implementations here are table-driven ``str.translate`` so they can be
applied cheaply to millions of strings inside ``map_batches``.
"""

from __future__ import annotations

# final → medial forms (reference: utils/ner.py:226-239 `normalise_final_letters`)
_FINAL_TO_MEDIAL = str.maketrans({"ך": "כ", "ם": "מ", "ן": "נ", "ף": "פ", "ץ": "צ"})
# medial → final forms for the LAST letter only (reference: utils/ner.py:241-253)
_MEDIAL_TO_FINAL = {"כ": "ך", "מ": "ם", "נ": "ן", "פ": "ף", "צ": "ץ"}

GERSHAYIM = "״"


def normalise_final_letters(word: str) -> str:
    """Map Hebrew final letters ך ם ן ף ץ to their medial forms everywhere.

    Reference semantics: utils/ner.py:226-239.
    """
    return word.translate(_FINAL_TO_MEDIAL)


def correct_final_letters(word: str) -> str:
    """Rewrite the last letter to its final form when the word has ≥2 chars.

    Reference semantics: utils/ner.py:241-253.
    """
    if len(word) < 2:
        return word
    last = word[-1]
    rep = _MEDIAL_TO_FINAL.get(last)
    return word[:-1] + rep if rep else word


def remove_trailing_yud(word: str) -> str:
    """Strip one trailing י (reference: utils/ner.py:255-258)."""
    return word[:-1] if word and word[-1] == "י" else word


def quotes_to_gershayim(text: str) -> str:
    """ASCII double-quote → gershayim (reference: utils/hebrew.py:3-10)."""
    return text.replace('"', GERSHAYIM)


def gershayim_to_quotes(text: str) -> str:
    """Gershayim → ASCII double-quote (reference: utils/hebrew.py:13-19)."""
    return text.replace(GERSHAYIM, '"')


_DIGITS = str.maketrans({c: "0" for c in "123456789"})


def normalize_digits(word: str) -> str:
    """All decimal digits → '0' (reference: utils/functions.py:14-21)."""
    return word.translate(_DIGITS)


def collapse_leading_double_vav(word: str) -> str:
    """After stripping a prefix particle, Hebrew ktiv-male spelling may leave a
    doubled leading vav (בוועדת → ב + וועדת, canonically ועדת). Collapse it.

    This is an engine-side normalization used when matching stripped cores
    against the gazetteer; the reference encounters the same phenomenon via
    YAP's lexicon (e.g. the ORG span at ner_app_test.py:55-56).
    """
    if word.startswith("וו"):
        return word[1:]
    return word


def mention_norm_key(cores: list[str]) -> str:
    """Normalized entity-linking key for a mention's morpheme cores.

    Final-letter normalization + trailing-yud removal per core, joined by a
    single space. Mirrors the reference's normalizer trio used for
    surface-form keying (utils/ner.py:226-258); prefix stripping has already
    happened when cores were produced.
    """
    return " ".join(remove_trailing_yud(normalise_final_letters(c)) for c in cores)
