"""Rule-based morpheme→token regrouping — the reference's linguistic
fallback layer (`make_groupings_linguistically`, utils/ner.py:260-396),
re-expressed as a data-driven rule chain with identical observable
behavior: given a flat morpheme sequence, reconstruct surface tokens and
report which morpheme indices grouped into each.

Rules (in priority order, mirroring the reference):
 1. punctuation is its own token
 2. hidden definite article: ה after ב/ל/כ merges silently
 3. ה after מ/ש/ו merges together with the FOLLOWING morpheme
 4. ל/ב/כ after ו/ש merge with the following morpheme (+ hidden ה)
 5. הכל after ב/ל/כ merges as כל
 6. any morpheme after a single-char particle (בלכהשומ) or כש merges
 7. pronominal suffixes: pronoun morphemes after prepositions reconstruct
    the inflected form via the singular/plural/מ/עם/את/כמו/לפי tables
 8. otherwise a new token starts
"""

from __future__ import annotations

import string
from typing import List, Sequence, Tuple

from hebrew_ner_ray.text.hebrew import (
    correct_final_letters,
    normalise_final_letters,
    remove_trailing_yud,
)

SKIP = "**SKIP**"

SINGLE_ENDINGS = {
    "אני": "י", "אתה": "ך", "את": "ך", "הוא": "ו", "היא": "ה",
    "אנחנו": "נו", "אתם": "כם", "אתן": "כן", "הם": "הם", "הן": "הן",
}
PLURAL_ENDINGS = {
    "אני": "י", "אתה": "יך", "את": "יך", "הוא": "יו", "היא": "יה",
    "אנחנו": "ינו", "אתם": "יכם", "אתן": "יכן", "הם": "יהם", "הן": "יהן",
}
FROM_ENDINGS = {
    "אני": "מני", "אתה": "מך", "את": "מך", "הוא": "מנו", "היא": "מנה",
    "אנחנו": "מנו", "אתם": "כם", "אתן": "כן", "הם": "הם", "הן": "הן",
}

SINGLE_STYLE_PREPS = {
    "אצל", "בגלל", "בשביל", "בעד", "בתוך", "זולת", "ליד", "כמות", "של", "מאת",
    "למען", "לעמת", "לקראת", "לשם", "מול", "נגד", "נכח", "ב", "ל", "לעבר",
}
PLURAL_STYLE_PREPS = {"כלפ", "ביד", "בלעד", "לגב", "לפנ", "בעקבות", "על", "עד", "תחת", "אחר", "אל"}


def _shorten_he(ending: str) -> str:
    # עם/את contractions drop a leading ה from 2-char endings (reference :358-377)
    if len(ending) == 2 and ending[0] == "ה":
        return ending[1]
    return ending


def make_groupings(morph: Sequence[str]) -> Tuple[List[List[int]], List[str]]:
    """Returns (groups, tokens): groups[k] = morpheme indices of token k."""
    morph = list(morph)
    tokens: List[str] = [morph[0]]
    groups: List[List[int]] = [[0]]

    for i in range(1, len(morph)):
        m_w = morph[i]
        if m_w == SKIP:
            continue
        if m_w in string.punctuation:
            tokens.append(m_w)
            groups.append([i])
            continue
        prev = tokens[-1]
        if m_w == "ה" and prev in "בלכ":
            groups[-1].append(i)  # hidden definite article
        elif m_w == "ה" and prev in "משו":
            assert i < len(morph) - 1
            tokens[-1] = tokens[-1] + "ה" + morph[i + 1]
            groups[-1].extend([i, i + 1])
            morph[i + 1] = SKIP
        elif m_w in ("ל", "ב", "כ") and prev in "וש":
            assert i < len(morph) - 1
            conc = morph[i + 1]
            extra = [i + 1]
            if conc == "ה":
                conc = morph[i + 2]
                morph[i + 2] = SKIP
                extra.append(i + 2)
            tokens[-1] = tokens[-1] + m_w + conc
            # reference quirk: morpheme i itself is merged into the surface
            # but its index is NOT recorded in the group (utils/ner.py:309-320)
            groups[-1].extend(extra)
            morph[i + 1] = SKIP
        elif m_w == "הכל" and prev in "בלכ":
            tokens[-1] = tokens[-1] + "כל"
            groups[-1].append(i)
        elif (len(prev) == 1 and prev in "בלכהשומ") or prev == "כש":
            tokens[-1] = tokens[-1] + m_w
            groups[-1].append(i)
        elif correct_final_letters(m_w) in SINGLE_ENDINGS:
            pron = correct_final_letters(m_w)
            if prev in SINGLE_STYLE_PREPS:
                # reference quirk: its `prev_word = normalise_final_letters(prev_word)`
                # is a DEAD assignment to a local (utils/ner.py:330-334) — the ending
                # is appended to the UNMODIFIED previous surface, so בתוך+הוא → בתוךו
                # (not בתוכו), למען+אני → למעןי.
                tokens[-1] = prev + SINGLE_ENDINGS[pron]
                groups[-1].append(i)
            # the len guard is a deliberate deviation: the reference indexes
            # sentence[-2] unconditionally (utils/ner.py:336) and raises
            # IndexError when יד opens the sentence; we fall through instead.
            elif prev == "יד" and len(tokens) >= 2 and tokens[-2] == "על":
                tokens[-1] = tokens[-1] + SINGLE_ENDINGS[pron]
                groups[-1].append(i)
            elif (nrw := normalise_final_letters(remove_trailing_yud(prev))) in PLURAL_STYLE_PREPS:
                tokens[-1] = nrw + PLURAL_ENDINGS[pron]
                groups[-1].append(i)
            elif prev in ("ממן", "מ"):
                tokens[-1] = tokens[-1] + FROM_ENDINGS[pron]
                groups[-1].append(i)
            elif correct_final_letters(prev) == "עם":
                tokens[-1] = "את" + _shorten_he(SINGLE_ENDINGS[pron])
                groups[-1].append(i)
            elif prev == "את":
                tokens[-1] = "אות" + _shorten_he(SINGLE_ENDINGS[pron])
                groups[-1].append(i)
            elif prev == "אות":
                tokens[-1] = tokens[-1] + _shorten_he(SINGLE_ENDINGS[pron])
                groups[-1].append(i)
            elif prev == "כמו":
                tokens[-1] = tokens[-1] + ("ני" if pron == "אני" else SINGLE_ENDINGS[pron])
                groups[-1].append(i)
            elif prev == "לפי":
                tokens[-1] = "לפ" + PLURAL_ENDINGS[pron]
                groups[-1].append(i)
            elif prev in "וש":
                tokens[-1] = tokens[-1] + m_w
                groups[-1].append(i)
            else:
                tokens.append(m_w)
                groups[-1].append(i)  # reference quirk: new word, index joins
                # the PREVIOUS group (utils/ner.py:390-392)
        else:
            groups.append([i])
            tokens.append(m_w)
    return groups, tokens


def grouping_matches_splitting(morph: Sequence[str], splitting: Sequence[int]) -> bool:
    """A11 (utils/eval/linguistic_groupings.py:14-24): does the rule-based
    grouping reproduce a given morphemes-per-token splitting?"""
    groups, _ = make_groupings(morph)
    return [len(g) for g in groups] == list(splitting)
