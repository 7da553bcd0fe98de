"""BIOSE label algebra: multi-label collapse, span extraction, tag schemes.

Pure functions over label sequences — the semantic core of the reference's
NER post-processing. Each function documents the reference behavior it
matches (file:line into /root/reference). These run per sentence inside
``map_batches`` UDFs; none of them touch files or global state.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Tuple

MULTI_DELIM = "^"

# Valid caret-joined BIOSE sequences (reference: utils/ner.py:179, from
# Appendix A of the NEMO^2 paper).
_VALID_SEQ = re.compile(r"O+|O*BI*(EO*)?|I+|I*EO*|O*SO*")

# Ordered collapse rules for valid sequences (reference: utils/ner.py:191-202).
_COLLAPSE_RULES: List[Tuple[str, re.Pattern]] = [
    ("B", re.compile(r"^O*BI*$")),
    ("I", re.compile(r"^I+$")),
    ("O", re.compile(r"^O+$")),
    ("S", re.compile(r"^O*(S|BI*E)O*$")),
    ("E", re.compile(r"^I*EO*$")),
]


def validate_multi_to_single(tag: str, multi_delim: str = MULTI_DELIM) -> Tuple[str, bool]:
    """Collapse a caret-joined BIOSE sequence to one token-level label.

    Matches reference utils/ner.py:178-222: validity is checked against the
    Appendix-A regular language; valid sequences collapse through the
    ordered rule table, invalid ones through the relaxed, order-insensitive
    mapping (paper Fig. 11). The category carried is the FIRST category
    seen in the sequence.
    """
    prefixes: List[str] = []
    first_cat = ""
    for label in tag.split(multi_delim):
        if "-" in label:
            pos, cat = label.split("-", 1)
            prefixes.append(pos)
            if not first_cat:
                first_cat = cat
        else:
            prefixes.append("O")
    seq = "".join(prefixes)

    m = _VALID_SEQ.match(seq)
    valid = m is not None  # NOTE: reference uses .match (prefix match), not fullmatch

    single = ""
    if valid:
        for lab, pat in _COLLAPSE_RULES:
            if pat.match(seq):
                single = lab
                break
    else:
        if "S" in seq or ("B" in seq and "E" in seq):
            single = "S"
        elif "E" in seq:
            single = "E"
        elif "B" in seq:
            single = "B"
        elif "I" in seq:
            single = "I"
        else:
            single = "O"

    if single != "O":
        single = f"{single}-{first_cat}"
    return single, valid


def make_spans(labels: Iterable[str]) -> List[str]:
    """Label sequence → span keys ``CAT@[lo,hi]`` / ``CAT@[i]``.

    Matches reference utils/ner.py:398-419: S and B open a span (S closes
    immediately), E closes the most recent open span, I is skipped, and an
    E with no open span is dropped.
    """
    spans: List[str] = []
    for i, label in enumerate(labels):
        if label == "O" or "-" not in label:
            continue
        pos, cat = label.split("-", 1)
        if pos == "I":
            continue
        if pos == "S":
            spans.append(f"{cat}@[{i}]")
        elif pos == "B":
            spans.append(f"{cat}@[{i}")
        elif pos == "E" and spans and "]" not in spans[-1]:
            spans[-1] += f",{i}]"
    return spans


def span_tuples(labels: Iterable[str]) -> List[Tuple[str, int, int]]:
    """Like :func:`make_spans` but returns ``(cat, lo, hi)`` tuples with
    closed bounds — the structured form used for mention extraction.
    Unclosed B-spans (no matching E) are dropped, mirroring the reference's
    span-key format where an unclosed ``CAT@[lo`` never equals a gold key.
    """
    out: List[Tuple[str, int, int]] = []
    open_idx = -1
    open_cat = ""
    for i, label in enumerate(labels):
        if label == "O" or "-" not in label:
            continue
        pos, cat = label.split("-", 1)
        if pos == "S":
            out.append((cat, i, i))
            open_idx = -1
        elif pos == "B":
            open_idx, open_cat = i, cat
        elif pos == "E" and open_idx >= 0:
            out.append((open_cat, open_idx, i))
            open_idx = -1
    return out


def multi_splitting(label: str, multi_delim: str = MULTI_DELIM) -> int:
    """Number of morphemes a caret-joined multi label implies
    (reference: utils/ner.py:162-174)."""
    return label.count(multi_delim) + 1


# --- tag-scheme conversions (reference: utils/tagSchemeConverter.py:14-122),
# re-expressed as pure per-sentence list transforms (no file I/O). ---


def bio_to_bioes(labels: List[str]) -> List[str]:
    out: List[str] = []
    n = len(labels)
    for i, lab in enumerate(labels):
        lab = lab.upper()
        if "-" not in lab:
            out.append(lab)
            continue
        cat = lab.split("-")[-1]
        nxt_inside = i + 1 < n and labels[i + 1].upper().startswith("I-")
        if lab.startswith("B-"):
            out.append(("B-" if nxt_inside else "S-") + cat)
        elif lab.startswith("I-"):
            out.append(("I-" if nxt_inside else "E-") + cat)
        else:
            out.append(lab)
    return out


def bioes_to_bio(labels: List[str]) -> List[str]:
    out: List[str] = []
    for lab in labels:
        lab = lab.upper()
        if "-" not in lab:
            out.append(lab)
            continue
        cat = lab.split("-")[-1]
        if lab.startswith("E-"):
            out.append("I-" + cat)
        elif lab.startswith("S-"):
            out.append("B-" + cat)
        else:
            out.append(lab)
    return out


def iob_to_bio(labels: List[str]) -> List[str]:
    out: List[str] = []
    for i, lab in enumerate(labels):
        lab = lab.upper()
        if lab.startswith("I-"):
            cat = lab.split("-")[-1]
            prev = labels[i - 1].upper() if i else "O"
            if i == 0 or prev == "O" or prev.split("-")[-1] != cat:
                out.append("B-" + cat)
            else:
                out.append(lab)
        else:
            out.append(lab)
    return out
