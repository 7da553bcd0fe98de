"""Hebrew sentence splitting + tokenization.

Behavior-compatible re-implementation of the reference's two-stage
tokenizer (utils/tokenizer.py:46-149 `text2listOfSentences`,
utils/tokenizer.py:178-211 scanner `tokenize`/`tokenize_sentences`, which
itself derives from Yoav Goldberg's public 2010 Hebrew tokenizer). The
implementation here is new: one compiled master regex with ordered named
alternatives applied via ``finditer`` (same priority semantics as the
reference's ``re.Scanner`` table), and a chunk-scanning sentence splitter.

All functions are pure and stateless; patterns compile once at import so
``map_batches`` workers pay the cost once per process.
"""

from __future__ import annotations

import re
from typing import List

# --- shared character classes (reference: utils/tokenizer.py:12-44) ---
_OPEN = r"[\(\[\{\'\"`]"
_CLOSE = r"[\)\]\}\'\"`]"
_SEP = r"[\.!?]"
_INTERNAL = r"[,;:\-&]"

_NUMBERING = r"(?:(?:[א-י]|\d+)\.)+"
_HEB_ACRONYM = r"(?:(?:[א-ת]\.)+[א-ת]+)"
_NUMERIC = r"(?:[+-]?(?:[0-9][0-9.,\/\-:]*)?(?:[0-9])%?)"
# NOTE the alternation is deliberately UNGROUPED, mirroring the reference's
# re_legalWithSeperator (utils/tokenizer.py:28-32): OPEN* binds only to the
# numbering alternative and CLOSE* only to the acronym alternative, so
# '(5' tokenizes as '(' + '5' and '1990)' as '1990' + ')'. re.Scanner wraps
# each rule in a plain group, which the (?P<legal>...) wrapper reproduces.
_LEGAL_DOTTED = rf"{_OPEN}*{_NUMBERING}|{_NUMERIC}|{_HEB_ACRONYM}{_CLOSE}*"

_URL = r"[a-z]+://\S+"
_ENG = r"[a-zA-Z][a-zA-Z0-9'.]*"
_GARBAGE = r"[^א-תa-zA-Z0-9!?.,:;\-()\[\]{}]+"
_HEB_WORD_PLUS = r"[א-ת](?:[.'`\"\-/\\]?['`]?[א-ת0-9'`])*"
_NON_ACRONYM_QUOTE = r"(?P<head>\w)(?P<mark>[\"\'])(?P<tail>\w{2,})"

_MULTI_SEP = rf"{_SEP}{{2,}}"

# Master token pattern: alternative ORDER encodes the reference scanner's
# rule priority (utils/tokenizer.py:178-193). Python's regex alternation
# picks the first matching alternative at each position, like re.Scanner.
_TOKEN_RE = re.compile(
    "|".join(
        [
            rf"(?P<url>{_URL})",
            rf"(?P<legal>{_LEGAL_DOTTED})",
            rf"(?P<quoted>{_NON_ACRONYM_QUOTE})",
            rf"(?P<heb>{_HEB_WORD_PLUS})",
            rf"(?P<eng>{_ENG})",
            rf"(?P<num>{_NUMERIC})",
            rf"(?P<numbering>{_NUMBERING})",
            rf"(?P<popen>{_OPEN})",
            rf"(?P<pclose>{_CLOSE})",
            rf"(?P<dots>{_MULTI_SEP})",
            rf"(?P<sep>{_SEP})",
            rf"(?P<ipunct>{_INTERNAL})",
            rf"(?P<garbage>{_GARBAGE})",
        ]
    ),
    re.UNICODE,
)

_QUOTE_IN_TOKEN = re.compile(_NON_ACRONYM_QUOTE, re.UNICODE)
_SENT_END = re.compile(rf"(?:{_CLOSE}{_SEP}\n*)|\n+")
_MULTI_SEP_AT = re.compile(_MULTI_SEP)
_SEP_BEFORE_CLOSE = re.compile(rf"{_SEP}{_CLOSE}+$")
_LEGAL_AT = re.compile(_LEGAL_DOTTED)
_CHUNK = re.compile(r"[^ \t\f\v]+(?:[\n][^ \t\f\v]*)*", re.MULTILINE | re.UNICODE)


def split_sentences(text: str) -> List[str]:
    """Rule-based sentence splitter.

    Re-implements the observable behavior of the reference splitter
    (utils/tokenizer.py:46-149): scan whitespace-separated chunks; `!`/`?`
    always end a sentence, `.` ends one unless it is part of an ellipsis
    (`..`/`...`), a dotted legal token (numbering, numeric, acronym), or
    followed by only closing quotes/parens.

    DELIBERATE deviations from the reference (each a data-loss bug there,
    pinned by tests/test_tokenizer.py::test_splitter_deviations):
      1. The trailing unterminated sentence is flushed; the reference drops
         it (no final flush of ``current_sentence``).
      2. Chunk leftovers are kept whenever ``start < n``; the reference's
         ``current_start < len-1`` off-by-one silently drops 1-char tails.
      3. The legal-token branch appends the full matched token; the
         reference slices with a relative ``match.end()`` used as an
         absolute index (utils/tokenizer.py:124), truncating the token
         whenever ``current_start > 0``. We also require the legal match to
         extend past the triggering dot (guard ``m_legal.end() > i``),
         which the reference omits.
    """
    sentences: List[List[str]] = []
    cur: List[str] = []

    def flush_sentence() -> None:
        if cur:
            sentences.append(list(cur))
            cur.clear()

    for chunk in _CHUNK.findall(text):
        start = 0
        i = 0
        n = len(chunk)
        while i < n:
            m_end = _SENT_END.match(chunk, i)
            if m_end:
                if i > start:
                    cur.append(chunk[start:i])
                cur.extend(c for c in chunk[i : m_end.end()] if c != "\n")
                sentences.append(list(cur))
                cur.clear()
                i = m_end.end()
                start = i
                continue
            ch = chunk[i]
            if ch in "!?.":
                m_multi = _MULTI_SEP_AT.match(chunk, i)
                if m_multi:
                    if i > start:
                        cur.append(chunk[start:i])
                    cur.append(chunk[i : m_multi.end()])
                    i = m_multi.end()
                    start = i
                    continue
                m_close = _SEP_BEFORE_CLOSE.match(chunk, i)
                if m_close:
                    if i > start:
                        cur.append(chunk[start:i])
                    cur.extend(chunk[i : m_close.end()])
                    i = m_close.end()
                    start = i
                    continue
                if ch in "!?" or i == n - 1:
                    if i > start:
                        cur.append(chunk[start:i])
                    cur.append(ch)
                    flush_sentence()
                    i += 1
                    start = i
                    continue
                m_legal = _LEGAL_AT.match(chunk, start)
                if m_legal and m_legal.end() > i:
                    cur.append(chunk[start : m_legal.end()])
                    i = m_legal.end()
                    start = i
                    continue
                if i > start:
                    cur.append(chunk[start:i])
                cur.append(ch)
                flush_sentence()
                i += 1
                start = i
                continue
            i += 1
        if start < n:
            cur.append(chunk[start:])

    if cur:
        sentences.append(cur)
    return [" ".join(s) for s in sentences if s]


def tokenize(sent: str) -> List[str]:
    """Tokenize one sentence into space-free tokens.

    Matches the reference scanner's handler behavior
    (utils/tokenizer.py:152-199): non-acronym quote marks are reordered
    (mark first), internal dashes in Hebrew words split into separate
    tokens, and a trailing ``%`` on numerics splits off.
    """
    out: List[str] = []
    for m in _TOKEN_RE.finditer(sent):
        kind = m.lastgroup
        tok = m.group()
        if kind == "quoted":
            tok = m.group("mark") + " " + m.group("head") + m.group("tail")
        elif kind in ("heb", "legal"):
            # reference routes both rules to handleHeb (utils/tokenizer.py:154-161,181):
            # reorder a non-acronym quote mark, split internal dashes. Note the
            # legal rule shadows the numeric rule, so the %-split handler is
            # unreachable for plain numerics in the reference too.
            qm = _QUOTE_IN_TOKEN.match(tok)
            if qm:
                tok = qm.group("mark") + " " + qm.group("head") + qm.group("tail")
            tok = tok.replace("-", " - ")
        elif kind == "num" and tok.endswith("%"):
            tok = tok[:-1] + " %"
        out.extend(tok.split())
    return out


def tokenize_sentences(sentences: List[str]) -> List[List[str]]:
    """Per-sentence tokenization (reference: utils/tokenizer.py:201-211)."""
    return [tokenize(s) for s in sentences]


def text_to_token_sentences(text: str) -> List[List[str]]:
    """Full two-stage pipeline: raw text → sentences → token lists."""
    return tokenize_sentences(split_sentences(text))
