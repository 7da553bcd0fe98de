"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline staples: language ID, quality scoring, token
counting, fingerprinting. Each is a stateless vectorized ``map_batches``
over column-pruned reads, with an exact DuckDB oracle (registry.py).

Tokenization contract shared with the SQL oracles: whitespace split of
``lower(trim(text))``; "BPE-ish" tokens are ``[a-z0-9_]+|[^a-z0-9_\\s]``
(ASCII classes on both sides — RE2 and Python agree).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")
_BPE = re.compile(r"[a-z0-9_]+|[^a-z0-9_\s]")
_HEB = re.compile(r"[א-ת]")
_ASCII_ALPHA = re.compile(r"[a-z]")

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for")


def ws_tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text.strip().lower()) if t]


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    s = batch["text"]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": s.str.count(r"\S+").astype("int64"),
            "n_bpe_tokens": s.str.lower().str.count(_BPE.pattern).astype("int64"),
            "n_chars": s.str.len().astype("int64"),
        }
    )


def lang_id_batch(batch: pd.DataFrame) -> pd.DataFrame:
    # ratios reported as integer parts-per-million (floor) — float rounding
    # modes differ between numpy (half-even) and SQL (half-away), so exact
    # integers are the only bit-stable cross-engine representation
    s = batch["text"]
    total = s.str.len().astype("float64")
    heb = s.str.count(_HEB.pattern).astype("float64")
    asc = s.str.lower().str.count(_ASCII_ALPHA.pattern).astype("float64")
    heb_ratio = heb / total
    ascii_ratio = asc / total
    guess = np.where(heb_ratio > 0.3, "he", np.where(ascii_ratio > 0.3, "en", "other"))
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "heb_ppm": np.floor(heb_ratio * 1_000_000).astype(np.int64),
            "ascii_ppm": np.floor(ascii_ratio * 1_000_000).astype(np.int64),
            "guessed_lang": guess,
        }
    )


def quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    toks = [ws_tokens(t) for t in batch["text"]]
    n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
    n_stop = np.array([sum(t in STOPWORDS for t in ts) for ts in toks], dtype=np.int64)
    compact_len = np.array([sum(len(t) for t in ts) for ts in toks], dtype=np.float64)
    raw_stop_ratio = n_stop / np.maximum(n_tokens, 1)
    ok = (n_tokens >= 5) & (n_tokens <= 1000) & (raw_stop_ratio < 0.5)  # flag on unrounded
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "avg_token_len_ppm": np.floor(
                compact_len / np.maximum(n_tokens, 1) * 1_000_000
            ).astype(np.int64),
            "stop_ppm": np.floor(raw_stop_ratio * 1_000_000).astype(np.int64),
            "quality_ok": ok.astype(np.int64),
        }
    )


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    norm = batch["text"].str.lower().str.replace(_WS.pattern, " ", regex=True)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": [hashlib.md5(t.encode()).hexdigest() for t in norm],
        }
    )
