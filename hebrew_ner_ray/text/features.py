"""Token-level feature columns — the reference's §2.9 extension surface.

The reference's NCRF++ data layer accepts extra per-token columns in its
BMES files (``word [POS]NN ... label``; utils/data.py:206-232 names them
from the bracket prefix, utils/functions.py:115-121 reads the values and
indexes them through per-feature Alphabets). The engine's counterpart:

- :mod:`hebrew_ner_ray.sources.bmes` parses feature-columned files with
  the exact ``split(']', 1)[-1]`` value quirk;
- this module DERIVES a ``[POS]``-style column inside a tagged pipeline,
  vectorized (Arrow regex kernels), with the identical rule exposed as a
  SQL expression so the driver oracle checks it value-for-value.

The rule itself is the deterministic coarse POS any gazetteer pipeline
can compute without a model: NUM / PUNCT / W. Both regexes are RE2-safe
and anchored, shared verbatim by the Arrow kernel and the DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

FEAT_NUM_RE = "^[0-9][0-9.,%:/-]*$"
FEAT_PUNCT_RE = "^[.,!?()\":;%'-]+$"


def pos_feature_batch(b: pa.Table) -> pa.Table:
    """Append the coarse-POS feature column to a token-row batch."""
    w = b.column("word")
    num = pc.match_substring_regex(w, FEAT_NUM_RE)
    punct = pc.match_substring_regex(w, FEAT_PUNCT_RE)
    feat = pc.if_else(
        num, pa.scalar("NUM"), pc.if_else(punct, pa.scalar("PUNCT"), pa.scalar("W"))
    )
    return b.append_column("feat_pos", feat)


def sql_pos_feature(word_expr: str) -> str:
    """The identical rule as a DuckDB expression."""
    num = FEAT_NUM_RE.replace("'", "''")
    punct = FEAT_PUNCT_RE.replace("'", "''")
    return (
        f"CASE WHEN regexp_matches({word_expr}, '{num}') THEN 'NUM' "
        f"WHEN regexp_matches({word_expr}, '{punct}') THEN 'PUNCT' "
        f"ELSE 'W' END"
    )
