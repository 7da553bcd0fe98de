"""As-of and range joins over the events stream.

Ray Data has no as-of / range join operator, so these are built as the
brief's pattern (a): ONE keyed exchange co-locating both join sides by
``user_id``, then a vectorized per-partition kernel. Partitioning
assumption: all rows of a user fit one partition (hash partitioning by
user; the skew bound is the hottest user's event count, same as any
per-user window — documented, like ops/windows.py sessionization).

Semantics (deterministic, exactly mirrored in SQL):

- ``asof_attribution``: for every LEFT event (default ``purchase``),
  the most recent RIGHT event (default ``click``) of the SAME user with
  ``r.ts < l.ts`` strictly; ties on ``r.ts`` broken by the largest
  ``r.event_id``. Inner semantics — left events with no prior right
  event emit nothing (keeps every output column int64-hashable, no
  NULL/sentinel timestamps). The classic attribution join.
- ``range_join_count``: for every LEFT event, the COUNT of right-side
  events of the same user in the half-open window
  ``[l.ts - window_us, l.ts)``. Left outer semantics (count 0 rows are
  kept) — a range join + aggregate in one pass.

Both kernels are single-pass numpy/pandas over a sorted partition — no
per-row Python, no per-user Python loop (the range kernel answers every
window with two vectorized ``merge_asof`` prefix-count lookups).
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

import numpy as np
import pandas as pd
import pyarrow as pa

from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, typed_empty

_ASOF_SCHEMA = {
    "event_id": "int64",
    "user_id": "int64",
    "prior_event_id": "int64",
    "lag_us": "int64",
}

_RANGE_SCHEMA = {
    "event_id": "int64",
    "user_id": "int64",
    "n_window": "int64",
}


def _sides(left_type: str, right_type: str):
    """Filter events to the two sides, tagging side=0 (left) / 1 (right).
    Column-pruned at the read; one pass, one output table."""
    import pyarrow.compute as pc

    def run(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        b = batch.filter(keep)
        side = pc.if_else(pc.equal(b.column("event_type"), left_type),
                          pa.scalar(0, pa.int64()), pa.scalar(1, pa.int64()))
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "side": side,
            }
        )

    return run


def _events_both(sf_dir: str, left_type: str, right_type: str):
    import ray.data

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return ds.map_batches(_sides(left_type, right_type), batch_format="pyarrow")


def _ts_us(values) -> np.ndarray:
    """datetime64[*] → int64 microseconds since epoch (exact)."""
    return np.asarray(values, dtype="datetime64[us]").astype(np.int64)


def asof_attribution(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click"):
    """As-of join: each ``left_type`` event matched to the latest strictly
    earlier ``right_type`` event of the same user. One hash exchange on
    ``user_id``; per-partition ``pd.merge_asof`` (vectorized C kernel,
    ``by=user_id`` handles the per-user grouping internally).

    Output: (event_id, user_id, prior_event_id, lag_us), inner semantics.
    """

    def agg(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_ASOF_SCHEMA)
        left = part[part["side"] == 0]
        right = part[part["side"] == 1]
        if left.empty or right.empty:
            return typed_empty(_ASOF_SCHEMA)
        # merge_asof picks the LAST eligible right row in frame order, so
        # sorting right by (ts, event_id) makes the ts tie-break "largest
        # event_id" — deterministic under duplicate timestamps.
        left = left.sort_values("ts", kind="mergesort")
        right = right.sort_values(["ts", "event_id"], kind="mergesort")
        right = pd.DataFrame(
            {
                "ts": right["ts"].to_numpy(),
                "user_id": right["user_id"].to_numpy(),
                "prior_event_id": right["event_id"].to_numpy(),
                "prior_ts": right["ts"].to_numpy(),
            }
        )
        m = pd.merge_asof(
            left[["ts", "user_id", "event_id"]], right,
            on="ts", by="user_id",
            direction="backward", allow_exact_matches=False,
        )
        m = m[m["prior_event_id"].notna()]
        if m.empty:
            return typed_empty(_ASOF_SCHEMA)
        lag = _ts_us(m["ts"].to_numpy()) - _ts_us(m["prior_ts"].to_numpy())
        return pd.DataFrame(
            {
                "event_id": m["event_id"].to_numpy(dtype=np.int64),
                "user_id": m["user_id"].to_numpy(dtype=np.int64),
                "prior_event_id": m["prior_event_id"].to_numpy(dtype=np.int64),
                "lag_us": lag,
            }
        )

    both = _events_both(sf_dir, left_type, right_type)
    return bucketed_aggregate(both, ["user_id"], agg)


def range_join_count(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "view", window_us: int = 3_600_000_000):
    """Range join + count: per ``left_type`` event, how many
    ``right_type`` events of the same user fall in
    ``[l.ts - window_us, l.ts)`` (default window 1 hour).

    Kernel: window count = count(r.ts < l.ts) − count(r.ts < l.ts − w),
    each term a prefix count answered by ``pd.merge_asof`` against the
    right side's per-user running count (vectorized; no composite-key
    arithmetic, so no int64-overflow ceiling on partition span × users).
    The second lookup key ``l.ts − w`` is a constant shift, so one left
    sort serves both merges.
    """

    def agg(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_RANGE_SCHEMA)
        left = part[part["side"] == 0]
        if left.empty:
            return typed_empty(_RANGE_SCHEMA)
        right = part[part["side"] == 1]
        left = left.sort_values("ts", kind="mergesort")
        l_user = left["user_id"].to_numpy(dtype=np.int64)
        l_ts = _ts_us(left["ts"].to_numpy())
        if right.empty:
            counts = np.zeros(len(left), dtype=np.int64)
        else:
            right = right.sort_values("ts", kind="mergesort")
            # running per-user count in ts order; under duplicate right
            # ts the asof lookup picks the LAST tied row, whose running
            # count includes the whole tie group — still exact.
            r = pd.DataFrame(
                {
                    "ts": _ts_us(right["ts"].to_numpy()),
                    "user_id": right["user_id"].to_numpy(dtype=np.int64),
                }
            )
            r["cum"] = r.groupby("user_id").cumcount() + 1
            l1 = pd.DataFrame({"ts": l_ts, "user_id": l_user})
            l2 = pd.DataFrame({"ts": l_ts - int(window_us), "user_id": l_user})
            kw = dict(on="ts", by="user_id", direction="backward",
                      allow_exact_matches=False)
            hi = pd.merge_asof(l1, r, **kw)["cum"].fillna(0).to_numpy(dtype=np.int64)
            lo = pd.merge_asof(l2, r, **kw)["cum"].fillna(0).to_numpy(dtype=np.int64)
            counts = hi - lo
        return pd.DataFrame(
            {
                "event_id": left["event_id"].to_numpy(dtype=np.int64),
                "user_id": l_user,
                "n_window": counts,
            }
        )

    both = _events_both(sf_dir, left_type, right_type)
    return bucketed_aggregate(both, ["user_id"], agg)
