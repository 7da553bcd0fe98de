"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windowing; these express the standard window
shapes the way the engine would at scale (ray_guide.md §streaming):

- tumbling: window key computed vectorized per batch + per-batch partial
  aggregation → small groupby (no per-key state, pure shuffle-light agg).
- session: per-batch session combiner → keyed exchange of session
  partials (~events/10) → per-user interval merge; state never crosses a
  key boundary and the shuffle ships sessions, not events.
- top-k users: partial agg → groupby → sort/limit.
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

import numpy as np
import pandas as pd

SESSION_GAP_US = 30 * 60 * 1_000_000
WINDOW_US = 3_600 * 1_000_000

_TUMBLE_COLS = {"user_id": "int64", "window_us": "int64",
                "n_events": "int64", "total_value_micro": "int64"}
_SESSION_COLS = {"user_id": "int64", "session_id": "int64", "n_events": "int64",
                 "start_us": "int64", "end_us": "int64", "total_value_micro": "int64"}
_TOP_COLS = {"user_id": "int64", "total_value_micro": "int64", "n_events": "int64"}


def _epoch_us(ts: pd.Series) -> pd.Series:
    # normalize to µs explicitly — pandas 2 preserves the parquet unit
    # (datetime64[us]), so a blind int64 view would be unit-dependent
    return ts.astype("datetime64[us]").astype("int64")


def _micro(v: pd.Series) -> np.ndarray:
    """Integer micro-units (floor(value*1e6)) so distributed sums are exact
    and match the SQL oracle bit-for-bit."""
    return np.floor(v.to_numpy() * 1_000_000).astype(np.int64)


def _project_events_arrow(t):
    """Arrow-native (event_id, user_id, ts_us, value_micro) projection —
    the scan stage shared by the per-user window family. Two casts and a
    floor-multiply, zero pandas conversion; floor(v·1e6) is the same
    IEEE multiply as :func:`_micro`, timestamp[us] → int64 the exact
    epoch-µs view of :func:`_epoch_us`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pa.table({
        "event_id": t.column("event_id"),
        "user_id": t.column("user_id"),
        "ts_us": pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                         pa.int64()),
        "value_micro": pc.cast(
            pc.floor(pc.multiply(t.column("value"),
                                 pa.scalar(1_000_000.0))), pa.int64()),
    })


def tumbling_partials(batch: pd.DataFrame) -> pd.DataFrame:
    us = _epoch_us(batch["ts"])
    win = (us // WINDOW_US) * WINDOW_US
    g = (
        pd.DataFrame({"user_id": batch["user_id"], "window_us": win,
                      "value_micro": _micro(batch["value"])})
        .groupby(["user_id", "window_us"], as_index=False)
        .agg(n_events=("value_micro", "size"), total_value_micro=("value_micro", "sum"))
    )
    return g


def events_tumbling(sf_dir: str):
    """Per (user, hour) event count + value sum — (user, window) keys are
    high-cardinality at scale, so the reduce is a bucketed aggregate."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"])
    partials = ds.map_batches(tumbling_partials, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_TUMBLE_COLS)
        out = g.groupby(["user_id", "window_us"], as_index=False).agg(
            n_events=("n_events", "sum"), total_value_micro=("total_value_micro", "sum")
        )
        return out.astype(_TUMBLE_COLS)

    from hebrew_ner_ray.ops.shuffle import partitions_for

    return sized_aggregate(partials, ["user_id", "window_us"], reduce,
                           coalesce=partitions_for())


_SPART_COLS = {"user_id": "int64", "start_us": "int64", "end_us": "int64",
               "n_events": "int64", "total_value_micro": "int64"}


def _session_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch sessionization: rows → maximal sessions WITHIN the batch
    (user, start_us, end_us, n_events, total_value_micro). The combiner
    that makes the exchange ship sessions (~events/10) instead of raw
    events — exact because 1-D single-linkage clustering (gap ≤ G) is
    associative under partitioning: merging partial session INTERVALS
    whose end→start gap ≤ G reproduces the global clustering."""
    if batch.empty:
        from hebrew_ner_ray.ops.shuffle import typed_empty

        return typed_empty(_SPART_COLS)
    df = pd.DataFrame({"user_id": batch["user_id"].to_numpy(),
                       "us": _epoch_us(batch["ts"]).to_numpy(),
                       "value_micro": _micro(batch["value"])})
    df = df.sort_values(["user_id", "us"], kind="stable")
    us = df["us"].to_numpy()
    uid = df["user_id"].to_numpy()
    brk = np.ones(len(df), dtype=np.int64)
    same_user = uid[1:] == uid[:-1]
    brk[1:] = (~same_user | (np.diff(us) > SESSION_GAP_US)).astype(np.int64)
    sid = np.cumsum(brk)
    g = (
        pd.DataFrame({"user_id": uid, "sid": sid, "us": us,
                      "value_micro": df["value_micro"].to_numpy()})
        .groupby(["user_id", "sid"], as_index=False)
        .agg(start_us=("us", "min"), end_us=("us", "max"),
             n_events=("us", "size"), total_value_micro=("value_micro", "sum"))
        .drop(columns=["sid"])
    )
    return g.astype(_SPART_COLS)[list(_SPART_COLS)]


def _merge_session_partials(g: pd.DataFrame) -> pd.DataFrame:
    """Partial sessions (any number of users, each user complete) → final
    session rows: interval merge on end→start gap ≤ G, VECTORIZED across
    users with groupby cummax/shift (no per-user python loop — the
    single-task small path depends on this). Per-user session_id numbers
    by start time, matching the event-level sessionizer exactly."""
    g = g.sort_values(["user_id", "start_us"], kind="stable").reset_index(drop=True)
    cummax_end = g.groupby("user_id")["end_us"].cummax()
    prev_end = cummax_end.groupby(g["user_id"]).shift(1)
    new_session = prev_end.isna() | (g["start_us"] - prev_end > SESSION_GAP_US)
    sid_global = new_session.cumsum()
    session_id = sid_global - sid_global.groupby(g["user_id"]).transform("min") + 1
    out = (
        g.assign(session_id=session_id)
        .groupby(["user_id", "session_id"], as_index=False)
        .agg(n_events=("n_events", "sum"), start_us=("start_us", "min"),
             end_us=("end_us", "max"), total_value_micro=("total_value_micro", "sum"))
    )
    return out.astype(_SESSION_COLS)[list(_SESSION_COLS)]


def events_sessions(sf_dir: str):
    """Session windows (gap > 30 min) per user — per-batch session
    combiner, then a keyed exchange of SESSION partials (~10× smaller than
    the raw events) merged per user.

    Skew status (the per-key window family contract, see
    events_concurrency): the combiner already bounds a hot user's
    exchange volume to their PARTIAL-SESSION count (dense activity
    collapses to few sessions per block), so the residual exposure is a
    user whose DISTINCT session count alone exceeds a worker — an order
    rarer than raw-event skew. A time-bucketed arm like
    events_concurrency's is NOT cleanly available here: session merging
    chains (a long carry session may absorb an arbitrary prefix of any
    later bucket's sessions), so the exact distributed form needs a
    per-user ordered scan over session-granularity partials — the same
    co-location this plain arm already does. Documented rather than
    dispatched; events_concurrency / events_rolling_window carry the
    bucketed arms, events_top_per_user is combiner-bounded (≤ k rows
    per (user, block))."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"])
    partials = ds.map_batches(_session_partials, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_SESSION_COLS)
        return _merge_session_partials(g)

    return sized_aggregate(partials, ["user_id"], merge)


HOP_US = 900 * 1_000_000  # 15-min hop → each event in WINDOW_US/HOP_US = 4 windows


def hopping_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Hopping (sliding) window partials: event at t belongs to every
    window start s ≡ 0 (mod hop) with s ≤ t < s+W — exactly W/hop
    windows, emitted vectorized by a 4× repeat with hop offsets, then
    batch-local aggregation (the exchange ships (user, window) partials,
    ~4× the tumbling volume, never raw events)."""
    n_wins = WINDOW_US // HOP_US
    us = _epoch_us(batch["ts"]).to_numpy()
    base = (us // HOP_US) * HOP_US
    k = np.tile(np.arange(n_wins, dtype=np.int64), len(us))
    win = np.repeat(base, n_wins) - k * HOP_US
    g = (
        pd.DataFrame({"user_id": np.repeat(batch["user_id"].to_numpy(), n_wins),
                      "window_us": win,
                      "value_micro": np.repeat(_micro(batch["value"]), n_wins)})
        .groupby(["user_id", "window_us"], as_index=False)
        .agg(n_events=("value_micro", "size"), total_value_micro=("value_micro", "sum"))
    )
    return g


def events_hopping(sf_dir: str):
    """Per (user, 1-h window hopping every 15 min) count + value sum —
    same partial/reduce shape as tumbling, 4× the partial keys."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import partitions_for, sized_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"])
    partials = ds.map_batches(hopping_partials, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_TUMBLE_COLS)
        out = g.groupby(["user_id", "window_us"], as_index=False).agg(
            n_events=("n_events", "sum"), total_value_micro=("total_value_micro", "sum")
        )
        return out.astype(_TUMBLE_COLS)

    return sized_aggregate(partials, ["user_id", "window_us"], reduce,
                           coalesce=partitions_for())


def events_top_users(sf_dir: str, k: int = 20):
    """Top-k users by total event value (partial agg → groupby → sort/limit)."""
    import ray.data

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"user_id": b["user_id"], "value_micro": _micro(b["value"])})
            .groupby("user_id", as_index=False)
            .agg(total_value_micro=("value_micro", "sum"), n_events=("value_micro", "size"))
        )

    from hebrew_ner_ray.ops.shuffle import typed_empty

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_TOP_COLS)
        out = g.groupby("user_id", as_index=False).agg(
            total_value_micro=("total_value_micro", "sum"), n_events=("n_events", "sum")
        )
        return out[list(_TOP_COLS)].astype(_TOP_COLS)

    from hebrew_ner_ray.ops.shuffle import partitions_for, sized_aggregate

    agg = sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                          ["user_id"], reduce, coalesce=partitions_for())
    return agg.sort(["total_value_micro", "user_id"], descending=[True, False]).limit(k)


_TOPPER_COLS = {"user_id": "int64", "rank": "int64", "event_id": "int64",
                "value_micro": "int64"}


def events_top_per_user(sf_dir: str, k: int = 3):
    """Group-wise top-k: each user's k highest-value events (the QUALIFY
    row_number() idiom). The per-batch combiner keeps only each user's
    local top-k (the exchange ships ≤ k rows per (user, block), never the
    event stream), then one keyed exchange finishes the rank per complete
    user. Ties break on value DESC, then event_id ASC — deterministic and
    stated identically in the SQL twin."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "value"])

    def topk(b: pd.DataFrame, with_rank: bool) -> pd.DataFrame:
        b = b.sort_values(["user_id", "value_micro", "event_id"],
                          ascending=[True, False, True], kind="mergesort")
        rank = b.groupby("user_id", sort=False).cumcount() + 1
        b = b[rank <= k]
        if with_rank:
            b = b.assign(rank=rank[rank <= k].to_numpy())
            return b[list(_TOPPER_COLS)].astype(_TOPPER_COLS)
        return b

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return topk(
            pd.DataFrame({"event_id": b["event_id"].to_numpy(dtype=np.int64),
                          "user_id": b["user_id"].to_numpy(dtype=np.int64),
                          "value_micro": _micro(b["value"])}),
            with_rank=False,
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_TOPPER_COLS)
        return topk(g, with_rank=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_aggregate(partials, ["user_id"], reduce,
                              coalesce=partitions_for())


FUNNEL_STAGES = ("view", "click", "purchase")
_FUNNEL_COLS = {"user_id": "int64", "depth": "int64",
                "t1_us": "int64", "t2_us": "int64", "t3_us": "int64"}


def events_funnel(sf_dir: str):
    """Per-user staged conversion funnel over ``FUNNEL_STAGES`` — the
    event-sequence analytic every product pipeline runs.

    Semantics (greedy earliest-completion, pinned identically in the SQL
    twin): t1 = the user's earliest 'view'; t2 = earliest 'click'
    STRICTLY after t1; t3 = earliest 'purchase' strictly after t2;
    depth = number of stages reached (0–3, missing stage ts = −1).
    Population = every user with ≥1 event of any type.

    Scale shape: the read is column-pruned, non-stage events collapse to
    a per-batch distinct-user combiner row (they only vote on the
    population), stage events ship as (user, stage, ts) — then ONE keyed
    exchange on user_id co-locates each user's stage events and the
    funnel is computed fully vectorized per partition (three
    groupby-min/merge rounds, no per-user Python loop)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    code_of = {s: i + 1 for i, s in enumerate(FUNNEL_STAGES)}

    def project(b: pd.DataFrame) -> pd.DataFrame:
        code = b["event_type"].map(code_of).fillna(0).astype(np.int64)
        us = _epoch_us(b["ts"]).to_numpy()
        stage = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(dtype=np.int64),
            "code": code.to_numpy(),
            "us": us,
        })
        pop = stage.loc[stage["code"] == 0, ["user_id"]].drop_duplicates()
        pop = pop.assign(code=np.int64(0), us=np.int64(-1))
        return pd.concat([stage[stage["code"] > 0], pop], ignore_index=True)

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    rows = ds.map_batches(project, batch_format="pandas")

    def funnel(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_FUNNEL_COLS)
        users = part[["user_id"]].drop_duplicates()
        t1 = (part[part["code"] == 1].groupby("user_id")["us"].min()
              .rename("t1_us").reset_index())
        c = part[part["code"] == 2].merge(t1, on="user_id")
        t2 = (c[c["us"] > c["t1_us"]].groupby("user_id")["us"].min()
              .rename("t2_us").reset_index())
        p = part[part["code"] == 3].merge(t2, on="user_id")
        t3 = (p[p["us"] > p["t2_us"]].groupby("user_id")["us"].min()
              .rename("t3_us").reset_index())
        out = (users.merge(t1, on="user_id", how="left")
               .merge(t2, on="user_id", how="left")
               .merge(t3, on="user_id", how="left"))
        depth = (out[["t1_us", "t2_us", "t3_us"]].notna().sum(axis=1)
                 .astype(np.int64))
        out = out.fillna(-1)
        out["depth"] = depth
        return out[list(_FUNNEL_COLS)].astype(_FUNNEL_COLS)

    return bucketed_aggregate(rows, ["user_id"], funnel,
                              coalesce=partitions_for())


_PROPS_COLS = {"k_bucket": "int64", "n_events": "int64",
               "total_value_micro": "int64"}


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the
    ``props`` JSON-string column (vectorized regex — no per-row json
    parser in the hot path; the contract '"k": <int>' is pinned by the
    json_extract SQL twin), bucket it by tens, and aggregate count +
    exact micro-unit value sums per bucket. The per-batch combiner ships
    ≤ #buckets rows per block."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["props", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            b["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce")
        keep = k.notna()
        g = pd.DataFrame({
            "k_bucket": (k[keep].astype(np.int64) // 10) * 10,
            "value_micro": _micro(b.loc[keep, "value"]),
        }).groupby("k_bucket", as_index=False).agg(
            n_events=("value_micro", "size"),
            total_value_micro=("value_micro", "sum"))
        return g.astype(_PROPS_COLS) if len(g) else typed_empty(_PROPS_COLS)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_PROPS_COLS)
        return (g.groupby("k_bucket", as_index=False)
                .agg(n_events=("n_events", "sum"),
                     total_value_micro=("total_value_micro", "sum"))
                .astype(_PROPS_COLS))

    return sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                           ["k_bucket"], merge)


WINDOW_KMV_K = 64
_WKMV_COLS = {"window_us": "int64", "k_used": "int64",
              "kth_hash": "int64", "est_distinct": "int64"}


def events_window_distinct(sf_dir: str, k: int = WINDOW_KMV_K):
    """Distinct users per 1-h tumbling window via a per-window KMV
    sketch — the windowed-cardinality composite (exact COUNT DISTINCT per
    window needs a per-window user set; the sketch's exchange ships ≤ k
    hashes per (window, block) instead).

    Deterministic end-to-end like :func:`~hebrew_ner_ray.ops.textstats.
    distinct_tokens_kmv`: hashes are the shared 60-bit md5 ``stable_id``
    of the user id, so the per-window kth-minimum AND the estimate are
    exactly SQL-reproducible; windows with fewer than k distinct users
    (the common case) are exact."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    HASH_SPACE = 1 << 60

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        win = (_epoch_us(b["ts"]).to_numpy() // WINDOW_US) * WINDOW_US
        g = pd.DataFrame({
            "window_us": win,
            "h": stable_ids([str(u) for u in b["user_id"].to_numpy()]),
        }).drop_duplicates()
        g = g.sort_values(["window_us", "h"], kind="mergesort")
        g = g[g.groupby("window_us", sort=False).cumcount() < k]
        return g.astype({"window_us": "int64", "h": "int64"})

    def finalize(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_WKMV_COLS)
        part = part.drop_duplicates().sort_values(["window_us", "h"],
                                                  kind="mergesort")
        rows = []
        for win, g in part.groupby("window_us", sort=False):
            h = g["h"].to_numpy()
            k_used = int(min(len(h), k))
            kth = int(h[k_used - 1])
            est = len(h) if len(h) < k else (k - 1) * HASH_SPACE // kth
            rows.append({"window_us": int(win), "k_used": k_used,
                         "kth_hash": kth, "est_distinct": int(est)})
        return pd.DataFrame(rows).astype(_WKMV_COLS)

    return bucketed_aggregate(ds.map_batches(partial, batch_format="pandas"),
                              ["window_us"], finalize,
                              coalesce=partitions_for())


_RT_COLS = {"event_id": "int64", "user_id": "int64", "ts_us": "int64",
            "seq": "int64", "prev_gap_us": "int64", "running_value_micro": "int64"}


def events_running_total(sf_dir: str):
    """Per-user running aggregates — the SQL window-function family
    (SUM OVER, ROW_NUMBER, LAG) as one keyed exchange.

    A user's prefix sums need that user's events colocated and ordered —
    inherent to the semantics (same partitioning contract as the as-of
    join). One hash exchange on ``user_id``; inside each complete-key
    partition the whole computation is vectorized: one mergesort by
    (user_id, ts, event_id) — the deterministic tie-break stated in the
    oracle's window — then groupby cumcount/cumsum/diff. State never
    crosses a partition, output is event-sized and streams to the sink.
    ``prev_gap_us`` is −1 on a user's first event (no nullable ints on
    the exchange)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_RT_COLS)
        p = p.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        gb = p.groupby("user_id", sort=False)
        p["seq"] = (gb.cumcount() + 1).astype("int64")
        p["prev_gap_us"] = gb["ts_us"].diff().fillna(-1).astype("int64")
        p["running_value_micro"] = gb["value_micro"].cumsum().astype("int64")
        return p[list(_RT_COLS)].astype(_RT_COLS)

    return bucketed_aggregate(
        ds.map_batches(_project_events_arrow, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], per_partition, coalesce=partitions_for())


_MODE_COLS = {"user_id": "int64", "top_event_type": "object", "n_events": "int64"}


def events_mode_type(sf_dir: str):
    """Per-user modal event type (argmax aggregate). The per-batch
    (user, type) count combiner shrinks the exchange to distinct pairs;
    each complete-user partition picks the winner vectorized — one
    mergesort by (user, n DESC, type) + groupby-head. Tie-break pinned:
    higher count, then lexicographically smaller type — the same window
    stated in the SQL oracle."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["user_id", "event_type"], as_index=False)
                .size().rename(columns={"size": "n"}))

    def pick(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_MODE_COLS)
        g = p.groupby(["user_id", "event_type"], as_index=False).agg(n=("n", "sum"))
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("user_id", sort=False).head(1)
        return (top.rename(columns={"event_type": "top_event_type",
                                    "n": "n_events"})
                [list(_MODE_COLS)].astype(_MODE_COLS))

    return bucketed_aggregate(ds.map_batches(partial, batch_format="pandas"),
                              ["user_id"], pick, coalesce=partitions_for())


DAY_US = 86_400 * 1_000_000

_SUFF_COLS = {"event_type": "object", "day_us": "int64", "n": "int64",
              "sum_x": "int64", "sum_x2": "int64", "sum_k": "int64",
              "sum_k2": "int64", "sum_xk": "int64"}


def events_sufficient_stats(sf_dir: str):
    """Mergeable sufficient statistics per (event_type, day): n, Σx, Σx²,
    Σk, Σk², Σxk with x = floor(value·100) (centi-units) and k the JSON
    ``props.$.k`` integer. Everything downstream — variance, covariance,
    correlation, OLS slope — is a driver-side O(groups) formula over
    these exact integers; the distributed part ships ≤ #groups rows per
    block (classic moment-sketch combiner).

    int64 bound: at this value domain (x ≤ ~5.7e4, k ≤ ~100) the second
    moments stay exact past 1e9 rows per (type, day) group; a deployment
    beyond that promotes the Σx²/Σxk partials to a (hi, lo) 128-bit
    split — the combiner shape is unchanged."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "props", "value"])

    sum_cols = ["n", "sum_x", "sum_x2", "sum_k", "sum_k2", "sum_xk"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            b["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce")
        keep = k.notna()
        if not keep.any():
            return typed_empty(_SUFF_COLS)
        b = b[keep]
        kk = k[keep].astype(np.int64).to_numpy()
        x = np.floor(b["value"].to_numpy() * 100).astype(np.int64)
        day = (_epoch_us(b["ts"]).to_numpy() // DAY_US) * DAY_US
        g = (pd.DataFrame(
            {"event_type": b["event_type"].to_numpy(), "day_us": day,
             "n": np.ones(len(b), dtype=np.int64), "sum_x": x,
             "sum_x2": x * x, "sum_k": kk, "sum_k2": kk * kk,
             "sum_xk": x * kk})
            .groupby(["event_type", "day_us"], as_index=False)[sum_cols]
            .sum())
        return g[list(_SUFF_COLS)].astype(_SUFF_COLS)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_SUFF_COLS)
        out = (g.groupby(["event_type", "day_us"], as_index=False)[sum_cols]
               .sum())
        return out[list(_SUFF_COLS)].astype(_SUFF_COLS)

    return sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                           ["event_type", "day_us"], merge)


_SETOP_COLS = {"n_both": "int64", "n_view_only": "int64",
               "n_purchase_only": "int64"}


def events_user_setops(sf_dir: str):
    """Distributed set algebra on user sets (INTERSECT / EXCEPT):
    viewers ∩ purchasers, viewers ∖ purchasers, purchasers ∖ viewers.
    Per-batch (user, has_view, has_purchase) boolean combiner → one
    user-keyed exchange ORs the flags per complete user → per-partition
    counts → one-row final. The exchange ships ≤ one row per (user,
    block); nothing user-set-sized reaches the driver."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    _F = {"user_id": "int64", "v": "int64", "p": "int64"}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b["event_type"]
        g = (pd.DataFrame({"user_id": b["user_id"],
                           "v": (t == "view").astype(np.int64),
                           "p": (t == "purchase").astype(np.int64)})
             .groupby("user_id", as_index=False).agg(v=("v", "max"),
                                                     p=("p", "max")))
        return g[g[["v", "p"]].any(axis=1)].astype(_F)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_SETOP_COLS)
        u = g.groupby("user_id", as_index=False).agg(v=("v", "max"),
                                                     p=("p", "max"))
        v = u["v"].to_numpy(dtype=bool)
        p = u["p"].to_numpy(dtype=bool)
        return pd.DataFrame(
            {"n_both": [int((v & p).sum())],
             "n_view_only": [int((v & ~p).sum())],
             "n_purchase_only": [int((~v & p).sum())]}).astype(_SETOP_COLS)

    parts = bucketed_aggregate(ds.map_batches(partial, batch_format="pandas"),
                               ["user_id"], count_part,
                               coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_SETOP_COLS)
        return (g[list(_SETOP_COLS)].sum().to_frame().T
                .astype(_SETOP_COLS))

    return small_key_aggregate(parts, final)


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")
_PIVOT_COLS = {"day_us": "int64",
               **{f"n_{t}": "int64" for t in _PIVOT_TYPES}}


def events_pivot_daily(sf_dir: str):
    """PIVOT: per-day event counts spread into one column per event type
    (the wide-table reshape). The pivot happens IN the per-batch combiner
    (conditional counts → ≤ one row per (day, block)), so the exchange
    and final reduce only ever see the wide shape — a pivot over 100 TB
    costs the same small aggregate as any day-keyed rollup. Unknown
    types are counted into none of the columns by construction; the
    column set is the pinned _PIVOT_TYPES domain, stated in the SQL
    twin's conditional aggregation."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (_epoch_us(b["ts"]).to_numpy() // DAY_US) * DAY_US
        f = pd.DataFrame({"day_us": day})
        for t in _PIVOT_TYPES:
            f[f"n_{t}"] = (b["event_type"] == t).to_numpy(dtype=np.int64)
        return (f.groupby("day_us", as_index=False).sum()
                [list(_PIVOT_COLS)].astype(_PIVOT_COLS))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_PIVOT_COLS)
        return (g.groupby("day_us", as_index=False).sum()
                [list(_PIVOT_COLS)].astype(_PIVOT_COLS))

    return sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                           ["day_us"], merge)


SEQ_K = 20
_SEQ_COLS = {"t1": "object", "t2": "object", "t3": "object",
             "n": "int64", "rnk": "int64"}


def events_top_sequences(sf_dir: str, k: int = SEQ_K):
    """Sequence mining lite: the top-k consecutive event-type TRIGRAMS
    over per-user time-ordered streams. One user-keyed exchange orders
    each user's events ((ts, event_id) tie-break — the as-of contract);
    trigrams are formed vectorized by shifting within the partition and
    masking user boundaries; the per-partition count combiner shrinks
    everything to the tiny type³ domain before one small final top-k."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    _P = {"t1": "object", "t2": "object", "t3": "object", "n": "int64"}

    def trigrams(p: pd.DataFrame) -> pd.DataFrame:
        if len(p) < 3:
            return typed_empty(_P)
        p = pd.DataFrame({"user_id": p["user_id"],
                          "ts_us": _epoch_us(p["ts"]),
                          "event_id": p["event_id"],
                          "t1": p["event_type"]})
        p = p.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = p["user_id"].to_numpy()
        t = p["t1"].to_numpy()
        same = (u[:-2] == u[1:-1]) & (u[:-2] == u[2:])
        if not same.any():
            return typed_empty(_P)
        g = (pd.DataFrame({"t1": t[:-2][same], "t2": t[1:-1][same],
                           "t3": t[2:][same]})
             .groupby(["t1", "t2", "t3"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return g[list(_P)].astype(_P)

    partials = bucketed_aggregate(ds, ["user_id"], trigrams,
                                  coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_SEQ_COLS)
        out = g.groupby(["t1", "t2", "t3"], as_index=False).agg(n=("n", "sum"))
        out = out.sort_values(["n", "t1", "t2", "t3"],
                              ascending=[False, True, True, True],
                              kind="mergesort").head(k).reset_index(drop=True)
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[list(_SEQ_COLS)].astype(_SEQ_COLS)

    return small_key_aggregate(partials, final)


_COHORT_COLS = {"cohort_us": "int64", "day_offset": "int64",
                "n_users": "int64"}


def events_cohort_retention(sf_dir: str):
    """Cohort retention: users grouped by first-active day; for each
    (cohort day, day offset) the count of distinct users active on that
    offset. One user-keyed exchange computes each user's first day and
    distinct active days locally; the per-partition combiner emits
    (cohort, offset, count) partials over the tiny day×day domain, one
    small task finishes."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_COHORT_COLS)
        day = (_epoch_us(p["ts"]).to_numpy() // DAY_US) * DAY_US
        f = pd.DataFrame({"user_id": p["user_id"], "day_us": day}
                         ).drop_duplicates()
        first = f.groupby("user_id")["day_us"].transform("min")
        g = pd.DataFrame(
            {"cohort_us": first,
             "day_offset": (f["day_us"].to_numpy() - first.to_numpy())
             // DAY_US})
        out = (g.groupby(["cohort_us", "day_offset"], as_index=False)
               .size().rename(columns={"size": "n_users"}))
        return out[list(_COHORT_COLS)].astype(_COHORT_COLS)

    partials = bucketed_aggregate(ds, ["user_id"], per_partition,
                                  coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_COHORT_COLS)
        return (g.groupby(["cohort_us", "day_offset"], as_index=False)
                .agg(n_users=("n_users", "sum"))
                [list(_COHORT_COLS)].astype(_COHORT_COLS))

    return small_key_aggregate(partials, final)


_CONC_COLS = {"user_id": "int64", "max_concurrency": "int64"}

# Skew contract for the per-key window family (rolling_window,
# concurrency, sessions, top_per_user): the plain arm co-locates each
# key's COMPLETE history on one worker, so a pathological hot key (one
# user holding the whole corpus) must fit that worker's heap. Below
# SKEW_SAFE_ROWS total table rows this holds for ANY key distribution
# (the sweep kernels are a few numpy arrays per row), so the plain arm
# is provably safe and free; above it, the time-bucketed arm splits
# every key by fixed time buckets — each (key, bucket) cell is bounded
# by the bucket's row count — and carries boundary partials, at the
# cost of one extra (tiny, combiner-shrunk) exchange.
SKEW_SAFE_ROWS = 20_000_000
SKEW_BUCKET_US = 3_600_000_000  # 1 h time buckets in the bucketed arms


def _events_rows(sf_dir: str) -> int:
    import pyarrow.parquet as _pq

    return _pq.read_metadata(f"{sf_dir}/events.parquet").num_rows


def events_concurrency(sf_dir: str, skew_safe_rows: int = SKEW_SAFE_ROWS):
    """Per-user MAX CONCURRENT intervals — the interval-overlap sweep.

    Each event is the half-open interval [ts, ts + value seconds); the
    answer per user is the max number of simultaneously-open intervals,
    attained at some interval start. One keyed exchange on user_id
    co-locates each user's events; the per-user kernel is the classic
    sorted sweep (starts vs ends two-pointer via searchsorted), O(k log k)
    per user with no pairwise blow-up — the SQL twin's self-join is
    O(k²) per user and exists only as the semantics statement. Zero-length
    intervals (non-positive durations) are dropped on BOTH sides, so
    every kept event covers its own start and max ≥ 1 for emitted users.
    Skew dispatch (SKEW_SAFE_ROWS): tables small enough that even a
    single-user corpus fits one worker take this plain one-exchange arm;
    larger tables take the time-bucketed arm (each user's sweep split by
    SKEW_BUCKET_US buckets, per-bucket (net-delta, local-max) partials
    merged in a per-user carry scan over bucket-count-sized rows).
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import grouped_exchange, typed_empty

    if _events_rows(sf_dir) > skew_safe_rows:
        return _events_concurrency_bucketed(sf_dir)

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def iv(b: pd.DataFrame) -> pd.DataFrame:
        s = _epoch_us(b["ts"]).to_numpy()
        dur = _micro(b["value"])
        out = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(dtype=np.int64),
            "s": s, "e": s + dur,
        })
        return out[out["e"] > out["s"]]

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_CONC_COLS)
        starts = np.sort(g["s"].to_numpy())
        ends = np.sort(g["e"].to_numpy())
        # open intervals at start t: #starts ≤ t − #ends ≤ t  ([s,e) covers
        # t iff s ≤ t < e); evaluated at every start, max is the answer
        conc = (np.arange(1, len(starts) + 1)
                - np.searchsorted(ends, starts, side="right"))
        return pd.DataFrame({"user_id": [np.int64(g["user_id"].iloc[0])],
                             "max_concurrency": [np.int64(conc.max())]})

    return grouped_exchange(ds.map_batches(iv, batch_format="pandas"),
                            ["user_id"], sweep)


def _events_concurrency_bucketed(sf_dir: str):
    """Skew arm for events_concurrency: the interval sweep split by time
    bucket so no single worker ever holds a whole hot user.

    Each kept interval [s, e) becomes two delta rows: (+1 at s) in
    bucket(s) and (−1 at e) in bucket(e). Exchange 1 is keyed on
    (user_id, bucket): the per-cell kernel sorts its deltas by (time,
    delta) — a −1 at time t sorts BEFORE a +1 at t because an interval
    ending at t does not cover t while one starting at t covers itself —
    and reduces the cell to net = Σdelta plus local_max = max running
    sum AT +1 positions (−2⁶² when the cell has no starts: closes-only
    cells contribute to later baselines but never attain the max).
    Exchange 2 is keyed on user_id over these bucket partials — rows per
    user = #active buckets, bounded by time span / SKEW_BUCKET_US no
    matter how many events the user has — and the carry scan computes
    max over buckets of (prefix of previous nets + local_max). Exact:
    the running count at any start equals its bucket's baseline (prefix
    of earlier buckets' nets) plus the within-bucket running sum. Both
    kernels are whole-partition vectorized (one mergesort + cumsum with
    segment-boundary baselines), never a Python loop per cell."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    _D = {"user_id": "int64", "bucket": "int64", "t": "int64",
          "delta": "int64"}
    _P = {"user_id": "int64", "bucket": "int64", "net": "int64",
          "local_max": "int64"}
    _NO_START = -(2 ** 62)

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def deltas(b: pd.DataFrame) -> pd.DataFrame:
        s = _epoch_us(b["ts"]).to_numpy()
        dur = _micro(b["value"])
        u = b["user_id"].to_numpy(dtype=np.int64)
        keep = (s + dur) > s
        s, e, u = s[keep], (s + dur)[keep], u[keep]
        return pd.DataFrame({
            "user_id": np.concatenate([u, u]),
            "bucket": np.concatenate([s, e]) // SKEW_BUCKET_US,
            "t": np.concatenate([s, e]),
            "delta": np.concatenate([np.ones(len(s), dtype=np.int64),
                                     -np.ones(len(e), dtype=np.int64)]),
        }).astype(_D)

    def cell_reduce(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_P)
        # delta −1 < +1, so the mergesort puts closes before opens at
        # equal t — exactly the [s, e) evaluation order
        p = p.sort_values(["user_id", "bucket", "t", "delta"],
                          kind="mergesort")
        u = p["user_id"].to_numpy()
        bk = p["bucket"].to_numpy()
        d = p["delta"].to_numpy()
        new_cell = np.r_[True, (u[1:] != u[:-1]) | (bk[1:] != bk[:-1])]
        cid = np.cumsum(new_cell) - 1
        run = np.cumsum(d)
        cs = np.flatnonzero(new_cell)
        base = np.r_[0, run[cs[1:] - 1]]  # global cumsum before each cell
        rel = run - base[cid]
        ce = np.r_[cs[1:], len(d)] - 1
        lm = (pd.Series(np.where(d > 0, rel, _NO_START))
              .groupby(cid).max().to_numpy())
        return pd.DataFrame({
            "user_id": u[cs], "bucket": bk[cs],
            "net": rel[ce], "local_max": lm,
        }).astype(_P)

    parts = bucketed_aggregate(
        ds.map_batches(deltas, batch_format="pandas"),
        ["user_id", "bucket"], cell_reduce, coalesce=partitions_for())

    def carry_scan(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_CONC_COLS)
        p = p.sort_values(["user_id", "bucket"], kind="mergesort")
        u = p["user_id"].to_numpy()
        net = p["net"].to_numpy()
        lm = p["local_max"].to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        uid = np.cumsum(new_user) - 1
        run = np.cumsum(net)
        us = np.flatnonzero(new_user)
        ubase = np.r_[0, run[us[1:] - 1]]
        baseline = (run - net) - ubase[uid]  # Σ earlier buckets' nets
        cand = np.where(lm != _NO_START, baseline + lm, _NO_START)
        best = pd.Series(cand).groupby(uid).max()
        keep = best.to_numpy() != _NO_START
        return pd.DataFrame({
            "user_id": u[us][keep],
            "max_concurrency": best.to_numpy()[keep],
        }).astype(_CONC_COLS)

    return bucketed_aggregate(parts, ["user_id"], carry_scan,
                              coalesce=partitions_for())


_DUNIQ_COLS = {"event_type": "object", "day_us": "int64", "n_users": "int64"}


def events_daily_unique(sf_dir: str):
    """EXACT daily unique users per event type — the exact COUNT DISTINCT
    complement to the KMV-sketched sliding window: per-batch distinct
    (type, day, user) triples (the combiner collapses each user's repeat
    events locally), one exchange keyed on the FULL triple so the global
    distinct is a partition-local drop_duplicates, then per-partition
    (type, day) count partials and a tiny final sum — correct because a
    distinct triple lives in exactly one partition."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _T = {"event_type": "object", "day_us": "int64", "user_id": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "user_id"])

    def triples(b: pd.DataFrame) -> pd.DataFrame:
        us = _epoch_us(b["ts"]).to_numpy()
        return (pd.DataFrame({
            "event_type": b["event_type"].astype(object),
            "day_us": (us // DAY_US) * DAY_US,
            "user_id": b["user_id"].to_numpy(dtype=np.int64),
        }).drop_duplicates().astype(_T))

    def count_part(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_DUNIQ_COLS)
        d = p.drop_duplicates()
        return (d.groupby(["event_type", "day_us"], as_index=False)
                .agg(n_users=("user_id", "size")).astype(_DUNIQ_COLS))

    partials = bucketed_aggregate(
        ds.map_batches(triples, batch_format="pandas"),
        ["event_type", "day_us", "user_id"], count_part,
        coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_DUNIQ_COLS)
        return (g.groupby(["event_type", "day_us"], as_index=False)
                .agg(n_users=("n_users", "sum")).astype(_DUNIQ_COLS))

    return small_key_aggregate(partials, final)


_SHARE_COLS = {"user_id": "int64", "event_type": "object",
               "value_micro": "int64", "share_ppm": "int64"}


def events_share_of_user(sf_dir: str):
    """Ratio-to-parent: each (user, type) value sum as a ppm share of the
    user's total — the SUM OVER (PARTITION BY parent) reporting shape
    without a window engine: (user, type) partials combine per batch, ONE
    exchange keyed on user co-locates each user's complete type rows, and
    the partition computes totals + shares locally. The ppm is the same
    float64 multiply-divide-floor on both sides (values are positive by
    the events contract, totals never zero for an emitted user)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _P = {"user_id": "int64", "event_type": "object", "value_micro": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({"user_id": b["user_id"].to_numpy(dtype=np.int64),
                              "event_type": b["event_type"].astype(object),
                              "value_micro": _micro(b["value"])})
                .groupby(["user_id", "event_type"], as_index=False)
                .agg(value_micro=("value_micro", "sum")).astype(_P))

    def shares(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_SHARE_COLS)
        g = (p.groupby(["user_id", "event_type"], as_index=False)
             .agg(value_micro=("value_micro", "sum")))
        tot = g.groupby("user_id")["value_micro"].transform("sum").to_numpy()
        v = g["value_micro"].to_numpy(dtype=np.int64)
        g["share_ppm"] = np.floor(v * 1_000_000.0 / tot).astype(np.int64)
        return g[list(_SHARE_COLS)].astype(_SHARE_COLS)

    return bucketed_aggregate(ds.map_batches(partial, batch_format="pandas"),
                              ["user_id"], shares,
                              coalesce=partitions_for())


HIST_BINS = 20
_VHIST_COLS = {"bin": "int64", "lo_micro": "int64", "hi_micro": "int64",
               "n_events": "int64"}


def events_value_histogram(sf_dir: str, bins: int = HIST_BINS):
    """Equi-width histogram of event values — the two-pass
    global-extremes pattern: pass 1 is a tree min/max (two scalars reach
    the driver), pass 2 bins every event against the broadcast edges.
    Integer micro-unit bin math pinned both sides: width = ceil(range+1 /
    bins), bin = (v − lo) // width — so the top value lands in the last
    bin without a float boundary lottery. Empty bins are emitted
    (zero-filled) so the output is always exactly ``bins`` rows."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    def read():
        return read_parquet_clean(f"{sf_dir}/events.parquet",
                                     columns=["value"])

    _MM = {"lo": "int64", "hi": "int64"}

    def minmax(b: pd.DataFrame) -> pd.DataFrame:
        v = _micro(b["value"])
        if len(v) == 0:
            return typed_empty(_MM)
        return pd.DataFrame({"lo": [np.int64(v.min())],
                             "hi": [np.int64(v.max())]})

    def mm_merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_MM)
        return pd.DataFrame({"lo": [np.int64(g["lo"].min())],
                             "hi": [np.int64(g["hi"].max())]})

    mm = small_key_aggregate(read().map_batches(minmax, batch_format="pandas"),
                             mm_merge).to_pandas()
    if mm.empty:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({c: pd.Series(dtype=t) for c, t in _VHIST_COLS.items()}))
    lo, hi = int(mm["lo"].iloc[0]), int(mm["hi"].iloc[0])
    width = -(-(hi - lo + 1) // bins)  # ceil → max value maps to bin bins-1

    _H = {"bin": "int64", "n_events": "int64"}

    def count_bins(b: pd.DataFrame) -> pd.DataFrame:
        v = _micro(b["value"])
        bn, cnt = np.unique((v - lo) // width, return_counts=True)
        return pd.DataFrame({"bin": bn.astype(np.int64),
                             "n_events": cnt.astype(np.int64)})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(bins, dtype=np.int64)
        if not g.empty:
            s = g.groupby("bin")["n_events"].sum()
            counts[s.index.to_numpy(dtype=np.int64)] = s.to_numpy(dtype=np.int64)
        bn = np.arange(bins, dtype=np.int64)
        return pd.DataFrame({"bin": bn, "lo_micro": lo + bn * width,
                             "hi_micro": lo + (bn + 1) * width,
                             "n_events": counts}).astype(_VHIST_COLS)

    return small_key_aggregate(
        read().map_batches(count_bins, batch_format="pandas"), final)


_GCONC_COLS = {"max_concurrency": "int64", "at_us": "int64"}


def events_global_concurrency(sf_dir: str):
    """GLOBAL max concurrent intervals across all users (capacity
    planning: peak simultaneous activity) — the distributed ordered
    sweep: a corpus-wide prefix sum over the merged ±1 boundary stream,
    done WITHOUT a global sort.

    1. every event emits (start, +1) and (end, −1) boundary points
       (half-open [s,e), empty intervals dropped);
    2. range-partition on time (monotone bucket function — partition
       order IS time order, the doc_pack_offsets pattern);
    3. per-partition net-delta totals → the driver prefix-sums P scalars
       (P = cluster partitions) into carries;
    4. each partition sorts ITS OWN points, adds its carry, and reports
       (local max open count at any start, earliest attaining time);
    5. one task picks the global max, earliest time on ties.

    Concurrency at a start s = Σ deltas with t ≤ s, evaluated at the end
    of each distinct-t run so simultaneous boundaries resolve together.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _PT = {"t": "int64", "delta": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def points(b: pd.DataFrame) -> pd.DataFrame:
        s = _epoch_us(b["ts"]).to_numpy()
        e = s + _micro(b["value"])
        keep = e > s
        s, e = s[keep], e[keep]
        return pd.DataFrame({
            "t": np.concatenate([s, e]),
            "delta": np.concatenate([np.ones(len(s), dtype=np.int64),
                                     -np.ones(len(e), dtype=np.int64)]),
        })

    pts = ds.map_batches(points, batch_format="pandas").materialize()
    if pts.count() == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({c: pd.Series(dtype=t) for c, t in _GCONC_COLS.items()}))
    lo, hi = int(pts.min("t")), int(pts.max("t"))
    n_parts = partitions_for()
    span = max(1, (hi - lo + 1 + n_parts - 1) // n_parts)

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = (b["t"].to_numpy(dtype=np.int64) - lo) // span
        return b

    parted = pts.map_batches(add_part, batch_format="pandas").materialize()

    _T = {"part": "int64", "net": "int64"}

    def net_totals(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_T)
        return (p.groupby("part", as_index=False).agg(net=("delta", "sum"))
                .astype(_T))

    tot = (bucketed_aggregate(parted, ["part"], net_totals, coalesce=n_parts)
           .to_pandas().sort_values("part").reset_index(drop=True))
    carry_map = dict(zip(
        tot["part"].to_numpy(dtype=np.int64),
        np.concatenate([[0], np.cumsum(tot["net"].to_numpy())[:-1]]).astype(np.int64)))

    _CAND = {"max_concurrency": "int64", "at_us": "int64"}

    def _sweep_one(g: pd.DataFrame):
        carry = int(carry_map.get(int(g["part"].iloc[0]), 0))
        g = g.sort_values("t", kind="mergesort")
        t = g["t"].to_numpy(dtype=np.int64)
        delta = g["delta"].to_numpy(dtype=np.int64)
        cum = carry + np.cumsum(delta)
        # evaluate at the END of each distinct-t run; keep runs with ≥1 start
        first = np.ones(len(t), dtype=bool)
        first[1:] = t[1:] != t[:-1]
        last = np.ones(len(t), dtype=bool)
        last[:-1] = t[1:] != t[:-1]
        run_has_start = np.add.reduceat(delta > 0, np.flatnonzero(first)) > 0
        ct, cc = t[last][run_has_start], cum[last][run_has_start]
        if len(ct) == 0:
            return None
        m = cc.max()
        return (np.int64(m), np.int64(ct[cc == m].min()))

    def sweep(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_CAND)
        # a hash partition holds one or more COMPLETE part groups
        rows = [r for _, g in p.groupby("part", sort=False)
                if (r := _sweep_one(g)) is not None]
        if not rows:
            return typed_empty(_CAND)
        return pd.DataFrame(rows, columns=["max_concurrency", "at_us"]
                            ).astype(_CAND)

    cands = bucketed_aggregate(parted, ["part"], sweep, coalesce=n_parts)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_GCONC_COLS)
        m = g["max_concurrency"].max()
        at = g.loc[g["max_concurrency"] == m, "at_us"].min()
        return pd.DataFrame({"max_concurrency": [np.int64(m)],
                             "at_us": [np.int64(at)]}).astype(_GCONC_COLS)

    return small_key_aggregate(cands, final)


_TREND_COLS = {"event_type": "object", "n_days": "int64",
               "total_value_micro": "int64", "slope_milli": "int64"}


def events_daily_trend(sf_dir: str):
    """Grouped OLS trend: per event type, the least-squares slope of
    daily value totals against the day index — the regression shape on
    top of exact moment sums. Daily totals come from the (type, day)
    combiner exchange; the per-type slope is computed from FOUR exact
    integer moments (n, Σx, Σy, Σxy, Σx²) with x = days since the
    type's first active day (small, so every moment is far inside
    int64). slope_milli = floor(1000·(nΣxy − ΣxΣy)/(nΣx² − (Σx)²)) via
    the identical float64 expression both sides (DuckDB's integer ``//``
    truncates where Python floors, so the float floor IS the contract).
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _D = {"event_type": "object", "day_us": "int64", "y": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = _epoch_us(b["ts"]).to_numpy()
        return (pd.DataFrame({
            "event_type": b["event_type"].astype(object),
            "day_us": (us // DAY_US) * DAY_US,
            "y": _micro(b["value"]),
        }).groupby(["event_type", "day_us"], as_index=False)
          .agg(y=("y", "sum")).astype(_D))

    daily = bucketed_aggregate(ds.map_batches(partial, batch_format="pandas"),
                               ["event_type", "day_us"],
                               lambda g: (g.groupby(["event_type", "day_us"],
                                                    as_index=False)
                                          .agg(y=("y", "sum")).astype(_D))
                               if not g.empty else typed_empty(_D),
                               coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_TREND_COLS)
        rows = []
        for et, grp in g.groupby("event_type", sort=True):
            day = (grp["day_us"].to_numpy(dtype=np.int64) // DAY_US)
            x = day - day.min()
            y = grp["y"].to_numpy(dtype=np.int64)
            n = np.int64(len(x))
            sx, sy = np.int64(x.sum()), np.int64(y.sum())
            sxy = np.int64((x * y).sum())
            sxx = np.int64((x * x).sum())
            den = n * sxx - sx * sx
            if den == 0:
                slope = np.int64(0)
            else:
                slope = np.int64(np.floor(
                    1000.0 * (n * sxy - sx * sy) / den))
            rows.append((et, int(n), int(sy), int(slope)))
        return pd.DataFrame(rows, columns=list(_TREND_COLS)).astype(_TREND_COLS)

    return small_key_aggregate(daily, final)


THROTTLE_US = 5 * 60 * 1_000_000
_THR_COLS = {"event_id": "int64", "user_id": "int64", "event_type": "object",
             "ts_us": "int64"}


def events_throttled(sf_dir: str, gap_us: int = THROTTLE_US):
    """Streaming throttle/dedup: keep an event only if the PREVIOUS event
    of the same (user, type) is more than ``gap_us`` older — the
    rate-limit / duplicate-suppression shape (LAG-based filter). One
    exchange keyed on (user, type); each complete-key group sorts by
    (ts, event_id) and applies the vectorized lag filter. Tie-break
    pinned: equal timestamps order by event_id, so the first of a
    same-instant burst survives and the rest are throttled."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import grouped_exchange, typed_empty

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(dtype=np.int64),
            "user_id": b["user_id"].to_numpy(dtype=np.int64),
            "event_type": b["event_type"].astype(object),
            "ts_us": _epoch_us(b["ts"]).to_numpy(),
        })

    def throttle(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_THR_COLS)
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (ts[1:] - ts[:-1]) > gap_us
        return g[keep][list(_THR_COLS)].astype(_THR_COLS)

    return grouped_exchange(ds.map_batches(project, batch_format="pandas"),
                            ["user_id", "event_type"], throttle)


LATENESS_US = 3_600 * 1_000_000  # allowed lateness: 1 h behind the watermark
_LATE_COLS = {"event_type": "object", "n_late": "int64", "n_events": "int64"}


def events_late_arrivals(sf_dir: str, lateness_us: int = LATENESS_US):
    """Watermark / late-data accounting — the stream-processing semantics
    check: an event is LATE if its event time trails the watermark (the
    max event time over all PRIOR arrivals, arrival order = event_id) by
    more than the allowed lateness. The running max over arrival order
    is the ordered prefix-MAX — the same two-phase carry as the prefix
    sums (max is associative): range-partition on event_id (monotone
    buckets), per-partition max partials → driver prefix-max of P
    scalars → per-partition exclusive running max with the carry.
    Output: late/total counts per event type."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type", "ts"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(dtype=np.int64),
            "event_type": b["event_type"].astype(object),
            "ts_us": _epoch_us(b["ts"]).to_numpy(),
        })

    proj = ds.map_batches(project, batch_format="pandas").materialize()
    if proj.count() == 0:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({c: pd.Series(dtype=t) for c, t in _LATE_COLS.items()}))
    lo, hi = int(proj.min("event_id")), int(proj.max("event_id"))
    n_parts = partitions_for()
    span = max(1, (hi - lo + 1 + n_parts - 1) // n_parts)

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = (b["event_id"].to_numpy(dtype=np.int64) - lo) // span
        return b

    parted = proj.map_batches(add_part, batch_format="pandas").materialize()

    _T = {"part": "int64", "mx": "int64"}

    def max_totals(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_T)
        return (p.groupby("part", as_index=False).agg(mx=("ts_us", "max"))
                .astype(_T))

    tot = (bucketed_aggregate(parted, ["part"], max_totals, coalesce=n_parts)
           .to_pandas().sort_values("part").reset_index(drop=True))
    mx = tot["mx"].to_numpy(dtype=np.int64)
    carry_vals = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(mx)[:-1]])
    carry_map = dict(zip(tot["part"].to_numpy(dtype=np.int64),
                         carry_vals.astype(np.int64)))

    def flag(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_LATE_COLS)
        frames = []
        for part, g in p.groupby("part", sort=False):
            g = g.sort_values("event_id", kind="mergesort")
            ts = g["ts_us"].to_numpy(dtype=np.int64)
            run = np.maximum.accumulate(ts)
            prior = np.concatenate(
                [[int(carry_map.get(int(part), np.iinfo(np.int64).min))],
                 np.maximum(run[:-1],
                            int(carry_map.get(int(part),
                                              np.iinfo(np.int64).min)))])
            late = (prior != np.iinfo(np.int64).min) & (ts + lateness_us < prior)
            frames.append(pd.DataFrame({"event_type": g["event_type"],
                                        "late": late}))
        f = pd.concat(frames, ignore_index=True)
        return (f.groupby("event_type", as_index=False)
                .agg(n_late=("late", "sum"), n_events=("late", "size"))
                .astype(_LATE_COLS))

    partials = bucketed_aggregate(parted, ["part"], flag, coalesce=n_parts)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_LATE_COLS)
        return (g.groupby("event_type", as_index=False)
                .agg(n_late=("n_late", "sum"), n_events=("n_events", "sum"))
                .astype(_LATE_COLS))

    return small_key_aggregate(partials, final)


ZORDER_BITS = 16
_Z_COLS = {"event_id": "int64", "x": "int64", "y": "int64", "zcode": "int64"}


def events_zorder(sf_dir: str, bits: int = ZORDER_BITS):
    """Z-order (Morton) locality codes — the lakehouse layout trick:
    interleaving the bits of two clustering dimensions (here user_id and
    event hour) gives a single sort key under which range scans on
    EITHER dimension touch O(√P) of the files instead of all of them.
    Pure vectorized map (shift/mask per bit plane); the code itself is
    the deliverable — `write_parquet` after a zcode sort yields the
    multi-dimensionally-prunable layout. SQL twin states the identical
    bit algebra with arithmetic shifts."""
    import ray.data

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])

    def code(b: pd.DataFrame) -> pd.DataFrame:
        mask = (1 << bits) - 1
        x = b["user_id"].to_numpy(dtype=np.int64) & mask
        y = (_epoch_us(b["ts"]).to_numpy() // WINDOW_US) & mask
        z = np.zeros(len(b), dtype=np.int64)
        for k in range(bits):
            z |= ((x >> k) & 1) << (2 * k)
            z |= ((y >> k) & 1) << (2 * k + 1)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(dtype=np.int64),
            "x": x, "y": y, "zcode": z}).astype(_Z_COLS)

    return ds.map_batches(code, batch_format="pandas")


ROLLING_WINDOW_US = 3_600_000_000  # 1 hour
_ROLL_COLS = {"event_id": "int64", "user_id": "int64", "ts_us": "int64",
              "win_sum_micro": "int64", "win_n": "int64"}


def events_rolling_window(sf_dir: str,
                          skew_safe_rows: int | None = None):
    """Per-user RANGE-frame rolling aggregates: for every event, the sum
    and count of the user's events in the preceding hour INCLUDING all
    timestamp peers (SQL ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW`` — peers of the current row belong to the frame, so
    tied timestamps share identical window values; no tie-break enters
    the semantics).

    Same partitioning contract as events_running_total: ONE user_id
    exchange; inside each complete-user partition one mergesort by
    (user, ts), per-user prefix sums, and two searchsorted probes give
    every frame in O(n log n) — never a per-event rescan of the hour.
    Skew dispatch (SKEW_SAFE_ROWS): above the bound the time-bucketed
    arm partitions on (user, hour-bucket) instead — the frame width
    equals the bucket width, so a previous-bucket context copy makes
    every frame cell-local and no worker ever holds a whole hot user."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    if _events_rows(sf_dir) > (SKEW_SAFE_ROWS if skew_safe_rows is None
                               else skew_safe_rows):
        return _events_rolling_window_bucketed(sf_dir)

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])

    project = _project_events_arrow

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_ROLL_COLS)
        p = p.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        u = p["user_id"].to_numpy()
        t = p["ts_us"].to_numpy()
        v = p["value_micro"].to_numpy()
        sums = np.empty(len(p), dtype=np.int64)
        cnts = np.empty(len(p), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[starts, len(p)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            ts_seg = t[s:e]
            csum = np.concatenate(([0], np.cumsum(v[s:e], dtype=np.int64)))
            lo = np.searchsorted(ts_seg, ts_seg - ROLLING_WINDOW_US, side="left")
            hi = np.searchsorted(ts_seg, ts_seg, side="right")  # peers in
            sums[s:e] = csum[hi] - csum[lo]
            cnts[s:e] = hi - lo
        out = pd.DataFrame(
            {"event_id": p["event_id"].to_numpy(dtype=np.int64),
             "user_id": u, "ts_us": t,
             "win_sum_micro": sums, "win_n": cnts})
        return out[list(_ROLL_COLS)].astype(_ROLL_COLS)

    return bucketed_aggregate(
        ds.map_batches(project, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], per_partition, coalesce=partitions_for())


def _events_rolling_window_bucketed(sf_dir: str):
    """Skew arm for events_rolling_window: partition on (user, bucket)
    where bucket = ts // ROLLING_WINDOW_US. Because the RANGE frame is
    exactly one bucket wide, an event's frame [t − 1 h, t] can only
    reach into its own bucket and the one before — so each row is
    shipped once as an OWN row and once as a CONTEXT copy into the NEXT
    bucket, and every frame is computable cell-locally (own + context
    rows, prefix sums, two searchsorted probes — the plain arm's kernel
    on a bounded slice). Output rows come from own copies only, so
    nothing is double-counted. Cost vs plain arm: 2× exchange payload;
    gain: per-worker memory bounded by one hot hour, not one hot user."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])

    def project2(b: pd.DataFrame) -> pd.DataFrame:
        t = _epoch_us(b["ts"]).to_numpy()
        base = pd.DataFrame(
            {"event_id": b["event_id"].to_numpy(dtype=np.int64),
             "user_id": b["user_id"].to_numpy(dtype=np.int64),
             "ts_us": t, "value_micro": _micro(b["value"])})
        own = base.assign(bucket=t // ROLLING_WINDOW_US, own=np.int64(1))
        ctx = base.assign(bucket=t // ROLLING_WINDOW_US + 1, own=np.int64(0))
        return pd.concat([own, ctx], ignore_index=True)

    def per_cell_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_ROLL_COLS)
        p = p.sort_values(["user_id", "bucket", "ts_us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        u = p["user_id"].to_numpy()
        bk = p["bucket"].to_numpy()
        t = p["ts_us"].to_numpy()
        v = p["value_micro"].to_numpy()
        own = p["own"].to_numpy()
        sums = np.empty(len(p), dtype=np.int64)
        cnts = np.empty(len(p), dtype=np.int64)
        new_cell = np.r_[True, (u[1:] != u[:-1]) | (bk[1:] != bk[:-1])]
        bounds = np.r_[np.flatnonzero(new_cell), len(p)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            ts_seg = t[s:e]
            csum = np.concatenate(([0], np.cumsum(v[s:e], dtype=np.int64)))
            lo = np.searchsorted(ts_seg, ts_seg - ROLLING_WINDOW_US,
                                 side="left")
            hi = np.searchsorted(ts_seg, ts_seg, side="right")
            sums[s:e] = csum[hi] - csum[lo]
            cnts[s:e] = hi - lo
        keep = own == 1
        out = pd.DataFrame(
            {"event_id": p["event_id"].to_numpy(dtype=np.int64)[keep],
             "user_id": u[keep], "ts_us": t[keep],
             "win_sum_micro": sums[keep], "win_n": cnts[keep]})
        return out[list(_ROLL_COLS)].astype(_ROLL_COLS)

    return bucketed_aggregate(
        ds.map_batches(project2, batch_format="pandas"),
        ["user_id", "bucket"], per_cell_partition,
        coalesce=partitions_for())


_ZSC_COLS = {"event_id": "int64", "event_type": "object",
             "value_centi": "int64", "direction": "object"}


def events_zscore_outliers(sf_dir: str):
    """Per-type 3σ outlier detection with ZERO floating point: the
    z-score test |x − μ| > 3σ is the integer cross-multiply
    (n·x − S)² > 9·(n·S2 − S²) over exact centi-unit moment sums — no
    sqrt, no division, no last-ulp oracle risk anywhere.

    Two streaming passes: a per-type (n, Σx, Σx², max|x|) combiner
    reduced to a model-sized stats table (read once on the driver, types
    are a handful), then a stateless vectorized filter pass. int64
    bound, GUARDED at runtime: every intermediate (d², 9·(n·s2 − s²))
    stays exact in int64 when n·max|x| ≤ ~1.01e9 (≈18k rows per type at
    x ≤ 5.6e4 centi-units — conservative; the first actual wrap is the
    d² term at ~5.4e4 rows); types past the bound promote to exact
    arbitrary-precision Python-int arithmetic (object dtype), which
    matches the DuckDB oracle's HUGEINT path bit-for-bit."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    _S = {"event_type": "object", "n": "int64", "s": "int64", "s2": "int64",
          "xmax": "int64"}
    # n·max|x| ≤ this keeps d² ≤ 4·(n·xmax)² and 9·(n·s2 − s²) ≤
    # 9·(n·xmax)² both under 2⁶³ − 1
    _SAFE_NXMAX = int(((2**63 - 1) // 9) ** 0.5)  # 1_012_076_068

    def stat_partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(b["value"].to_numpy() * 100).astype(np.int64)
        if len(x) and int(np.abs(x).max()) >= 2**31:
            raise OverflowError(
                "events_zscore_outliers: |value_centi| >= 2^31 — x² "
                "would wrap in the int64 combiner; widen the combiner "
                "to a (hi, lo) split for this value domain")
        return (pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                              "n": np.ones(len(b), dtype=np.int64),
                              "s": x, "s2": x * x, "xmax": np.abs(x)})
                .groupby("event_type", as_index=False)
                .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
                     xmax=("xmax", "max")).astype(_S))

    def stat_merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_S)
        return (g.groupby("event_type", as_index=False)
                .agg(n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
                     xmax=("xmax", "max")).astype(_S))

    read = lambda: read_parquet_clean(  # noqa: E731
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])

    stats = small_key_aggregate(
        read().map_batches(stat_partial, batch_format="pandas"),
        stat_merge).to_pandas()
    model = {r.event_type: (int(r.n), int(r.s), int(r.s2))
             for r in stats.itertuples()}
    # types whose moments could wrap the int64 cross-multiply take the
    # exact arbitrary-precision path (Python ints, object dtype)
    wide_types = {r.event_type for r in stats.itertuples()
                  if int(r.n) * int(r.xmax) > _SAFE_NXMAX}

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(b["value"].to_numpy() * 100).astype(np.int64)
        et = b["event_type"].to_numpy()
        n = np.array([model[t][0] for t in et], dtype=np.int64)
        s = np.array([model[t][1] for t in et], dtype=np.int64)
        s2 = np.array([model[t][2] for t in et], dtype=np.int64)
        d = n * x - s
        out = d * d > 9 * (n * s2 - s * s)
        if wide_types:
            w = np.isin(et, list(wide_types))
            if w.any():
                no, so, s2o, xo = (a[w].astype(object) for a in
                                   (n, s, s2, x))
                do = no * xo - so
                out[w] = (do * do > 9 * (no * s2o - so * so))
                # exact sign for the direction label (d may have wrapped)
                d[w] = np.array([(v > 0) - (v < 0) for v in do],
                                dtype=np.int64)
        if not out.any():
            return typed_empty(_ZSC_COLS)
        b = b[out]
        return pd.DataFrame(
            {"event_id": b["event_id"].to_numpy(dtype=np.int64),
             "event_type": et[out],
             "value_centi": x[out],
             "direction": np.where(d[out] > 0, "high", "low")}
        ).astype(_ZSC_COLS)

    return read().map_batches(flag, batch_format="pandas")
