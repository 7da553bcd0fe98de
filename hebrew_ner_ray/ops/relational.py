"""Relational patterns over the TPC-H-ish tables — the join/aggregate
idioms the KG pipeline's wide stages are built from, shown standalone:

- ``revenue_by_nation``: broadcast hash join (dimension side ray.put once,
  numpy searchsorted lookup per batch — no shuffle for the join) + partial
  aggregation → small groupby.
- ``pricing_summary``: TPC-H Q1 shape — column-pruned read, vectorized
  filter + per-batch partial sums, tiny final groupby; averages computed
  at finalize from (sum, count).

Money amounts are summed as integer cents (floor(x*100) per row) so the
distributed sum is EXACT and matches the DuckDB oracle bit-for-bit —
float-sum ordering differences can flip a rounded decimal.
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from hebrew_ner_ray.runtime import default_concurrency

_REV_COLS = {"n_name": "object", "revenue_cents": "int64", "n_orders": "int64"}
_PRICE_COLS = {
    "l_returnflag": "object", "l_linestatus": "object", "sum_qty": "int64",
    "sum_base_cents": "int64", "sum_disc_price_cents": "int64",
    "avg_qty": "float64", "avg_disc_bp": "float64", "count_order": "int64",
}


BROADCAST_DIM_LIMIT = 20_000_000  # rows; ~300 MB of (int64, int64) per worker


def dim_lookup(sorted_keys: np.ndarray, fact_keys: np.ndarray):
    """Guarded broadcast-dimension lookup: positions into ``sorted_keys``
    plus the INNER-JOIN match mask. A fact key absent from the dimension
    (orphan FK — found by the randomized relational gate) must DROP the
    row, never index out of bounds or silently hit a neighbor key."""
    if len(sorted_keys) == 0:
        return (np.zeros(len(fact_keys), dtype=np.int64),
                np.zeros(len(fact_keys), dtype=bool))
    pos = np.searchsorted(sorted_keys, fact_keys)
    pos[pos == len(sorted_keys)] = 0
    return pos, sorted_keys[pos] == fact_keys


def revenue_by_nation(sf_dir: str, broadcast_dim_limit: int = BROADCAST_DIM_LIMIT):
    """Size-aware dimension join: customer→nation revenue rollup.

    - customer rows ≤ ``broadcast_dim_limit`` (metadata row count, no
      read): the dimension is ``ray.put`` ONCE as sorted arrays and every
      orders batch does a searchsorted lookup — zero shuffle.
    - larger: no broadcast — per-batch (custkey, cents, n) combiners from
      orders meet the customer rows in ONE keyed exchange on custkey
      (same plan as the Q10 chain's second hop), then the tiny nation
      rollup. The dispatch closes the 'customer broadcast is fine at sf'
      caveat: a 100-TB customer table takes the exchange arm
      automatically.
    """
    import ray
    import ray.data

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    names = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))
    if n_cust > broadcast_dim_limit:
        return _revenue_by_nation_exchange(sf_dir, names)

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy()
    order_idx = np.argsort(ck)
    dim_ref = ray.put(
        (
            ck[order_idx],
            cust.column("c_nationkey").to_numpy()[order_idx],
            names,
        )
    )

    class JoinAgg:
        def __init__(self):
            self.ck, self.cnat, self.names = ray.get(dim_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            pos, ok = dim_lookup(self.ck, b["o_custkey"].to_numpy())
            b, pos = b[ok], pos[ok]  # inner join: orphan custkeys drop
            nat = self.cnat[pos]
            cents = np.floor(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
            g = (
                pd.DataFrame({"nationkey": nat, "cents": cents})
                .groupby("nationkey", as_index=False)
                .agg(revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
            )
            g["n_name"] = g["nationkey"].map(self.names)
            return g[["n_name", "revenue_cents", "n_orders"]]

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(
        JoinAgg, batch_format="pandas", concurrency=default_concurrency()
    )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        from hebrew_ner_ray.ops.shuffle import typed_empty

        if g.empty:
            return typed_empty(_REV_COLS)
        out = g.groupby("n_name", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"), n_orders=("n_orders", "sum")
        )
        return out.astype({"revenue_cents": "int64", "n_orders": "int64"})

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate

    return small_key_aggregate(partials, reduce)


def _revenue_by_nation_exchange(sf_dir: str, names: dict):
    """Exchange arm: orders combiners ⋈ customer on custkey, no broadcast."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _ROW = {"custkey": "int64", "nationkey": "int64", "revenue_cents": "int64",
            "n_orders": "int64", "side": "int64"}
    _PART = {"nationkey": "int64", "revenue_cents": "int64", "n_orders": "int64"}

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
            "custkey": b["o_custkey"].to_numpy(dtype=np.int64),
            "revenue_cents": np.floor(b["o_totalprice"].to_numpy() * 100).astype(np.int64),
        }).groupby("custkey", as_index=False)
            .agg(revenue_cents=("revenue_cents", "sum"),
                 n_orders=("revenue_cents", "size")))
        g["nationkey"] = np.int64(0)
        g["side"] = np.int64(1)
        return g[list(_ROW)].astype(_ROW)

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": b["c_custkey"].to_numpy(dtype=np.int64),
            "nationkey": b["c_nationkey"].to_numpy(dtype=np.int64),
            "revenue_cents": np.zeros(len(b), dtype=np.int64),
            "n_orders": np.zeros(len(b), dtype=np.int64),
            "side": np.zeros(len(b), dtype=np.int64),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(order_side, batch_format="pandas")
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_side, batch_format="pandas")

    def join_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_PART)
        r = (part[part["side"] == 1]
             .groupby("custkey", as_index=False)
             .agg(revenue_cents=("revenue_cents", "sum"),
                  n_orders=("n_orders", "sum")))
        c = part[part["side"] == 0][["custkey", "nationkey"]]
        m = c.merge(r, on="custkey")
        if m.empty:
            return typed_empty(_PART)
        return (m.groupby("nationkey", as_index=False)
                .agg(revenue_cents=("revenue_cents", "sum"),
                     n_orders=("n_orders", "sum")).astype(_PART))

    partials = bucketed_aggregate(cust.union(orders), ["custkey"],
                                  join_part, coalesce=partitions_for())

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_REV_COLS)
        out = g.groupby("nationkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"), n_orders=("n_orders", "sum"))
        out["n_name"] = out["nationkey"].map(names)
        return out[list(_REV_COLS)].astype(_REV_COLS)

    return small_key_aggregate(partials, reduce)


CUTOFF = "1998-09-02"


def pricing_summary(sf_dir: str):
    import ray.data

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    # Arrow-native combiner: the fact scan's hot path does filter →
    # arithmetic → tiny groupby, all available as pyarrow.compute
    # kernels, so the batch never pays the Arrow→pandas copy (the string
    # flag/status columns are the expensive part of that copy). The
    # float chain keeps numpy's exact evaluation order:
    # (ext·(1−disc))·100, left-associated, IEEE-identical.
    import pyarrow as pa
    import pyarrow.compute as pc

    cutoff_ts = pa.scalar(pd.Timestamp(CUTOFF), type=pa.timestamp("us"))

    def partial(t: "pa.Table") -> pd.DataFrame:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff_ts))
        ext = t.column("l_extendedprice")
        disc = t.column("l_discount")
        g = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": pc.cast(pc.floor(t.column("l_quantity")), pa.int64()),
            "base_cents": pc.cast(
                pc.floor(pc.multiply(ext, pa.scalar(100.0))), pa.int64()),
            "disc_price_cents": pc.cast(pc.floor(pc.multiply(
                pc.multiply(ext, pc.subtract(pa.scalar(1.0), disc)),
                pa.scalar(100.0))), pa.int64()),
            "disc_bp": pc.cast(
                pc.floor(pc.multiply(disc, pa.scalar(10000.0))), pa.int64()),
        }).group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("qty", "sum"), ("base_cents", "sum"),
            ("disc_price_cents", "sum"), ("disc_bp", "sum"),
            ("qty", "count"),
        ])
        g = g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                              "sum_base_cents", "sum_disc_price_cents",
                              "sum_disc_bp", "count_order"])
        return g.to_pandas()  # ≤ #groups rows — the copy is free here

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        from hebrew_ner_ray.ops.shuffle import typed_empty

        if g.empty:
            return typed_empty(_PRICE_COLS)
        b = g.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_base_cents=("sum_base_cents", "sum"),
            sum_disc_price_cents=("sum_disc_price_cents", "sum"),
            sum_disc_bp=("sum_disc_bp", "sum"),
            count_order=("count_order", "sum"),
        )
        n = b["count_order"].astype("int64")
        return pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": b["sum_qty"].astype("int64"),
                "sum_base_cents": b["sum_base_cents"].astype("int64"),
                "sum_disc_price_cents": b["sum_disc_price_cents"].astype("int64"),
                "avg_qty": (b["sum_qty"] / n).round(6),
                "avg_disc_bp": (b["sum_disc_bp"] / n).round(6),
                "count_order": n,
            }
        )

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate

    return small_key_aggregate(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), reduce)


Q3_CUTOFF = "1998-06-15"
Q3_SEGMENT = "BUILDING"
_Q3_COLS = {"l_orderkey": "int64", "revenue_cents": "int64",
            "o_orderdate": "object", "o_orderpriority": "object"}


def shipping_priority(sf_dir: str, k: int = 10,
                      broadcast_dim_limit: int = BROADCAST_DIM_LIMIT):
    """TPC-H Q3 shape — the one big×big join in the relational family:

    - customer is size-aware (the revenue_by_nation contract): at or
      under ``broadcast_dim_limit`` rows (metadata count, no read) the
      segment-filtered keys broadcast once (``ray.put`` of a sorted
      int64 array, searchsorted membership per batch); above it the
      segment semi-join runs as a custkey exchange — customer is
      corpus-growing (150k×SF), so a 100-TB run must not read it on
      the driver.
    - orders⋈lineitem is big×big: lineitem revenue is pre-aggregated per
      orderkey inside each batch (combiner — the exchange ships order
      partials, not line items), then ONE keyed exchange on orderkey
      co-locates order attrs with revenue partials; each partition joins
      and emits its local top-k, and a single-task merge (≤ k×partitions
      rows) takes the global top-k (revenue DESC, orderkey ASC —
      deterministic tie-break stated in the SQL twin).
    """
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    n_customers = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_customers <= broadcast_dim_limit:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        seg = cust.column("c_mktsegment").to_numpy(zero_copy_only=False)
        keys_ref = ray.put(np.sort(
            cust.column("c_custkey").to_numpy()[seg == Q3_SEGMENT]))

        # Arrow task closure (see the Q8 sides for the rationale: the
        # "setup" is a zero-copy ray.get, an actor pool buys nothing,
        # and Arrow output keeps the union with line_side homogeneous)
        import pyarrow as pa
        import pyarrow.compute as pc

        q3_cut_o = pa.scalar(pd.Timestamp(Q3_CUTOFF), type=pa.timestamp("us"))

        def order_side(t: "pa.Table") -> "pa.Table":
            keys = ray.get(keys_ref)
            t = t.filter(pc.less(t.column("o_orderdate"), q3_cut_o))
            if len(keys) == 0:
                t = t.slice(0, 0)
            else:
                ck = (t.column("o_custkey").combine_chunks()
                      .to_numpy(zero_copy_only=False))
                pos = np.searchsorted(keys, ck)
                pos[pos == len(keys)] = 0
                t = t.filter(pa.array(keys[pos] == ck))
            n = t.num_rows
            z = pa.repeat(pa.scalar(0, type=pa.int64()), n)
            return pa.table({
                "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "revenue_cents": z,
                # explicit date-only render (oracle strftime %Y-%m-%d)
                "o_orderdate": pc.strftime(t.column("o_orderdate"),
                                           format="%Y-%m-%d"),
                "o_orderpriority": t.column("o_orderpriority"),
                "side": z,
            })

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ).map_batches(order_side, batch_format="pyarrow",
                      zero_copy_batch=True)
    else:
        orders = _q3_orders_exchange(sf_dir)

    # Arrow-native fact-side combiner (same rationale as pricing_summary:
    # filter → float chain → per-orderkey sum, no Arrow→pandas copy of
    # the scan). The padding columns the union schema needs are typed
    # NULLS (never read on this side — local_topk only consumes the
    # order side's strings), allocated O(1).
    import pyarrow as pa
    import pyarrow.compute as pc

    q3_cut = pa.scalar(pd.Timestamp(Q3_CUTOFF), type=pa.timestamp("us"))

    def line_side(t: "pa.Table") -> "pa.Table":
        t = t.filter(pc.greater(t.column("l_shipdate"), q3_cut))
        rev = pc.cast(pc.floor(pc.multiply(
            pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            pa.scalar(100.0))), pa.int64())
        g = (pa.table({"l_orderkey": pc.cast(t.column("l_orderkey"),
                                             pa.int64()),
                       "revenue_cents": rev})
             .group_by("l_orderkey").aggregate([("revenue_cents", "sum")])
             .rename_columns(["l_orderkey", "revenue_cents"]))
        n = g.num_rows
        return g.append_column(
            "o_orderdate", pa.nulls(n, pa.string())).append_column(
            "o_orderpriority", pa.nulls(n, pa.string())).append_column(
            "side", pa.repeat(pa.scalar(1, type=pa.int64()), n))

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)

    def local_topk(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_Q3_COLS)
        o = part[part["side"] == 0]
        r = (
            part[part["side"] == 1]
            .groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        )
        m = o.drop(columns=["revenue_cents", "side"]).merge(r, on="l_orderkey")
        if m.empty:
            return typed_empty(_Q3_COLS)
        m = m.sort_values(["revenue_cents", "l_orderkey"],
                          ascending=[False, True]).head(k)
        return m[list(_Q3_COLS)].astype(_Q3_COLS)

    partials = bucketed_aggregate(orders.union(lines), ["l_orderkey"],
                                  local_topk, coalesce=partitions_for())

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q3_COLS)
        return (
            g.sort_values(["revenue_cents", "l_orderkey"],
                          ascending=[False, True]).head(k)
            .reset_index(drop=True).astype(_Q3_COLS)
        )

    return small_key_aggregate(partials, final_topk)


def _q3_orders_exchange(sf_dir: str):
    """Exchange arm for Q3's customer dimension: ONE custkey exchange
    semi-joining date-filtered orders with segment-filtered customers
    (no driver read, no broadcast), emitting the same side-0 order
    mid-frame the broadcast arm produces."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _CK = {"c_custkey": "int64", "l_orderkey": "int64", "o_orderdate": "object",
           "o_orderpriority": "object", "side2": "int64"}
    _MID = {"l_orderkey": "int64", "revenue_cents": "int64",
            "o_orderdate": "object", "o_orderpriority": "object", "side": "int64"}

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderdate"].astype(str) < Q3_CUTOFF]
        return pd.DataFrame(
            {"c_custkey": b["o_custkey"].to_numpy(dtype=np.int64),
             "l_orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
             "o_orderdate": b["o_orderdate"].dt.strftime("%Y-%m-%d").to_numpy(),
             "o_orderpriority": b["o_orderpriority"].to_numpy(),
             "side2": np.zeros(len(b), dtype=np.int64)}
        ).astype(_CK)

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["c_mktsegment"] == Q3_SEGMENT]
        n = len(b)
        return pd.DataFrame(
            {"c_custkey": b["c_custkey"].to_numpy(dtype=np.int64),
             "l_orderkey": np.zeros(n, dtype=np.int64),
             "o_orderdate": np.full(n, "", dtype=object),
             "o_orderpriority": np.full(n, "", dtype=object),
             "side2": np.ones(n, dtype=np.int64)}
        ).astype(_CK)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_side, batch_format="pandas")
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"],
    ).map_batches(cust_side, batch_format="pandas")

    def join(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_MID)
        # c_custkey is a key column, so membership semi-join == inner join
        keys = np.unique(
            part.loc[part["side2"] == 1, "c_custkey"].to_numpy(dtype=np.int64))
        o = part[part["side2"] == 0]
        _, ok = dim_lookup(keys, o["c_custkey"].to_numpy(dtype=np.int64))
        o = o[ok]
        return pd.DataFrame(
            {"l_orderkey": o["l_orderkey"].to_numpy(dtype=np.int64),
             "revenue_cents": np.zeros(len(o), dtype=np.int64),
             "o_orderdate": o["o_orderdate"].to_numpy(),
             "o_orderpriority": o["o_orderpriority"].to_numpy(),
             "side": np.zeros(len(o), dtype=np.int64)}
        ).astype(_MID)

    return bucketed_aggregate(orders.union(cust), ["c_custkey"], join,
                              coalesce=partitions_for())


Q4_LO, Q4_HI = "1997-01-01", "1997-07-01"
_Q4_COLS = {"o_orderpriority": "object", "order_count": "int64"}


def order_priority_semi(sf_dir: str):
    """TPC-H Q4 shape — the distributed big×big SEMI-join: count orders
    per priority (in a date window) that have AT LEAST ONE returned
    lineitem (``EXISTS``, l_returnflag='R').

    Shape: both sides are corpus-sized, so neither broadcasts. The
    lineitem side is shrunk by a per-batch DISTINCT-orderkey combiner
    (the exchange ships qualifying keys once per (key, block), not one
    row per lineitem); ONE keyed exchange on orderkey co-locates each
    order with its qualifying-key evidence; each partition emits partial
    priority counts (≤ priorities × partitions rows) and a single small
    reduce finishes. The reference has no joins at all — this is the
    engine-native idiom the KG edge semi-join (J6) generalizes to.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].dt.strftime("%Y-%m-%d")
        b = b[(d >= Q4_LO) & (d < Q4_HI)]
        return pd.DataFrame({
            "orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
            "o_orderpriority": b["o_orderpriority"].to_numpy(),
            "side": np.zeros(len(b), dtype=np.int64),
        })

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(
            b.loc[b["l_returnflag"] == "R", "l_orderkey"].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame({
            "orderkey": keys,
            "o_orderpriority": np.full(len(keys), "", dtype=object),
            "side": np.ones(len(keys), dtype=np.int64),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_side, batch_format="pandas")
    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).map_batches(line_side, batch_format="pandas")

    def semi_count(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_Q4_COLS)
        have = part.loc[part["side"] == 1, "orderkey"].to_numpy()
        o = part[part["side"] == 0]
        o = o[np.isin(o["orderkey"].to_numpy(), have)]
        if o.empty:
            return typed_empty(_Q4_COLS)
        g = o.groupby("o_orderpriority", as_index=False).agg(
            order_count=("orderkey", "size"))
        return g.astype(_Q4_COLS)

    partials = bucketed_aggregate(orders.union(lines), ["orderkey"],
                                  semi_count, coalesce=partitions_for())

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q4_COLS)
        return (g.groupby("o_orderpriority", as_index=False)["order_count"]
                .sum().astype(_Q4_COLS))

    return small_key_aggregate(partials, reduce)


Q22_CUTOFF = "2000-06-01"
_Q22_COLS = {"n_name": "object", "n_customers": "int64", "acctbal_cents": "int64"}


def customers_no_orders(sf_dir: str):
    """TPC-H Q22 shape — the distributed ANTI-join: per nation, the count
    and total balance (integer cents) of positive-balance DORMANT
    customers — no order since ``Q22_CUTOFF`` (``NOT EXISTS`` with a
    pushed-down date predicate, so evidence rows exist on both arms).

    Same exchange plan as the semi-join, inverted at the partition: the
    orders side ships per-batch DISTINCT custkeys (combiner), ONE keyed
    exchange on custkey, and each partition KEEPS the customers whose key
    has no evidence row. The nation dimension (25 rows) never enters the
    exchange — names are mapped after the final reduce on the driver-side
    small result.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _PART = {"nationkey": "int64", "n_customers": "int64", "acctbal_cents": "int64"}

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["c_acctbal"] > 0.0]
        return pd.DataFrame({
            "custkey": b["c_custkey"].to_numpy(dtype=np.int64),
            "nationkey": b["c_nationkey"].to_numpy(dtype=np.int64),
            "acctbal_cents": np.floor(b["c_acctbal"].to_numpy() * 100).astype(np.int64),
            "side": np.zeros(len(b), dtype=np.int64),
        })

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].dt.strftime("%Y-%m-%d")
        keys = np.unique(
            b.loc[d >= Q22_CUTOFF, "o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "custkey": keys,
            "nationkey": np.zeros(len(keys), dtype=np.int64),
            "acctbal_cents": np.zeros(len(keys), dtype=np.int64),
            "side": np.ones(len(keys), dtype=np.int64),
        })

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(cust_side, batch_format="pandas")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(order_side, batch_format="pandas")

    def anti_agg(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_PART)
        have = part.loc[part["side"] == 1, "custkey"].to_numpy()
        c = part[part["side"] == 0]
        c = c[~np.isin(c["custkey"].to_numpy(), have)]
        if c.empty:
            return typed_empty(_PART)
        g = c.groupby("nationkey", as_index=False).agg(
            n_customers=("custkey", "size"),
            acctbal_cents=("acctbal_cents", "sum"))
        return g.astype(_PART)

    partials = bucketed_aggregate(cust.union(orders), ["custkey"],
                                  anti_agg, coalesce=partitions_for())

    names = dict(zip(
        *(pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
          .to_pandas().T.values.tolist())
    ))

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q22_COLS)
        out = g.groupby("nationkey", as_index=False).agg(
            n_customers=("n_customers", "sum"),
            acctbal_cents=("acctbal_cents", "sum"))
        out["n_name"] = out["nationkey"].map(names)
        return out[list(_Q22_COLS)].astype(_Q22_COLS)

    return small_key_aggregate(partials, reduce)


Q10_LO, Q10_HI = "1996-01-01", "1996-07-01"
_Q10_COLS = {"c_custkey": "int64", "c_name": "object", "n_name": "object",
             "acctbal_cents": "int64", "revenue_cents": "int64"}


def returned_item_revenue(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape — the CHAINED big-join: lineitem⋈orders on
    orderkey, then the order-level revenue re-keys and joins customer on
    custkey; top-k customers by returned-item revenue.

    Scale plan: two keyed exchanges, one per join key, each fed by
    combiners so neither ships raw fact rows twice —

    1. lineitem ('R'-flag filtered) pre-aggregates revenue per orderkey
       per batch; orders (date-windowed) ship (orderkey, custkey); the
       orderkey exchange joins and IMMEDIATELY re-combines to (custkey,
       revenue) partials — order-level rows never leave the partition.
    2. customer ships attribute rows once; the custkey exchange merges
       revenue partials with attributes, emits a local top-k, and a
       single small task takes the global top-k (revenue DESC, custkey
       ASC tie-break, stated in the SQL twin). The nation dimension (25
       rows) maps names after the final reduce.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _S1 = {"orderkey": "int64", "custkey": "int64",
           "revenue_cents": "int64", "side": "int64"}
    _S1_OUT = {"custkey": "int64", "revenue_cents": "int64"}

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].dt.strftime("%Y-%m-%d")
        b = b[(d >= Q10_LO) & (d < Q10_HI)]
        return pd.DataFrame({
            "orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
            "custkey": b["o_custkey"].to_numpy(dtype=np.int64),
            "revenue_cents": np.zeros(len(b), dtype=np.int64),
            "side": np.zeros(len(b), dtype=np.int64),
        })

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        rev = np.floor(
            b["l_extendedprice"].to_numpy() * (1 - b["l_discount"].to_numpy()) * 100
        ).astype(np.int64)
        g = (pd.DataFrame({"orderkey": b["l_orderkey"].to_numpy(dtype=np.int64),
                           "revenue_cents": rev})
             .groupby("orderkey", as_index=False)["revenue_cents"].sum())
        g["custkey"] = np.int64(0)
        g["side"] = np.int64(1)
        return g[list(_S1)].astype(_S1)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_side, batch_format="pandas")
    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(line_side, batch_format="pandas")

    def join_to_cust(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_S1_OUT)
        o = part[part["side"] == 0]
        r = (part[part["side"] == 1]
             .groupby("orderkey", as_index=False)["revenue_cents"].sum())
        m = o[["orderkey", "custkey"]].merge(r, on="orderkey")
        if m.empty:
            return typed_empty(_S1_OUT)
        return (m.groupby("custkey", as_index=False)["revenue_cents"].sum()
                .astype(_S1_OUT))

    cust_rev = bucketed_aggregate(orders.union(lines), ["orderkey"],
                                  join_to_cust, coalesce=partitions_for())

    _S2 = {"custkey": "int64", "c_name": "object", "nationkey": "int64",
           "acctbal_cents": "int64", "revenue_cents": "int64", "side": "int64"}
    _S2_OUT = {"custkey": "int64", "c_name": "object", "nationkey": "int64",
               "acctbal_cents": "int64", "revenue_cents": "int64"}

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": b["c_custkey"].to_numpy(dtype=np.int64),
            "c_name": b["c_name"].to_numpy(),
            "nationkey": b["c_nationkey"].to_numpy(dtype=np.int64),
            "acctbal_cents": np.floor(b["c_acctbal"].to_numpy() * 100).astype(np.int64),
            "revenue_cents": np.zeros(len(b), dtype=np.int64),
            "side": np.zeros(len(b), dtype=np.int64),
        })

    def rev_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["c_name"] = ""
        b["nationkey"] = np.int64(0)
        b["acctbal_cents"] = np.int64(0)
        b["side"] = np.int64(1)
        return b[list(_S2)].astype(_S2)

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    ).map_batches(cust_side, batch_format="pandas")

    def local_topk(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_S2_OUT)
        r = (part[part["side"] == 1]
             .groupby("custkey", as_index=False)["revenue_cents"].sum())
        c = part[part["side"] == 0].drop(columns=["revenue_cents", "side"])
        m = c.merge(r, on="custkey")
        if m.empty:
            return typed_empty(_S2_OUT)
        m = m.sort_values(["revenue_cents", "custkey"],
                          ascending=[False, True]).head(k)
        return m[list(_S2_OUT)].astype(_S2_OUT)

    partials = bucketed_aggregate(
        cust.union(cust_rev.map_batches(rev_side, batch_format="pandas")),
        ["custkey"], local_topk, coalesce=partitions_for())

    names = dict(zip(
        *(pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
          .to_pandas().T.values.tolist())
    ))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q10_COLS)
        g = g.sort_values(["revenue_cents", "custkey"],
                          ascending=[False, True]).head(k)
        out = pd.DataFrame({
            "c_custkey": g["custkey"].to_numpy(),
            "c_name": g["c_name"].to_numpy(),
            "n_name": g["nationkey"].map(names).to_numpy(),
            "acctbal_cents": g["acctbal_cents"].to_numpy(),
            "revenue_cents": g["revenue_cents"].to_numpy(),
        })
        return out.astype(_Q10_COLS)

    return small_key_aggregate(partials, final_topk)


Q5_REGION = "ASIA"
Q5_LO, Q5_HI = "1996-01-01", "1997-01-01"
_Q5_COLS = {"n_name": "object", "revenue_cents": "int64", "n_lineitems": "int64"}
_Q5_MID = {"l_orderkey": "int64", "nat": "int64", "revenue_cents": "int64",
           "n_li": "int64", "side": "int64"}
_Q5_PART = {"nat": "int64", "revenue_cents": "int64", "n_li": "int64"}


def local_supplier_revenue(sf_dir: str,
                           broadcast_dim_limit: int = BROADCAST_DIM_LIMIT):
    """TPC-H Q5 shape — the multiway join whose distinguishing feature is
    a CROSS-SIDE equality (c_nationkey = s_nationkey) that no single
    broadcast can resolve: the customer's nation arrives through the
    orders side and the supplier's nation through the lineitem side, and
    they only meet in the orderkey-partitioned join.

    Plan: region+nation (≤ a few hundred rows at any scale) are read on
    the driver; supplier keys in the region are broadcast once (10k×SF
    rows — ~80 MB of int64 pairs at SF=10k, the same per-worker budget as
    revenue_by_nation's dimension arm). Customer is size-aware like
    revenue_by_nation: its (custkey → nationkey) map is broadcast under
    ``broadcast_dim_limit`` rows and resolved by a custkey exchange above
    it. Lineitem revenue is combined per (orderkey, supplier-nation)
    inside each batch before the single big exchange on orderkey, where
    the cross-side filter and a per-partition partial sum by nation run;
    the final reduce is 25 rows."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == Q5_REGION, "r_regionkey"].astype("int64"))
    nat = nat[nat["n_regionkey"].astype("int64").isin(rkeys)]
    names = dict(zip(nat["n_nationkey"].astype("int64"), nat["n_name"]))
    region_nations = np.sort(np.fromiter(names, dtype=np.int64))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].astype("int64").isin(names)]
    sup = sup.sort_values("s_suppkey")
    supkey_ref = ray.put(sup["s_suppkey"].to_numpy(dtype=np.int64))
    supnat_ref = ray.put(sup["s_nationkey"].to_numpy(dtype=np.int64))

    def _lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
        """searchsorted inner-join probe: (mask, matched values)."""
        if len(keys) == 0:
            return np.zeros(len(probe), dtype=bool), np.empty(0, dtype=np.int64)
        pos = np.searchsorted(keys, probe)
        pos[pos == len(keys)] = 0
        hit = keys[pos] == probe
        return hit, vals[pos[hit]]

    # Arrow task closure (the Q8 rationale: per-task "setup" is a
    # zero-copy ray.get, the scan's filter/arithmetic/groupby stay in
    # pyarrow, no actor pool to ramp)
    import pyarrow as pa
    import pyarrow.compute as pc

    def line_side(t: "pa.Table") -> "pa.Table":
        keys, nats = ray.get(supkey_ref), ray.get(supnat_ref)
        hit, snat = _lookup(keys, nats,
                            t.column("l_suppkey").combine_chunks()
                            .to_numpy(zero_copy_only=False).astype(np.int64))
        t = t.filter(pa.array(hit))
        rev = pc.cast(pc.floor(pc.multiply(
            pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            pa.scalar(100.0))), pa.int64())
        g = (pa.table({"l_orderkey": pc.cast(t.column("l_orderkey"),
                                             pa.int64()),
                       "nat": pa.array(snat),
                       "revenue_cents": rev})
             .group_by(["l_orderkey", "nat"])
             .aggregate([("revenue_cents", "sum"),
                         ("revenue_cents", "count")])
             .rename_columns(["l_orderkey", "nat", "revenue_cents",
                              "n_li"]))
        return g.append_column(
            "side", pa.repeat(pa.scalar(1, type=pa.int64()), g.num_rows))

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)

    def _order_frame(okey: np.ndarray, cnat: np.ndarray) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": okey, "nat": cnat,
             "revenue_cents": np.zeros(len(okey), dtype=np.int64),
             "n_li": np.zeros(len(okey), dtype=np.int64),
             "side": np.zeros(len(okey), dtype=np.int64)}
        ).astype(_Q5_MID)

    n_customers = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_customers <= broadcast_dim_limit:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"]).to_pandas()
        cust = cust[cust["c_nationkey"].astype("int64").isin(names)]
        cust = cust.sort_values("c_custkey")
        ckey_ref = ray.put(cust["c_custkey"].to_numpy(dtype=np.int64))
        cnat_ref = ray.put(cust["c_nationkey"].to_numpy(dtype=np.int64))

        q5_lo = pa.scalar(pd.Timestamp(Q5_LO), type=pa.timestamp("us"))
        q5_hi = pa.scalar(pd.Timestamp(Q5_HI), type=pa.timestamp("us"))

        def order_side(t: "pa.Table") -> "pa.Table":
            keys, nats = ray.get(ckey_ref), ray.get(cnat_ref)
            od = t.column("o_orderdate")
            t = t.filter(pc.and_(pc.greater_equal(od, q5_lo),
                                 pc.less(od, q5_hi)))
            hit, cnat = _lookup(keys, nats,
                                t.column("o_custkey").combine_chunks()
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64))
            t = t.filter(pa.array(hit))
            z = pa.repeat(pa.scalar(0, type=pa.int64()), t.num_rows)
            return pa.table({
                "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "nat": pa.array(cnat),
                "revenue_cents": z, "n_li": z, "side": z})

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(order_side, batch_format="pyarrow",
                      zero_copy_batch=True)
    else:
        orders = _orders_with_cust_nation(sf_dir, region_nations)

    def join_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_Q5_PART)
        o = part[part["side"] == 0][["l_orderkey", "nat"]].rename(
            columns={"nat": "c_nat"})
        li = part[part["side"] == 1]
        m = li.merge(o, on="l_orderkey")
        m = m[m["nat"] == m["c_nat"]]
        if m.empty:
            return typed_empty(_Q5_PART)
        g = m.groupby("nat", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"), n_li=("n_li", "sum"))
        return g[list(_Q5_PART)].astype(_Q5_PART)

    partials = bucketed_aggregate(orders.union(lines), ["l_orderkey"],
                                  join_part, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q5_COLS)
        out = g.groupby("nat", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"), n_lineitems=("n_li", "sum"))
        out["n_name"] = out["nat"].map(names)
        out = out.sort_values(["revenue_cents", "n_name"],
                              ascending=[False, True]).reset_index(drop=True)
        return out[list(_Q5_COLS)].astype(_Q5_COLS)

    return small_key_aggregate(partials, final)


def _orders_with_cust_nation(sf_dir: str, region_nations: np.ndarray):
    """Exchange arm for Q5's customer dimension: custkey exchange joining
    date-filtered orders with region-filtered customers, emitting the
    (orderkey, customer-nation) mid-frame rows (side 0)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _CK = {"c_custkey": "int64", "l_orderkey": "int64", "nat": "int64",
           "side2": "int64"}

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].astype(str)
        b = b[(d >= Q5_LO) & (d < Q5_HI)]
        return pd.DataFrame(
            {"c_custkey": b["o_custkey"].to_numpy(dtype=np.int64),
             "l_orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
             "nat": np.zeros(len(b), dtype=np.int64),
             "side2": np.zeros(len(b), dtype=np.int64)}
        ).astype(_CK)

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[np.isin(b["c_nationkey"].to_numpy(dtype=np.int64), region_nations)]
        return pd.DataFrame(
            {"c_custkey": b["c_custkey"].to_numpy(dtype=np.int64),
             "l_orderkey": np.zeros(len(b), dtype=np.int64),
             "nat": b["c_nationkey"].to_numpy(dtype=np.int64),
             "side2": np.ones(len(b), dtype=np.int64)}
        ).astype(_CK)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_side, batch_format="pandas")
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"],
    ).map_batches(cust_side, batch_format="pandas")

    def join(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_Q5_MID)
        c = part[part["side2"] == 1][["c_custkey", "nat"]]
        o = part[part["side2"] == 0][["c_custkey", "l_orderkey"]]
        m = o.merge(c, on="c_custkey")
        return pd.DataFrame(
            {"l_orderkey": m["l_orderkey"].to_numpy(dtype=np.int64),
             "nat": m["nat"].to_numpy(dtype=np.int64),
             "revenue_cents": np.zeros(len(m), dtype=np.int64),
             "n_li": np.zeros(len(m), dtype=np.int64),
             "side": np.zeros(len(m), dtype=np.int64)}
        ).astype(_Q5_MID)

    return bucketed_aggregate(orders.union(cust), ["c_custkey"], join,
                              coalesce=partitions_for())


_COV_COLS = {"n_name": "object", "n_customers": "int64", "n_suppliers": "int64"}


def nation_coverage(sf_dir: str):
    """FULL OUTER join shape: per nation, customer and supplier counts
    with zeros where a side is absent. Both fact sides collapse to
    ≤ 25-row partial counts inside map_batches (nothing row-sized is
    exchanged); the one-task final outer-merges the two partial sets
    onto the nation dimension read on the driver (dimension tables are
    O(100) rows at any scale)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    names = pq.read_table(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).to_pandas()
    names["n_nationkey"] = names["n_nationkey"].astype("int64")

    def side_counts(col: str, side: int):
        def run(b: pd.DataFrame) -> pd.DataFrame:
            k, c = np.unique(b[col].to_numpy(dtype=np.int64), return_counts=True)
            return pd.DataFrame({"nk": k, "n": c.astype(np.int64),
                                 "side": np.full(len(k), side, dtype=np.int64)})

        return run

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=["c_nationkey"]).map_batches(
        side_counts("c_nationkey", 0), batch_format="pandas")
    sup = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                                columns=["s_nationkey"]).map_batches(
        side_counts("s_nationkey", 1), batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_COV_COLS)
        c = (g[g["side"] == 0].groupby("nk", as_index=False).agg(
            n_customers=("n", "sum")))
        s = (g[g["side"] == 1].groupby("nk", as_index=False).agg(
            n_suppliers=("n", "sum")))
        out = names.rename(columns={"n_nationkey": "nk"}).merge(
            c, on="nk", how="left").merge(s, on="nk", how="left")
        out["n_customers"] = out["n_customers"].fillna(0).astype("int64")
        out["n_suppliers"] = out["n_suppliers"].fillna(0).astype("int64")
        return (out.sort_values("n_name").reset_index(drop=True)
                [list(_COV_COLS)].astype(_COV_COLS))

    return small_key_aggregate(cust.union(sup), merge)


BLOOM_PRIORITY = "1-URGENT"
BLOOM_BITS = 1 << 20  # 128 KiB bitset — fixed size at ANY key cardinality
_BLOOM_COLS = {"n_lineitems": "int64", "revenue_cents": "int64"}


def _bloom_hashes(keys: np.ndarray, n_bits: int) -> tuple[np.ndarray, ...]:
    """Three vectorized splitmix64-style hash positions per key. Engine-
    internal only (the bloom never reaches the oracle), so a cheap numpy
    mix beats per-key md5."""
    x = keys.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    m = np.uint64(n_bits - 1)  # n_bits is a power of two
    return (x & m, (x >> np.uint64(21)) & m, (x >> np.uint64(42)) & m)


def _bloom_set(bits: np.ndarray, keys: np.ndarray, n_bits: int) -> None:
    for h in _bloom_hashes(keys, n_bits):
        # unbuffered accumulate: plain bits[idx] |= v drops updates when
        # two keys land in the same word within one batch
        np.bitwise_or.at(bits, h >> np.uint64(6),
                         np.uint64(1) << (h & np.uint64(63)))


def _bloom_test(bits: np.ndarray, keys: np.ndarray, n_bits: int) -> np.ndarray:
    hit = np.ones(len(keys), dtype=bool)
    for h in _bloom_hashes(keys, n_bits):
        hit &= (bits[h >> np.uint64(6)] >> (h & np.uint64(63))) & np.uint64(1) != 0
    return hit


def bloom_semi_revenue(sf_dir: str, n_bits: int = BLOOM_BITS):
    """Bloom-pruned EXACT semi-join: revenue of lineitems whose order is
    {BLOOM_PRIORITY}-priority.

    The scale pattern: when the build side's key set is too large to
    broadcast exactly, broadcast a FIXED-size Bloom bitset instead
    (128 KiB here regardless of key cardinality) and prune the probe
    side map-side — no false negatives, so the subsequent exact
    orderkey-exchange semi-join sees only survivors and the exchange
    volume shrinks by the filter's selectivity while the answer stays
    exact (false positives die in the partition join). The oracle is the
    plain SQL semi-join: the bloom is invisible to the result."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])

    def bloom_partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = b.loc[b["o_orderpriority"] == BLOOM_PRIORITY,
                     "o_orderkey"].to_numpy(dtype=np.int64)
        bits = np.zeros(n_bits // 64, dtype=np.uint64)
        _bloom_set(bits, keys, n_bits)
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def bloom_or(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_bits // 64, dtype=np.uint64)
        for raw in g["bits"]:
            acc |= np.frombuffer(raw, dtype=np.uint64)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    merged = small_key_aggregate(
        orders.map_batches(bloom_partial, batch_format="pandas"), bloom_or
    ).to_pandas()
    bloom_ref = ray.put(np.frombuffer(merged["bits"].iloc[0], dtype=np.uint64))

    _MID = {"l_orderkey": "int64", "revenue_cents": "int64", "n_li": "int64",
            "side": "int64"}

    class ProbeSide:
        def __init__(self):
            self.bits = ray.get(bloom_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            keys = b["l_orderkey"].to_numpy(dtype=np.int64)
            b = b[_bloom_test(self.bits, keys, n_bits)]
            rev = np.floor(b["l_extendedprice"].to_numpy()
                           * (1 - b["l_discount"].to_numpy()) * 100
                           ).astype(np.int64)
            g = (pd.DataFrame({"l_orderkey": b["l_orderkey"]
                               .to_numpy(dtype=np.int64),
                               "revenue_cents": rev})
                 .groupby("l_orderkey", as_index=False)
                 .agg(revenue_cents=("revenue_cents", "sum"),
                      n_li=("revenue_cents", "size")))
            g["side"] = np.ones(len(g), dtype=np.int64)
            return g[list(_MID)].astype(_MID)

    def build_side(b: pd.DataFrame) -> pd.DataFrame:
        keys = b.loc[b["o_orderpriority"] == BLOOM_PRIORITY,
                     "o_orderkey"].to_numpy(dtype=np.int64)
        n = len(keys)
        return pd.DataFrame(
            {"l_orderkey": keys,
             "revenue_cents": np.zeros(n, dtype=np.int64),
             "n_li": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_MID)

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(ProbeSide, batch_format="pandas",
                  concurrency=default_concurrency())
    keys_ds = orders.map_batches(build_side, batch_format="pandas")

    _PART = {"revenue_cents": "int64", "n_li": "int64"}

    def semi(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_PART)
        true_keys = p.loc[p["side"] == 0, "l_orderkey"]
        li = p[p["side"] == 1]
        m = li[li["l_orderkey"].isin(set(true_keys))]
        return pd.DataFrame({"revenue_cents": [int(m["revenue_cents"].sum())],
                             "n_li": [int(m["n_li"].sum())]})

    partials = bucketed_aggregate(keys_ds.union(lines), ["l_orderkey"],
                                  semi, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_BLOOM_COLS)
        return pd.DataFrame(
            {"n_lineitems": [int(g["n_li"].sum())],
             "revenue_cents": [int(g["revenue_cents"].sum())]}
        ).astype(_BLOOM_COLS)

    return small_key_aggregate(partials, final)


_ROLLUP_COLS = {"l_returnflag": "object", "l_linestatus": "object",
                "lvl": "int64", "sum_qty": "int64",
                "sum_disc_price_cents": "int64", "count_order": "int64"}


def pricing_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — the grouping-sets
    surface. The detail level reuses the Q1 combiner discipline (per-batch
    partial sums, one small final task); the flag subtotals and grand
    total are derived IN the final reduce from the detail partials —
    super-aggregates never touch the fact table again. ``lvl`` is the SQL
    GROUPING() bitmask (0 detail, 1 status rolled, 3 both rolled);
    rolled-up key columns render as '' (the engine avoids nullable
    string keys on the exchange)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"].astype(str) <= CUTOFF]
        ext = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        return (pd.DataFrame(
            {"l_returnflag": b["l_returnflag"].to_numpy(),
             "l_linestatus": b["l_linestatus"].to_numpy(),
             "qty": np.floor(b["l_quantity"].to_numpy()).astype(np.int64),
             "disc_price_cents": np.floor(ext * (1 - disc) * 100)
             .astype(np.int64)})
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty=("qty", "sum"),
                 sum_disc_price_cents=("disc_price_cents", "sum"),
                 count_order=("qty", "size")))

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_ROLLUP_COLS)
        sums = dict(sum_qty=("sum_qty", "sum"),
                    sum_disc_price_cents=("sum_disc_price_cents", "sum"),
                    count_order=("count_order", "sum"))
        detail = g.groupby(["l_returnflag", "l_linestatus"],
                           as_index=False).agg(**sums)
        detail["lvl"] = 0
        byflag = detail.groupby("l_returnflag", as_index=False).agg(**sums)
        byflag["l_linestatus"] = ""
        byflag["lvl"] = 1
        total = detail.agg({k: "sum" for k in sums}).to_frame().T
        total["l_returnflag"] = ""
        total["l_linestatus"] = ""
        total["lvl"] = 3
        out = pd.concat([detail, byflag, total], ignore_index=True)
        return (out.sort_values(["lvl", "l_returnflag", "l_linestatus"])
                .reset_index(drop=True)[list(_ROLLUP_COLS)]
                .astype(_ROLLUP_COLS))

    return small_key_aggregate(ds.map_batches(partial, batch_format="pandas"),
                               reduce)


def pricing_cube(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus) — the full grouping-set
    lattice: detail (lvl 0), status rolled (1), flag rolled (2), grand
    total (3). Same discipline as pricing_rollup: every super-aggregate
    derives from the detail partials in the one final task; the fact
    table is scanned exactly once."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"].astype(str) <= CUTOFF]
        ext = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        return (pd.DataFrame(
            {"l_returnflag": b["l_returnflag"].to_numpy(),
             "l_linestatus": b["l_linestatus"].to_numpy(),
             "qty": np.floor(b["l_quantity"].to_numpy()).astype(np.int64),
             "disc_price_cents": np.floor(ext * (1 - disc) * 100)
             .astype(np.int64)})
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty=("qty", "sum"),
                 sum_disc_price_cents=("disc_price_cents", "sum"),
                 count_order=("qty", "size")))

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_ROLLUP_COLS)
        sums = dict(sum_qty=("sum_qty", "sum"),
                    sum_disc_price_cents=("sum_disc_price_cents", "sum"),
                    count_order=("count_order", "sum"))
        detail = g.groupby(["l_returnflag", "l_linestatus"],
                           as_index=False).agg(**sums)
        detail["lvl"] = 0
        byflag = detail.groupby("l_returnflag", as_index=False).agg(**sums)
        byflag["l_linestatus"] = ""
        byflag["lvl"] = 1
        bystatus = detail.groupby("l_linestatus", as_index=False).agg(**sums)
        bystatus["l_returnflag"] = ""
        bystatus["lvl"] = 2
        total = detail.agg({k: "sum" for k in sums}).to_frame().T
        total["l_returnflag"] = ""
        total["l_linestatus"] = ""
        total["lvl"] = 3
        out = pd.concat([detail, byflag, bystatus, total], ignore_index=True)
        return (out.sort_values(["lvl", "l_returnflag", "l_linestatus"])
                .reset_index(drop=True)[list(_ROLLUP_COLS)]
                .astype(_ROLLUP_COLS))

    return small_key_aggregate(ds.map_batches(partial, batch_format="pandas"),
                               reduce)


Q18_QTY = 200
_Q18_COLS = {"c_custkey": "int64", "c_name": "object", "l_orderkey": "int64",
             "sum_qty": "int64", "total_price_cents": "int64", "rnk": "int64"}


def large_volume_customers(sf_dir: str, k: int = 25,
                           qty_threshold: int = Q18_QTY):
    """TPC-H Q18 shape — HAVING on a big aggregate, then join: orders
    whose total lineitem quantity exceeds the threshold, top-k by order
    value with the customer attached.

    The quantity aggregate is combiner-fed (per-batch per-order sums)
    and meets the orders side in ONE orderkey exchange where the HAVING
    filter runs; each partition emits its local top-k. Customer names
    are resolved AFTER the top-k — a filtered point-lookup read of ≤ k
    keys (predicate-pushdown parquet read), never a corpus-scale join:
    the cheapest correct plan once the result is k rows."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _MID = {"l_orderkey": "int64", "sum_qty": "int64", "o_custkey": "int64",
            "total_price_cents": "int64", "side": "int64"}

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame(
            {"l_orderkey": b["l_orderkey"].to_numpy(dtype=np.int64),
             "sum_qty": np.floor(b["l_quantity"].to_numpy()).astype(np.int64)})
            .groupby("l_orderkey", as_index=False).agg(sum_qty=("sum_qty", "sum")))
        n = len(g)
        g["o_custkey"] = np.zeros(n, dtype=np.int64)
        g["total_price_cents"] = np.zeros(n, dtype=np.int64)
        g["side"] = np.ones(n, dtype=np.int64)
        return g[list(_MID)].astype(_MID)

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"l_orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
             "sum_qty": np.zeros(n, dtype=np.int64),
             "o_custkey": b["o_custkey"].to_numpy(dtype=np.int64),
             "total_price_cents": np.floor(
                 b["o_totalprice"].to_numpy() * 100).astype(np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_MID)

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"],
    ).map_batches(line_side, batch_format="pandas")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(order_side, batch_format="pandas")

    _TOP = {"c_custkey": "int64", "l_orderkey": "int64", "sum_qty": "int64",
            "total_price_cents": "int64"}

    def having_topk(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_TOP)
        q = (p[p["side"] == 1].groupby("l_orderkey", as_index=False)
             .agg(sum_qty=("sum_qty", "sum")))
        q = q[q["sum_qty"] > qty_threshold]
        o = p[p["side"] == 0][["l_orderkey", "o_custkey",
                               "total_price_cents"]]
        m = o.merge(q, on="l_orderkey")
        if m.empty:
            return typed_empty(_TOP)
        m = m.sort_values(["total_price_cents", "l_orderkey"],
                          ascending=[False, True], kind="mergesort").head(k)
        m = m.rename(columns={"o_custkey": "c_custkey"})
        return m[list(_TOP)].astype(_TOP)

    partials = bucketed_aggregate(orders.union(lines), ["l_orderkey"],
                                  having_topk, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q18_COLS)
        g = g.sort_values(["total_price_cents", "l_orderkey"],
                          ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        # point-lookup of ≤ k customer names: predicate-pushdown read
        keys = sorted(set(int(x) for x in g["c_custkey"]))
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
            filters=[("c_custkey", "in", keys)]).to_pandas()
        names = dict(zip(cust["c_custkey"].astype("int64"), cust["c_name"]))
        g["c_name"] = g["c_custkey"].map(names)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[list(_Q18_COLS)].astype(_Q18_COLS)

    return small_key_aggregate(partials, final)


_Q13_COLS = {"c_count": "int64", "custdist": "int64"}


def order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by order count —
    a LEFT join whose unmatched side must survive (customers with zero
    orders are a histogram bucket, not a dropped row).

    Plan: per-batch order-count combiners (custkey → n) union the
    customer keys side-marked into ONE exchange keyed on custkey; each
    complete-key partition resolves the left join locally (customers
    missing from the orders side get c_count = 0) and emits its
    HISTOGRAM partial (c_count → custdist) — so the final hop carries
    ≈ distinct order counts per partition, never a customer-sized
    relation. Both sides are corpus-sized; nothing is broadcast.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _ROW = {"custkey": "int64", "n": "int64", "side": "int64"}

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["o_custkey"].value_counts()
        return pd.DataFrame({
            "custkey": vc.index.to_numpy(dtype=np.int64),
            "n": vc.to_numpy(dtype=np.int64),
            "side": np.ones(len(vc), dtype=np.int64),
        })

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": b["c_custkey"].to_numpy(dtype=np.int64),
            "n": np.zeros(len(b), dtype=np.int64),
            "side": np.zeros(len(b), dtype=np.int64),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(order_side, batch_format="pandas")
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(cust_side, batch_format="pandas")

    def hist_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_Q13_COLS)
        counts = (part[part["side"] == 1]
                  .groupby("custkey")["n"].sum())
        ckeys = part.loc[part["side"] == 0, "custkey"]
        c_count = ckeys.map(counts).fillna(0).astype(np.int64)
        vc = c_count.value_counts()
        return pd.DataFrame({
            "c_count": vc.index.to_numpy(dtype=np.int64),
            "custdist": vc.to_numpy(dtype=np.int64),
        })

    partials = bucketed_aggregate(cust.union(orders), ["custkey"],
                                  hist_part, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q13_COLS)
        out = g.groupby("c_count", as_index=False).agg(
            custdist=("custdist", "sum"))
        return out[list(_Q13_COLS)].astype(_Q13_COLS)

    return small_key_aggregate(partials, final)


Q14_LO = "1996-01-01"
Q14_HI = "1997-01-01"
_Q14_COLS = {"promo_cents": "int64", "total_cents": "int64",
             "promo_ppm": "int64"}


def promo_revenue(sf_dir: str, broadcast_dim_limit: int = BROADCAST_DIM_LIMIT):
    """TPC-H Q14 shape: share of revenue from promotional parts — a
    conditional aggregate over a dimension join, reduced to ONE row.

    Size-aware like :func:`revenue_by_nation`: part within the broadcast
    limit ships ONCE as (sorted partkey, is-promo bitmask) and every
    lineitem batch folds to a single (promo, total) partial — zero
    shuffle; a 100-TB part table takes the keyed-exchange arm
    automatically. The ratio is integer ppm computed from EXACT integer
    cent sums (same float64 multiply-divide-floor on both sides).
    """
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    if n_part > broadcast_dim_limit:
        return _promo_revenue_exchange(sf_dir)

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy()
    order_idx = np.argsort(pk)
    promo = (np.asarray(part.column("p_type").to_pylist(), dtype=object)
             == "PROMO")[order_idx]
    dim_ref = ray.put((pk[order_idx], promo))

    class Fold:
        def __init__(self):
            self.pk, self.promo = ray.get(dim_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            d = b["l_shipdate"].dt.strftime("%Y-%m-%d")
            b = b[(d >= Q14_LO) & (d < Q14_HI)]
            if b.empty:
                return typed_empty({"promo_cents": "int64", "total_cents": "int64"})
            pos, ok = dim_lookup(self.pk, b["l_partkey"].to_numpy())
            b, pos = b[ok], pos[ok]  # inner join: orphan partkeys drop
            if b.empty:
                return typed_empty({"promo_cents": "int64", "total_cents": "int64"})
            cents = np.floor(b["l_extendedprice"].to_numpy()
                             * (1 - b["l_discount"].to_numpy()) * 100).astype(np.int64)
            is_promo = self.promo[pos]
            return pd.DataFrame({
                "promo_cents": [np.int64(cents[is_promo].sum())],
                "total_cents": [np.int64(cents.sum())],
            })

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])
    partials = ds.map_batches(Fold, batch_format="pandas",
                              concurrency=default_concurrency())
    return small_key_aggregate(partials, _promo_final)


def _promo_final(g: pd.DataFrame) -> pd.DataFrame:
    from hebrew_ner_ray.ops.shuffle import typed_empty

    if g.empty:
        return typed_empty(_Q14_COLS)
    promo = np.int64(g["promo_cents"].sum())
    total = np.int64(g["total_cents"].sum())
    ppm = np.int64(np.floor(promo * 1_000_000.0 / total)) if total else np.int64(0)
    return pd.DataFrame({"promo_cents": [promo], "total_cents": [total],
                         "promo_ppm": [ppm]}).astype(_Q14_COLS)


def _promo_revenue_exchange(sf_dir: str):
    """Exchange arm: lineitem cent-combiners ⋈ part on partkey."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _ROW = {"partkey": "int64", "cents": "int64", "side": "int64"}
    _PART = {"promo_cents": "int64", "total_cents": "int64"}

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].dt.strftime("%Y-%m-%d")
        b = b[(d >= Q14_LO) & (d < Q14_HI)]
        if b.empty:
            return typed_empty(_ROW)
        cents = np.floor(b["l_extendedprice"].to_numpy()
                         * (1 - b["l_discount"].to_numpy()) * 100).astype(np.int64)
        g = (pd.DataFrame({"partkey": b["l_partkey"].to_numpy(dtype=np.int64),
                           "cents": cents})
             .groupby("partkey", as_index=False).agg(cents=("cents", "sum")))
        g["side"] = np.int64(1)
        return g[list(_ROW)].astype(_ROW)

    def part_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "partkey": b["p_partkey"].to_numpy(dtype=np.int64),
            "cents": (np.asarray(b["p_type"].to_numpy(), dtype=object)
                      == "PROMO").astype(np.int64),
            "side": np.zeros(len(b), dtype=np.int64),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(line_side, batch_format="pandas")
    parts = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(part_side, batch_format="pandas")

    def join_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_PART)
        li = (part[part["side"] == 1]
              .groupby("partkey", as_index=False).agg(cents=("cents", "sum")))
        pm = part[part["side"] == 0][["partkey", "cents"]].rename(
            columns={"cents": "is_promo"})
        m = li.merge(pm, on="partkey")
        if m.empty:
            return typed_empty(_PART)
        return pd.DataFrame({
            "promo_cents": [np.int64(m.loc[m["is_promo"] == 1, "cents"].sum())],
            "total_cents": [np.int64(m["cents"].sum())],
        })

    partials = bucketed_aggregate(parts.union(lines), ["partkey"],
                                  join_part, coalesce=partitions_for())
    return small_key_aggregate(partials, _promo_final)


QUANT_PCTS = (25, 50, 75, 99)
QUANT_SHIFT = 12  # pass-1 bucket = cents >> 12 (4096-cent coarse bins)
_QUANT_COLS = {"q_pct": "int64", "value_cents": "int64"}


def price_quantiles_twopass(sf_dir: str, pcts=QUANT_PCTS):
    """EXACT quantiles of a LARGE-domain value (lineitem price cents,
    ~10⁷ distinct values) — the two-pass radix refinement that replaces a
    global sort at 100 TB.

    token_quantiles' one-pass histogram relies on a tiny value domain;
    here the domain is too wide, so pass 1 histograms the HIGH bits
    (cents >> 12 → ≤ a few thousand coarse bins, combiner-shrunk,
    corpus-size-independent), the driver locates each target rank's bin
    from the tiny cumulative table, and pass 2 re-scans with a vectorized
    filter to those ≤ len(pcts) bins and histograms exact values inside
    them. Two streaming passes, nothing corpus-sized collected. Rank
    semantics pinned (ceil(p·N/100), 1-based, integer ceil) identically
    in the SQL window twin.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    _H = {"bucket": "int64", "cnt": "int64"}

    def read():
        return read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                                     columns=["l_extendedprice"])

    def cents_of(b: pd.DataFrame) -> np.ndarray:
        return np.floor(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)

    def coarse(b: pd.DataFrame) -> pd.DataFrame:
        bucket, cnt = np.unique(cents_of(b) >> QUANT_SHIFT, return_counts=True)
        return pd.DataFrame({"bucket": bucket, "cnt": cnt.astype(np.int64)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_H)
        return g.groupby("bucket", as_index=False).agg(cnt=("cnt", "sum")).astype(_H)

    hist = (small_key_aggregate(read().map_batches(coarse, batch_format="pandas"),
                                merge)
            .to_pandas().sort_values("bucket").reset_index(drop=True))
    if hist.empty:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({c: pd.Series(dtype=t) for c, t in _QUANT_COLS.items()}))

    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    ranks = {p: (n * p + 99) // 100 for p in pcts}  # ceil(p·N/100), 1-based
    # bin containing rank r: first bucket whose cumulative count ≥ r
    bin_of = {p: int(hist["bucket"].iloc[np.searchsorted(cum, r)])
              for p, r in ranks.items()}
    # rank offset INSIDE the bin (count of values in earlier bins)
    below = {p: int(cum[np.searchsorted(cum, r) - 1])
             if np.searchsorted(cum, r) > 0 else 0
             for p, r in ranks.items()}
    need = sorted(set(bin_of.values()))
    need_arr = np.asarray(need, dtype=np.int64)

    def fine(b: pd.DataFrame) -> pd.DataFrame:
        c = cents_of(b)
        c = c[np.isin(c >> QUANT_SHIFT, need_arr)]
        v, cnt = np.unique(c, return_counts=True)
        return pd.DataFrame({"bucket": v, "cnt": cnt.astype(np.int64)})

    fh = (small_key_aggregate(read().map_batches(fine, batch_format="pandas"),
                              merge)
          .to_pandas().sort_values("bucket").reset_index(drop=True))
    out = []
    for p in pcts:
        inbin = fh[(fh["bucket"].to_numpy() >> QUANT_SHIFT) == bin_of[p]]
        c2 = inbin["cnt"].cumsum().to_numpy()
        idx = int(np.searchsorted(c2, ranks[p] - below[p]))
        out.append((np.int64(p), np.int64(inbin["bucket"].iloc[idx])))
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(out, columns=["q_pct", "value_cents"])
                          .astype(_QUANT_COLS))


Q7_LO = "1996-01-01"
Q7_HI = "1998-01-01"
_Q7_COLS = {"supp_nation": "object", "cust_nation": "object",
            "l_year": "int64", "revenue_cents": "int64", "n_lineitems": "int64"}


_Q7_ROW = {"orderkey": "int64", "nat": "int64", "l_year": "int64",
           "cents": "int64", "n": "int64", "side": "int64"}


def volume_shipping(sf_dir: str, broadcast_dim_limit: int = BROADCAST_DIM_LIMIT):
    """TPC-H Q7 shape: revenue flowing BETWEEN nation pairs by ship year
    — the two-dimension-attach join (supplier nation on the lineitem,
    customer nation through orders) with a cross-pair filter.

    Plan: supplier and customer key→nation maps are BOTH size-aware
    (the revenue_by_nation contract — metadata row count, no driver
    read above ``broadcast_dim_limit``): under the limit each map is
    ``ray.put`` once and probed per batch; above it the supplier nation
    attaches through a suppkey exchange on the lineitem combiners and
    the customer nation through a custkey exchange on orders. The
    big×big lineitem⋈orders hop is the ONE keyed exchange on orderkey,
    fed by lineitem combiners already pre-aggregated to (orderkey,
    supp_nation, year) partials. The (nation × nation × year) rollup is
    tiny and finishes in one task. Only ordered pairs with supp ≠ cust
    survive (both directions kept, as in Q7)."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    names = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))

    _ROW = _Q7_ROW
    _PART = {"supp_nat": "int64", "cust_nat": "int64", "l_year": "int64",
             "cents": "int64", "n": "int64"}

    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    if n_supp <= broadcast_dim_limit:
        supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
        sk = supp.column("s_suppkey").to_numpy()
        si = np.argsort(sk)
        supp_ref = ray.put((sk[si], supp.column("s_nationkey").to_numpy()[si]))

        class LineSide:
            def __init__(self):
                self.sk, self.snat = ray.get(supp_ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                d = b["l_shipdate"].dt.strftime("%Y-%m-%d")
                b = b[(d >= Q7_LO) & (d < Q7_HI)]
                if b.empty:
                    return typed_empty(_ROW)
                pos, ok = dim_lookup(self.sk, b["l_suppkey"].to_numpy())
                b, pos = b[ok], pos[ok]  # inner join: orphan suppkeys drop
                if b.empty:
                    return typed_empty(_ROW)
                cents = np.floor(b["l_extendedprice"].to_numpy()
                                 * (1 - b["l_discount"].to_numpy()) * 100).astype(np.int64)
                nat = self.snat[pos]
                g = (pd.DataFrame({
                    "orderkey": b["l_orderkey"].to_numpy(dtype=np.int64),
                    "nat": nat.astype(np.int64),
                    "l_year": b["l_shipdate"].dt.year.to_numpy(dtype=np.int64),
                    "cents": cents})
                    .groupby(["orderkey", "nat", "l_year"], as_index=False)
                    .agg(cents=("cents", "sum"), n=("cents", "size")))
                g["side"] = np.int64(1)
                return g[list(_ROW)].astype(_ROW)

        lines = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                     "l_shipdate"]
        ).map_batches(LineSide, batch_format="pandas",
                      concurrency=default_concurrency())
    else:
        lines = _q7_lines_exchange(sf_dir)

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust <= broadcast_dim_limit:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        ck = cust.column("c_custkey").to_numpy()
        ci = np.argsort(ck)
        cust_ref = ray.put((ck[ci], cust.column("c_nationkey").to_numpy()[ci]))

        class OrderSide:
            def __init__(self):
                self.ck, self.cnat = ray.get(cust_ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                pos, ok = dim_lookup(self.ck, b["o_custkey"].to_numpy())
                b, pos = b[ok], pos[ok]  # inner join: orphan custkeys drop
                nat = self.cnat[pos]
                n = len(b)
                return pd.DataFrame({
                    "orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
                    "nat": nat.astype(np.int64),
                    "l_year": np.zeros(n, dtype=np.int64),
                    "cents": np.zeros(n, dtype=np.int64),
                    "n": np.zeros(n, dtype=np.int64),
                    "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(OrderSide, batch_format="pandas",
                      concurrency=default_concurrency())
    else:
        orders = _q7_orders_exchange(sf_dir)

    def join_part(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_PART)
        li = p[p["side"] == 1]
        od = (p[p["side"] == 0][["orderkey", "nat"]]
              .rename(columns={"nat": "cust_nat"}))
        m = li.merge(od, on="orderkey")
        m = m[m["nat"] != m["cust_nat"]]
        if m.empty:
            return typed_empty(_PART)
        return (m.rename(columns={"nat": "supp_nat"})
                .groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)
                .agg(cents=("cents", "sum"), n=("n", "sum"))
                [list(_PART)].astype(_PART))

    partials = bucketed_aggregate(orders.union(lines), ["orderkey"],
                                  join_part, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q7_COLS)
        out = (g.groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)
               .agg(cents=("cents", "sum"), n=("n", "sum")))
        out["supp_nation"] = out["supp_nat"].map(names)
        out["cust_nation"] = out["cust_nat"].map(names)
        out = out.rename(columns={"cents": "revenue_cents",
                                  "n": "n_lineitems"})
        return out[list(_Q7_COLS)].astype(_Q7_COLS)

    return small_key_aggregate(partials, final)


def _q7_lines_exchange(sf_dir: str):
    """Exchange arm for Q7's supplier dimension: lineitem combiners
    pre-aggregated to (suppkey, orderkey, year) meet supplier rows in a
    suppkey exchange that attaches the supplier nation, emitting the
    side-1 (orderkey, supp_nation, year) partials the orderkey exchange
    consumes — no driver read, no broadcast."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _SK = {"s_suppkey": "int64", "orderkey": "int64", "l_year": "int64",
           "cents": "int64", "n": "int64", "nat": "int64", "side2": "int64"}

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].dt.strftime("%Y-%m-%d")
        b = b[(d >= Q7_LO) & (d < Q7_HI)]
        if b.empty:
            return typed_empty(_SK)
        cents = np.floor(b["l_extendedprice"].to_numpy()
                         * (1 - b["l_discount"].to_numpy()) * 100).astype(np.int64)
        g = (pd.DataFrame({
            "s_suppkey": b["l_suppkey"].to_numpy(dtype=np.int64),
            "orderkey": b["l_orderkey"].to_numpy(dtype=np.int64),
            "l_year": b["l_shipdate"].dt.year.to_numpy(dtype=np.int64),
            "cents": cents})
            .groupby(["s_suppkey", "orderkey", "l_year"], as_index=False)
            .agg(cents=("cents", "sum"), n=("cents", "size")))
        g["nat"] = np.int64(0)
        g["side2"] = np.int64(0)
        return g[list(_SK)].astype(_SK)

    def supp_side(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"s_suppkey": b["s_suppkey"].to_numpy(dtype=np.int64),
             "orderkey": np.zeros(n, dtype=np.int64),
             "l_year": np.zeros(n, dtype=np.int64),
             "cents": np.zeros(n, dtype=np.int64),
             "n": np.zeros(n, dtype=np.int64),
             "nat": b["s_nationkey"].to_numpy(dtype=np.int64),
             "side2": np.ones(n, dtype=np.int64)}).astype(_SK)

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]
    ).map_batches(line_side, batch_format="pandas")
    su = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"],
    ).map_batches(supp_side, batch_format="pandas")

    def join(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_Q7_ROW)
        s = part[part["side2"] == 1][["s_suppkey", "nat"]].rename(
            columns={"nat": "s_nat"})
        li = part[part["side2"] == 0]
        m = li.merge(s, on="s_suppkey")  # inner join: orphan suppkeys drop
        if m.empty:
            return typed_empty(_Q7_ROW)
        out = pd.DataFrame(
            {"orderkey": m["orderkey"].to_numpy(dtype=np.int64),
             "nat": m["s_nat"].to_numpy(dtype=np.int64),
             "l_year": m["l_year"].to_numpy(dtype=np.int64),
             "cents": m["cents"].to_numpy(dtype=np.int64),
             "n": m["n"].to_numpy(dtype=np.int64),
             "side": np.ones(len(m), dtype=np.int64)})
        return out.astype(_Q7_ROW)

    return bucketed_aggregate(li.union(su), ["s_suppkey"], join,
                              coalesce=partitions_for())


def _q7_orders_exchange(sf_dir: str):
    """Exchange arm for Q7's customer dimension: custkey exchange
    attaching the customer nation to orders, emitting the side-0
    (orderkey, cust_nation) rows — no driver read, no broadcast."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _CK = {"c_custkey": "int64", "orderkey": "int64", "nat": "int64",
           "side2": "int64"}

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"c_custkey": b["o_custkey"].to_numpy(dtype=np.int64),
             "orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
             "nat": np.zeros(n, dtype=np.int64),
             "side2": np.zeros(n, dtype=np.int64)}).astype(_CK)

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"c_custkey": b["c_custkey"].to_numpy(dtype=np.int64),
             "orderkey": np.zeros(n, dtype=np.int64),
             "nat": b["c_nationkey"].to_numpy(dtype=np.int64),
             "side2": np.ones(n, dtype=np.int64)}).astype(_CK)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
    ).map_batches(order_side, batch_format="pandas")
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"],
    ).map_batches(cust_side, batch_format="pandas")

    def join(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_Q7_ROW)
        c = part[part["side2"] == 1][["c_custkey", "nat"]].rename(
            columns={"nat": "c_nat"})
        o = part[part["side2"] == 0][["c_custkey", "orderkey"]]
        m = o.merge(c, on="c_custkey")  # inner join: orphan custkeys drop
        n = len(m)
        return pd.DataFrame(
            {"orderkey": m["orderkey"].to_numpy(dtype=np.int64),
             "nat": m["c_nat"].to_numpy(dtype=np.int64),
             "l_year": np.zeros(n, dtype=np.int64),
             "cents": np.zeros(n, dtype=np.int64),
             "n": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_Q7_ROW)

    return bucketed_aggregate(orders.union(cust), ["c_custkey"], join,
                              coalesce=partitions_for())


_DQ_COLS = {"n_orphan_lineitems": "int64", "n_orphan_orders": "int64",
            "n_dup_orderkeys": "int64", "n_empty_docs": "int64"}


def dq_constraints(sf_dir: str):
    """Data-quality constraint audit — the dbt-style test battery as ONE
    engine pass per constraint, each returning a violation count:

    - referential integrity lineitem→orders and orders→customer
      (anti-join counts via keyed exchanges; the fact side ships
      per-batch (key, count) combiners, never rows),
    - o_orderkey uniqueness (dup count from the same exchange shape),
    - non-empty document text (stateless map partial).

    Violation counts are model-sized, so the final assembly is
    driver-side; the scan work is all distributed. On healthy inputs
    every count is 0 — the audit row IS the gate."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    _ROW = {"key": "int64", "cnt": "int64", "side": "int64"}
    _CNT = {"n": "int64"}

    def _fact_side(col):
        def run(b: pd.DataFrame) -> pd.DataFrame:
            vc = b[col].value_counts()
            return pd.DataFrame({"key": vc.index.to_numpy(dtype=np.int64),
                                 "cnt": vc.to_numpy(dtype=np.int64),
                                 "side": np.ones(len(vc), dtype=np.int64)})
        return run

    def _dim_side(col):
        def run(b: pd.DataFrame) -> pd.DataFrame:
            k = b[col].drop_duplicates().to_numpy(dtype=np.int64)
            return pd.DataFrame({"key": k,
                                 "cnt": np.zeros(len(k), dtype=np.int64),
                                 "side": np.zeros(len(k), dtype=np.int64)})
        return run

    def _orphan_count(fact_path, fact_col, dim_path, dim_col) -> int:
        fact = read_parquet_clean(fact_path, columns=[fact_col]
                                     ).map_batches(_fact_side(fact_col),
                                                   batch_format="pandas")
        dim = read_parquet_clean(dim_path, columns=[dim_col]
                                    ).map_batches(_dim_side(dim_col),
                                                  batch_format="pandas")

        def anti(p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_CNT)
            present = set(p.loc[p["side"] == 0, "key"])
            f = p[p["side"] == 1]
            return pd.DataFrame({"n": [np.int64(
                f.loc[~f["key"].isin(present), "cnt"].sum())]})

        parts = bucketed_aggregate(dim.union(fact), ["key"], anti,
                                   coalesce=partitions_for())
        return int(parts.sum("n") or 0)

    orphan_li = _orphan_count(f"{sf_dir}/lineitem.parquet", "l_orderkey",
                              f"{sf_dir}/orders.parquet", "o_orderkey")
    orphan_ord = _orphan_count(f"{sf_dir}/orders.parquet", "o_custkey",
                               f"{sf_dir}/customer.parquet", "c_custkey")

    def dup_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["o_orderkey"].value_counts()
        return pd.DataFrame({"key": vc.index.to_numpy(dtype=np.int64),
                             "cnt": vc.to_numpy(dtype=np.int64)})

    def dup_count(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_CNT)
        s = p.groupby("key")["cnt"].sum()
        return pd.DataFrame({"n": [np.int64(s[s > 1].sum())]})

    dups = bucketed_aggregate(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey"]
                              ).map_batches(dup_partial, batch_format="pandas"),
        ["key"], dup_count, coalesce=partitions_for())
    n_dup = int(dups.sum("n") or 0)

    def empty_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(
            (b["text"].str.strip() == "").sum())]})

    empties = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                    columns=["text"]
                                    ).map_batches(empty_partial,
                                                  batch_format="pandas")
    n_empty = int(empties.sum("n") or 0)

    return pd.DataFrame({"n_orphan_lineitems": [orphan_li],
                         "n_orphan_orders": [orphan_ord],
                         "n_dup_orderkeys": [n_dup],
                         "n_empty_docs": [n_empty]}).astype(_DQ_COLS)


Q22_CUTOFF = "2000-06-01"
_Q22_COLS = {"n_name": "object", "n_customers": "int64",
             "acctbal_cents": "int64"}


def idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape: customers with above-average balances and no
    recent orders, rolled up by nation — the global-scalar-then-filter
    composite (aggregate → broadcast scalar → filter → anti-join →
    group).

    The average comparison is EXACT integer arithmetic: instead of
    materializing avg = Σcents/N as a float, each customer's test is the
    cross-multiplied ``cents · N > Σcents`` — no float boundary lottery
    at all (int64 bound: cents·N overflows only past ~10¹² customers ×
    typical balances; the SQL twin states the identical inequality).
    The anti-join against recent orders ships per-batch distinct
    custkeys (combiner) through one custkey exchange."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    names = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))

    # pass 1: the global (Σcents, N) over positive-balance customers
    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = cents > 0
        return pd.DataFrame({"s": [np.int64(cents[pos].sum())],
                             "n": [np.int64(pos.sum())]})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    bal = small_key_aggregate(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_acctbal"]
                              ).map_batches(bal_partial, batch_format="pandas"),
        lambda g: pd.DataFrame({"s": [np.int64(g["s"].sum())],
                                "n": [np.int64(g["n"].sum())]})
        if not g.empty else typed_empty({"s": "int64", "n": "int64"})
    ).to_pandas()
    total, count = int(bal["s"].iloc[0]), int(bal["n"].iloc[0])

    _ROW = {"key": "int64", "nationkey": "int64", "cents": "int64",
            "side": "int64"}

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["c_acctbal"].to_numpy() * 100).astype(np.int64)
        # exact above-average test: cents·N > Σcents (both sides int64)
        rich = (cents > 0) & (cents * count > total)
        b = b[rich]
        return pd.DataFrame({
            "key": b["c_custkey"].to_numpy(dtype=np.int64),
            "nationkey": b["c_nationkey"].to_numpy(dtype=np.int64),
            "cents": cents[rich],
            "side": np.ones(rich.sum(), dtype=np.int64)}).astype(_ROW)

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].dt.strftime("%Y-%m-%d")
        k = b.loc[d >= Q22_CUTOFF, "o_custkey"].drop_duplicates()
        n = len(k)
        return pd.DataFrame({"key": k.to_numpy(dtype=np.int64),
                             "nationkey": np.zeros(n, dtype=np.int64),
                             "cents": np.zeros(n, dtype=np.int64),
                             "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=cust_cols
                                 ).map_batches(cust_side, batch_format="pandas")
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_orderdate"]
                                   ).map_batches(order_side,
                                                 batch_format="pandas")

    _PART = {"nationkey": "int64", "n_customers": "int64",
             "acctbal_cents": "int64"}

    def anti(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_PART)
        active = set(p.loc[p["side"] == 0, "key"])
        c = p[(p["side"] == 1) & ~p["key"].isin(active)]
        if c.empty:
            return typed_empty(_PART)
        return (c.groupby("nationkey", as_index=False)
                .agg(n_customers=("key", "size"),
                     acctbal_cents=("cents", "sum")).astype(_PART))

    parts = bucketed_aggregate(orders.union(cust), ["key"], anti,
                               coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q22_COLS)
        out = (g.groupby("nationkey", as_index=False)
               .agg(n_customers=("n_customers", "sum"),
                    acctbal_cents=("acctbal_cents", "sum")))
        out["n_name"] = out["nationkey"].map(names)
        return out[list(_Q22_COLS)].astype(_Q22_COLS)

    return small_key_aggregate(parts, final)


_PROFILE_COLS = {"column": "object", "n_rows": "int64", "n_null": "int64",
                 "n_distinct_kmv": "int64", "min_v": "int64", "max_v": "int64"}
PROFILE_KMV_K = 256


def profile_table(sf_dir: str, table: str = "orders"):
    """Column profiler — the data-engine introspection every ingest runs
    first: per column (row count, nulls, KMV distinct estimate, min/max
    as integer units). One streaming pass; each batch folds to a
    fixed-size per-column partial (counts + k smallest md5 hashes +
    extrema), merged associatively in one small task — profile size is
    columns × k, independent of table size.

    Numeric columns report exact integer min/max (floats in cents);
    string columns report min/max of their stable_id hash (a
    deterministic, SQL-reproducible ordering surrogate). The KMV
    estimate is floor((k-1) · 2^60 / kth_min) beyond k values, exact
    count below (the text_distinct_kmv contract)."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    _HASH_SPACE = 1 << 60
    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path)
    cols = [f.name for f in schema]

    _P = {"column": "object", "n_rows": "int64", "n_null": "int64",
          "hashes": "object", "min_v": "int64", "max_v": "int64"}

    def col_ints(s: pd.Series) -> np.ndarray:
        if s.dtype.kind in "iu":
            return s.dropna().to_numpy(dtype=np.int64)
        if s.dtype.kind == "f":
            return np.floor(s.dropna().to_numpy() * 100).astype(np.int64)
        if s.dtype.kind == "M":
            return s.dropna().astype("datetime64[us]").astype("int64").to_numpy()
        return stable_ids([str(x) for x in s.dropna()])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = b[c]
            v = col_ints(s)
            # KMV over the INTEGER SURROGATE (never the raw rendering —
            # float→string repr is not portable across engines)
            h = np.unique(stable_ids([str(int(x)) for x in v]))[:PROFILE_KMV_K]
            rows.append((c, np.int64(len(s)), np.int64(s.isna().sum()),
                         h.astype(np.int64),
                         np.int64(v.min()) if len(v) else np.int64(0),
                         np.int64(v.max()) if len(v) else np.int64(0)))
        return pd.DataFrame(rows, columns=list(_P))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_PROFILE_COLS)
        rows = []
        for c, grp in g.groupby("column", sort=True):
            h = np.unique(np.concatenate(list(grp["hashes"])))[:PROFILE_KMV_K]
            if len(h) < PROFILE_KMV_K:
                est = np.int64(len(h))
            else:
                est = np.int64((PROFILE_KMV_K - 1) * _HASH_SPACE
                               // int(h[PROFILE_KMV_K - 1]))
            nn = grp["n_rows"].sum() - grp["n_null"].sum()
            rows.append((c, np.int64(grp["n_rows"].sum()),
                         np.int64(grp["n_null"].sum()), est,
                         np.int64(grp.loc[grp["n_rows"] > grp["n_null"],
                                          "min_v"].min()) if nn else np.int64(0),
                         np.int64(grp.loc[grp["n_rows"] > grp["n_null"],
                                          "max_v"].max()) if nn else np.int64(0)))
        return pd.DataFrame(rows, columns=list(_PROFILE_COLS)).astype(_PROFILE_COLS)

    ds = read_parquet_clean(path)
    return small_key_aggregate(
        ds.map_batches(partial, batch_format="pandas"), final)


_Q16_COLS = {"p_brand": "object", "size_bucket": "int64",
             "supplier_cnt": "int64"}


def parts_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per (brand, size bucket) —
    grouped COUNT DISTINCT over a fact↔dimension join. Part attributes
    broadcast (size-aware contract); lineitem rows collapse to distinct
    (brand, bucket, suppkey) triples per batch, one exchange on the full
    triple makes the global distinct a partition-local drop_duplicates,
    and (brand, bucket) count partials cross the final hop."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    order = np.argsort(pk)
    brands = np.asarray(part.column("p_brand").to_pylist(),
                        dtype=object)[order]
    sizes = (part.column("p_size").to_numpy().astype(np.int64) // 10)[order]
    dim_ref = ray.put((pk[order], brands, sizes))

    _T = {"p_brand": "object", "size_bucket": "int64", "suppkey": "int64"}

    class Triples:
        def __init__(self):
            self.pk, self.brands, self.sizes = ray.get(dim_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            pos, ok = dim_lookup(self.pk, b["l_partkey"].to_numpy())
            b, pos = b[ok], pos[ok]
            if b.empty:
                return typed_empty(_T)
            return (pd.DataFrame({
                "p_brand": self.brands[pos],
                "size_bucket": self.sizes[pos],
                "suppkey": b["l_suppkey"].to_numpy(dtype=np.int64),
            }).drop_duplicates().astype(_T))

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])
    tri = ds.map_batches(Triples, batch_format="pandas",
                         concurrency=default_concurrency())

    def count_part(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_Q16_COLS)
        d = p.drop_duplicates()
        return (d.groupby(["p_brand", "size_bucket"], as_index=False)
                .agg(supplier_cnt=("suppkey", "size")).astype(_Q16_COLS))

    partials = bucketed_aggregate(tri, ["p_brand", "size_bucket", "suppkey"],
                                  count_part, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q16_COLS)
        return (g.groupby(["p_brand", "size_bucket"], as_index=False)
                .agg(supplier_cnt=("supplier_cnt", "sum")).astype(_Q16_COLS))

    return small_key_aggregate(partials, final)


_Q17_COLS = {"n_small": "int64", "revenue_cents": "int64"}


def small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity — the correlated per-group
    threshold. One exchange on partkey: per-batch (partkey, Σqty, n)
    combiners meet the RAW (partkey, qty, cents) rows in the same
    partition; the threshold test is the EXACT integer cross-multiply
    ``5·qty·n < Σqty`` (qty floored to int, the pricing_summary
    contract) — no float average anywhere. Output one row
    (n_small, revenue_cents)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _ROW = {"partkey": "int64", "qty": "int64", "cents": "int64",
            "n": "int64", "side": "int64"}

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        qty = np.floor(b["l_quantity"].to_numpy()).astype(np.int64)
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        pk = b["l_partkey"].to_numpy(dtype=np.int64)
        raw = pd.DataFrame({"partkey": pk, "qty": qty, "cents": cents,
                            "n": np.zeros(len(b), dtype=np.int64),
                            "side": np.zeros(len(b), dtype=np.int64)})
        agg = (pd.DataFrame({"partkey": pk, "qty": qty})
               .groupby("partkey", as_index=False)
               .agg(qty=("qty", "sum"), n=("qty", "size")))
        agg["cents"] = np.int64(0)
        agg["side"] = np.int64(1)
        return pd.concat([raw, agg[list(_ROW)]], ignore_index=True).astype(_ROW)

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def threshold(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_Q17_COLS)
        stats = (p[p["side"] == 1]
                 .groupby("partkey", as_index=False)
                 .agg(sum_qty=("qty", "sum"), n=("n", "sum")))
        raw = (p[p["side"] == 0][["partkey", "qty", "cents"]]
               .merge(stats, on="partkey"))
        small = raw[5 * raw["qty"] * raw["n"] < raw["sum_qty"]]
        return pd.DataFrame({
            "n_small": [np.int64(len(small))],
            "revenue_cents": [np.int64(small["cents"].sum())]})

    partials = bucketed_aggregate(ds.map_batches(rows, batch_format="pandas"),
                                  ["partkey"], threshold,
                                  coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q17_COLS)
        return pd.DataFrame({
            "n_small": [np.int64(g["n_small"].sum())],
            "revenue_cents": [np.int64(g["revenue_cents"].sum())]}
        ).astype(_Q17_COLS)

    return small_key_aggregate(partials, final)


Q6_LO, Q6_HI = "1997-01-01", "1998-01-01"
_Q6_COLS = {"revenue_cents": "int64", "n_lineitems": "int64"}


def forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: forecasted revenue delta from a discount change —
    the pure scan-filter-aggregate (no join at all): lineitems in a ship
    year with discount 5–7 bp-percent and quantity < 24, revenue =
    Σ floor(extendedprice · discount · 100). One column-pruned pass,
    per-batch scalar partials, one tiny reduce — the cheapest possible
    100-TB plan. Discounts compare as integer basis points
    (round(d·100)) on both sides so no float boundary can flip a row —
    rounded HALF-AWAY-FROM-ZERO (floor(x+0.5), discounts are
    non-negative) to match DuckDB round(); np.round is half-to-even and
    would classify an exact .5-bp discount differently."""
    import ray.data
    import pyarrow as pa
    import pyarrow.compute as pc

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    # Arrow-native scan fold (Q1 rationale): filter + two float chains +
    # scalar sums, zero pandas conversion of the fact batch; the
    # half-away bp rounding is the same floor(x·100 + 0.5)
    q6_lo = pa.scalar(pd.Timestamp(Q6_LO), type=pa.timestamp("us"))
    q6_hi = pa.scalar(pd.Timestamp(Q6_HI), type=pa.timestamp("us"))

    def fold(t: "pa.Table") -> pd.DataFrame:
        bp = pc.cast(pc.floor(pc.add(
            pc.multiply(t.column("l_discount"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        ship = t.column("l_shipdate")
        m = pc.and_(pc.and_(
            pc.and_(pc.greater_equal(ship, q6_lo), pc.less(ship, q6_hi)),
            pc.and_(pc.greater_equal(bp, pa.scalar(5, type=pa.int64())),
                    pc.less_equal(bp, pa.scalar(7, type=pa.int64())))),
            pc.less(t.column("l_quantity"), pa.scalar(24.0)))
        t = t.filter(m)
        if t.num_rows == 0:
            return typed_empty(_Q6_COLS)
        cents = pc.cast(pc.floor(pc.multiply(
            pc.multiply(t.column("l_extendedprice"),
                        t.column("l_discount")),
            pa.scalar(100.0))), pa.int64())
        return pd.DataFrame(
            {"revenue_cents": [np.int64(pc.sum(cents).as_py())],
             "n_lineitems": [np.int64(t.num_rows)]})

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        # one row even when nothing matches (SQL scalar-aggregate shape)
        return pd.DataFrame(
            {"revenue_cents": [np.int64(g["revenue_cents"].sum()) if len(g) else np.int64(0)],
             "n_lineitems": [np.int64(g["n_lineitems"].sum()) if len(g) else np.int64(0)]}
        ).astype(_Q6_COLS)

    return small_key_aggregate(
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        final)


Q12_LO, Q12_HI = "1996-01-01", "1998-01-01"
_Q12_COLS = {"l_returnflag": "object", "high_count": "int64",
             "low_count": "int64"}
_HIGH_PRIO = ("1-URGENT", "2-HIGH")


def priority_lineitem_counts(sf_dir: str):
    """TPC-H Q12 shape (adapted to this schema: returnflag plays the
    shipmode role): per return flag, how many shipped lineitems belong
    to HIGH-priority orders (1-URGENT/2-HIGH) vs lower — the big×big
    join + conditional-count rollup.

    Both sides are corpus-sized: lineitems ship per-batch (orderkey,
    flag, n) combiners, orders ship (orderkey, is_high) rows, ONE keyed
    exchange on orderkey joins them, per-partition partial counts, tiny
    final reduce."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _ROW = {"orderkey": "int64", "flag": "object", "n": "int64",
            "is_high": "int64", "side": "int64"}
    _PART = {"l_returnflag": "object", "high_count": "int64",
             "low_count": "int64"}

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].dt.strftime("%Y-%m-%d")
        b = b[(d >= Q12_LO) & (d < Q12_HI)]
        if b.empty:
            return typed_empty(_ROW)
        g = (pd.DataFrame({"orderkey": b["l_orderkey"].to_numpy(dtype=np.int64),
                           "flag": b["l_returnflag"].to_numpy()})
             .groupby(["orderkey", "flag"], as_index=False)
             .agg(n=("orderkey", "size")))
        g["is_high"] = np.int64(0)
        g["side"] = np.int64(1)
        return g[list(_ROW)].astype(_ROW)

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        hi = b["o_orderpriority"].isin(_HIGH_PRIO).to_numpy()
        n = len(b)
        return pd.DataFrame(
            {"orderkey": b["o_orderkey"].to_numpy(dtype=np.int64),
             "flag": np.full(n, "", dtype=object),
             "n": np.zeros(n, dtype=np.int64),
             "is_high": hi.astype(np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    ).map_batches(line_side, batch_format="pandas")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(order_side, batch_format="pandas")

    def join(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_PART)
        o = p[p["side"] == 0][["orderkey", "is_high"]]
        li = p[p["side"] == 1][["orderkey", "flag", "n"]]
        m = li.merge(o, on="orderkey")
        if m.empty:
            return typed_empty(_PART)
        m["high"] = m["n"] * m["is_high"]
        m["low"] = m["n"] * (1 - m["is_high"])
        out = (m.groupby("flag", as_index=False)
               .agg(high_count=("high", "sum"), low_count=("low", "sum"))
               .rename(columns={"flag": "l_returnflag"}))
        return out[list(_PART)].astype(_PART)

    partials = bucketed_aggregate(orders.union(lines), ["orderkey"], join,
                                  coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q12_COLS)
        out = (g.groupby("l_returnflag", as_index=False)
               .agg(high_count=("high_count", "sum"),
                    low_count=("low_count", "sum")))
        return (out.sort_values("l_returnflag").reset_index(drop=True)
                [list(_Q12_COLS)].astype(_Q12_COLS))

    return small_key_aggregate(partials, final)


Q15_LO, Q15_HI = "1997-01-01", "1997-07-01"
_Q15_COLS = {"s_suppkey": "int64", "s_name": "object",
             "total_revenue_cents": "int64"}


def top_supplier_revenue(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a ship
    window — the view + global-argmax pattern. Supplier revenue totals
    are corpus-growing, so they come from per-batch combiners + ONE
    suppkey exchange; each partition emits only its LOCAL max rows
    (ties kept), and a single tiny merge takes the global max. The
    winner's name comes from a row-filtered supplier read (O(winners),
    never a table scan)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _TOT = {"s_suppkey": "int64", "cents": "int64"}

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].dt.strftime("%Y-%m-%d")
        b = b[(d >= Q15_LO) & (d < Q15_HI)]
        if b.empty:
            return typed_empty(_TOT)
        cents = np.floor(b["l_extendedprice"].to_numpy()
                         * (1 - b["l_discount"].to_numpy()) * 100).astype(np.int64)
        return (pd.DataFrame({"s_suppkey": b["l_suppkey"].to_numpy(dtype=np.int64),
                              "cents": cents})
                .groupby("s_suppkey", as_index=False)["cents"].sum())

    def local_max(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_TOT)
        t = p.groupby("s_suppkey", as_index=False)["cents"].sum()
        return t[t["cents"] == t["cents"].max()].astype(_TOT)

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
    cand = bucketed_aggregate(ds.map_batches(fold, batch_format="pandas"),
                              ["s_suppkey"], local_max,
                              coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q15_COLS)
        g = g[g["cents"] == g["cents"].max()].sort_values("s_suppkey")
        sup = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
            filters=[("s_suppkey", "in", [int(k) for k in g["s_suppkey"]])],
        ).to_pandas()
        out = g.merge(sup, on="s_suppkey").rename(
            columns={"cents": "total_revenue_cents"})
        return (out.sort_values("s_suppkey").reset_index(drop=True)
                [list(_Q15_COLS)].astype(_Q15_COLS))

    return small_key_aggregate(cand, final)


# Q19-shape disjunctive predicate groups: (brand, max p_size, qty lo-hi)
Q19_GROUPS = (("Brand#1", 25, 1, 20), ("Brand#2", 35, 10, 30),
              ("Brand#3", 50, 20, 40))
_Q19_COLS = {"revenue_cents": "int64", "n_lineitems": "int64"}


def brand_quantity_revenue(sf_dir: str,
                           broadcast_dim_limit: int = BROADCAST_DIM_LIMIT):
    """TPC-H Q19 shape: revenue from an OR-of-ANDs join predicate —
    three (brand, size-range, quantity-range) groups, any match keeps
    the lineitem. The part dimension folds to a single int8 group id
    per partkey (0 = no group), size-aware like promo_revenue: broadcast
    under ``broadcast_dim_limit`` (sorted partkey + group array), keyed
    partkey exchange above it. The quantity range check then rides each
    lineitem batch vectorized; output is one exact-integer row."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    if n_part > broadcast_dim_limit:
        return _brand_quantity_exchange(sf_dir)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    order_idx = np.argsort(pk)
    grp = _part_groups(
        np.asarray(part.column("p_brand").to_pylist(), dtype=object),
        part.column("p_size").to_numpy())[order_idx]
    dim_ref = ray.put((pk[order_idx], grp))

    class Fold:
        def __init__(self):
            self.pk, self.grp = ray.get(dim_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            pos, ok = dim_lookup(self.pk, b["l_partkey"].to_numpy())
            b, pos = b[ok], pos[ok]  # inner join: orphan partkeys drop
            if b.empty:
                return typed_empty(_Q19_COLS)
            g = self.grp[pos]
            keep = _qty_in_group(g, b["l_quantity"].to_numpy())
            b = b[keep]
            if b.empty:
                return typed_empty(_Q19_COLS)
            cents = np.floor(b["l_extendedprice"].to_numpy()
                             * (1 - b["l_discount"].to_numpy()) * 100).astype(np.int64)
            return pd.DataFrame({"revenue_cents": [np.int64(cents.sum())],
                                 "n_lineitems": [np.int64(len(b))]})

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    partials = ds.map_batches(Fold, batch_format="pandas",
                              concurrency=default_concurrency())
    return small_key_aggregate(partials, _q19_final)


def _part_groups(brands: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Per-part predicate group id (1-based; 0 = matches no group)."""
    g = np.zeros(len(brands), dtype=np.int64)
    for i, (brand, max_size, _lo, _hi) in enumerate(Q19_GROUPS, start=1):
        m = (brands == brand) & (sizes >= 1) & (sizes <= max_size)
        g[m & (g == 0)] = i
    return g


def _qty_in_group(g: np.ndarray, qty: np.ndarray) -> np.ndarray:
    keep = np.zeros(len(g), dtype=bool)
    for i, (_brand, _sz, lo, hi) in enumerate(Q19_GROUPS, start=1):
        keep |= (g == i) & (qty >= lo) & (qty <= hi)
    return keep


def _q19_final(g: pd.DataFrame) -> pd.DataFrame:
    # one row even when nothing matches (the SQL scalar aggregate's shape)
    if g.empty:
        return pd.DataFrame({"revenue_cents": [np.int64(0)],
                             "n_lineitems": [np.int64(0)]}).astype(_Q19_COLS)
    return pd.DataFrame(
        {"revenue_cents": [np.int64(g["revenue_cents"].sum())],
         "n_lineitems": [np.int64(g["n_lineitems"].sum())]}).astype(_Q19_COLS)


def _brand_quantity_exchange(sf_dir: str):
    """Exchange arm: lineitem (partkey, qty, cents) rows ⋈ part groups
    on partkey — used when the part table exceeds the broadcast limit."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _ROW = {"partkey": "int64", "qty": "float64", "cents": "int64",
            "grp": "int64", "side": "int64"}

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["l_extendedprice"].to_numpy()
                         * (1 - b["l_discount"].to_numpy()) * 100).astype(np.int64)
        n = len(b)
        return pd.DataFrame(
            {"partkey": b["l_partkey"].to_numpy(dtype=np.int64),
             "qty": b["l_quantity"].to_numpy(dtype=np.float64),
             "cents": cents,
             "grp": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

    def part_side(b: pd.DataFrame) -> pd.DataFrame:
        g = _part_groups(b["p_brand"].to_numpy(dtype=object),
                         b["p_size"].to_numpy())
        keep = g > 0  # parts outside every group can't contribute
        n = int(keep.sum())
        return pd.DataFrame(
            {"partkey": b["p_partkey"].to_numpy(dtype=np.int64)[keep],
             "qty": np.zeros(n, dtype=np.float64),
             "cents": np.zeros(n, dtype=np.int64),
             "grp": g[keep],
             "side": np.ones(n, dtype=np.int64)}).astype(_ROW)

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pandas")
    parts = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"],
    ).map_batches(part_side, batch_format="pandas")

    def join(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_Q19_COLS)
        pt = p[p["side"] == 1][["partkey", "grp"]].rename(columns={"grp": "g"})
        li = p[p["side"] == 0][["partkey", "qty", "cents"]]
        m = li.merge(pt, on="partkey")
        if m.empty:
            return typed_empty(_Q19_COLS)
        keep = _qty_in_group(m["g"].to_numpy(), m["qty"].to_numpy())
        m = m[keep]
        if m.empty:
            return typed_empty(_Q19_COLS)
        return pd.DataFrame(
            {"revenue_cents": [np.int64(m["cents"].sum())],
             "n_lineitems": [np.int64(len(m))]}).astype(_Q19_COLS)

    partials = bucketed_aggregate(lines.union(parts), ["partkey"], join,
                                  coalesce=partitions_for())
    return small_key_aggregate(partials, _q19_final)


Q8_REGION = "EUROPE"
Q8_NATION = "NATION_8"
Q8_LO, Q8_HI = "1996-01-01", "1998-01-01"
_Q8_COLS = {"l_year": "int64", "nation_cents": "int64",
            "total_cents": "int64", "share_ppm": "int64"}


def market_share(sf_dir: str, broadcast_dim_limit: int = BROADCAST_DIM_LIMIT):
    """TPC-H Q8 shape: a supplier nation's market share, per ship year,
    of all revenue sold into one region's customer market — the
    two-dimension-attach ratio query. Same distributed plan as Q7:
    supplier nation rides the lineitem combiners (size-aware broadcast /
    suppkey exchange), customer REGION membership rides orders
    (size-aware broadcast / custkey exchange), they meet in ONE orderkey
    exchange. The share is integer ppm from exact cent sums."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    import pyarrow as pa
    import pyarrow.compute as pc

    rkeys = set(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"].astype("int64"))
    region_nations = np.sort(
        nat.loc[nat["n_regionkey"].astype("int64").isin(rkeys),
                "n_nationkey"].to_numpy(dtype=np.int64))
    tn = nat.loc[nat["n_name"] == Q8_NATION, "n_nationkey"]
    # absent target nation → no supplier matches (the SQL scalar subquery
    # goes NULL and its equality is never true); -1 mirrors that exactly
    target_nat = int(tn.iloc[0]) if len(tn) else -1

    _ROW = {"orderkey": "int64", "is_target": "int64", "l_year": "int64",
            "cents": "int64", "side": "int64"}
    _PART = {"l_year": "int64", "nation_cents": "int64", "total_cents": "int64"}

    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    if n_supp <= broadcast_dim_limit:
        supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
        sk = supp.column("s_suppkey").to_numpy()
        si = np.argsort(sk)
        supp_ref = ray.put((sk[si], supp.column("s_nationkey").to_numpy()[si]))

        # plain TASK closure, not an actor pool: the per-task "setup" is
        # one zero-copy ray.get of the broadcast array (µs from plasma),
        # so an actor pool buys nothing and costs a pool spin-up + ramp
        # lottery — measured: the whole query is fixed-overhead-bound at
        # bench scale (total remote compute ~0.5 s vs 6-7 s wall).
        # Arrow-native: the scan's filter/arithmetic/groupby never pays
        # the Arrow→pandas copy; the supplier membership probe drops to
        # numpy searchsorted on the zero-copy key column.
        q8_lo = pa.scalar(pd.Timestamp(Q8_LO), type=pa.timestamp("us"))
        q8_hi = pa.scalar(pd.Timestamp(Q8_HI), type=pa.timestamp("us"))

        def line_side(t: "pa.Table") -> "pa.Table":
            sk_s, snat_s = ray.get(supp_ref)
            ship = t.column("l_shipdate")
            t = t.filter(pc.and_(pc.greater_equal(ship, q8_lo),
                                 pc.less(ship, q8_hi)))
            suppkey = (t.column("l_suppkey").combine_chunks()
                       .to_numpy(zero_copy_only=False))
            pos, ok = dim_lookup(sk_s, suppkey)
            t, pos = t.filter(pa.array(ok)), pos[ok]
            cents = pc.cast(pc.floor(pc.multiply(
                pc.multiply(t.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0),
                                        t.column("l_discount"))),
                pa.scalar(100.0))), pa.int64())
            g = (pa.table({
                "orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                "is_target": pa.array(
                    (snat_s[pos] == target_nat).astype(np.int64)),
                "l_year": pc.cast(pc.year(t.column("l_shipdate")),
                                  pa.int64()),
                "cents": cents})
                .group_by(["orderkey", "is_target", "l_year"])
                .aggregate([("cents", "sum")])
                .rename_columns(["orderkey", "is_target", "l_year",
                                 "cents"]))
            return g.append_column(
                "side", pa.repeat(pa.scalar(1, type=pa.int64()),
                                  g.num_rows))

        lines = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount", "l_shipdate"],
        ).map_batches(line_side, batch_format="pyarrow",
                      zero_copy_batch=True)
    else:
        lines = _q8_lines_exchange(sf_dir, target_nat)

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust <= broadcast_dim_limit:
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"]).to_pandas()
        cust = cust[cust["c_nationkey"].astype("int64").isin(
            set(region_nations.tolist()))]
        ckeys_ref = ray.put(np.sort(cust["c_custkey"].to_numpy(dtype=np.int64)))

        def order_side(t: "pa.Table") -> "pa.Table":
            # task closure; see line_side for why no actor pool. Arrow
            # output keeps the union with line_side single-block-type
            # (mixed pandas/Arrow unions log schema-drift warnings and
            # trip Ray 2.49's shuffle-reduce block-type assertion).
            ck = (t.column("o_custkey").combine_chunks()
                  .to_numpy(zero_copy_only=False).astype(np.int64))
            _, ok = dim_lookup(ray.get(ckeys_ref), ck)
            t = t.filter(pa.array(ok))
            n = t.num_rows
            z = pa.repeat(pa.scalar(0, type=pa.int64()), n)
            return pa.table({
                "orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "is_target": z, "l_year": z, "cents": z, "side": z})

        orders = read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        ).map_batches(order_side, batch_format="pyarrow",
                      zero_copy_batch=True)
    else:
        orders = _q8_orders_exchange(sf_dir, region_nations)

    def join(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_PART)
        ok = set(p.loc[p["side"] == 0, "orderkey"])
        li = p[(p["side"] == 1) & p["orderkey"].isin(ok)]
        if li.empty:
            return typed_empty(_PART)
        li = li.assign(nation_cents=li["cents"] * li["is_target"])
        out = (li.groupby("l_year", as_index=False)
               .agg(nation_cents=("nation_cents", "sum"),
                    total_cents=("cents", "sum")))
        return out[list(_PART)].astype(_PART)

    partials = bucketed_aggregate(orders.union(lines), ["orderkey"], join,
                                  coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_Q8_COLS)
        out = (g.groupby("l_year", as_index=False)
               .agg(nation_cents=("nation_cents", "sum"),
                    total_cents=("total_cents", "sum")))
        t = out["total_cents"].to_numpy()
        n = out["nation_cents"].to_numpy()
        out["share_ppm"] = np.where(
            t > 0, np.floor(n * 1_000_000.0 / np.maximum(t, 1)), 0
        ).astype(np.int64)
        return (out.sort_values("l_year").reset_index(drop=True)
                [list(_Q8_COLS)].astype(_Q8_COLS))

    return small_key_aggregate(partials, final)


def _q8_lines_exchange(sf_dir: str, target_nat: int):
    """Q8 supplier exchange arm: reuse Q7's suppkey exchange, then fold
    the attached nation to the is_target flag."""
    li = _q7_lines_exchange(sf_dir)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"orderkey": b["orderkey"].to_numpy(dtype=np.int64),
             "is_target": (b["nat"].to_numpy() == target_nat).astype(np.int64),
             "l_year": b["l_year"].to_numpy(dtype=np.int64),
             "cents": b["cents"].to_numpy(dtype=np.int64),
             "side": np.ones(len(b), dtype=np.int64)})

    return li.map_batches(fold, batch_format="pandas")


def _q8_orders_exchange(sf_dir: str, region_nations: np.ndarray):
    """Q8 customer exchange arm: Q7's custkey exchange, filtered to the
    region's nations and folded to the order-side row shape."""
    od = _q7_orders_exchange(sf_dir)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        b = b[np.isin(b["nat"].to_numpy(), region_nations)]
        n = len(b)
        return pd.DataFrame(
            {"orderkey": b["orderkey"].to_numpy(dtype=np.int64),
             "is_target": np.zeros(n, dtype=np.int64),
             "l_year": np.zeros(n, dtype=np.int64),
             "cents": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)})

    return od.map_batches(fold, batch_format="pandas")
