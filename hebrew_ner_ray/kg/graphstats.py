"""Graph analytics over the knowledge-graph edge table.

Triangle counting via the degree-oriented node-iterator (the classic
O(m^{3/2})-wedge bound): orient every undirected edge from its
lower-(degree, id) endpoint to the higher one, generate wedges only
between a node's out-neighbors, and close them against the oriented
edge set. Each triangle is generated exactly once — by its
lowest-order vertex — so the count needs no dedup.

Every step is a keyed exchange + per-partition vectorized kernel; the
only materialized datasets are edge-sized (the distinct undirected
edge set and its oriented twin), which Ray keeps in the object store
and spills as needed. Nothing node- or edge-sized reaches the driver:
the driver only pulls the five final scalars.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_UND = {"a": "int64", "b": "int64"}
_DEG = {"node": "int64", "d": "int64"}
_ATT = {"k": "int64", "other": "int64", "d_other": "int64", "side": "int64"}
_ORI = {"src": "int64", "dst": "int64", "dst_deg": "int64"}
_PAIR = {"x": "int64", "y": "int64", "side": "int64"}
_TRI_COLS = {"n_nodes": "int64", "n_edges": "int64", "n_wedges": "int64",
             "n_triangles": "int64", "cluster_ppm": "int64"}


def _distinct_undirected(edges_ds):
    """(subj, obj, pred)* → distinct {min, max} node pairs, self-loops
    dropped; per-batch dedup combiner, then a (a, b)-keyed exchange so
    each pair lands wholly in one partition."""
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    def to_und(b: pd.DataFrame) -> pd.DataFrame:
        s = b["subj_id"].to_numpy(dtype=np.int64)
        o = b["obj_id"].to_numpy(dtype=np.int64)
        keep = s != o
        s, o = s[keep], o[keep]
        out = pd.DataFrame({"a": np.minimum(s, o), "b": np.maximum(s, o)})
        return out.drop_duplicates().astype(_UND)

    def dedup(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_UND)
        return p.drop_duplicates().astype(_UND)

    return bucketed_aggregate(edges_ds.map_batches(to_und, batch_format="pandas"),
                              ["a", "b"], dedup, coalesce=partitions_for())


def _degrees(und):
    """Per-node undirected degree: endpoint-count combiner per batch →
    node-keyed aggregate."""
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ends = np.concatenate([b["a"].to_numpy(dtype=np.int64),
                               b["b"].to_numpy(dtype=np.int64)])
        node, cnt = np.unique(ends, return_counts=True)
        return pd.DataFrame({"node": node, "d": cnt.astype(np.int64)})

    def reduce(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_DEG)
        return (p.groupby("node", as_index=False).agg(d=("d", "sum"))
                .astype(_DEG))

    return bucketed_aggregate(und.map_batches(partial, batch_format="pandas"),
                              ["node"], reduce, coalesce=partitions_for())


def _attach_degree(pairs, deg, key_col: str, other_col: str):
    """One exchange attaching deg[key] to each edge row: edge rows
    (side 0) and degree rows (side 1) co-partitioned on the node key."""
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"k": b[key_col].to_numpy(dtype=np.int64),
             "other": b[other_col].to_numpy(dtype=np.int64),
             "d_other": b["d_other"].to_numpy(dtype=np.int64)
             if "d_other" in b.columns else np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_ATT)

    def deg_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"k": b["node"].to_numpy(dtype=np.int64),
             "other": np.zeros(n, dtype=np.int64),
             "d_other": b["d"].to_numpy(dtype=np.int64),
             "side": np.ones(n, dtype=np.int64)}).astype(_ATT)

    _OUT = {"k": "int64", "other": "int64", "d_other": "int64", "d_k": "int64"}

    def join(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _OUT.items()})
        d = p[p["side"] == 1][["k", "d_other"]].rename(columns={"d_other": "d_k"})
        e = p[p["side"] == 0].drop(columns=["side"])
        return e.merge(d, on="k").astype(_OUT)

    u = pairs.map_batches(edge_rows, batch_format="pandas").union(
        deg.map_batches(deg_rows, batch_format="pandas"))
    return bucketed_aggregate(u, ["k"], join, coalesce=partitions_for())


def triangle_stats(edges_ds) -> pd.DataFrame:
    """Exact triangle count + global clustering coefficient of the
    undirected entity graph. Returns one row:
    (n_nodes, n_edges, n_wedges, n_triangles, cluster_ppm) where
    n_wedges = Σ C(d, 2) over undirected degrees and
    cluster_ppm = floor(3e6 · triangles / wedges) (0 when wedge-free) —
    both integer-exact, mirrored in the SQL oracle."""
    import ray.data  # noqa: F401 — edges_ds is a Dataset

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    und = _distinct_undirected(edges_ds).materialize()
    n_edges = und.count()
    deg = _degrees(und).materialize()
    n_nodes = deg.count()

    # Σ C(d,2): per-block partial, one-task final (block-count rows)
    def wedge_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["d"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())]})

    n_wedges = int(
        deg.map_batches(wedge_partial, batch_format="pandas").sum("w") or 0)

    # attach both endpoint degrees (two node-keyed exchanges), orient
    with_da = _attach_degree(und.select_columns(["a", "b"]).map_batches(
        lambda b: b.assign(d_other=np.zeros(len(b), dtype=np.int64)),
        batch_format="pandas"), deg, "a", "b")
    # first hop attached deg(a) as d_k; rekey on b carrying deg(a) along
    rekeyed = with_da.map_batches(
        lambda b: pd.DataFrame({"a": b["other"], "b": b["k"],
                                "d_other": b["d_k"]}),
        batch_format="pandas")
    # after the rekey: k = the original 'b' endpoint, other = 'a',
    # d_other = deg(a) (carried through), d_k = deg(b)
    both = _attach_degree(rekeyed, deg, "a", "b")

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _ORI.items()})
        kb = b["k"].to_numpy(dtype=np.int64)        # endpoint b
        ka = b["other"].to_numpy(dtype=np.int64)    # endpoint a
        db = b["d_k"].to_numpy(dtype=np.int64)
        da = b["d_other"].to_numpy(dtype=np.int64)
        # total order: (deg, id) ascending — a precedes b?
        a_first = (da < db) | ((da == db) & (ka < kb))
        src = np.where(a_first, ka, kb)
        dst = np.where(a_first, kb, ka)
        dst_deg = np.where(a_first, db, da)
        return pd.DataFrame({"src": src, "dst": dst,
                             "dst_deg": dst_deg}).astype(_ORI)

    oriented = both.map_batches(orient, batch_format="pandas").materialize()

    # wedges: per src, all out-neighbor pairs ordered by (deg, id) so the
    # wedge key IS the closing edge's oriented key
    def wedges(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_PAIR)
        outs = []
        for _, g in p.groupby("src", sort=False):
            k = len(g)
            if k < 2:
                continue
            order = np.lexsort((g["dst"].to_numpy(), g["dst_deg"].to_numpy()))
            nb = g["dst"].to_numpy(dtype=np.int64)[order]
            i, j = np.triu_indices(k, 1)
            outs.append(pd.DataFrame({"x": nb[i], "y": nb[j]}))
        if not outs:
            return typed_empty(_PAIR)
        w = pd.concat(outs, ignore_index=True)
        w["side"] = np.zeros(len(w), dtype=np.int64)
        return w.astype(_PAIR)

    wedge_ds = bucketed_aggregate(oriented, ["src"], wedges,
                                  coalesce=partitions_for())

    def edge_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"x": b["src"].to_numpy(dtype=np.int64),
             "y": b["dst"].to_numpy(dtype=np.int64),
             "side": np.ones(len(b), dtype=np.int64)}).astype(_PAIR)

    closing = wedge_ds.union(oriented.map_batches(edge_pairs,
                                                  batch_format="pandas"))

    def close_count(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame({"t": pd.Series(dtype="int64")})
        e = p[p["side"] == 1][["x", "y"]]
        w = p[p["side"] == 0][["x", "y"]]
        m = w.merge(e, on=["x", "y"])
        return pd.DataFrame({"t": [int(len(m))]})

    tri_parts = bucketed_aggregate(closing, ["x", "y"], close_count,
                                   coalesce=partitions_for())
    n_triangles = int(tri_parts.sum("t") or 0)

    cluster_ppm = (3_000_000 * n_triangles) // n_wedges if n_wedges else 0
    return pd.DataFrame(
        {"n_nodes": [n_nodes], "n_edges": [n_edges], "n_wedges": [n_wedges],
         "n_triangles": [n_triangles], "cluster_ppm": [cluster_ppm]}
    ).astype(_TRI_COLS)


PR_SCALE = 1_000_000_000_000  # rank unit: 1e-12 of total mass
PR_ITERS = 3

_PR_COLS = {"entity_id": "int64", "rank_pico": "int64"}


def pagerank(edges_ds, iters: int = PR_ITERS) -> "object":
    """Damped PageRank (d = 0.85) on the symmetrized entity graph,
    ``iters`` synchronous iterations — the iterative-algorithm shape
    (bounded rounds of keyed exchanges with a materialize barrier per
    iteration, like the connected-components arm).

    All arithmetic is integer in pico-units (floor divisions pinned:
    contribution = r // deg, damping = 85·s // 100, teleport =
    (SCALE·15 // 100) // N), so every iteration is bit-reproducible and
    the SQL oracle unrolls the identical rounds. Per iteration: one
    exchange on the source key (rank → per-edge contributions) and one
    on the destination (sum + degree re-attach) — edge-sized data moves,
    node-sized state persists in the object store, nothing reaches the
    driver but N."""
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    und = _distinct_undirected(edges_ds).materialize()
    deg = _degrees(und).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return und.map_batches(
            lambda b: pd.DataFrame({c: pd.Series(dtype=t)
                                    for c, t in _PR_COLS.items()}),
            batch_format="pandas")
    base = (PR_SCALE * 15 // 100) // n_nodes
    r0 = PR_SCALE // n_nodes

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a])})

    sym = und.map_batches(to_sym, batch_format="pandas").materialize()

    ranks = deg.map_batches(
        lambda b: b.assign(r=np.full(len(b), r0, dtype=np.int64)),
        batch_format="pandas").materialize()  # (node, d, r)

    _EX1 = {"k": "int64", "v": "int64", "r": "int64", "d": "int64",
            "side": "int64"}
    _CTB = {"node": "int64", "c": "int64"}
    _EX2 = {"node": "int64", "c": "int64", "d": "int64", "side": "int64"}
    _RNK = {"node": "int64", "d": "int64", "r": "int64"}

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"k": b["u"], "v": b["v"], "r": np.zeros(n, dtype=np.int64),
             "d": np.zeros(n, dtype=np.int64),
             "side": np.ones(n, dtype=np.int64)}).astype(_EX1)

    def rank_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"k": b["node"], "v": np.zeros(n, dtype=np.int64),
             "r": b["r"], "d": b["d"],
             "side": np.zeros(n, dtype=np.int64)}).astype(_EX1)

    def contrib(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_CTB)
        rk = p[p["side"] == 0][["k", "r", "d"]]
        e = p[p["side"] == 1][["k", "v"]]
        m = e.merge(rk, on="k")
        # per-batch partial: pre-sum contributions by destination here so
        # the second exchange ships ≤ distinct-destination rows
        out = pd.DataFrame({"node": m["v"].to_numpy(dtype=np.int64),
                            "c": (m["r"] // m["d"]).to_numpy(dtype=np.int64)})
        return (out.groupby("node", as_index=False).agg(c=("c", "sum"))
                .astype(_CTB))

    def ctb_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"node": b["node"], "c": b["c"], "d": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_EX2)

    def deg_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"node": b["node"], "c": np.zeros(n, dtype=np.int64),
             "d": b["d"], "side": np.ones(n, dtype=np.int64)}).astype(_EX2)

    for _ in range(iters):
        u1 = sym.map_batches(edge_rows, batch_format="pandas").union(
            ranks.map_batches(rank_rows, batch_format="pandas"))
        contribs = bucketed_aggregate(u1, ["k"], contrib,
                                      coalesce=partitions_for())

        def newrank(p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_RNK)
            s = (p[p["side"] == 0].groupby("node", as_index=False)
                 .agg(c=("c", "sum")))
            dd = p[p["side"] == 1][["node", "d"]]
            m = dd.merge(s, on="node", how="left")
            c = m["c"].fillna(0).to_numpy(dtype=np.int64)
            m["r"] = base + (85 * c) // 100
            return m[list(_RNK)].astype(_RNK)

        u2 = contribs.map_batches(ctb_rows, batch_format="pandas").union(
            deg.map_batches(deg_rows, batch_format="pandas"))
        ranks = bucketed_aggregate(u2, ["node"], newrank,
                                   coalesce=partitions_for()).materialize()

    out = ranks.map_batches(
        lambda b: pd.DataFrame({"entity_id": b["node"],
                                "rank_pico": b["r"]}).astype(_PR_COLS),
        batch_format="pandas")
    return out.sort("entity_id")


PR_EPS_DIV = 8        # eps_pico = PR_SCALE // (PR_EPS_DIV · N)
PR_EPS_MAX_ROUNDS = 20

_PR_EPS_COLS = {"entity_id": "int64", "rank_pico": "int64",
                "rounds": "int64"}


def pagerank_eps(edges_ds, eps_div: int = PR_EPS_DIV,
                 max_rounds: int = PR_EPS_MAX_ROUNDS) -> "object":
    """PageRank iterated TO CONVERGENCE instead of a fixed round count:
    stop at the first round whose max per-node rank change is ≤
    eps_pico = PR_SCALE // (eps_div · N) — the iterate-to-epsilon
    contract, with the same raise-on-round-overflow guard as BFS/SSSP
    (never a silent partial answer). Output carries the oracle-checked
    ``rounds`` column (the stopping round), and the SQL twin unrolls
    ``max_rounds`` rounds with per-round max-delta scalars and selects
    the FIRST round that crosses the threshold — bit-identical integer
    arithmetic per round (same pinned floor divisions as
    :func:`pagerank`).

    Per round: the two keyed exchanges of :func:`pagerank` plus one
    model-sized distributed max over the per-node deltas (the delta
    column never reaches the driver, only the scalar). Both per-round
    aggregations are size-aware (keyed_aggregate with the known
    edge+node row bound): small graphs reduce in ONE task per round
    instead of paying ~2 s of hash-aggregator spin-up per exchange —
    at 18 convergence rounds that fixed cost dominated everything."""
    from hebrew_ner_ray.ops.shuffle import keyed_aggregate, typed_empty

    und = _distinct_undirected(edges_ds).materialize()
    deg = _degrees(und).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return und.map_batches(
            lambda b: pd.DataFrame({c: pd.Series(dtype=t)
                                    for c, t in _PR_EPS_COLS.items()}),
            batch_format="pandas")
    base = (PR_SCALE * 15 // 100) // n_nodes
    r0 = PR_SCALE // n_nodes
    eps_pico = PR_SCALE // (eps_div * n_nodes)

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a])})

    sym = und.map_batches(to_sym, batch_format="pandas").materialize()

    ranks = deg.map_batches(
        lambda b: b.assign(r=np.full(len(b), r0, dtype=np.int64)),
        batch_format="pandas").materialize()  # (node, d, r)

    _EX1 = {"k": "int64", "v": "int64", "r": "int64", "d": "int64",
            "side": "int64"}
    _CTB = {"node": "int64", "c": "int64"}
    _EX2 = {"node": "int64", "c": "int64", "d": "int64", "r": "int64",
            "side": "int64"}
    _RNK = {"node": "int64", "d": "int64", "r": "int64", "delta": "int64"}

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"k": b["u"], "v": b["v"], "r": np.zeros(n, dtype=np.int64),
             "d": np.zeros(n, dtype=np.int64),
             "side": np.ones(n, dtype=np.int64)}).astype(_EX1)

    def rank_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"k": b["node"], "v": np.zeros(n, dtype=np.int64),
             "r": b["r"], "d": b["d"],
             "side": np.zeros(n, dtype=np.int64)}).astype(_EX1)

    def contrib(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_CTB)
        rk = p[p["side"] == 0][["k", "r", "d"]]
        e = p[p["side"] == 1][["k", "v"]]
        m = e.merge(rk, on="k")
        out = pd.DataFrame({"node": m["v"].to_numpy(dtype=np.int64),
                            "c": (m["r"] // m["d"]).to_numpy(dtype=np.int64)})
        return (out.groupby("node", as_index=False).agg(c=("c", "sum"))
                .astype(_CTB))

    def ctb_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"node": b["node"], "c": b["c"], "d": np.zeros(n, dtype=np.int64),
             "r": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_EX2)

    def old_rows(b: pd.DataFrame) -> pd.DataFrame:
        # unlike pagerank's static deg side, the epsilon variant ships
        # the CURRENT ranks so the update kernel can emit per-node deltas
        n = len(b)
        return pd.DataFrame(
            {"node": b["node"], "c": np.zeros(n, dtype=np.int64),
             "d": b["d"], "r": b["r"],
             "side": np.ones(n, dtype=np.int64)}).astype(_EX2)

    def newrank(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_RNK)
        s = (p[p["side"] == 0].groupby("node", as_index=False)
             .agg(c=("c", "sum")))
        dd = p[p["side"] == 1][["node", "d", "r"]]
        m = dd.merge(s, on="node", how="left")
        c = m["c"].fillna(0).to_numpy(dtype=np.int64)
        new_r = base + (85 * c) // 100
        m["delta"] = np.abs(new_r - m["r"].to_numpy(dtype=np.int64))
        m["r"] = new_r
        return m[list(_RNK)].astype(_RNK)

    sym_count = sym.count()  # free: materialized
    # exact for u1 (edges + ranks); a valid upper bound for u2 (contrib
    # partials are per-(partition, node) ≤ sym rows, plus the rank rows)
    row_bound = sym_count + n_nodes

    rounds_run = 0
    for i in range(1, max_rounds + 1):
        u1 = sym.map_batches(edge_rows, batch_format="pandas").union(
            ranks.map_batches(rank_rows, batch_format="pandas"))
        contribs = keyed_aggregate(u1, ["k"], contrib, count=row_bound)
        u2 = contribs.map_batches(ctb_rows, batch_format="pandas").union(
            ranks.map_batches(old_rows, batch_format="pandas"))
        nxt = keyed_aggregate(u2, ["node"], newrank,
                              count=row_bound).materialize()
        delta_max = int(nxt.max("delta") or 0)
        ranks = nxt.select_columns(["node", "d", "r"]).materialize()
        if delta_max <= eps_pico:
            rounds_run = i
            break
    else:
        raise RuntimeError(
            f"pagerank_eps: no convergence to eps_pico={eps_pico} within "
            f"{max_rounds} rounds (last max delta {delta_max}) — raise "
            "max_rounds or loosen eps_div; a silent partial answer is "
            "never returned")

    k = rounds_run

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"entity_id": b["node"], "rank_pico": b["r"],
             "rounds": np.full(len(b), k, dtype=np.int64)}
        ).astype(_PR_EPS_COLS)

    return ranks.map_batches(finish,
                             batch_format="pandas").sort("entity_id")


NODE_SIM_DEG_CAP = 64  # wedge centers above this degree are excluded
# (quadratic pair blowup — the ENTITY_PAIR_DOC_CAP idiom, mirrored by
# the SQL twin's center-degree predicate)
_NSIM_COLS = {"a_id": "int64", "b_id": "int64", "common": "int64",
              "jaccard_ppm": "int64"}


def node_similarity(edges_ds, deg_cap: int = NODE_SIM_DEG_CAP,
                    sort: bool = True):
    """Neighbor-set Jaccard similarity for node pairs sharing at least
    one neighbor — the link-prediction staple: common = |N(a) ∩ N(b)|
    counted via wedges (both endpoints adjacent to a shared center),
    jaccard_ppm = floor(10⁶ · common / (deg(a) + deg(b) − common)) in
    exact integers. Degrees are FULL-graph; only wedge CENTERS are
    degree-capped (hot hubs would emit O(deg²) pairs — excluded and
    mirrored by the SQL twin, like ENTITY_PAIR_DOC_CAP).

    Three keyed exchanges at scale: center co-location (pair emission),
    pair-keyed common-count sum, then two degree attaches via the
    two-sided union pattern (degree tables are corpus-sized — never a
    driver-side lookup)."""
    from hebrew_ner_ray.ops.shuffle import (
        _arrow_clean,
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    und = _distinct_undirected(edges_ds).materialize()
    deg = _degrees(und).materialize()  # (node, d)

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a])})

    sym = und.map_batches(to_sym, batch_format="pandas")

    _PAIR = {"a_id": "int64", "b_id": "int64", "common": "int64"}

    def wedge_pairs(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_PAIR)
        rows_a, rows_b = [], []
        for _, grp in p.groupby("u", sort=False):
            e = np.sort(grp["v"].to_numpy())
            if len(e) < 2 or len(e) > deg_cap:
                continue
            i, j = np.triu_indices(len(e), k=1)
            rows_a.append(e[i])
            rows_b.append(e[j])
        if not rows_a:
            return typed_empty(_PAIR)
        out = (pd.DataFrame({"a_id": np.concatenate(rows_a),
                             "b_id": np.concatenate(rows_b)})
               .groupby(["a_id", "b_id"], as_index=False).size()
               .rename(columns={"size": "common"}))
        return out[list(_PAIR)].astype(_PAIR)

    wp = bucketed_aggregate(sym, ["u"], wedge_pairs,
                            coalesce=partitions_for())

    def sum_common(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_PAIR)
        return (g.groupby(["a_id", "b_id"], as_index=False)
                .agg(common=("common", "sum"))[list(_PAIR)].astype(_PAIR))

    pairs = bucketed_aggregate(wp, ["a_id", "b_id"], sum_common,
                               coalesce=partitions_for())

    # attach deg(a) then deg(b): pair rows and degree rows share one
    # exchange key per pass (the two-sided union idiom)
    def _attach(pairs_ds, key_col, out_col):
        _AT = {"k": "int64", "a_id": "int64", "b_id": "int64",
               "common": "int64", "da": "int64", "db": "int64",
               "d": "int64", "side": "int64"}

        def pair_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            out = {"k": b[key_col].to_numpy(dtype=np.int64),
                   "a_id": b["a_id"].to_numpy(dtype=np.int64),
                   "b_id": b["b_id"].to_numpy(dtype=np.int64),
                   "common": b["common"].to_numpy(dtype=np.int64),
                   "da": (b["da"].to_numpy(dtype=np.int64)
                          if "da" in b.columns
                          else np.zeros(n, dtype=np.int64)),
                   "db": np.zeros(n, dtype=np.int64),
                   "d": np.zeros(n, dtype=np.int64),
                   "side": np.ones(n, dtype=np.int64)}
            return pd.DataFrame(out).astype(_AT)

        def deg_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            z = np.zeros(n, dtype=np.int64)
            return pd.DataFrame(
                {"k": b["node"].to_numpy(dtype=np.int64),
                 "a_id": z, "b_id": z, "common": z, "da": z, "db": z,
                 "d": b["d"].to_numpy(dtype=np.int64),
                 "side": z}).astype(_AT)

        def join(p: pd.DataFrame) -> pd.DataFrame:
            cols = ["a_id", "b_id", "common", "da", "db"]
            if p.empty:
                return typed_empty({c: "int64" for c in cols})
            dd = p[p["side"] == 0][["k", "d"]]
            pr = p[p["side"] == 1].drop(columns=["d"])
            m = pr.merge(dd, on="k", how="left")
            m[out_col] = m["d"].fillna(0).astype("int64")
            return m[cols].astype({c: "int64" for c in cols})

        u = pairs_ds.map_batches(pair_rows, batch_format="pandas").union(
            deg.map_batches(deg_rows, batch_format="pandas"))
        return bucketed_aggregate(u, ["k"], join,
                                  coalesce=partitions_for())

    with_da = _attach(pairs.map_batches(
        lambda b: b.assign(da=np.zeros(len(b), dtype=np.int64)),
        batch_format="pandas"), "a_id", "da")
    with_db = _attach(with_da, "b_id", "db")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return typed_empty(_NSIM_COLS)
        c = b["common"].to_numpy(dtype=np.int64)
        den = (b["da"].to_numpy(dtype=np.int64)
               + b["db"].to_numpy(dtype=np.int64) - c)
        b = b.assign(jaccard_ppm=(1_000_000 * c) // np.maximum(den, 1))
        return b[list(_NSIM_COLS)].astype(_NSIM_COLS)

    out = with_db.map_batches(finish, batch_format="pandas")
    return (_arrow_clean(out).sort(["a_id", "b_id"]) if sort else out)


_CCOEF_COLS = {"entity_id": "int64", "triangles": "int64",
               "coeff_ppm": "int64"}


def clustering_coefficient(edges_ds, deg_cap: int = NODE_SIM_DEG_CAP,
                           sort: bool = True):
    """Per-node LOCAL clustering coefficient: triangles(v) = closed
    wedges centered at v, coeff_ppm = floor(2·10⁶ · t(v) / (d(v)·(d(v)−1)))
    — the node-level companion to triangle_stats' global transitivity.
    Output covers every node with 2 ≤ degree ≤ deg_cap (the wedge-center
    cap against quadratic hub blowup, mirrored by the SQL twin's
    predicate), INCLUDING zero-triangle nodes.

    Exchanges at scale: center co-location (wedge emission), one
    (x, y)-keyed exchange closing wedges against the edge set, a
    center-keyed partial sum, and the eligibility/degree attach via the
    two-sided union pattern."""
    from hebrew_ner_ray.ops.shuffle import (
        _arrow_clean,
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    und = _distinct_undirected(edges_ds).materialize()
    deg = _degrees(und).materialize()

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a])})

    sym = und.map_batches(to_sym, batch_format="pandas")

    _W = {"x": "int64", "y": "int64", "center": "int64", "side": "int64"}

    def wedge_rows(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_W)
        xs, ys, cs = [], [], []
        for u, grp in p.groupby("u", sort=False):
            e = np.sort(grp["v"].to_numpy())
            if len(e) < 2 or len(e) > deg_cap:
                continue
            i, j = np.triu_indices(len(e), k=1)
            xs.append(e[i])
            ys.append(e[j])
            cs.append(np.full(len(i), u, dtype=np.int64))
        if not xs:
            return typed_empty(_W)
        n = sum(len(x) for x in xs)
        return pd.DataFrame({"x": np.concatenate(xs),
                             "y": np.concatenate(ys),
                             "center": np.concatenate(cs),
                             "side": np.zeros(n, dtype=np.int64)
                             }).astype(_W)

    wedges = bucketed_aggregate(sym, ["u"], wedge_rows,
                                coalesce=partitions_for())

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({"x": b["a"].to_numpy(dtype=np.int64),
                             "y": b["b"].to_numpy(dtype=np.int64),
                             "center": np.zeros(n, dtype=np.int64),
                             "side": np.ones(n, dtype=np.int64)
                             }).astype(_W)

    _T = {"center": "int64", "triangles": "int64"}

    def close_wedges(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_T)
        e = p[p["side"] == 1][["x", "y"]]
        w = p[p["side"] == 0][["x", "y", "center"]]
        m = w.merge(e, on=["x", "y"])
        if m.empty:
            return typed_empty(_T)
        return (m.groupby("center", as_index=False).size()
                .rename(columns={"size": "triangles"})[list(_T)]
                .astype(_T))

    closed = bucketed_aggregate(
        wedges.union(und.map_batches(edge_rows, batch_format="pandas")),
        ["x", "y"], close_wedges, coalesce=partitions_for())

    def sum_t(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_T)
        return (g.groupby("center", as_index=False)
                .agg(triangles=("triangles", "sum"))[list(_T)].astype(_T))

    t_per_center = bucketed_aggregate(closed, ["center"], sum_t,
                                      coalesce=partitions_for())

    # eligibility join: all nodes with 2 ≤ d ≤ cap, t = 0 when absent
    _J = {"node": "int64", "d": "int64", "t": "int64", "side": "int64"}

    def deg_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["d"] >= 2) & (b["d"] <= deg_cap)]
        n = len(b)
        return pd.DataFrame({"node": b["node"].to_numpy(dtype=np.int64),
                             "d": b["d"].to_numpy(dtype=np.int64),
                             "t": np.zeros(n, dtype=np.int64),
                             "side": np.zeros(n, dtype=np.int64)
                             }).astype(_J)

    def t_side(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({"node": b["center"].to_numpy(dtype=np.int64),
                             "d": np.zeros(n, dtype=np.int64),
                             "t": b["triangles"].to_numpy(dtype=np.int64),
                             "side": np.ones(n, dtype=np.int64)
                             }).astype(_J)

    def finish(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_CCOEF_COLS)
        dd = p[p["side"] == 0][["node", "d"]]
        tt = p[p["side"] == 1][["node", "t"]]
        m = dd.merge(tt, on="node", how="left")
        t = m["t"].fillna(0).to_numpy(dtype=np.int64)
        d = m["d"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "entity_id": m["node"].to_numpy(dtype=np.int64),
            "triangles": t,
            "coeff_ppm": (2_000_000 * t) // (d * (d - 1)),
        }).astype(_CCOEF_COLS)

    out = bucketed_aggregate(
        deg.map_batches(deg_side, batch_format="pandas").union(
            t_per_center.map_batches(t_side, batch_format="pandas")),
        ["node"], finish, coalesce=partitions_for())
    return _arrow_clean(out).sort("entity_id") if sort else out


_COMP_COLS = {"entity_id": "int64", "component_id": "int64"}


def components(edges_ds):
    """Weakly connected components of the entity graph: the distinct
    undirected edge set feeds :func:`ops.dedup.clusters_from_pairs` —
    the engine's size-aware CC dispatch (exact driver union-find on
    small pair sets, pointer-doubling iterated to the FIXED POINT when
    distributed), so component ids are exact at any diameter.
    component_id = min entity id of the component. Nodes with no edges
    are singletons and excluded by construction on both sides."""
    from hebrew_ner_ray.ops.dedup import clusters_from_pairs

    cl = clusters_from_pairs(_distinct_undirected(edges_ds))

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return (b.rename(columns={"doc_id": "entity_id",
                                  "cluster_id": "component_id"})
                [list(_COMP_COLS)].astype(_COMP_COLS))

    return cl.map_batches(rename, batch_format="pandas")


BFS_MAX_ROUNDS = 64
_BFS_COLS = {"entity_id": "int64", "depth": "int64"}


def bfs_depths(edges_ds, max_rounds: int = BFS_MAX_ROUNDS):
    """Single-source BFS depths over the undirected entity graph from the
    globally-minimum entity id (deterministic source, no config) — the
    synchronous frontier-expansion shape: per round ONE exchange joins
    the current frontier with the symmetric edge list, the candidate set
    anti-joins the known set, and the loop runs to the FIXED POINT
    (empty frontier), raising past ``max_rounds`` (the diameter bound) —
    never a silent cap. Nodes outside the source's component are absent,
    matching the SQL twin's reachability semantics."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    und = _distinct_undirected(edges_ds).materialize()

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a])})

    sym = und.map_batches(to_sym, batch_format="pandas").materialize()
    src = und.min("a")
    if src is None:
        return und.map_batches(
            lambda b: pd.DataFrame({c: pd.Series(dtype=t)
                                    for c, t in _BFS_COLS.items()}),
            batch_format="pandas")

    known = ray.data.from_pandas(pd.DataFrame(
        {"entity_id": pd.array([src], dtype="int64"),
         "depth": pd.array([0], dtype="int64")})).materialize()
    frontier = known

    _ROW = {"k": "int64", "v": "int64", "side": "int64"}
    _CAND = {"entity_id": "int64"}

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["u"], "v": b["v"],
                             "side": np.ones(len(b), dtype=np.int64)}).astype(_ROW)

    def expand_neighbors(fr):
        def fr_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({"k": b["entity_id"].to_numpy(dtype=np.int64),
                                 "v": np.zeros(n, dtype=np.int64),
                                 "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

        def nbrs(p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_CAND)
            on_frontier = set(p.loc[p["side"] == 0, "k"])
            e = p[p["side"] == 1]
            out = e.loc[e["k"].isin(on_frontier), "v"].drop_duplicates()
            return pd.DataFrame({"entity_id": out.to_numpy(dtype=np.int64)})

        u = sym.map_batches(edge_rows, batch_format="pandas").union(
            fr.map_batches(fr_rows, batch_format="pandas"))
        return bucketed_aggregate(u, ["k"], nbrs, coalesce=partitions_for())

    def anti_known(cand, kn):
        _A = {"entity_id": "int64", "depth": "int64", "side": "int64"}

        def c_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({"entity_id": b["entity_id"],
                                 "depth": np.zeros(n, dtype=np.int64),
                                 "side": np.zeros(n, dtype=np.int64)}).astype(_A)

        def k_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({"entity_id": b["entity_id"], "depth": b["depth"],
                                 "side": np.ones(n, dtype=np.int64)}).astype(_A)

        def anti(p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_CAND)
            seen = set(p.loc[p["side"] == 1, "entity_id"])
            fresh = p[(p["side"] == 0) & ~p["entity_id"].isin(seen)]
            return (fresh[["entity_id"]].drop_duplicates()
                    .astype(_CAND))

        u = cand.map_batches(c_rows, batch_format="pandas").union(
            kn.map_batches(k_rows, batch_format="pandas"))
        return bucketed_aggregate(u, ["entity_id"], anti,
                                  coalesce=partitions_for())

    for depth in range(1, max_rounds + 1):
        fresh = anti_known(expand_neighbors(frontier), known).materialize()
        if fresh.count() == 0:
            break
        frontier = fresh.map_batches(
            lambda b, d=depth: b.assign(depth=np.full(len(b), d, dtype=np.int64)),
            batch_format="pandas").materialize()
        known = known.union(frontier).materialize()
    else:
        raise RuntimeError(f"bfs_depths did not converge in {max_rounds} rounds")

    return known


SSSP_MAX_ROUNDS = 128
_SSSP_COLS = {"entity_id": "int64", "dist": "int64"}


def shortest_paths(edges_ds, max_rounds: int = SSSP_MAX_ROUNDS):
    """Single-source shortest paths by WEIGHT over the undirected entity
    graph (source = min entity id; parallel edges collapse to their MIN
    weight — pinned rule): synchronous Bellman-Ford relaxation iterated
    to the FIXED POINT. Per round one exchange joins the tentative
    distance table with the symmetric weighted edge list and min-reduces
    candidates per node; convergence is the exact monotone invariant
    (reached-node count AND distance sum both unchanged — distances only
    ever decrease, so equality IS the fixed point). Raises past
    ``max_rounds``. The SQL twin is the recursive hop-bounded walk with
    min-aggregation."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _WE = {"a": "int64", "b": "int64", "w": "int64"}

    def to_wund(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subj_id"].to_numpy(dtype=np.int64)
        o = batch["obj_id"].to_numpy(dtype=np.int64)
        w = batch["weight"].to_numpy(dtype=np.int64)
        keep = s != o
        out = pd.DataFrame({"a": np.minimum(s, o)[keep],
                            "b": np.maximum(s, o)[keep], "w": w[keep]})
        return (out.groupby(["a", "b"], as_index=False).agg(w=("w", "min"))
                .astype(_WE))

    def min_w(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_WE)
        return (p.groupby(["a", "b"], as_index=False).agg(w=("w", "min"))
                .astype(_WE))

    und = bucketed_aggregate(
        edges_ds.map_batches(to_wund, batch_format="pandas"),
        ["a", "b"], min_w, coalesce=partitions_for()).materialize()

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        w = b["w"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a]),
                             "w": np.concatenate([w, w])})

    sym = und.map_batches(to_sym, batch_format="pandas").materialize()
    src = und.min("a")
    if src is None:
        return und.map_batches(
            lambda b: pd.DataFrame({c: pd.Series(dtype=t)
                                    for c, t in _SSSP_COLS.items()}),
            batch_format="pandas")

    import ray

    dist = ray.data.from_pandas(pd.DataFrame(
        {"entity_id": pd.array([src], dtype="int64"),
         "dist": pd.array([0], dtype="int64")})).materialize()
    reached, total = 1, 0

    _ROW = {"k": "int64", "v": "int64", "w": "int64", "side": "int64"}
    _CAND = {"entity_id": "int64", "dist": "int64"}

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["u"], "v": b["v"], "w": b["w"],
                             "side": np.ones(len(b), dtype=np.int64)}).astype(_ROW)

    def relax_round(dd):
        def d_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({"k": b["entity_id"].to_numpy(dtype=np.int64),
                                 "v": np.zeros(n, dtype=np.int64),
                                 "w": b["dist"].to_numpy(dtype=np.int64),
                                 "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

        def relax(p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_CAND)
            d = (p[p["side"] == 0][["k", "w"]]
                 .rename(columns={"w": "dist"}))
            e = p[p["side"] == 1]
            m = e.merge(d, on="k")
            cand = pd.DataFrame({"entity_id": m["v"].to_numpy(dtype=np.int64),
                                 "dist": (m["w"] + m["dist"]).to_numpy(dtype=np.int64)})
            keep = pd.concat(
                [cand, d.rename(columns={"k": "entity_id"})], ignore_index=True)
            return (keep.groupby("entity_id", as_index=False)
                    .agg(dist=("dist", "min")).astype(_CAND))

        u = sym.map_batches(edge_rows, batch_format="pandas").union(
            dd.map_batches(d_rows, batch_format="pandas"))
        # candidates from different partitions can name the same node →
        # second tiny min-reduce keyed on the node
        cands = bucketed_aggregate(u, ["k"], relax, coalesce=partitions_for())

        def node_min(p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_CAND)
            return (p.groupby("entity_id", as_index=False)
                    .agg(dist=("dist", "min")).astype(_CAND))

        return bucketed_aggregate(cands, ["entity_id"], node_min,
                                  coalesce=partitions_for())

    for _round in range(max_rounds):
        new = relax_round(dist).materialize()
        n_new = new.count()
        s_new = int(new.sum("dist") or 0)
        if n_new == reached and s_new == total:
            break
        dist, reached, total = new, n_new, s_new
    else:
        raise RuntimeError(
            f"shortest_paths did not converge in {max_rounds} rounds")

    return dist


WALK_LEN = 4
_WALK_COLS = {"start_id": "int64", "step": "int64", "node_id": "int64"}


def random_walks(edges_ds, walk_len: int = WALK_LEN):
    """Deterministic 'random' walks from EVERY node — the walk-corpus
    generator behind node2vec/DeepWalk-style graph embeddings, made
    exactly reproducible (and therefore SQL-checkable) by drawing each
    step from the shared md5 contract instead of an RNG: at step s on
    node u, the walk moves to sorted-neighbor index
    ``stable_id('walk|start|s|u') % degree(u)``. Any task on any node
    derives the same walk — the same content-addressing argument as
    entity ids. Per step ONE exchange joins the walk frontier with the
    adjacency (grouped per complete node key, neighbor pick vectorized
    per group); emits (start_id, step, node_id) rows, step 0 = start.
    Dead-end-free by construction (undirected symmetric adjacency)."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    und = _distinct_undirected(edges_ds).materialize()

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a])})

    sym = und.map_batches(to_sym, batch_format="pandas").materialize()

    def start_rows(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b["a"], b["b"]]).drop_duplicates()
        return pd.DataFrame({"start_id": u.to_numpy(dtype=np.int64)})

    def dedup_nodes(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty({"start_id": "int64"})
        return p.drop_duplicates().astype({"start_id": "int64"})

    nodes = bucketed_aggregate(
        und.map_batches(start_rows, batch_format="pandas"),
        ["start_id"], dedup_nodes, coalesce=partitions_for()).materialize()

    frontier = nodes.map_batches(
        lambda b: pd.DataFrame({"start_id": b["start_id"],
                                "cur": b["start_id"]}),
        batch_format="pandas").materialize()

    out = nodes.map_batches(
        lambda b: pd.DataFrame({"start_id": b["start_id"],
                                "step": np.zeros(len(b), dtype=np.int64),
                                "node_id": b["start_id"]}),
        batch_format="pandas")

    _ROW = {"k": "int64", "start_id": "int64", "v": "int64", "side": "int64"}
    _F = {"start_id": "int64", "cur": "int64"}

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({"k": b["u"], "start_id": np.zeros(n, dtype=np.int64),
                             "v": b["v"],
                             "side": np.ones(n, dtype=np.int64)}).astype(_ROW)

    for step in range(1, walk_len + 1):
        def fr_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({"k": b["cur"].to_numpy(dtype=np.int64),
                                 "start_id": b["start_id"].to_numpy(dtype=np.int64),
                                 "v": np.zeros(n, dtype=np.int64),
                                 "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

        def advance(p: pd.DataFrame, s=step) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_F)
            rows = []
            for node, g in p.groupby("k", sort=False):
                nbrs = np.sort(g.loc[g["side"] == 1, "v"].to_numpy(dtype=np.int64))
                walks = g.loc[g["side"] == 0, "start_id"]
                if len(nbrs) == 0 or walks.empty:
                    continue
                starts = walks.to_numpy(dtype=np.int64)
                idx = stable_ids([f"walk|{st}|{s}|{node}" for st in starts]
                                 ) % len(nbrs)
                rows.append(pd.DataFrame({"start_id": starts,
                                          "cur": nbrs[idx]}))
            if not rows:
                return typed_empty(_F)
            return pd.concat(rows, ignore_index=True).astype(_F)

        u = sym.map_batches(edge_rows, batch_format="pandas").union(
            frontier.map_batches(fr_rows, batch_format="pandas"))
        frontier = bucketed_aggregate(u, ["k"], advance,
                                      coalesce=partitions_for()).materialize()
        out = out.union(frontier.map_batches(
            lambda b, s=step: pd.DataFrame({
                "start_id": b["start_id"],
                "step": np.full(len(b), s, dtype=np.int64),
                "node_id": b["cur"]}),
            batch_format="pandas"))

    return out.map_batches(lambda b: b[list(_WALK_COLS)].astype(_WALK_COLS),
                           batch_format="pandas")


def weighted_random_walks(edges_ds, walk_len: int = WALK_LEN):
    """Weight-biased deterministic walks: like :func:`random_walks` but
    the step draw is proportional to edge WEIGHT — pick =
    stable_id('wwalk|start|step|node') % Σw over the node's sorted
    neighbors, resolved by searchsorted on the cumulative weights
    (exactly the weighted-sampling kernel, derandomized through the md5
    contract so the SQL twin can replay it: the oracle ranks neighbors
    by id, prefix-sums their weights, and picks the first neighbor whose
    running total exceeds the draw). Parallel edges collapse to MIN
    weight (the shortest_paths rule)."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    _WE = {"a": "int64", "b": "int64", "w": "int64"}

    def to_wund(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subj_id"].to_numpy(dtype=np.int64)
        o = batch["obj_id"].to_numpy(dtype=np.int64)
        w = batch["weight"].to_numpy(dtype=np.int64)
        keep = s != o
        out = pd.DataFrame({"a": np.minimum(s, o)[keep],
                            "b": np.maximum(s, o)[keep], "w": w[keep]})
        return (out.groupby(["a", "b"], as_index=False).agg(w=("w", "min"))
                .astype(_WE))

    def min_w(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_WE)
        return (p.groupby(["a", "b"], as_index=False).agg(w=("w", "min"))
                .astype(_WE))

    und = bucketed_aggregate(
        edges_ds.map_batches(to_wund, batch_format="pandas"),
        ["a", "b"], min_w, coalesce=partitions_for()).materialize()

    def to_sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        w = b["w"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.concatenate([a, bb]),
                             "v": np.concatenate([bb, a]),
                             "w": np.concatenate([w, w])})

    sym = und.map_batches(to_sym, batch_format="pandas").materialize()

    def start_rows(b: pd.DataFrame) -> pd.DataFrame:
        u = pd.concat([b["a"], b["b"]]).drop_duplicates()
        return pd.DataFrame({"start_id": u.to_numpy(dtype=np.int64)})

    def dedup_nodes(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty({"start_id": "int64"})
        return p.drop_duplicates().astype({"start_id": "int64"})

    nodes = bucketed_aggregate(
        und.map_batches(start_rows, batch_format="pandas"),
        ["start_id"], dedup_nodes, coalesce=partitions_for()).materialize()

    frontier = nodes.map_batches(
        lambda b: pd.DataFrame({"start_id": b["start_id"],
                                "cur": b["start_id"]}),
        batch_format="pandas").materialize()

    out = nodes.map_batches(
        lambda b: pd.DataFrame({"start_id": b["start_id"],
                                "step": np.zeros(len(b), dtype=np.int64),
                                "node_id": b["start_id"]}),
        batch_format="pandas")

    _ROW = {"k": "int64", "start_id": "int64", "v": "int64", "w": "int64",
            "side": "int64"}
    _F = {"start_id": "int64", "cur": "int64"}

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({"k": b["u"], "start_id": np.zeros(n, dtype=np.int64),
                             "v": b["v"], "w": b["w"],
                             "side": np.ones(n, dtype=np.int64)}).astype(_ROW)

    for step in range(1, walk_len + 1):
        def fr_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({"k": b["cur"].to_numpy(dtype=np.int64),
                                 "start_id": b["start_id"].to_numpy(dtype=np.int64),
                                 "v": np.zeros(n, dtype=np.int64),
                                 "w": np.zeros(n, dtype=np.int64),
                                 "side": np.zeros(n, dtype=np.int64)}).astype(_ROW)

        def advance(p: pd.DataFrame, s=step) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_F)
            rows = []
            for node, g in p.groupby("k", sort=False):
                e = g[g["side"] == 1].sort_values("v")
                walks = g.loc[g["side"] == 0, "start_id"]
                if e.empty or walks.empty:
                    continue
                nbrs = e["v"].to_numpy(dtype=np.int64)
                cum = np.cumsum(e["w"].to_numpy(dtype=np.int64))
                starts = walks.to_numpy(dtype=np.int64)
                draw = stable_ids([f"wwalk|{st}|{s}|{node}" for st in starts]
                                  ) % cum[-1]
                idx = np.searchsorted(cum, draw, side="right")
                rows.append(pd.DataFrame({"start_id": starts,
                                          "cur": nbrs[idx]}))
            if not rows:
                return typed_empty(_F)
            return pd.concat(rows, ignore_index=True).astype(_F)

        u = sym.map_batches(edge_rows, batch_format="pandas").union(
            frontier.map_batches(fr_rows, batch_format="pandas"))
        frontier = bucketed_aggregate(u, ["k"], advance,
                                      coalesce=partitions_for()).materialize()
        out = out.union(frontier.map_batches(
            lambda b, s=step: pd.DataFrame({
                "start_id": b["start_id"],
                "step": np.full(len(b), s, dtype=np.int64),
                "node_id": b["cur"]}),
            batch_format="pandas"))

    return out.map_batches(lambda b: b[list(_WALK_COLS)].astype(_WALK_COLS),
                           batch_format="pandas")


_DEGDIST_COLS = {"degree": "int64", "n_nodes": "int64"}


def degree_distribution(edges_ds):
    """Degree histogram of the canonical graph: how many nodes have each
    total degree (incident distinct edge rows, both directions). Node
    degrees are corpus-growing → bucketed node-keyed count; the
    histogram itself is model-sized → one tiny reduce."""
    import pandas as pd

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        small_key_aggregate,
        typed_empty,
    )

    _D = {"node": "int64", "degree": "int64"}

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([b["subj_id"].to_numpy(dtype=np.int64),
                                b["obj_id"].to_numpy(dtype=np.int64)])
        g = (pd.DataFrame({"node": nodes})
             .groupby("node", as_index=False).size()
             .rename(columns={"size": "degree"}))
        return g.astype(_D)

    def per_node(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_D)
        return (p.groupby("node", as_index=False)
                .agg(degree=("degree", "sum")).astype(_D))

    deg = bucketed_aggregate(edges_ds.map_batches(endpoints, batch_format="pandas"),
                             ["node"], per_node, coalesce=partitions_for())

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby("degree", as_index=False).size()
                .rename(columns={"size": "n_nodes"}).astype(_DEGDIST_COLS))

    def hist_final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_DEGDIST_COLS)
        out = g.groupby("degree", as_index=False).agg(n_nodes=("n_nodes", "sum"))
        return (out.sort_values("degree").reset_index(drop=True)
                [list(_DEGDIST_COLS)].astype(_DEGDIST_COLS))

    return small_key_aggregate(
        deg.map_batches(hist_partial, batch_format="pandas"), hist_final)
