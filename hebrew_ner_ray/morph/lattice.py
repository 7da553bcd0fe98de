"""Morphological lattices: build, DFS path enumeration, arity pruning.

This is the engine's in-process replacement for the reference's external
YAP service plus its lattice pruning (SURVEY.md §2.7). Semantics mirrored:

- ``all_paths``: the reference's iterative DFS with a depth limit,
  including the at-limit "end reachable in frontier" acceptance that
  consumes the adjacency iterator (utils/yap_graph.py:57-83).
- ``prune_lattice``: keep edges on paths whose length equals the
  token_multi arity + 1, relaxing to ±1 under ``fallback``, keeping all
  paths when none survive (utils/yap_graph.py:86-105).

Everything operates on one sentence's lattice — a small Python structure
inside a per-sentence UDF; sub-lattices are ≤ ~10 nodes so pure Python is
the right tool (no cross-row state, embarrassingly parallel).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Iterator, List, Sequence, Tuple

from hebrew_ner_ray.morph.prefixes import prefix_splits


@dataclass(frozen=True)
class LatticeEdge:
    from_: int
    to: int
    form: str
    token: int  # 1-based source token index (YAP convention; origins subtract 1 —
                # reference utils/ner.py:86-115)


def build_adjacency(edges: Sequence[LatticeEdge]) -> Dict[int, List[int]]:
    """Adjacency dict with dedup + insertion order (utils/yap_graph.py:23-36)."""
    adj: Dict[int, List[int]] = {}
    for e in edges:
        adj.setdefault(e.from_, [])
        adj.setdefault(e.to, [])
        if e.to not in adj[e.from_]:
            adj[e.from_].append(e.to)
    return adj


def all_paths(adj: Dict[int, List[int]], start: int, end: int, limit: float = math.inf) -> Iterator[List[int]]:
    """All simple paths start→end, depth-limited — reference DFS semantics
    (utils/yap_graph.py:57-83), including the iterator-consuming
    at-limit reachability check."""
    path = [start]
    stack: List[Iterator[int]] = [iter(adj.get(start, ()))]
    while stack:
        peek = stack[-1]
        w = next(peek, None)
        if w is None:
            stack.pop()
            path.pop()
        elif len(path) < limit:
            if w == end:
                yield path + [end]
            elif w not in path:
                path.append(w)
                stack.append(iter(adj.get(w, ())))
        else:
            if w == end or end in peek:
                yield path + [end]
            stack.pop()
            path.pop()


def token_lattice(token: str, tok_id: int, node_offset: int) -> Tuple[List[LatticeEdge], int]:
    """Per-token sub-lattice from the rule-based analyzer.

    Every candidate segmentation (morph/prefixes.py) becomes a chain from a
    shared start node to a shared end node. Returns (edges, next_offset).
    """
    splits = prefix_splits(token)
    start = node_offset
    max_len = max(len(p) + 1 for p, _ in splits)
    end = start + max_len  # reserve interior ids; end node shared by all paths
    edges: List[LatticeEdge] = []
    interior = end + 1
    for prefix, core in splits:
        morphs = list(prefix) + [core]
        prev = start
        for k, m in enumerate(morphs):
            if k == len(morphs) - 1:
                nxt = end
            elif len(morphs) == max_len:
                nxt = start + k + 1  # canonical longest path uses the reserved ids
            else:
                nxt = interior
                interior += 1
            edges.append(LatticeEdge(prev, nxt, m, tok_id))
            prev = nxt
    return edges, interior


def sentence_lattice(tokens: Sequence[str]) -> List[LatticeEdge]:
    """MA lattice for a whole sentence (token sub-lattices chained)."""
    edges: List[LatticeEdge] = []
    offset = 0
    for i, tok in enumerate(tokens, start=1):
        tok_edges, offset = token_lattice(tok, i, offset)
        edges.extend(tok_edges)
    return edges


def prune_lattice(edges: Sequence[LatticeEdge], arities: Sequence[int], fallback: bool = False) -> List[LatticeEdge]:
    """Keep edges on paths matching the token_multi arity (+1 node count).

    Faithful to reference utils/yap_graph.py:86-105: per (token), paths of
    length arity+1 survive; with ``fallback`` ±1 is accepted when exact
    fails; when still empty ALL paths survive.
    """
    by_token: Dict[int, List[LatticeEdge]] = {}
    for e in edges:
        by_token.setdefault(e.token, []).append(e)
    valid: set[Tuple[int, int, int]] = set()
    for tok_id, tok_edges in by_token.items():
        adj = build_adjacency(tok_edges)
        source = tok_edges[0].from_
        target = tok_edges[-1].to
        path_len = arities[tok_id - 1] + 1
        paths = list(all_paths(adj, source, target, limit=path_len))
        pruned = [p for p in paths if len(p) == path_len]
        if fallback and not pruned:
            pruned = [p for p in paths if abs(len(p) - path_len) <= 1]
        if pruned:
            paths = pruned
        for p in paths:
            for f, t in zip(p[:-1], p[1:]):
                valid.add((tok_id, f, t))
    return [e for e in edges if (e.token, e.from_, e.to) in valid]


def disambiguate(edges: Sequence[LatticeEdge], arities: Sequence[int]) -> List[LatticeEdge]:
    """MD: pick one path per token from a (pruned) lattice.

    Chooses the first path in DFS enumeration order whose length matches
    the token's arity + 1, falling back to the first enumerated path — the
    deterministic stand-in for YAP's joint disambiguation
    (utils/yap.py:74-103).
    """
    by_token: Dict[int, List[LatticeEdge]] = {}
    for e in edges:
        by_token.setdefault(e.token, []).append(e)
    form_of: Dict[Tuple[int, int, int], str] = {}
    for e in edges:
        form_of.setdefault((e.token, e.from_, e.to), e.form)
    out: List[LatticeEdge] = []
    for tok_id in sorted(by_token):
        tok_edges = by_token[tok_id]
        adj = build_adjacency(tok_edges)
        source = tok_edges[0].from_
        target = tok_edges[-1].to
        want = arities[tok_id - 1] + 1
        best: List[int] | None = None
        for p in all_paths(adj, source, target):
            if best is None:
                best = p
            if len(p) == want:
                best = p
                break
        assert best is not None, f"empty lattice for token {tok_id}"
        for f, t in zip(best[:-1], best[1:]):
            out.append(LatticeEdge(f, t, form_of[(tok_id, f, t)], tok_id))
    return out
