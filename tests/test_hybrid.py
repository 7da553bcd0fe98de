"""Hybrid chain (lattice → prune → disambiguate → morph tag → merge)
agrees with token_single on every template — the reference's own invariant
(ner_app_test.py:80-81 asserts single == hybrid on its goldens)."""

import math

from hebrew_ner_ray.fixtures.pool import template_artifacts
from hebrew_ner_ray.morph.align import hybrid_tag_sentence, merge_labels_by_origin
from hebrew_ner_ray.morph.lattice import (
    LatticeEdge,
    all_paths,
    build_adjacency,
    prune_lattice,
    sentence_lattice,
)
from hebrew_ner_ray.ner.gazetteer import GazetteerIndex


def test_hybrid_equals_single_on_all_templates():
    idx = GazetteerIndex()
    for art in template_artifacts():
        labels, _forms, _ml, origins = hybrid_tag_sentence(art["tokens"], idx)
        assert labels == art["single"], art["text"]
        assert sorted(set(origins)) == list(range(len(art["tokens"])))


def test_all_paths_dfs_limit_semantics():
    # diamond with a long detour; reference DFS accepts at-limit paths when
    # the end is reachable in the current frontier (utils/yap_graph.py:77-83)
    adj = {0: [1, 2], 1: [3], 2: [4], 3: [5], 4: [5], 5: []}
    paths = sorted(tuple(p) for p in all_paths(adj, 0, 5, limit=math.inf))
    assert paths == [(0, 1, 3, 5), (0, 2, 4, 5)]
    limited = list(all_paths(adj, 0, 5, limit=2))
    # at depth limit 2 the frontier from 0 is {1,2}; 5 not reachable in it
    assert limited == []


def test_prune_lattice_exact_and_fallback():
    # token with a 1-morph path and a 2-morph path
    edges = [
        LatticeEdge(0, 2, "לבית", 1),
        LatticeEdge(0, 1, "ל", 1),
        LatticeEdge(1, 2, "בית", 1),
    ]
    kept = prune_lattice(edges, [2])
    assert {(e.from_, e.to) for e in kept} == {(0, 1), (1, 2)}
    kept1 = prune_lattice(edges, [1])
    assert {(e.from_, e.to) for e in kept1} == {(0, 2)}
    # arity 3 matches nothing exactly; fallback ±1 admits the 2-morph path
    kept3 = prune_lattice(edges, [3], fallback=True)
    assert {(e.from_, e.to) for e in kept3} == {(0, 1), (1, 2)}
    # no fallback and nothing survives → all paths kept (reference :98-99)
    kept_all = prune_lattice(edges, [5])
    assert {(e.from_, e.to) for e in kept_all} == {(0, 2), (0, 1), (1, 2)}


def test_sentence_lattice_tokens_numbered_1_based():
    edges = sentence_lattice(["לבית", "."])
    assert {e.token for e in edges} == {1, 2}


def test_merge_labels_by_origin():
    labels = ["O", "B-ORG", "I-ORG", "E-ORG"]
    origins = [0, 0, 1, 1]
    merged = merge_labels_by_origin(labels, origins, 2, validate=True)
    assert merged == ["B-ORG", "E-ORG"]
    raw = merge_labels_by_origin(labels, origins, 2, validate=False)
    assert raw == ["O^B-ORG", "I-ORG^E-ORG"]


def test_adjacency_insertion_order_dedup():
    edges = [LatticeEdge(0, 1, "a", 1), LatticeEdge(0, 1, "b", 1), LatticeEdge(1, 2, "c", 1)]
    adj = build_adjacency(edges)
    assert adj == {0: [1], 1: [2], 2: []}
