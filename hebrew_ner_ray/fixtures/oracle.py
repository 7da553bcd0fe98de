"""DuckDB oracle SQL generation for the KG queries.

The interleaved corpus is a pure integer-arithmetic function of the
``documents`` table's ids (sources/interleaved.py), so the oracle re-derives
the exact corpus in SQL and joins it against per-template gold artifacts
rendered as VALUES lists. The gold artifacts come from the fixture pool —
which pytest independently verifies against hand-written label sequences —
so the driver-side comparison validates the DISTRIBUTED execution (flatten,
actor-pool annotation, salted groupbys, id hashing) at corpus scale.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

from hebrew_ner_ray.fixtures.pool import N_TEMPLATES, TEMPLATES, template_artifacts
from hebrew_ner_ray.kg.ids import sql_entity_id


def q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values(rows: Iterable[Sequence], cast_bigint_cols: Sequence[int] = ()) -> str:
    rendered: List[str] = []
    for row in rows:
        cells = []
        for k, cell in enumerate(row):
            if isinstance(cell, str):
                cells.append(q(cell))
            elif isinstance(cell, bool):
                cells.append("TRUE" if cell else "FALSE")
            elif k in cast_bigint_cols or isinstance(cell, int):
                cells.append(f"CAST({cell} AS BIGINT)")
            else:
                cells.append(str(cell))
        rendered.append("(" + ", ".join(cells) + ")")
    return ",\n    ".join(rendered)


# Shared CTE: re-derive the interleaved corpus from the documents view.
CORPUS_CTE = f"""
ids AS (SELECT doc_id AS i FROM documents),
spans AS (SELECT i, unnest(range(1 + (i*7 + 3) % 8)) AS j FROM ids),
attrs AS (
  SELECT 'doc-' || lpad(CAST(i AS VARCHAR), 8, '0') AS doc_id,
         i, j,
         ((i*31 + j*17) % 4) <> 0 AS is_text,
         (i*13 + j*5) % {N_TEMPLATES} AS t,
         CASE WHEN ((i*31 + j*17) % 4) <> 0 THEN 'text'
              WHEN (i + j) % 2 = 0 THEN 'image' ELSE 'audio' END AS kind
  FROM spans
)"""


def pool_cte() -> str:
    rows = _values([(t, text) for t, text in enumerate(TEMPLATES)])
    return f"pool(t, text) AS (VALUES\n    {rows})"


def _gold_cte(name: str, cols: str, rows: Iterable[Sequence]) -> str:
    return f"{name}({cols}) AS (VALUES\n    {_values(rows)})"


def sql_flatten_spans() -> str:
    return f"""WITH {CORPUS_CTE},
{pool_cte()}
SELECT a.doc_id,
       CAST(a.j AS BIGINT) AS span_ord,
       a.kind,
       CASE WHEN a.is_text THEN p.text ELSE '' END AS text,
       CASE WHEN a.is_text THEN ''
            ELSE 'media://' || md5(a.doc_id || '-' || CAST(a.j AS VARCHAR)) END AS media_ref
FROM attrs a LEFT JOIN pool p ON a.t = p.t
"""


def sql_tokens() -> str:
    rows = [
        (t, " ".join(a["tokens"]), len(a["tokens"]))
        for t, a in enumerate(template_artifacts())
    ]
    return f"""WITH {CORPUS_CTE},
{_gold_cte('gold', 't, token_str, n_tokens', rows)}
SELECT a.doc_id, CAST(a.j AS BIGINT) AS span_ord, g.token_str,
       CAST(g.n_tokens AS BIGINT) AS n_tokens
FROM attrs a JOIN gold g ON a.t = g.t
WHERE a.is_text
"""


def _label_rows(key: str):
    if key == "bio":
        # M12 converter gold: BIOSE single labels converted per label
        from hebrew_ner_ray.labels.algebra import bioes_to_bio

        rows = []
        for t, a in enumerate(template_artifacts()):
            for w, (word, lab) in enumerate(zip(a["tokens"], bioes_to_bio(a["single"]))):
                rows.append((t, w, word, lab))
        return rows
    rows = []
    for t, a in enumerate(template_artifacts()):
        for w, (word, lab) in enumerate(zip(a["tokens"], a[key])):
            rows.append((t, w, word, lab))
    return rows


def sql_token_labels(key: str) -> str:
    """key in {'single','multi','crf','bio'} (and 'hybrid' — identical to
    single by the reference's own invariant, verified per-template in
    tests)."""
    rows = _label_rows("single" if key == "hybrid" else key)
    return f"""WITH {CORPUS_CTE},
{_gold_cte('gold', 't, word_idx, word, label', rows)}
SELECT a.doc_id, CAST(a.j AS BIGINT) AS span_ord,
       CAST(g.word_idx AS BIGINT) AS word_idx, g.word, g.label
FROM attrs a JOIN gold g ON a.t = g.t
WHERE a.is_text
"""


def sql_token_features() -> str:
    """Single-tagger rows plus the coarse-POS feature column — the §2.9
    feature-column surface (utils/data.py:206-232) under a value oracle;
    the CASE expression is the Arrow kernel's exact twin
    (text/features.py)."""
    from hebrew_ner_ray.text.features import sql_pos_feature

    return f"""SELECT doc_id, span_ord, word_idx, word, label,
       {sql_pos_feature('word')} AS feat_pos
FROM ({sql_token_labels('single')})
"""


def sql_morph() -> str:
    rows = []
    for t, a in enumerate(template_artifacts()):
        for m, (form, lab, orig) in enumerate(
            zip(a["morph_forms"], a["morph_labels"], a["morph_origins"])
        ):
            rows.append((t, m, form, lab, orig))
    return f"""WITH {CORPUS_CTE},
{_gold_cte('gold', 't, morph_idx, form, label, origin', rows)}
SELECT a.doc_id, CAST(a.j AS BIGINT) AS span_ord,
       CAST(g.morph_idx AS BIGINT) AS morph_idx, g.form, g.label,
       CAST(g.origin AS BIGINT) AS origin
FROM attrs a JOIN gold g ON a.t = g.t
WHERE a.is_text
"""


def _mention_rows():
    rows = []
    for t, a in enumerate(template_artifacts()):
        for k, m in enumerate(a["mentions"]):
            rows.append((t, k, m.cat, m.lo, m.hi, m.surface, m.core_surface, m.norm_key))
    return rows


def mentions_cte() -> str:
    return _gold_cte(
        "gold", "t, mention_ord, cat, lo, hi, surface, core_surface, norm_key", _mention_rows()
    )


def sql_mentions() -> str:
    return f"""WITH {CORPUS_CTE},
{mentions_cte()}
SELECT a.doc_id, CAST(a.j AS BIGINT) AS span_ord,
       CAST(g.mention_ord AS BIGINT) AS mention_ord, g.cat,
       CAST(g.lo AS BIGINT) AS lo, CAST(g.hi AS BIGINT) AS hi,
       g.surface, g.core_surface, g.norm_key
FROM attrs a JOIN gold g ON a.t = g.t
WHERE a.is_text
"""


def _triple_rows():
    rows = []
    for t, a in enumerate(template_artifacts()):
        for k, tr in enumerate(a["triples"]):
            rows.append((t, k, tr.subj, tr.pred, tr.obj, tr.subj_cat, tr.obj_cat))
    return rows


def triples_cte() -> str:
    return _gold_cte("gold", "t, triple_ord, subj, pred, obj, subj_cat, obj_cat", _triple_rows())


def sql_triples() -> str:
    return f"""WITH {CORPUS_CTE},
{triples_cte()}
SELECT a.doc_id, CAST(a.j AS BIGINT) AS span_ord,
       CAST(g.triple_ord AS BIGINT) AS triple_ord,
       g.subj, g.pred, g.obj, g.subj_cat, g.obj_cat
FROM attrs a JOIN gold g ON a.t = g.t
WHERE a.is_text
"""


def sql_nodes() -> str:
    eid = sql_entity_id("m.cat", "m.norm_key")
    return f"""WITH {CORPUS_CTE},
{mentions_cte()},
mentions AS (
  SELECT a.doc_id, g.* FROM attrs a JOIN gold g ON a.t = g.t WHERE a.is_text
)
SELECT {eid} AS entity_id,
       min(m.core_surface) AS canonical_form,
       m.cat,
       CAST(count(*) AS BIGINT) AS mention_count
FROM mentions m
GROUP BY m.cat, m.norm_key
"""


def sql_edges() -> str:
    sid = sql_entity_id("tr.subj_cat", "tr.subj")
    oid = sql_entity_id("tr.obj_cat", "tr.obj")
    return f"""WITH {CORPUS_CTE},
{triples_cte()},
triples AS (
  SELECT a.doc_id, g.* FROM attrs a JOIN gold g ON a.t = g.t WHERE a.is_text
)
SELECT {sid} AS subj_id, tr.pred, {oid} AS obj_id,
       CAST(count(*) AS BIGINT) AS weight
FROM triples tr
GROUP BY subj_id, tr.pred, obj_id
"""


def sql_media_edges() -> str:
    eid = sql_entity_id("m.cat", "m.norm_key")
    return f"""WITH {CORPUS_CTE},
{mentions_cte()},
mentions AS (
  SELECT a.doc_id, g.cat, g.norm_key
  FROM attrs a JOIN gold g ON a.t = g.t WHERE a.is_text
),
ments AS (
  SELECT m.doc_id, {eid} AS entity_id, count(*) AS n
  FROM mentions m GROUP BY m.doc_id, m.cat, m.norm_key
),
media AS (
  SELECT doc_id,
         'media://' || md5(doc_id || '-' || CAST(j AS VARCHAR)) AS media_ref
  FROM attrs WHERE NOT is_text
)
SELECT e.entity_id, md.media_ref, CAST(e.n AS BIGINT) AS weight
FROM ments e JOIN media md USING (doc_id)
"""


def sql_degree_distribution() -> str:
    return f"""WITH e AS ({sql_edges()}),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT subj_id AS node FROM e
    UNION ALL SELECT obj_id AS node FROM e)
  GROUP BY node
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


def sql_entity_cooccurrence() -> str:
    eid = sql_entity_id("m.cat", "m.norm_key")
    return f"""WITH {CORPUS_CTE},
{mentions_cte()},
mentions AS (
  SELECT a.doc_id, g.cat, g.norm_key
  FROM attrs a JOIN gold g ON a.t = g.t WHERE a.is_text
),
ment AS (
  SELECT DISTINCT m.doc_id, {eid} AS entity_id FROM mentions m
),
ok AS (SELECT doc_id FROM ment GROUP BY 1 HAVING count(*) BETWEEN 2 AND 64)
SELECT x.entity_id AS a_id, y.entity_id AS b_id,
       CAST(count(*) AS BIGINT) AS weight
FROM ment x JOIN ok USING (doc_id)
JOIN ment y ON x.doc_id = y.doc_id AND x.entity_id < y.entity_id
GROUP BY 1, 2
"""


def sql_groupings() -> str:
    rows = []
    for t, a in enumerate(template_artifacts()):
        for k, (word, n) in enumerate(a["groupings"]):
            rows.append((t, k, word, n))
    return f"""WITH {CORPUS_CTE},
{_gold_cte('gold', 't, group_ord, grouped_word, n_morphs', rows)}
SELECT a.doc_id, CAST(a.j AS BIGINT) AS span_ord,
       CAST(g.group_ord AS BIGINT) AS group_ord, g.grouped_word,
       CAST(g.n_morphs AS BIGINT) AS n_morphs
FROM attrs a JOIN gold g ON a.t = g.t
WHERE a.is_text
"""


def sql_eval() -> str:
    rows = [
        (t, len(a["tokens"]), len(a["mentions"])) for t, a in enumerate(template_artifacts())
    ]
    return f"""WITH {CORPUS_CTE},
{_gold_cte('gold', 't, n_tok, n_men', rows)},
tot AS (
  SELECT sum(g.n_tok) AS n_tok, sum(g.n_men) AS n_men
  FROM attrs a JOIN gold g ON a.t = g.t WHERE a.is_text
)
SELECT CAST(n_tok AS BIGINT) AS n_tok, CAST(n_tok AS BIGINT) AS corr_tok,
       CAST(n_men AS BIGINT) AS n_pred_spans, CAST(n_men AS BIGINT) AS n_gold_spans,
       CAST(n_men AS BIGINT) AS n_correct_spans,
       CAST(1000000 AS BIGINT) AS precision_ppm,
       CAST(1000000 AS BIGINT) AS recall_ppm,
       CAST(1000000 AS BIGINT) AS f1_ppm
FROM tot
"""


def sql_crf_nbest() -> str:
    rows = []
    for t, a in enumerate(template_artifacts()):
        for rank, ppm, labels in a["crf_nbest"]:
            rows.append((t, rank, ppm, labels))
    return f"""WITH {CORPUS_CTE},
{_gold_cte('gold', 't, rank, score_ppm, labels', rows)}
SELECT a.doc_id, CAST(a.j AS BIGINT) AS span_ord, CAST(g.rank AS BIGINT) AS rank,
       CAST(g.score_ppm AS BIGINT) AS score_ppm, g.labels
FROM attrs a JOIN gold g ON a.t = g.t
WHERE a.is_text
"""


def sql_eval_vs_gold() -> str:
    """Oracle for the pred↔gold join eval: per-template span counts of
    (gazetteer single) vs (CRF gold) computed in-process, weighted by the
    corpus occurrence count in SQL, finalized with the exact float-op
    order of eval/metrics.finalize (int() == FLOOR for non-negatives)."""
    from hebrew_ner_ray.eval.metrics import sentence_counts

    rows = []
    for t, a in enumerate(template_artifacts()):
        ct, nt, np_, ng, nc = sentence_counts(a["single"], a["crf"])
        rows.append((t, ct, nt, np_, ng, nc))
    return f"""WITH {CORPUS_CTE},
{_gold_cte('gold', 't, corr_tok, n_tok, n_pred, n_gold, n_corr', rows)},
tot AS (
  SELECT sum(g.corr_tok) AS corr_tok, sum(g.n_tok) AS n_tok,
         sum(g.n_pred) AS n_pred, sum(g.n_gold) AS n_gold, sum(g.n_corr) AS n_corr
  FROM attrs a JOIN gold g ON a.t = g.t WHERE a.is_text
),
pr AS (
  SELECT *, CASE WHEN n_pred > 0 THEN n_corr * 1.0 / n_pred ELSE 0.0 END AS p,
            CASE WHEN n_gold > 0 THEN n_corr * 1.0 / n_gold ELSE 0.0 END AS r
  FROM tot
)
SELECT CAST(n_tok AS BIGINT) AS n_tok, CAST(corr_tok AS BIGINT) AS corr_tok,
       CAST(n_pred AS BIGINT) AS n_pred_spans, CAST(n_gold AS BIGINT) AS n_gold_spans,
       CAST(n_corr AS BIGINT) AS n_correct_spans,
       CAST(FLOOR(p * 1000000) AS BIGINT) AS precision_ppm,
       CAST(FLOOR(r * 1000000) AS BIGINT) AS recall_ppm,
       CAST(FLOOR(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END * 1000000) AS BIGINT) AS f1_ppm
FROM pr
"""


def sql_span_invariant() -> str:
    return """SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_ok
FROM documents
"""


def sql_triangles() -> str:
    """Triangle census of the undirected entity graph derived from
    :func:`sql_edges` — the 3-way self-join twin of the engine's
    degree-oriented wedge counting (kg/graphstats.py)."""
    return f"""WITH eg AS (
{sql_edges()}
),
und AS (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
  GROUP BY n
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
wg AS (
  SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) AS w,
         CAST(count(*) AS BIGINT) AS n_nodes
  FROM deg
)
SELECT wg.n_nodes AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       wg.w AS n_wedges,
       tri.t AS n_triangles,
       CAST(CASE WHEN wg.w = 0 THEN 0
                 ELSE (3000000 * tri.t) // wg.w END AS BIGINT) AS cluster_ppm
FROM wg, tri
"""


def sql_pagerank(iters: int = 3) -> str:
    """Unrolled integer PageRank twin of kg/graphstats.pagerank: the
    same pinned floor divisions per round (contribution r // d, damping
    85·s // 100, teleport 15% of SCALE // N), one CTE pair per
    iteration."""
    scale = 1_000_000_000_000
    base = scale * 15 // 100  # exact: 150_000_000_000
    rounds = []
    prev = "r0"
    for i in range(1, iters + 1):
        rounds.append(f"""c{i} AS (
  SELECT s.v AS node, CAST(sum(p.r // p.d) AS BIGINT) AS c
  FROM sym s JOIN {prev} p ON s.u = p.node GROUP BY s.v
),
r{i} AS (
  SELECT d.node AS node, d.d AS d,
         CAST(({base} // nn.n) + ((85 * coalesce(c.c, 0)) // 100) AS BIGINT)
           AS r
  FROM deg d LEFT JOIN c{i} c ON d.node = c.node, nn
)""")
        prev = f"r{i}"
    body = ",\n".join(rounds)
    return f"""WITH eg AS (
{sql_edges()}
),
und AS (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
r0 AS (SELECT deg.node, deg.d, CAST({scale} // nn.n AS BIGINT) AS r
       FROM deg, nn),
{body}
SELECT node AS entity_id, r AS rank_pico FROM {prev} ORDER BY entity_id
"""


def sql_pagerank_eps(eps_div: int = 8, max_rounds: int = 20) -> str:
    """Unrolled iterate-to-epsilon twin of kg/graphstats.pagerank_eps:
    the same integer rounds as :func:`sql_pagerank`, plus one max-delta
    scalar per round (d{i} = max |r{i} − r{i−1}|) and a first-crossing
    selector — the result is round k's ranks where k is the FIRST round
    with d{k} ≤ eps_pico = SCALE // (eps_div · N), with ``rounds`` = k
    as an oracle-checked output column. The engine raises if no round
    converges within ``max_rounds``; the twin mirrors that by selecting
    nothing (coalesce chain exhausts) — a mismatch either way would
    surface in the gate."""
    scale = 1_000_000_000_000
    base = scale * 15 // 100
    rounds = []
    prev = "r0"
    for i in range(1, max_rounds + 1):
        rounds.append(f"""c{i} AS MATERIALIZED (
  SELECT s.v AS node, CAST(sum(p.r // p.d) AS BIGINT) AS c
  FROM sym s JOIN {prev} p ON s.u = p.node GROUP BY s.v
),
r{i} AS MATERIALIZED (
  SELECT d.node AS node, d.d AS d,
         CAST(({base} // nn.n) + ((85 * coalesce(c.c, 0)) // 100) AS BIGINT)
           AS r
  FROM deg d LEFT JOIN c{i} c ON d.node = c.node, nn
),
d{i} AS MATERIALIZED (
  SELECT max(abs(a.r - b.r)) AS dm FROM r{i} a JOIN {prev} b
  ON a.node = b.node
)""")
        prev = f"r{i}"
    body = ",\n".join(rounds)
    first = " ".join(
        f"WHEN (SELECT dm FROM d{i}) <= ep.e THEN {i}"
        for i in range(1, max_rounds + 1))
    unions = "\n  UNION ALL\n".join(
        f"  SELECT node, r, {i} AS k FROM r{i}"
        for i in range(1, max_rounds + 1))
    # every CTE is MATERIALIZED: the round chain references r{{i-1}}
    # twice (contributions + delta) and DuckDB's default inlining
    # re-evaluates the whole prefix per reference — exponential in the
    # round count (measured: 20 rounds never finished; materialized the
    # same query runs in seconds)
    return f"""WITH eg AS MATERIALIZED (
{sql_edges()}
),
und AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
sym AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
deg AS MATERIALIZED (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
ep AS MATERIALIZED (SELECT CAST({scale} // ({eps_div} * nn.n) AS BIGINT) AS e FROM nn),
r0 AS MATERIALIZED (SELECT deg.node, deg.d, CAST({scale} // nn.n AS BIGINT) AS r
       FROM deg, nn),
{body},
sel AS (SELECT CASE {first} END AS k FROM ep),
allr AS (
{unions}
)
SELECT a.node AS entity_id, a.r AS rank_pico, CAST(a.k AS BIGINT) AS rounds
FROM allr a, sel WHERE a.k = sel.k ORDER BY entity_id
"""


def sql_node_similarity(deg_cap: int = 64) -> str:
    """Twin of kg/graphstats.node_similarity: wedge-counted common
    neighbors with FULL-graph degrees and the same center-degree cap;
    jaccard_ppm is exact integer floor division on both sides. CTEs
    materialized (the sym self-join is referenced through deg twice)."""
    return f"""WITH eg AS MATERIALIZED (
{sql_edges()}
),
und AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
sym AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
deg AS MATERIALIZED (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
w AS MATERIALIZED (
  SELECT s1.v AS a_id, s2.v AS b_id, CAST(count(*) AS BIGINT) AS common
  FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
  JOIN deg dc ON dc.node = s1.u
  WHERE dc.d <= {deg_cap}
  GROUP BY 1, 2
)
SELECT w.a_id, w.b_id, w.common,
       CAST((1000000 * w.common) // (da.d + db.d - w.common) AS BIGINT)
         AS jaccard_ppm
FROM w JOIN deg da ON da.node = w.a_id JOIN deg db ON db.node = w.b_id
ORDER BY a_id, b_id
"""


def sql_clustering_coefficient(deg_cap: int = 64) -> str:
    """Twin of kg/graphstats.clustering_coefficient: closed wedges per
    center against the distinct undirected edge set, eligibility
    2 ≤ degree ≤ cap, zero-triangle nodes kept via LEFT JOIN, exact
    integer ppm. CTEs materialized (sym/deg referenced repeatedly)."""
    return f"""WITH eg AS MATERIALIZED (
{sql_edges()}
),
und AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
sym AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und),
deg AS MATERIALIZED (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
w AS MATERIALIZED (
  SELECT s1.u AS center, s1.v AS x, s2.v AS y
  FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
  JOIN deg dc ON dc.node = s1.u
  WHERE dc.d >= 2 AND dc.d <= {deg_cap}
),
t AS MATERIALIZED (
  SELECT w.center, CAST(count(*) AS BIGINT) AS triangles
  FROM w JOIN und e ON e.a = w.x AND e.b = w.y
  GROUP BY 1
)
SELECT d.node AS entity_id,
       CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       CAST((2000000 * coalesce(t.triangles, 0)) // (d.d * (d.d - 1))
            AS BIGINT) AS coeff_ppm
FROM deg d LEFT JOIN t ON t.center = d.node
WHERE d.d >= 2 AND d.d <= {deg_cap}
ORDER BY entity_id
"""


def sql_components() -> str:
    """Weakly connected components of the undirected entity graph —
    recursive transitive closure, min reachable id per node (the exact
    twin of kg/graphstats.components at any diameter)."""
    return f"""WITH RECURSIVE eg AS MATERIALIZED (
{sql_edges()}
),
und AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
e AS MATERIALIZED (
  SELECT a AS node, b AS peer FROM und UNION ALL SELECT b, a FROM und
),
reach(node, lbl) AS (
  SELECT DISTINCT node, node AS lbl FROM e
  UNION
  SELECT e.peer AS node, r.lbl FROM e JOIN reach r ON e.node = r.node
)
SELECT CAST(node AS BIGINT) AS entity_id,
       CAST(min(lbl) AS BIGINT) AS component_id
FROM reach GROUP BY node
"""


def sql_bfs_depths() -> str:
    """Single-source BFS depths (source = min entity id): recursive walk
    with per-(node, depth) dedup and a node-count depth bound, min depth
    per reached node — the exact twin of kg/graphstats.bfs_depths."""
    return f"""WITH RECURSIVE eg AS MATERIALIZED (
{sql_edges()}
),
und AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
sym AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
),
nn AS (SELECT count(DISTINCT u) AS n FROM sym),
walk(node, d) AS (
  SELECT (SELECT min(a) FROM und) AS node, 0 AS d
  UNION
  SELECT s.v AS node, w.d + 1 AS d
  FROM walk w JOIN sym s ON s.u = w.node CROSS JOIN nn
  WHERE w.d < nn.n
)
SELECT CAST(node AS BIGINT) AS entity_id, CAST(min(d) AS BIGINT) AS depth
FROM walk GROUP BY 1
"""


def sql_shortest_paths() -> str:
    """Weighted single-source shortest paths (source = min entity id,
    parallel edges collapse to min weight): recursive hop-bounded walk
    with min aggregation — the exact twin of kg/graphstats.shortest_paths
    (a shortest path uses at most n-1 edges, so the hop bound is safe)."""
    return f"""WITH RECURSIVE eg AS MATERIALIZED (
{sql_edges()}
),
wund AS MATERIALIZED (
  SELECT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b,
         CAST(min(weight) AS BIGINT) AS w
  FROM eg WHERE subj_id <> obj_id GROUP BY 1, 2
),
sym AS MATERIALIZED (
  SELECT a AS u, b AS v, w FROM wund UNION ALL SELECT b, a, w FROM wund
),
nn AS (SELECT count(DISTINCT u) AS n FROM sym),
walk(node, dw, h) AS (
  SELECT (SELECT min(a) FROM wund) AS node, CAST(0 AS BIGINT) AS dw, 0 AS h
  UNION
  SELECT s.v AS node, w.dw + s.w AS dw, w.h + 1 AS h
  FROM walk w JOIN sym s ON s.u = w.node CROSS JOIN nn
  WHERE w.h < nn.n
)
SELECT CAST(node AS BIGINT) AS entity_id, CAST(min(dw) AS BIGINT) AS dist
FROM walk GROUP BY 1
"""


def sql_random_walks(walk_len: int = 4) -> str:
    """Deterministic random walks: at step s on node u a walk started at
    st moves to sorted-neighbor index stable_id('walk|st|s|u') % deg(u) —
    unrolled per step over a ranked adjacency CTE."""
    from hebrew_ner_ray.kg.ids import sql_stable_id

    head = f"""WITH eg AS MATERIALIZED (
{sql_edges()}
),
und AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b
  FROM eg WHERE subj_id <> obj_id
),
adj AS MATERIALIZED (
  SELECT u, v,
         row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rnk,
         count(*) OVER (PARTITION BY u) AS deg
  FROM (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und)
),
w0 AS MATERIALIZED (
  SELECT DISTINCT u AS start_id, u AS cur FROM adj
)"""
    ctes = [head]
    for s in range(1, walk_len + 1):
        pick = sql_stable_id(
            f"'walk|' || CAST(w.start_id AS VARCHAR) || '|{s}|' "
            f"|| CAST(w.cur AS VARCHAR)")
        ctes.append(f"""w{s} AS MATERIALIZED (
  SELECT w.start_id, a.v AS cur
  FROM w{s - 1} w JOIN adj a ON a.u = w.cur
   AND a.rnk = {pick} % a.deg
)""")
    selects = ["SELECT CAST(start_id AS BIGINT) AS start_id, "
               "CAST(0 AS BIGINT) AS step, "
               "CAST(start_id AS BIGINT) AS node_id FROM w0"]
    for s in range(1, walk_len + 1):
        selects.append(f"SELECT CAST(start_id AS BIGINT) AS start_id, "
                       f"CAST({s} AS BIGINT) AS step, "
                       f"CAST(cur AS BIGINT) AS node_id FROM w{s}")
    return ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def sql_weighted_walks(walk_len: int = 4) -> str:
    """Weight-biased deterministic walks: draw = stable_id % Σw(u), the
    step lands on the first id-sorted neighbor whose cumulative weight
    exceeds the draw (cum − w ≤ draw < cum)."""
    from hebrew_ner_ray.kg.ids import sql_stable_id

    head = f"""WITH eg AS MATERIALIZED (
{sql_edges()}
),
wund AS MATERIALIZED (
  SELECT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b,
         CAST(min(weight) AS BIGINT) AS w
  FROM eg WHERE subj_id <> obj_id GROUP BY 1, 2
),
adjw AS MATERIALIZED (
  SELECT u, v, w,
         sum(w) OVER (PARTITION BY u ORDER BY v) AS cum,
         sum(w) OVER (PARTITION BY u) AS tot
  FROM (SELECT a AS u, b AS v, w FROM wund
        UNION ALL SELECT b, a, w FROM wund)
),
w0 AS MATERIALIZED (
  SELECT DISTINCT u AS start_id, u AS cur FROM adjw
)"""
    ctes = [head]
    for s in range(1, walk_len + 1):
        draw = sql_stable_id(
            f"'wwalk|' || CAST(w.start_id AS VARCHAR) || '|{s}|' "
            f"|| CAST(w.cur AS VARCHAR)")
        ctes.append(f"""w{s} AS MATERIALIZED (
  SELECT w.start_id, a.v AS cur
  FROM w{s - 1} w JOIN adjw a ON a.u = w.cur
  WHERE ({draw}) % a.tot < a.cum
    AND ({draw}) % a.tot >= a.cum - a.w
)""")
    selects = ["SELECT CAST(start_id AS BIGINT) AS start_id, "
               "CAST(0 AS BIGINT) AS step, "
               "CAST(start_id AS BIGINT) AS node_id FROM w0"]
    for s in range(1, walk_len + 1):
        selects.append(f"SELECT CAST(start_id AS BIGINT) AS start_id, "
                       f"CAST({s} AS BIGINT) AS step, "
                       f"CAST(cur AS BIGINT) AS node_id FROM w{s}")
    return ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
