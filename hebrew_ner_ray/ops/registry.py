"""Query + DuckDB-oracle registry for the scale-ops family.

Every oracle mirrors the Ray implementation's arithmetic exactly: shared
md5-based hashing (kg/ids.py), integer-unit money/value sums, identical
regex token contracts, and identical hot-key caps.
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

from hebrew_ner_ray.kg.ids import sql_stable_id
from hebrew_ner_ray.ops.dedup import HOT_SHINGLE_CAP, MINHASH_BAND, MINHASH_K, SIMHASH_BITS
from hebrew_ner_ray.ops.similarity import (
    LSH_PLANES,
    LSH_TABLES,
    N_PLANES,
    N_QUERIES,
    PAIR_TAU,
    TOPK,
)
from hebrew_ner_ray.ops.textstats import HEAVY_K, KMV_K, STOPWORDS
from hebrew_ner_ray.ops.windows import HOP_US, SESSION_GAP_US, WINDOW_KMV_K, WINDOW_US

_BPE_RE = r"[a-z0-9_]+|[^a-z0-9_\s]"

_TOKS_CTE = r"""toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents
)"""

# shingles keyed by the shared 60-bit md5 id (kg/ids.sql_stable_id) so the
# exchange key matches the Ray side bit-for-bit, collisions included
_SHINGLES_CTE = (
    _TOKS_CTE
    + r""",
sh AS (
  SELECT DISTINCT doc_id,
         CAST('0x' || substr(md5(
           CASE WHEN len(tk) >= 3 THEN tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                ELSE array_to_string(tk, ' ') END), 1, 15) AS BIGINT) AS sh_h
  FROM toks, unnest(range(1, greatest(len(tk) - 1, 2))) AS u(i)
)"""
)


def ops_queries():
    import ray.data

    from hebrew_ner_ray.ops import asof, dedup, multimodal, relational, similarity, windows

    def _wrap(fn):
        return lambda sf_dir: fn(sf_dir)

    def _incremental_snapshot(sf_dir: str):
        from hebrew_ner_ray.ops.incremental import dedup_incremental_snapshot

        return dedup_incremental_snapshot(sf_dir)

    def _formats_jsonl(sf_dir: str):
        from hebrew_ner_ray.ops.formats import docs_jsonl_stats

        return docs_jsonl_stats(sf_dir)

    def _formats_csv(sf_dir: str):
        from hebrew_ner_ray.ops.formats import events_csv_stats

        return events_csv_stats(sf_dir)

    def _docs_map(batch_fn):
        def run(sf_dir: str):
            ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
            return ds.map_batches(batch_fn, batch_format="pandas")

        return run

    from hebrew_ner_ray.ops import textstats

    def _curation(sf_dir: str):
        from hebrew_ner_ray.ops.curation import curated_docs

        return curated_docs(sf_dir)

    def _curation_quality(sf_dir: str):
        from hebrew_ner_ray.ops.curation import curated_docs_quality

        return curated_docs_quality(sf_dir)

    return {
        "text_token_count": _docs_map(textstats.token_count_batch),
        "text_lang_id": _docs_map(textstats.lang_id_batch),
        "text_quality": _docs_map(textstats.quality_batch),
        "text_fingerprint": _docs_map(textstats.fingerprint_batch),
        "text_distinct_kmv": _wrap(textstats.distinct_tokens_kmv),
        "corpus_sample_k": _wrap(textstats.corpus_sample_k),
        "corpus_sample_stratified": _wrap(textstats.corpus_sample_stratified),
        "dedup_exact": _wrap(dedup.dedup_exact),
        "dedup_jaccard": _wrap(dedup.dedup_jaccard),
        "dedup_minhash": _wrap(dedup.dedup_minhash),
        "dedup_simhash": _wrap(dedup.dedup_simhash),
        "dedup_clusters": _wrap(dedup.dedup_clusters),
        "sim_ann_topk": _wrap(similarity.ann_topk),
        "sim_embedding_pairs": _wrap(similarity.embedding_pairs),
        "sim_embedding_pairs_lsh": _wrap(similarity.embedding_pairs_lsh),
        "sim_lsh_recall": _wrap(similarity.lsh_recall),
        "sim_ivf_topk": _wrap(similarity.ivf_topk),
        "sim_ivf_recall": _wrap(similarity.ivf_recall),
        "sim_embedding_centroids": _wrap(similarity.embedding_centroids),
        "sim_kmeans_assign": _wrap(similarity.kmeans_assign),
        "sim_kmeans_lloyd": _wrap(similarity.kmeans_lloyd),
        "sim_ann_topk_filtered": _wrap(similarity.ann_topk_filtered),
        "sim_range_search": _wrap(similarity.range_search),
        "text_winnow_fingerprints": _wrap(textstats.winnow_fingerprints),
        "docs_jsonl_stats": _formats_jsonl,
        "events_csv_stats": _formats_csv,
        "events_daily_trend": _wrap(windows.events_daily_trend),
        "events_throttled": _wrap(windows.events_throttled),
        "events_late_arrivals": _wrap(windows.events_late_arrivals),
        "events_zorder": _wrap(windows.events_zorder),
        "sim_embedding_gram": _wrap(similarity.embedding_gram),
        "events_tumbling": _wrap(windows.events_tumbling),
        "events_hopping": _wrap(windows.events_hopping),
        "events_sessions": _wrap(windows.events_sessions),
        "events_top_users": _wrap(windows.events_top_users),
        "events_top_per_user": _wrap(windows.events_top_per_user),
        "events_funnel": _wrap(windows.events_funnel),
        "events_props_stats": _wrap(windows.events_props_stats),
        "events_window_distinct": _wrap(windows.events_window_distinct),
        "events_running_total": _wrap(windows.events_running_total),
        "events_rolling_window": _wrap(windows.events_rolling_window),
        "events_zscore_outliers": _wrap(windows.events_zscore_outliers),
        "events_mode_type": _wrap(windows.events_mode_type),
        "events_sufficient_stats": _wrap(windows.events_sufficient_stats),
        "events_user_setops": _wrap(windows.events_user_setops),
        "events_pivot_daily": _wrap(windows.events_pivot_daily),
        "events_top_sequences": _wrap(windows.events_top_sequences),
        "events_cohort_retention": _wrap(windows.events_cohort_retention),
        "events_concurrency": _wrap(windows.events_concurrency),
        "events_daily_unique": _wrap(windows.events_daily_unique),
        "events_share_of_user": _wrap(windows.events_share_of_user),
        "events_value_histogram": _wrap(windows.events_value_histogram),
        "events_global_concurrency": _wrap(windows.events_global_concurrency),
        "doc_embedding_features": _wrap(similarity.doc_embedding_features),
        "nation_coverage": _wrap(relational.nation_coverage),
        "bloom_semi_revenue": _wrap(relational.bloom_semi_revenue),
        "pricing_rollup": _wrap(relational.pricing_rollup),
        "pricing_cube": _wrap(relational.pricing_cube),
        "large_volume_customers": _wrap(relational.large_volume_customers),
        "order_count_distribution": _wrap(relational.order_count_distribution),
        "promo_revenue": _wrap(relational.promo_revenue),
        "price_quantiles": _wrap(relational.price_quantiles_twopass),
        "volume_shipping": _wrap(relational.volume_shipping),
        "dq_constraints": _wrap(relational.dq_constraints),
        "idle_rich_customers": _wrap(relational.idle_rich_customers),
        "profile_orders": _wrap(relational.profile_table),
        "parts_supplier_counts": _wrap(relational.parts_supplier_counts),
        "small_quantity_revenue": _wrap(relational.small_quantity_revenue),
        "forecast_revenue": _wrap(relational.forecast_revenue),
        "priority_lineitem_counts": _wrap(relational.priority_lineitem_counts),
        "top_supplier_revenue": _wrap(relational.top_supplier_revenue),
        "brand_quantity_revenue": _wrap(relational.brand_quantity_revenue),
        "market_share": _wrap(relational.market_share),
        "events_asof_attribution": _wrap(asof.asof_attribution),
        "events_range_count": _wrap(asof.range_join_count),
        "revenue_by_nation": _wrap(relational.revenue_by_nation),
        "pricing_summary": _wrap(relational.pricing_summary),
        "shipping_priority": _wrap(relational.shipping_priority),
        "order_priority_semi": _wrap(relational.order_priority_semi),
        "customers_no_orders": _wrap(relational.customers_no_orders),
        "returned_item_revenue": _wrap(relational.returned_item_revenue),
        "local_supplier_revenue": _wrap(relational.local_supplier_revenue),
        "token_quantiles": _wrap(textstats.token_quantiles),
        "tfidf_topk": _wrap(textstats.tfidf_topk),
        "text_heavy_hitters": _wrap(textstats.heavy_hitters),
        "doc_global_rank": _wrap(textstats.doc_global_rank),
        "text_fuzzy_pairs": _wrap(textstats.fuzzy_token_pairs),
        "doc_pack_offsets": _wrap(textstats.doc_pack_offsets),
        "text_fuzzy_clusters": _wrap(textstats.fuzzy_token_clusters),
        "lm_doc_logprob": _wrap(textstats.lm_doc_logprob),
        "text_collocations": _wrap(textstats.collocations_pmi),
        "text_heavy_hitters_by_lang": _wrap(textstats.heavy_hitters_by_lang),
        "text_cms_heavy_estimate": _wrap(textstats.cms_heavy_estimate),
        "doc_pareto_frontier": _wrap(textstats.doc_pareto_frontier),
        "text_kcore": _wrap(textstats.text_kcore),
        "corpus_split_assign": _wrap(textstats.corpus_split_assign),
        "doc_len_mad_by_lang": _wrap(textstats.doc_len_mad_by_lang),
        "text_bm25_topk": _wrap(textstats.bm25_topk),
        "dedup_incremental": _wrap(dedup.dedup_incremental),
        "dedup_incremental_snapshot": _incremental_snapshot,
        "text_entropy": _wrap(textstats.text_entropy),
        "text_repetition": _wrap(textstats.text_repetition),
        "corpus_card": _wrap(textstats.corpus_card),
        "split_contamination": _wrap(dedup.split_contamination),
        "media_decode": _wrap(multimodal.media_decode),
        "media_resize": _wrap(multimodal.media_resize),
        "media_frame_sample": _wrap(multimodal.media_frame_sample),
        "media_features": _wrap(multimodal.media_features),  # list col →
        # rows-only here; the list VALUES are oracle-checked by the
        # media_feature_components unnest query below
        "media_feature_norms": _wrap(multimodal.media_feature_norms),
        "media_feature_components": _wrap(multimodal.media_feature_components),
        "media_kind_stats": _wrap(multimodal.media_kind_stats),
        "corpus_curation": _curation,
        "corpus_curation_quality": _curation_quality,
    }


def _sql_lsh_buckets(prefix: str, n_tables: int, n_planes: int) -> str:
    """CTE chain computing per-(vec, table) LSH buckets with the engine's
    Rademacher planes: sign(t,p,j) = ±1 from stable_id('{prefix}-t-p-j')
    (similarity._sign_planes). Sign of the raw-embedding projection equals
    the engine's normalized-projection sign (positive scaling)."""
    sign_key = (
        f"'{prefix}-' || CAST(tp.t AS VARCHAR) || '-' || CAST(tp.p AS VARCHAR)"
        f" || '-' || CAST(d.j AS VARCHAR)"
    )
    return f"""
dims AS (SELECT unnest(range(len(embedding))) AS j
         FROM (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1)),
tp AS (SELECT t.t, p.p FROM (SELECT unnest(range({n_tables})) AS t) t,
                            (SELECT unnest(range({n_planes})) AS p) p),
signs AS (
  SELECT tp.t, tp.p, d.j,
         CASE WHEN {sql_stable_id(sign_key)} & 1 = 1 THEN 1.0 ELSE -1.0 END AS s
  FROM tp CROSS JOIN dims d),
comps AS (
  SELECT e.vec_id, d.j, CAST(e.embedding[d.j + 1] AS DOUBLE) AS v
  FROM embeddings e CROSS JOIN dims d),
dots AS (
  SELECT c.vec_id, s.t, s.p, sum(s.s * c.v) AS dp
  FROM comps c JOIN signs s ON s.j = c.j GROUP BY 1, 2, 3),
buckets AS (
  SELECT vec_id, t,
         CAST(sum(CASE WHEN dp > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY 1, 2)"""


_SQL_LSH_PAIRS_BODY = """
cand AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM buckets a JOIN buckets b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
lsh_pairs AS (
  SELECT CAST(c.a AS BIGINT) AS a, CAST(c.b AS BIGINT) AS b,
         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                      CAST(eb.embedding AS DOUBLE[])), 6) AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a
  JOIN embeddings eb ON eb.vec_id = c.b
  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                               CAST(eb.embedding AS DOUBLE[])) >= {tau})"""


def _sql_kcore(k: int, rounds: int = 8) -> str:
    """Unrolled k-core peel over the token-adjacency graph. Sound in the
    unroll direction because peeling is idempotent at the fixed point:
    with ``rounds`` ≥ the engine's converged round count (the engine
    raises past its own safety bound, and equality is verified at test
    scale), extra peels are no-ops."""
    # AS MATERIALIZED throughout: DuckDB inlines CTEs by default, which
    # would re-evaluate every earlier peel round (and the parquet scan)
    # exponentially many times across the unroll
    ctes = [r"""tk AS MATERIALIZED (
  SELECT regexp_extract_all(lower(text), '\S+') AS t FROM documents
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(t[i], t[i+1]) AS a, greatest(t[i], t[i+1]) AS b
  FROM tk, unnest(range(1, len(t))) AS u(i)
  WHERE t[i] <> t[i+1]
)"""]
    for r in range(rounds):
        ctes.append(f"""d{r} AS MATERIALIZED (
  SELECT node, count(*) AS d
  FROM (SELECT a AS node FROM e{r} UNION ALL SELECT b AS node FROM e{r})
  GROUP BY 1
),
e{r + 1} AS MATERIALIZED (
  SELECT a, b FROM e{r}
  WHERE a NOT IN (SELECT node FROM d{r} WHERE d < {k})
    AND b NOT IN (SELECT node FROM d{r} WHERE d < {k})
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT node AS token, CAST(count(*) AS BIGINT) AS deg
FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b AS node FROM e{rounds})
GROUP BY 1
""")


def _sql_kmeans(k: int, rounds: int = 36) -> str:
    """Unrolled Lloyd's k-means twin (micro-unit integers, floor-division
    means, argmin tie → smallest cid, empty clusters keep the previous
    centroid). Sound in the unroll direction: Lloyd's is idempotent at
    its fixed point, so rounds ≥ the engine's converged count (19 at
    sf0.01, 13 at sf0.001, 31 at sf0.1 — the 36-round budget covers all
    measured scales; engine raises past its own safety bound)
    reproduce the fixed-point assignment exactly."""
    head = f"""WITH ex AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS x
  FROM embeddings
),
seeds AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
           AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),
c0 AS MATERIALIZED (
  SELECT s.cid, e.dim, e.x AS c FROM seeds s JOIN ex e USING (vec_id)
)"""
    ctes = [head]
    for r in range(rounds):
        ctes.append(f"""d{r} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.x - c.c) * (e.x - c.c)) AS d2
  FROM ex e JOIN c{r} c USING (dim) GROUP BY 1, 2
),
a{r} AS MATERIALIZED (
  SELECT vec_id, cid, d2 FROM (
    SELECT vec_id, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
    FROM d{r}) WHERE rk = 1
),
s{r} AS (
  SELECT a.cid, e.dim, CAST(floor(sum(e.x) * 1.0 / count(*)) AS BIGINT) AS m
  FROM a{r} a JOIN ex e USING (vec_id) GROUP BY 1, 2
),
c{r + 1} AS MATERIALIZED (
  SELECT c.cid, c.dim, coalesce(s.m, c.c) AS c
  FROM c{r} c LEFT JOIN s{r} s ON s.cid = c.cid AND s.dim = c.dim
)""")
    last = rounds - 1
    return (",\n".join(ctes) + f"""
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cluster,
       CAST(d2 AS BIGINT) AS dist2
FROM a{last}
""")


def _sql_profile_orders() -> str:
    """Column-profile twin for the orders table: per column the same
    integer surrogate (ints as-is, doubles→cents, timestamps→µs,
    strings→stable_id), KMV over md5 of the surrogate string, exact
    integer min/max."""
    from hebrew_ner_ray.ops.relational import PROFILE_KMV_K as K

    space = 1 << 60
    surr = {
        "o_orderkey": "o_orderkey",
        "o_custkey": "o_custkey",
        "o_orderstatus": sql_stable_id("o_orderstatus"),
        "o_totalprice": "CAST(floor(o_totalprice * 100) AS BIGINT)",
        "o_orderdate": "epoch_us(o_orderdate)",
        "o_orderpriority": sql_stable_id("o_orderpriority"),
    }
    blocks = []
    for c, e in surr.items():
        h = sql_stable_id(f"CAST(({e}) AS VARCHAR)")
        blocks.append(f"""SELECT '{c}' AS "column",
  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
  (SELECT CAST(count(*) - count({c}) AS BIGINT) FROM orders) AS n_null,
  (SELECT CASE WHEN count(*) < {K} THEN CAST(count(*) AS BIGINT)
               ELSE CAST(CAST({K - 1} AS HUGEINT) * {space} // max(h)
                         AS BIGINT) END
   FROM (SELECT DISTINCT {h} AS h FROM orders
         WHERE {c} IS NOT NULL ORDER BY h LIMIT {K})) AS n_distinct_kmv,
  (SELECT CAST(coalesce(min({e}), 0) AS BIGINT) FROM orders
   WHERE {c} IS NOT NULL) AS min_v,
  (SELECT CAST(coalesce(max({e}), 0) AS BIGINT) FROM orders
   WHERE {c} IS NOT NULL) AS max_v""")
    return "\nUNION ALL\n".join(blocks)


def _sql_clusters() -> str:
    """EXACT connected components: recursive transitive closure of the
    undirected pair graph, then min reachable node id per node. Matches
    the engine's exact union-find / converged pointer-doubling arms for
    ANY component diameter (the former 8-round unroll mirrored the
    engine's old round cap — both sides are now exact)."""
    # AS MATERIALIZED: DuckDB inlines CTEs by default, which would
    # re-evaluate the whole shingle pipeline inside the recursion
    return f"""
WITH RECURSIVE {_SHINGLES_CTE},
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ok_sh AS (SELECT sh_h FROM sh GROUP BY sh_h
          HAVING count(*) BETWEEN 2 AND {HOT_SHINGLE_CAP}),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
  FROM sh a JOIN sh b USING (sh_h) JOIN ok_sh USING (sh_h)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS MATERIALIZED (
  SELECT p.a, p.b FROM p JOIN sz sa ON sa.doc_id = p.a JOIN sz sb ON sb.doc_id = p.b
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
),
e AS MATERIALIZED (SELECT a AS node, b AS peer FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(node, lbl) AS (
  SELECT DISTINCT node, node AS lbl FROM e
  UNION
  SELECT e.peer AS node, r.lbl FROM e JOIN reach r ON e.node = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


def _sql_curation() -> str:
    clusters = _sql_clusters()
    # wrap the clusters statement as a subquery (strip nothing; it is a
    # complete SELECT with its own WITH)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH clusters AS MATERIALIZED ({clusters}),
exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
near_losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents),
u AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
ag AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS n_stop
  FROM u GROUP BY doc_id
)
SELECT CAST(ag.doc_id AS BIGINT) AS doc_id, CAST(ag.n_tokens AS BIGINT) AS n_tokens
FROM ag
JOIN exact_keep k ON k.doc_id = ag.doc_id
WHERE ag.doc_id NOT IN (SELECT doc_id FROM near_losers)
  AND ag.n_tokens BETWEEN 5 AND 1000
  AND ag.n_stop * 1.0 / ag.n_tokens < 0.5
"""


def ops_oracles():
    from hebrew_ner_ray.fixtures.oracle import CORPUS_CTE
    from hebrew_ner_ray.ops import relational, similarity, textstats, windows

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_bands = MINHASH_K // MINHASH_BAND

    oracles = {
        "text_token_count": rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
        "text_lang_id": r"""
SELECT doc_id,
       CAST(floor(len(regexp_extract_all(text, '[א-ת]')) * 1.0 / length(text) * 1000000) AS BIGINT) AS heb_ppm,
       CAST(floor(len(regexp_extract_all(lower(text), '[a-z]')) * 1.0 / length(text) * 1000000) AS BIGINT) AS ascii_ppm,
       CASE WHEN len(regexp_extract_all(text, '[א-ת]')) * 1.0 / length(text) > 0.3 THEN 'he'
            WHEN len(regexp_extract_all(lower(text), '[a-z]')) * 1.0 / length(text) > 0.3 THEN 'en'
            ELSE 'other' END AS guessed_lang
FROM documents
""",
        "text_quality": rf"""
WITH {_TOKS_CTE},
u AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
ag AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(tok)) AS clen
  FROM u GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(clen * 1.0 / n_tokens * 1000000) AS BIGINT) AS avg_token_len_ppm,
       CAST(floor(n_stop * 1.0 / n_tokens * 1000000) AS BIGINT) AS stop_ppm,
       CAST(CASE WHEN n_tokens BETWEEN 5 AND 1000 AND n_stop * 1.0 / n_tokens < 0.5
            THEN 1 ELSE 0 END AS BIGINT) AS quality_ok
FROM ag
""",
        "text_fingerprint": r"""
SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
        "text_distinct_kmv": rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents),
ids AS (SELECT DISTINCT {sql_stable_id('tok')} AS h FROM toks WHERE tok <> ''),
km AS (SELECT h FROM ids ORDER BY h LIMIT {KMV_K}),
agg AS (SELECT count(*) AS k_used, COALESCE(max(h), 0) AS kth,
               (SELECT count(*) FROM ids) AS n_distinct FROM km)
SELECT CAST(k_used AS BIGINT) AS k_used, CAST(kth AS BIGINT) AS kth_hash,
       CAST(CASE WHEN n_distinct < {KMV_K} THEN n_distinct
                 ELSE CAST({KMV_K - 1} AS HUGEINT)
                      * 1152921504606846976 // kth END AS BIGINT) AS est_distinct
FROM agg
""",
        "corpus_sample_k": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {sql_stable_id("CAST(doc_id AS VARCHAR)")} AS h
FROM documents ORDER BY h, doc_id LIMIT 100
""",
        "corpus_sample_stratified": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(h AS BIGINT) AS h
FROM (SELECT doc_id, lang,
             {sql_stable_id("CAST(doc_id AS VARCHAR)")} AS h,
             row_number() OVER (PARTITION BY lang ORDER BY
                                {sql_stable_id("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
      FROM documents)
WHERE rn <= 20
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)
""",
        "dedup_jaccard": f"""
WITH {_SHINGLES_CTE},
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ok_sh AS (SELECT sh_h FROM sh GROUP BY sh_h
          HAVING count(*) BETWEEN 2 AND {HOT_SHINGLE_CAP}),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
  FROM sh a JOIN sh b USING (sh_h) JOIN ok_sh USING (sh_h)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT CAST(p.a AS BIGINT) AS a, CAST(p.b AS BIGINT) AS b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM p JOIN sz sa ON sa.doc_id = p.a JOIN sz sb ON sb.doc_id = p.b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
""",
        "dedup_minhash": f"""
WITH {_SHINGLES_CTE},
ks AS (SELECT unnest(range({MINHASH_K})) AS k),
sig AS (
  SELECT doc_id, k, min({sql_stable_id("CAST(k AS VARCHAR) || '|' || CAST(sh_h AS VARCHAR)")}) AS mh
  FROM sh CROSS JOIN ks GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, k // {MINHASH_BAND} AS band,
         CAST('0x' || substr(md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY k)), 1, 15) AS BIGINT) AS bucket
  FROM sig GROUP BY doc_id, k // {MINHASH_BAND}
),
grp AS (SELECT band, bucket FROM bands GROUP BY band, bucket
        HAVING count(*) BETWEEN 2 AND {HOT_SHINGLE_CAP})
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS a, CAST(b.doc_id AS BIGINT) AS b
FROM bands a JOIN bands b USING (band, bucket) JOIN grp USING (band, bucket)
WHERE a.doc_id < b.doc_id
""",
        "dedup_clusters": _sql_clusters(),
        "dedup_simhash": f"""
WITH {_TOKS_CTE},
u AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM toks),
th AS (SELECT doc_id, {sql_stable_id('tok')} AS h FROM u),
bits AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range({SIMHASH_BITS})) AS b) GROUP BY doc_id, b
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
""",
        "sim_ann_topk": f"""
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sc
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       round(sc, 6) AS score
FROM s
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id) <= {TOPK}
""",
        "sim_embedding_pairs": f"""
SELECT CAST(a.vec_id AS BIGINT) AS a, CAST(b.vec_id AS BIGINT) AS b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {PAIR_TAU}
""",
        "sim_embedding_pairs_lsh": f"""
WITH {_sql_lsh_buckets("pairs-lsh", LSH_TABLES, LSH_PLANES)},
{_SQL_LSH_PAIRS_BODY.format(tau=PAIR_TAU).lstrip()}
SELECT a, b, cosine FROM lsh_pairs
""",
        "sim_lsh_recall": f"""
WITH {_sql_lsh_buckets("pairs-lsh", LSH_TABLES, LSH_PLANES)},
{_SQL_LSH_PAIRS_BODY.format(tau=PAIR_TAU).lstrip()},
exact_pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= {PAIR_TAU}),
n AS (SELECT (SELECT count(*) FROM exact_pairs) AS n_exact,
             (SELECT count(*) FROM exact_pairs e JOIN lsh_pairs l
              ON e.a = l.a AND e.b = l.b) AS n_found)
SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_found AS BIGINT) AS n_found,
       CAST(CASE WHEN n_exact = 0 THEN 0
                 ELSE (n_found * 1000000) // n_exact END AS BIGINT) AS recall_ppm
FROM n
""",
        "sim_ivf_recall": f"""
WITH {_sql_lsh_buckets("ivf-planes", 1, N_PLANES)},
q AS (
  SELECT e.vec_id AS qid, CAST(e.embedding AS DOUBLE[]) AS qe, b.bucket AS qb
  FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
  WHERE e.vec_id < {N_QUERIES}),
ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT q.qid AS query_id, e.vec_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sc
    FROM q
    JOIN buckets b ON b.bucket = q.qb
    JOIN embeddings e ON e.vec_id = b.vec_id AND e.vec_id <> q.qid)
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id) <= {TOPK}),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.qid AS query_id, e.vec_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sc
    FROM q JOIN embeddings e ON e.vec_id <> q.qid)
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id) <= {TOPK}),
n AS (SELECT (SELECT count(*) FROM exact) AS n_exact,
             (SELECT count(*) FROM exact e JOIN ivf i
              ON e.query_id = i.query_id AND e.vec_id = i.vec_id) AS n_found)
SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_found AS BIGINT) AS n_found,
       CAST(CASE WHEN n_exact = 0 THEN 0
                 ELSE (n_found * 1000000) // n_exact END AS BIGINT) AS recall_ppm
FROM n
""",
        "sim_ivf_topk": f"""
WITH {_sql_lsh_buckets("ivf-planes", 1, N_PLANES)},
q AS (
  SELECT e.vec_id AS qid, CAST(e.embedding AS DOUBLE[]) AS qe, b.bucket AS qb
  FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
  WHERE e.vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sc
  FROM q
  JOIN buckets b ON b.bucket = q.qb
  JOIN embeddings e ON e.vec_id = b.vec_id AND e.vec_id <> q.qid
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       round(sc, 6) AS score
FROM s
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id) <= {TOPK}
""",
        "events_tumbling": f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST((epoch_us(ts) // {WINDOW_US}) * {WINDOW_US} AS BIGINT) AS window_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_micro
FROM events GROUP BY 1, 2
""",
        "events_hopping": f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST((epoch_us(ts) // {HOP_US}) * {HOP_US}
            - k * {HOP_US} AS BIGINT) AS window_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_micro
FROM events CROSS JOIN (SELECT unnest(range({WINDOW_US // HOP_US})) AS k)
GROUP BY 1, 2
""",
        "events_sessions": f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(sid AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_micro
FROM s GROUP BY user_id, sid
""",
        # as-of join twin: the rn=1 window formulation states the engine's
        # tie-break (max r.ts, then max r.event_id) explicitly — DuckDB's
        # native ASOF JOIN leaves duplicate-ts ties unspecified
        "events_asof_attribution": """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
r AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
pairs AS (
  SELECT l.event_id AS event_id, l.user_id AS user_id,
         r.event_id AS prior_event_id,
         CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS lag_us,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id AND r.ts < l.ts
)
SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(prior_event_id AS BIGINT) AS prior_event_id, lag_us
FROM pairs WHERE rn = 1
""",
        "events_range_count": """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT CAST(l.event_id AS BIGINT) AS event_id,
       CAST(l.user_id AS BIGINT) AS user_id,
       CAST(count(r.ts) AS BIGINT) AS n_window
FROM l LEFT JOIN r
  ON l.user_id = r.user_id
 AND r.ts < l.ts
 AND epoch_us(r.ts) >= epoch_us(l.ts) - 3600000000
GROUP BY l.event_id, l.user_id
""",
        "events_top_per_user": """
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(rn AS BIGINT) AS rank,
       CAST(event_id AS BIGINT) AS event_id, value_micro
FROM (SELECT user_id, event_id,
             CAST(floor(value * 1000000) AS BIGINT) AS value_micro,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY floor(value * 1000000) DESC, event_id) AS rn
      FROM events)
WHERE rn <= 3
""",
        "events_top_users": """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_micro,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value_micro DESC, user_id LIMIT 20
""",
        "revenue_by_nation": """
SELECT n.n_name,
       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "shipping_priority": """
WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
o AS (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
      JOIN b ON o_custkey = c_custkey
      WHERE CAST(o_orderdate AS VARCHAR) < '1998-06-15'),
r AS (SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem WHERE CAST(l_shipdate AS VARCHAR) > '1998-06-15'
      GROUP BY 1)
SELECT CAST(o.o_orderkey AS BIGINT) AS l_orderkey, r.revenue_cents,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, o.o_orderpriority
FROM o JOIN r ON o.o_orderkey = r.l_orderkey
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       round(sum(CAST(floor(l_quantity) AS BIGINT)) * 1.0 / count(*), 6) AS avg_qty,
       round(sum(CAST(floor(l_discount * 10000) AS BIGINT)) * 1.0 / count(*), 6) AS avg_disc_bp,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS VARCHAR) <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "order_priority_semi": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE strftime(o_orderdate, '%Y-%m-%d') >= '1997-01-01'
  AND strftime(o_orderdate, '%Y-%m-%d') < '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
        "customers_no_orders": """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > 0.0
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND strftime(o.o_orderdate, '%Y-%m-%d') >= '2000-06-01')
GROUP BY n.n_name
""",
        # Q5 shape: note the cross-side c_nationkey = s_nationkey filter —
        # the Ray plan resolves it inside the orderkey-partitioned join
        "local_supplier_revenue": f"""
WITH rn AS (
  SELECT n_nationkey, n_name FROM nation
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{relational.Q5_REGION}'
)
SELECT rn.n_name AS n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN rn ON s_nationkey = rn.n_nationkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= DATE '{relational.Q5_LO}'
  AND o_orderdate < DATE '{relational.Q5_HI}'
GROUP BY rn.n_name
ORDER BY revenue_cents DESC, n_name
""",
        "returned_item_revenue": """
WITH r AS (
  SELECT o.o_custkey,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
           AS revenue_cents
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE strftime(o.o_orderdate, '%Y-%m-%d') >= '1996-01-01'
    AND strftime(o.o_orderdate, '%Y-%m-%d') < '1996-07-01'
    AND l.l_returnflag = 'R'
  GROUP BY o.o_custkey
)
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name, n.n_name,
       CAST(floor(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       CAST(r.revenue_cents AS BIGINT) AS revenue_cents
FROM r
JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_cents DESC, c.c_custkey LIMIT 20
""",
        # quantile semantics pinned in window form (NOT an engine builtin):
        # q-quantile = smallest value whose 1-based rank reaches ceil(q*N)
        "token_quantiles": r"""
WITH h AS (
  SELECT lang, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
  FROM documents
),
r AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang ORDER BY n) AS rk,
         count(*) OVER (PARTITION BY lang) AS n_docs
  FROM h
)
SELECT lang, CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN rk >= ceil(0.50 * n_docs) THEN n END) AS BIGINT) AS p50,
       CAST(min(CASE WHEN rk >= ceil(0.90 * n_docs) THEN n END) AS BIGINT) AS p90,
       CAST(min(CASE WHEN rk >= ceil(0.99 * n_docs) THEN n END) AS BIGINT) AS p99
FROM r GROUP BY lang
""",
        # PMI: both sides round numerator and denominator to DOUBLE
        # before the divide; tie-break (pmi DESC, w1, w2) pinned
        "text_collocations": rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
  FROM documents
),
bg AS (
  SELECT tk[i] AS w1, tk[i+1] AS w2
  FROM toks, unnest(range(1, len(tk))) AS u(i)
  WHERE len(tk) >= 2
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg
        GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w2),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM bg),
sc AS (
  SELECT c12.w1, c12.w2, c12.c12,
         CAST(floor(ln(CAST(c12.c12 * t.total AS DOUBLE)
                       / CAST(c1.c1 * c2.c2 AS DOUBLE)) * 1000000)
              AS BIGINT) AS pmi_ppm
  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), t
  WHERE c12.c12 >= {textstats.PMI_MIN_COUNT}
),
r AS (SELECT *, row_number() OVER (
        ORDER BY pmi_ppm DESC, w1, w2) AS rk FROM sc)
SELECT w1, w2, c12, pmi_ppm, CAST(rk AS BIGINT) AS rnk
FROM r WHERE rk <= {textstats.PMI_K}
ORDER BY rnk
""",
        # bigram LM score: floor(ln(c12/c1)·1e6) per occurrence, integer
        # sums; ln on a DOUBLE ratio — identical libm path both engines
        "lm_doc_logprob": r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
  FROM documents
),
bg AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS key, tk[i] AS w1
  FROM toks, unnest(range(1, len(tk))) AS u(i)
  WHERE len(tk) >= 2
),
c12 AS (SELECT key, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY key),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
lp AS (
  SELECT bg.doc_id,
         CAST(floor(ln(CAST(c12.c12 AS DOUBLE) / c1.c1) * 1000000)
              AS BIGINT) AS lp
  FROM bg JOIN c12 USING (key) JOIN c1 USING (w1)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(lp) AS BIGINT) AS logprob_ppm
FROM lp GROUP BY doc_id
""",
        # transitive closure of the fuzzy-pair graph; cluster_id = min
        # stable_id of the variant group (same rule as the engine's CC)
        "text_fuzzy_clusters": rf"""
WITH RECURSIVE tk AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\S+')) AS t
  FROM documents
),
pr AS (
  SELECT a.t AS ta, b.t AS tb FROM tk a JOIN tk b ON a.t < b.t
  WHERE abs(len(a.t) - len(b.t)) <= 2 AND levenshtein(a.t, b.t) <= 2
),
ids AS (SELECT t, {sql_stable_id('t')} AS id FROM tk),
p AS (SELECT ia.id AS a, ib.id AS b
      FROM pr JOIN ids ia ON pr.ta = ia.t JOIN ids ib ON pr.tb = ib.t),
e AS MATERIALIZED (SELECT a AS node, b AS peer FROM p
                   UNION ALL SELECT b, a FROM p),
reach(node, lbl) AS (
  SELECT DISTINCT node, node AS lbl FROM e
  UNION
  SELECT e.peer AS node, r.lbl FROM e JOIN reach r ON e.node = r.node
),
cl AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT ids.t AS token, CAST(cl.cluster_id AS BIGINT) AS cluster_id
FROM cl JOIN ids ON cl.node = ids.id
ORDER BY token
""",
        # sequence packing: ordered prefix sum stated as a window frame
        "doc_pack_offsets": rf"""
WITH h AS (
  SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
  FROM documents
),
o AS (
  SELECT doc_id, n,
         CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM h
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n AS n_ws_tokens,
       off AS tok_offset,
       CAST(off // {textstats.PACK_WINDOW} AS BIGINT) AS window_id,
       CAST(off % {textstats.PACK_WINDOW} AS BIGINT) AS pos_in_window
FROM o
""",
        # string-similarity join; SQL does the O(V²) exact check the
        # engine's deletion-neighborhood index avoids
        "text_fuzzy_pairs": r"""
WITH tk AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\S+')) AS t
  FROM documents
)
SELECT a.t AS tok_a, b.t AS tok_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM tk a JOIN tk b ON a.t < b.t
WHERE abs(len(a.t) - len(b.t)) <= 2 AND levenshtein(a.t, b.t) <= 2
ORDER BY tok_a, tok_b
""",
        # exact global ROW_NUMBER — engine computes it as histogram
        # prefix-offsets + per-count ordinals, no global sort
        "doc_global_rank": r"""
WITH h AS (
  SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n AS n_ws_tokens,
       CAST(row_number() OVER (ORDER BY n, doc_id) AS BIGINT) AS global_rank
FROM h
""",
        # grouped heavy hitters (QUALIFY idiom); (tf DESC, token) window
        "text_heavy_hitters_by_lang": rf"""
WITH tk AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS token
  FROM documents
),
c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS tf
      FROM tk GROUP BY lang, token),
r AS (SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY tf DESC, token) AS rk FROM c)
SELECT lang, token, tf, CAST(rk AS BIGINT) AS rnk
FROM r WHERE rk <= {textstats.GROUP_HH_K}
ORDER BY lang, rnk
""",
        # CMS cells recomputed exactly (shared md5 contract, collisions
        # included); estimate = min over the CMS_D row cells
        "text_cms_heavy_estimate": rf"""
WITH tk AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token FROM documents
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY 1),
rows_ AS (SELECT unnest(range({textstats.CMS_D})) AS r),
cells AS (
  SELECT r,
         {sql_stable_id("'cms' || CAST(r AS VARCHAR) || '|' || token")}
           % {textstats.CMS_W} AS cell,
         CAST(sum(tf) AS BIGINT) AS cnt
  FROM c CROSS JOIN rows_ GROUP BY 1, 2
),
heavy AS (
  SELECT token, tf, rk FROM (
    SELECT token, tf,
           CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rk
    FROM c) WHERE rk <= {textstats.HEAVY_K}
)
SELECT h.token, h.tf AS exact_tf, CAST(min(ce.cnt) AS BIGINT) AS cms_tf,
       CAST(min(ce.cnt) - h.tf AS BIGINT) AS overcount, h.rk AS rnk
FROM heavy h CROSS JOIN rows_ r
JOIN cells ce
  ON ce.r = r.r
 AND ce.cell = {sql_stable_id("'cms' || CAST(r.r AS VARCHAR) || '|' || h.token")}
               % {textstats.CMS_W}
GROUP BY h.token, h.tf, h.rk
""",
        # skyline as the canonical NOT EXISTS dominance statement
        "doc_pareto_frontier": r"""
WITH m AS (
  SELECT doc_id, n_chars,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
pts AS (
  SELECT CAST(n_chars AS BIGINT) AS n_chars, n_tokens,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(doc_id) AS BIGINT) AS min_doc_id
  FROM m GROUP BY 1, 2
)
SELECT * FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.n_chars <= p.n_chars AND q.n_tokens >= p.n_tokens
    AND (q.n_chars < p.n_chars OR q.n_tokens > p.n_tokens))
ORDER BY n_chars
""",
        "text_kcore": _sql_kcore(textstats.KCORE_K),
        # one-row dataset card; KMV and tokenization per text_distinct_kmv
        "corpus_card": rf"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
),
d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM tk),
u AS (SELECT unnest(t) AS tok FROM tk),
ids AS (SELECT DISTINCT {sql_stable_id('tok')} AS h FROM u),
km AS (SELECT h FROM ids ORDER BY h LIMIT {KMV_K}),
agg AS (SELECT count(*) AS k_used, coalesce(max(h), 0) AS kth,
               (SELECT count(*) FROM ids) AS n_distinct FROM km)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_docs,
       (SELECT CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM d) AS n_empty,
       (SELECT CAST(sum(n) AS BIGINT) FROM d) AS n_tokens,
       (SELECT CAST(sum(n) * 1000 // count(*) AS BIGINT) FROM d)
         AS mean_tokens_milli,
       CAST(CASE WHEN agg.n_distinct < {KMV_K} THEN agg.n_distinct
                 ELSE CAST({KMV_K - 1} AS HUGEINT)
                      * 1152921504606846976 // agg.kth END AS BIGINT)
         AS vocab_kmv,
       (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM documents)
         AS n_langs
FROM agg
""",
        # decontamination: eval docs sharing ≥1 shingle id with train
        "split_contamination": f"""
WITH {_SHINGLES_CTE},
sp AS (
  SELECT doc_id,
         {sql_stable_id("'split|' || CAST(doc_id AS VARCHAR)")} % 100
           AS bucket
  FROM documents
),
tr AS (SELECT DISTINCT sh_h FROM sh JOIN sp USING (doc_id)
       WHERE bucket < 80),
ev AS (SELECT doc_id FROM sp WHERE bucket >= 80),
cont AS (
  SELECT DISTINCT s.doc_id
  FROM sh s JOIN ev USING (doc_id) JOIN tr USING (sh_h)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_eval_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM cont) AS n_contaminated,
       CAST(CASE WHEN (SELECT count(*) FROM ev) = 0 THEN 0
                 ELSE (SELECT count(*) FROM cont) * 1000000
                      // (SELECT count(*) FROM ev) END AS BIGINT)
         AS contamination_ppm
""",
        # per-distinct-token floors (the lm_doc_logprob contract)
        "text_entropy": r"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
  FROM documents
),
c AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      FROM tk GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
t AS (
  SELECT c.doc_id, n.n,
         CAST(floor(c.c * ln(n.n * 1.0 / c.c) * 1000000.0 / n.n) AS BIGINT)
           AS term
  FROM c JOIN n USING (doc_id)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(min(n) AS BIGINT) AS n_tokens,
       CAST(sum(term) AS BIGINT) AS entropy_ppm
FROM t GROUP BY 1
""",
        # Gopher-style repetition: dup-trigram and top-token ppm shares
        "text_repetition": r"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
),
base AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS nt,
         CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n3
  FROM tk
),
tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
topc AS (
  SELECT doc_id, max(c) AS top FROM (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
    FROM tok GROUP BY 1, 2) GROUP BY 1
),
tri AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS k
  FROM tk, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
  WHERE len(t) >= 3
),
d3 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS d FROM tri GROUP BY 1)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id, b.n3 AS n_trigrams,
       CAST(CASE WHEN b.n3 > 0
                 THEN floor((b.n3 - coalesce(d3.d, 0)) * 1000000.0 / b.n3)
                 ELSE 0 END AS BIGINT) AS dup_trigram_ppm,
       CAST(CASE WHEN b.nt > 0
                 THEN floor(coalesce(topc.top, 0) * 1000000.0 / b.nt)
                 ELSE 0 END AS BIGINT) AS top_token_ppm
FROM base b LEFT JOIN d3 USING (doc_id) LEFT JOIN topc USING (doc_id)
""",
        # BM25 (Lucene idf, k1=1.2 b=0.75) for the top-3 heavy-token
        # query; per-term ppm floors summed as ints; float constants
        # written as the engine computes them ((1.2 + 1.0), not 2.2 —
        # they round differently)
        "text_bm25_topk": rf"""
WITH tkk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS token FROM tkk),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tkk),
st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tt
       FROM dl),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1),
heavy AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY tf DESC, token) AS rk FROM c)
  WHERE rk <= {textstats.BM25_NQ}
),
df AS (SELECT h.token, CAST(count(DISTINCT tok.doc_id) AS BIGINT) AS df
       FROM heavy h JOIN tok ON tok.token = h.token GROUP BY 1),
idf AS (
  SELECT df.token,
         CAST(floor(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
                    * 1000000) AS BIGINT) AS idf_ppm
  FROM df CROSS JOIN st
),
tfq AS (SELECT tok.doc_id, tok.token, CAST(count(*) AS BIGINT) AS tf
        FROM tok JOIN heavy ON tok.token = heavy.token GROUP BY 1, 2),
sc AS (
  SELECT tfq.doc_id,
         CAST(sum(CAST(floor(idf.idf_ppm * tfq.tf * ({textstats.BM25_K1} + 1.0)
              / (tfq.tf + {textstats.BM25_K1}
                 * ((1.0 - {textstats.BM25_B})
                    + {textstats.BM25_B} * (dl.dl * st.n / st.tt))))
              AS BIGINT)) AS BIGINT) AS score_ppm
  FROM tfq JOIN idf ON tfq.token = idf.token
  JOIN dl ON dl.doc_id = tfq.doc_id CROSS JOIN st
  GROUP BY 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score_ppm, CAST(rk AS BIGINT) AS rnk
FROM (SELECT doc_id, score_ppm,
             row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rk
      FROM sc WHERE score_ppm > 0)
WHERE rk <= {textstats.BM25_TOPK}
""",
        # delta-vs-base ingest dedup on the parity stand-in split
        "dedup_incremental": f"""
WITH h AS (
  SELECT doc_id, md5(text) AS text_hash,
         {sql_stable_id("CAST(doc_id AS VARCHAR)")} % 2 AS par
  FROM documents
),
base AS (SELECT DISTINCT text_hash FROM h WHERE par = 0),
delta AS (SELECT text_hash, min(doc_id) AS doc_id FROM h WHERE par = 1
          GROUP BY 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.text_hash
FROM delta d WHERE d.text_hash NOT IN (SELECT text_hash FROM base)
""",
        # the identical md5 split hash; CASE over the recomputed bucket
        "corpus_split_assign": f"""
WITH b AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {sql_stable_id("'split|' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
  FROM documents
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket < {textstats.SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {textstats.SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
        # corpus-wide top-k tokens; tie-break (total_tf DESC, token ASC)
        # matches the engine's per-partition/final mergesort exactly
        "text_heavy_hitters": rf"""
WITH tk AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token FROM documents
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS total_tf FROM tk GROUP BY token)
SELECT token, total_tf,
       CAST(row_number() OVER (ORDER BY total_tf DESC, token) AS BIGINT) AS rnk
FROM c ORDER BY total_tf DESC, token LIMIT {HEAVY_K}
""",
        # integer-exact tf-idf: score_ppm = tf * floor(ln(N/df)*1e6);
        # ties break token-ascending — same window stated in the engine
        "tfidf_topk": r"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM tk GROUP BY doc_id, token),
df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tk GROUP BY token),
n AS (SELECT count(*) AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / df.df) * 1000000) AS BIGINT)
           AS score_ppm
  FROM tf JOIN df USING (token), n
),
r AS (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_ppm DESC, token) AS rk FROM sc)
SELECT CAST(doc_id AS BIGINT) AS doc_id, token, tf, df, score_ppm,
       CAST(rk AS BIGINT) AS rnk
FROM r WHERE rk <= 5
""",
        # per-window KMV distinct-user sketch: deterministic, so the
        # ESTIMATE itself is oracle-checked (exact when distinct < K)
        "events_window_distinct": f"""
WITH ids AS (
  SELECT DISTINCT
         CAST((epoch_us(ts) // {WINDOW_US}) * {WINDOW_US} AS BIGINT) AS window_us,
         {sql_stable_id("CAST(user_id AS VARCHAR)")} AS h
  FROM events),
km AS (SELECT window_us, h,
              row_number() OVER (PARTITION BY window_us ORDER BY h) AS rn,
              count(*) OVER (PARTITION BY window_us) AS n_distinct
       FROM ids)
SELECT window_us, CAST(count(*) AS BIGINT) AS k_used,
       CAST(max(h) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN max(n_distinct) < {WINDOW_KMV_K} THEN max(n_distinct)
                 ELSE CAST({WINDOW_KMV_K - 1} AS HUGEINT)
                      * 1152921504606846976 // max(h) END AS BIGINT)
         AS est_distinct
FROM km WHERE rn <= {WINDOW_KMV_K}
GROUP BY window_us
""",
        # JSON k extraction, bucketed by tens, exact micro-unit sums.
        # floor(k/10), NOT DuckDB's // (truncation) — they differ on
        # negative k (numpy's // floors)
        # consecutive type trigrams; same (ts, event_id) order window
        "events_top_sequences": f"""
WITH o AS (
  SELECT user_id, event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
c AS (SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
      FROM o WHERE t3 IS NOT NULL GROUP BY t1, t2, t3),
r AS (SELECT *, row_number() OVER (ORDER BY n DESC, t1, t2, t3) AS rk FROM c)
SELECT t1, t2, t3, n, CAST(rk AS BIGINT) AS rnk
FROM r WHERE rk <= {windows.SEQ_K} ORDER BY rnk
""",
        # cohort = first active day; distinct active (user, day) pairs
        "events_cohort_retention": f"""
WITH d AS (
  SELECT DISTINCT user_id,
         CAST((epoch_us(ts) // {windows.DAY_US}) * {windows.DAY_US}
              AS BIGINT) AS day_us
  FROM events
),
f AS (SELECT user_id, min(day_us) AS cohort_us FROM d GROUP BY user_id)
SELECT f.cohort_us,
       CAST((d.day_us - f.cohort_us) // {windows.DAY_US} AS BIGINT)
         AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY f.cohort_us, day_offset
""",
        # interval-overlap semantics stated as the O(k²) self-join the
        # engine's sweep replaces; [s,e) half-open, empty intervals dropped
        "events_concurrency": """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e
  FROM events
),
nz AS (SELECT * FROM iv WHERE e > s),
cov AS (
  SELECT a.user_id, a.s, count(*) AS c
  FROM nz a JOIN nz b ON a.user_id = b.user_id
                     AND b.s <= a.s AND a.s < b.e
  GROUP BY a.user_id, a.s
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(max(c) AS BIGINT) AS max_concurrency
FROM cov GROUP BY 1
""",
        # global peak concurrency: the engine's distributed prefix sweep
        # stated as the quadratic cover-count self-join
        "events_global_concurrency": """
WITH iv AS (
  SELECT epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e
  FROM events
),
nz AS (SELECT * FROM iv WHERE e > s),
cov AS (
  SELECT a.s, count(*) AS c
  FROM nz a JOIN nz b ON b.s <= a.s AND a.s < b.e
  GROUP BY a.s
)
SELECT CAST(c AS BIGINT) AS max_concurrency, CAST(min(s) AS BIGINT) AS at_us
FROM cov WHERE c = (SELECT max(c) FROM cov) GROUP BY c
""",
        # 1:1 feature-assembly join; squared norms in milli-units² (the
        # gram contract) recomputed from the raw list column
        "doc_embedding_features": """
WITH n AS (
  SELECT vec_id, label,
         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                  * CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
              AS BIGINT) AS sq_norm_milli2
  FROM (SELECT vec_id, label, unnest(embedding) AS x FROM embeddings)
  GROUP BY 1, 2
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       CAST(n.label AS BIGINT) AS label, n.sq_norm_milli2
FROM documents d JOIN n ON d.doc_id = n.vec_id
""",
        # ratio-to-parent: ppm of the user's total per event type
        "events_share_of_user": """
WITH g AS (
  SELECT user_id, event_type,
         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
           AS value_micro
  FROM events GROUP BY 1, 2
),
t AS (SELECT user_id, sum(value_micro) AS tot FROM g GROUP BY 1)
SELECT CAST(g.user_id AS BIGINT) AS user_id, g.event_type, g.value_micro,
       CAST(floor(g.value_micro * 1000000.0 / t.tot) AS BIGINT) AS share_ppm
FROM g JOIN t USING (user_id)
""",
        # equi-width histogram; integer ceil width, (v - lo) // width bins,
        # empty bins zero-filled by the range() scaffold
        "events_value_histogram": f"""
WITH v AS (SELECT CAST(floor(value * 1000000) AS BIGINT) AS v FROM events),
mm AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
w AS (SELECT lo, hi,
             (hi - lo + 1 + {windows.HIST_BINS} - 1) // {windows.HIST_BINS}
               AS width
      FROM mm),
c AS (SELECT (v.v - w.lo) // w.width AS bin, count(*) AS n
      FROM v CROSS JOIN w GROUP BY 1),
b AS (SELECT unnest(range({windows.HIST_BINS})) AS bin)
SELECT CAST(b.bin AS BIGINT) AS bin,
       CAST(w.lo + b.bin * w.width AS BIGINT) AS lo_micro,
       CAST(w.lo + (b.bin + 1) * w.width AS BIGINT) AS hi_micro,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
FROM b CROSS JOIN w LEFT JOIN c USING (bin)
""",
        # exact COUNT DISTINCT per (type, day)
        "events_daily_unique": f"""
SELECT event_type,
       CAST((epoch_us(ts) // {windows.DAY_US}) * {windows.DAY_US}
            AS BIGINT) AS day_us,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
""",
        # rank semantics pinned: value at 1-based rank ceil(p·N/100),
        # integer ceil (N·p + 99) // 100 — identical to the engine's
        # two-pass radix refinement
        "price_quantiles": f"""
WITH c AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
             count(*) OVER () AS n
      FROM c)
SELECT CAST(p.q AS BIGINT) AS q_pct, r.v AS value_cents
FROM (VALUES {", ".join(f"({p})" for p in relational.QUANT_PCTS)}) p(q)
JOIN r ON r.rn = (r.n * p.q + 99) // 100
""",
        "profile_orders": _sql_profile_orders(),
        # Q16 shape: grouped distinct suppliers over the part join
        "parts_supplier_counts": """
SELECT p.p_brand,
       CAST(p.p_size // 10 AS BIGINT) AS size_bucket,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2
""",
        # Q17 shape: below-20%-of-part-average revenue; the threshold is
        # the exact integer cross-multiply 5·qty·n < Σqty
        "small_quantity_revenue": """
WITH q AS (
  SELECT l_partkey, CAST(floor(l_quantity) AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
s AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n
      FROM q GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_small,
       CAST(coalesce(sum(q.cents), 0) AS BIGINT) AS revenue_cents
FROM q JOIN s USING (l_partkey)
WHERE 5 * q.qty * s.n < s.sum_qty
""",
        # Q22 shape; above-average test as the exact integer
        # cross-multiply cents·N > Σcents (no float average anywhere)
        "idle_rich_customers": f"""
WITH bal AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE CAST(floor(c_acctbal * 100) AS BIGINT) > 0
),
rich AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(floor(c.c_acctbal * 100) AS BIGINT) AS cents
  FROM customer c CROSS JOIN bal
  WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT) > 0
    AND CAST(floor(c.c_acctbal * 100) AS BIGINT) * bal.n > bal.s
),
idle AS (
  SELECT r.* FROM rich r
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey
      AND strftime(o.o_orderdate, '%Y-%m-%d') >= '{relational.Q22_CUTOFF}')
)
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS acctbal_cents
FROM idle JOIN nation n ON idle.c_nationkey = n.n_nationkey
GROUP BY 1
""",
        # dbt-style constraint battery: violation counts, one audit row
        "dq_constraints": """
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey))
    AS n_orphan_lineitems,
  (SELECT CAST(count(*) AS BIGINT) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey))
    AS n_orphan_orders,
  (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM
     (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
    AS n_dup_orderkeys,
  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE trim(text) = '')
    AS n_empty_docs
""",
        # Q7 shape: nation-pair revenue by ship year, both directions
        "volume_shipping": f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE s_nationkey <> c_nationkey
  AND strftime(l_shipdate, '%Y-%m-%d') >= '{relational.Q7_LO}'
  AND strftime(l_shipdate, '%Y-%m-%d') < '{relational.Q7_HI}'
GROUP BY 1, 2, 3
""",
        # grouped median + MAD, rank pinned at (N+1)//2 (1-based)
        "doc_len_mad_by_lang": """
WITH agg AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
m AS (
  SELECT lang, min(v) AS med FROM (
    SELECT lang, v,
           sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
           sum(c) OVER (PARTITION BY lang) AS n
    FROM agg) WHERE cum >= (n + 1) // 2 GROUP BY lang
),
dev AS (
  SELECT a.lang, abs(a.v - m.med) AS dv, sum(a.c) AS c
  FROM agg a JOIN m USING (lang) GROUP BY 1, 2
),
mad AS (
  SELECT lang, min(dv) AS mad FROM (
    SELECT lang, dv,
           sum(c) OVER (PARTITION BY lang ORDER BY dv) AS cum,
           sum(c) OVER (PARTITION BY lang) AS n
    FROM dev) WHERE cum >= (n + 1) // 2 GROUP BY lang
),
nn AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs FROM agg GROUP BY 1)
SELECT nn.lang, nn.n_docs, CAST(m.med AS BIGINT) AS median_chars,
       CAST(mad.mad AS BIGINT) AS mad_chars
FROM nn JOIN m USING (lang) JOIN mad USING (lang)
""",
        # set algebra on user sets: INTERSECT / EXCEPT both directions
        "events_user_setops": """
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id
)
SELECT CAST(sum(CASE WHEN v = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both,
       CAST(sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_only,
       CAST(sum(CASE WHEN v = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase_only
FROM f
""",
        # PIVOT via conditional aggregation over the pinned type domain
        "events_pivot_daily": f"""
SELECT CAST((epoch_us(ts) // {windows.DAY_US}) * {windows.DAY_US} AS BIGINT)
         AS day_us,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view
FROM events GROUP BY day_us
""",
        # exact integer moment sums; centi-unit x pinned both sides
        "events_sufficient_stats": f"""
WITH e AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {windows.DAY_US}) * {windows.DAY_US} AS BIGINT)
           AS day_us,
         CAST(floor(value * 100) AS BIGINT) AS x,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, day_us, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(x * x) AS BIGINT) AS sum_x2,
       CAST(sum(k) AS BIGINT) AS sum_k, CAST(sum(k * k) AS BIGINT) AS sum_k2,
       CAST(sum(x * k) AS BIGINT) AS sum_xk
FROM e WHERE k IS NOT NULL
GROUP BY event_type, day_us
""",
        # argmax aggregate: tie-break (n DESC, type ASC) pinned both sides
        "events_mode_type": """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
r AS (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) AS rk FROM c)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS top_event_type,
       n AS n_events
FROM r WHERE rk = 1
""",
        # Q18: HAVING on the big aggregate; tie-break (price DESC, key)
        "large_volume_customers": f"""
WITH s AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum_qty > {relational.Q18_QTY}
),
j AS (
  SELECT c.c_custkey, c.c_name, o.o_orderkey AS l_orderkey, s.sum_qty,
         CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_price_cents
  FROM s JOIN orders o ON s.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
r AS (SELECT *, row_number() OVER (
        ORDER BY total_price_cents DESC, l_orderkey) AS rk FROM j)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, l_orderkey, sum_qty,
       total_price_cents, CAST(rk AS BIGINT) AS rnk
FROM r WHERE rk <= 25 ORDER BY rnk
""",
        # Q13 shape: LEFT join keeps zero-order customers as a bucket
        "order_count_distribution": """
WITH cc AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM cc GROUP BY 1 ORDER BY custdist DESC, c_count DESC
""",
        # Q14 shape: conditional aggregate over the part join; exact
        # integer cents, ppm via the same float64 multiply-divide-floor
        "promo_revenue": f"""
WITH f AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE strftime(l_shipdate, '%Y-%m-%d') >= '{relational.Q14_LO}'
    AND strftime(l_shipdate, '%Y-%m-%d') < '{relational.Q14_HI}'
),
j AS (
  SELECT cents, CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END AS pc
  FROM f JOIN part ON l_partkey = p_partkey
)
SELECT CAST(sum(pc) AS BIGINT) AS promo_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(floor(sum(pc) * 1000000.0 / sum(cents)) AS BIGINT) AS promo_ppm
FROM j
""",
        # ROLLUP with GROUPING() bitmask; rolled keys render '' both sides
        "pricing_rollup": """
SELECT coalesce(l_returnflag, '') AS l_returnflag,
       coalesce(l_linestatus, '') AS l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag, l_linestatus
""",
        # semi-join result is bloom-invisible: plain SQL twin
        "bloom_semi_revenue": f"""
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '{relational.BLOOM_PRIORITY}')
""",
        # FULL OUTER shape: every nation appears, zero-filled sides
        "nation_coverage": """
SELECT n_name,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_customers,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_suppliers
FROM nation
LEFT JOIN (SELECT c_nationkey, count(*) AS n FROM customer
           GROUP BY c_nationkey) c ON n_nationkey = c.c_nationkey
LEFT JOIN (SELECT s_nationkey, count(*) AS n FROM supplier
           GROUP BY s_nationkey) s ON n_nationkey = s.s_nationkey
ORDER BY n_name
""",
        # window functions over the event stream: same (ts, event_id)
        # tie-break window as the engine's per-partition mergesort;
        # first-event gap pinned to -1 (engine avoids nullable ints)
        "events_running_total": """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(row_number() OVER w AS BIGINT) AS seq,
       CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS BIGINT)
         AS prev_gap_us,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) OVER
              (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_micro
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
        "events_props_stats": """
SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) * 1.0 / 10)
            * 10 AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
         AS total_value_micro
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY k_bucket
""",
        # greedy earliest-completion funnel; population = any-event users
        "events_funnel": """
WITH u AS (SELECT DISTINCT user_id FROM events),
t1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
       WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
       JOIN t1 ON e.user_id = t1.user_id
       WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
       GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
       JOIN t2 ON e.user_id = t2.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
       GROUP BY e.user_id)
SELECT CAST(u.user_id AS BIGINT) AS user_id,
       CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
                 WHEN t2.t2 IS NOT NULL THEN 2
                 WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth,
       CAST(coalesce(t1.t1, -1) AS BIGINT) AS t1_us,
       CAST(coalesce(t2.t2, -1) AS BIGINT) AS t2_us,
       CAST(coalesce(t3.t3, -1) AS BIGINT) AS t3_us
FROM u
LEFT JOIN t1 ON u.user_id = t1.user_id
LEFT JOIN t2 ON u.user_id = t2.user_id
LEFT JOIN t3 ON u.user_id = t3.user_id
""",
        # k-means M-step: micro-unit integer sums, floor-division mean
        # XᵀX in squared milli-units; 1-based (i ≤ j) upper triangle
        "sim_embedding_gram": """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(floor(unnest(embedding) * 1000) AS BIGINT) AS x
  FROM embeddings
)
SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
       CAST(sum(a.x * b.x) AS BIGINT) AS g_milli2,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
""",
        "sim_embedding_centroids": r"""
WITH e AS (
  SELECT label, CAST(t.j AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(t.j AS INT) + 1] AS DOUBLE) * 1000000)
              AS BIGINT) AS micro
  FROM embeddings, unnest(range(len(embedding))) AS t(j)
)
SELECT CAST(label AS BIGINT) AS label, dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(micro) AS BIGINT) AS sum_micro,
       CAST(floor(sum(micro) * 1.0 / count(*)) AS BIGINT) AS mean_micro
FROM e GROUP BY label, dim
""",
        # k-means E-step: integer squared L2 to the M-step centroids;
        # argmin tie-break = smallest centroid label (stated in the window)
        "sim_kmeans_lloyd": _sql_kmeans(similarity.KMEANS_K),
        # ann_topk with the label predicate pushed into the candidate scan
        "sim_ann_topk_filtered": f"""
WITH q AS (SELECT vec_id AS qid, label AS qlab,
                  CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sc
  FROM q JOIN embeddings e ON e.vec_id <> q.qid AND e.label = q.qlab
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       round(sc, 6) AS score
FROM s
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id) <= {TOPK}
""",
        # Morton interleave as generated bit algebra (2^(2k) / 2^(2k+1)
        # planes; both sides positive so // == >> exactly)
        "events_zorder": f"""
WITH c AS (
  SELECT event_id, user_id % {1 << windows.ZORDER_BITS} AS x,
         (epoch_us(ts) // {windows.WINDOW_US})
           % {1 << windows.ZORDER_BITS} AS y
  FROM events
)
SELECT CAST(event_id AS BIGINT) AS event_id, CAST(x AS BIGINT) AS x,
       CAST(y AS BIGINT) AS y,
       CAST({" + ".join(f"((x // {1 << k}) % 2) * {1 << (2 * k)}"
                        for k in range(windows.ZORDER_BITS))}
            + {" + ".join(f"((y // {1 << k}) % 2) * {1 << (2 * k + 1)}"
                          for k in range(windows.ZORDER_BITS))}
            AS BIGINT) AS zcode
FROM c
""",
        # watermark semantics: late iff event time trails the running max
        # event time over PRIOR arrivals (event_id order) by > lateness
        "events_late_arrivals": f"""
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
w AS (
  SELECT event_type, ts_us,
         max(ts_us) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prior
  FROM e
)
SELECT event_type,
       CAST(sum(CASE WHEN prior IS NOT NULL
                      AND ts_us + {windows.LATENESS_US} < prior
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY 1
""",
        # LAG-based throttle: first of a same-instant burst survives
        "events_throttled": f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
l AS (
  SELECT *, lag(ts_us) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts_us, event_id) AS prev
  FROM e
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(ts_us AS BIGINT) AS ts_us
FROM l WHERE prev IS NULL OR ts_us - prev > {windows.THROTTLE_US}
""",
        # grouped OLS slope from exact integer moments; x = days since the
        # type's first active day; float-floor slope (DuckDB // truncates)
        "events_daily_trend": f"""
WITH d AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {windows.DAY_US}) * {windows.DAY_US}
              AS BIGINT) AS day_us,
         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type,
         (day_us // {windows.DAY_US})
           - min(day_us // {windows.DAY_US})
               OVER (PARTITION BY event_type) AS x,
         y
  FROM d
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM x GROUP BY 1
)
SELECT event_type, n AS n_days, sy AS total_value_micro,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                 ELSE floor(1000.0 * (n * sxy - sx * sy)
                            / (n * sxx - sx * sx)) END AS BIGINT)
         AS slope_milli
FROM m
""",
        "sim_kmeans_assign": r"""
WITH e AS (
  SELECT vec_id, label, CAST(t.j AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(t.j AS INT) + 1] AS DOUBLE) * 1000000)
              AS BIGINT) AS micro
  FROM embeddings, unnest(range(len(embedding))) AS t(j)
),
c AS (
  SELECT label AS clabel, dim,
         CAST(floor(sum(micro) * 1.0 / count(*)) AS BIGINT) AS mean_micro
  FROM e GROUP BY label, dim
),
d AS (
  SELECT e.vec_id, max(e.label) AS label, c.clabel,
         sum((e.micro - c.mean_micro) * (e.micro - c.mean_micro)) AS dist2
  FROM e JOIN c ON e.dim = c.dim
  GROUP BY e.vec_id, c.clabel
),
r AS (SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY dist2, clabel) AS rn FROM d)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label,
       CAST(clabel AS BIGINT) AS assigned, CAST(dist2 AS BIGINT) AS dist2
FROM r WHERE rn = 1
""",
    }
    oracles["corpus_curation"] = _sql_curation()
    from hebrew_ner_ray.ops.curation import DUP_MAX_PPM as DUP_MAX_PPM_
    from hebrew_ner_ray.ops.curation import ENT_MIN_PPM as ENT_MIN_PPM_
    oracles["corpus_curation_quality"] = rf"""
WITH cur AS MATERIALIZED ({_sql_curation()}),
tk2 AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
  FROM documents
),
ec AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
       FROM tk2 GROUP BY 1, 2),
en AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM ec GROUP BY 1),
ent AS (
  SELECT ec.doc_id,
         CAST(sum(CAST(floor(ec.c * ln(en.n * 1.0 / ec.c) * 1000000.0 / en.n)
                       AS BIGINT)) AS BIGINT) AS entropy_ppm
  FROM ec JOIN en USING (doc_id) GROUP BY 1
),
tk3 AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
),
b3 AS (SELECT doc_id, CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n3 FROM tk3),
tri3 AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS k
  FROM tk3, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
  WHERE len(t) >= 3
),
d33 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS d FROM tri3 GROUP BY 1),
rep AS (
  SELECT b3.doc_id,
         CAST(CASE WHEN b3.n3 > 0
                   THEN floor((b3.n3 - coalesce(d33.d, 0)) * 1000000.0 / b3.n3)
                   ELSE 0 END AS BIGINT) AS dup_trigram_ppm
  FROM b3 LEFT JOIN d33 USING (doc_id)
)
SELECT cur.doc_id, cur.n_tokens, ent.entropy_ppm, rep.dup_trigram_ppm
FROM cur JOIN ent USING (doc_id) JOIN rep USING (doc_id)
WHERE ent.entropy_ppm >= {ENT_MIN_PPM_}
  AND rep.dup_trigram_ppm <= {DUP_MAX_PPM_}
"""
    media_w = sql_stable_id("media_ref")
    media_h = sql_stable_id("media_ref || '#h'")
    media_d = sql_stable_id("media_ref || '#d'")
    oracles["media_decode"] = f"""
WITH {CORPUS_CTE},
media AS (
  SELECT doc_id, CAST(j AS BIGINT) AS span_ord, kind,
         'media://' || md5(doc_id || '-' || CAST(j AS VARCHAR)) AS media_ref
  FROM attrs WHERE NOT is_text
)
SELECT doc_id, span_ord, kind, media_ref,
       CAST(CASE WHEN kind = 'image' THEN 16 + {media_w} % 2048 ELSE 0 END AS BIGINT) AS width,
       CAST(CASE WHEN kind = 'image' THEN 16 + {media_h} % 2048 ELSE 0 END AS BIGINT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 1 ELSE 1000 + {media_d} % 600000 END AS BIGINT) AS n_frames
FROM media
"""
    oracles["media_kind_stats"] = f"""
WITH {CORPUS_CTE},
media AS (
  SELECT doc_id, kind,
         'media://' || md5(doc_id || '-' || CAST(j AS VARCHAR)) AS media_ref
  FROM attrs WHERE NOT is_text
),
d AS (
  SELECT kind,
         CAST(CASE WHEN kind = 'image' THEN 16 + {media_w} % 2048 ELSE 0 END
              AS BIGINT) AS width,
         CAST(CASE WHEN kind = 'image' THEN 16 + {media_h} % 2048 ELSE 0 END
              AS BIGINT) AS height,
         CAST(CASE WHEN kind = 'image' THEN 1
              ELSE 1000 + {media_d} % 600000 END AS BIGINT) AS n_frames
  FROM media
)
SELECT kind, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(width * height) AS BIGINT) AS total_pixels,
       CAST(sum(n_frames) AS BIGINT) AS total_frames
FROM d GROUP BY kind ORDER BY kind
"""
    from hebrew_ner_ray.ops.multimodal import N_FRAME_SAMPLES, RESIZE_MAX

    oracles["media_resize"] = f"""
WITH {CORPUS_CTE},
media AS (
  SELECT doc_id, CAST(j AS BIGINT) AS span_ord, kind,
         'media://' || md5(doc_id || '-' || CAST(j AS VARCHAR)) AS media_ref
  FROM attrs WHERE NOT is_text
),
dims AS (
  SELECT doc_id, span_ord,
         CAST(16 + {media_w} % 2048 AS BIGINT) AS width,
         CAST(16 + {media_h} % 2048 AS BIGINT) AS height
  FROM media WHERE kind = 'image'
)
SELECT doc_id, span_ord, width, height,
       CAST(CASE WHEN width >= height THEN {RESIZE_MAX}
                 ELSE greatest(width * {RESIZE_MAX} // greatest(height, 1), 1)
            END AS BIGINT) AS out_w,
       CAST(CASE WHEN width >= height
                 THEN greatest(height * {RESIZE_MAX} // greatest(width, 1), 1)
                 ELSE {RESIZE_MAX} END AS BIGINT) AS out_h
FROM dims
"""
    oracles["media_frame_sample"] = f"""
WITH {CORPUS_CTE},
media AS (
  SELECT doc_id, CAST(j AS BIGINT) AS span_ord, kind,
         'media://' || md5(doc_id || '-' || CAST(j AS VARCHAR)) AS media_ref
  FROM attrs WHERE NOT is_text
),
au AS (
  SELECT doc_id, span_ord,
         CAST(CASE WHEN kind = 'image' THEN 1
                   ELSE 1000 + {media_d} % 600000 END AS BIGINT) AS n_frames
  FROM media
),
idx AS (
  SELECT DISTINCT doc_id, span_ord,
         CAST(i * n_frames // {N_FRAME_SAMPLES} AS BIGINT) AS frame_idx
  FROM au, unnest(range({N_FRAME_SAMPLES})) AS u(i)
  WHERE i * n_frames // {N_FRAME_SAMPLES} < n_frames
)
SELECT doc_id, span_ord,
       CAST(row_number() OVER (PARTITION BY doc_id, span_ord
                               ORDER BY frame_idx) - 1 AS BIGINT)
         AS sample_ord,
       frame_idx
FROM idx
"""
    from hebrew_ner_ray.ops.multimodal import FEATURE_DIM

    feat_v = sql_stable_id("media_ref || '#f' || CAST(fj AS VARCHAR)")
    oracles["media_feature_norms"] = f"""
WITH {CORPUS_CTE},
media AS (
  SELECT doc_id, CAST(j AS BIGINT) AS span_ord,
         'media://' || md5(doc_id || '-' || CAST(j AS VARCHAR)) AS media_ref
  FROM attrs WHERE NOT is_text
),
fdims AS (SELECT unnest(range({FEATURE_DIM})) AS fj),
f AS (
  SELECT doc_id, span_ord, ({feat_v} % 2000001) - 1000000 AS v
  FROM media CROSS JOIN fdims
)
SELECT doc_id, span_ord, CAST(sum(v * v) AS BIGINT) AS norm_sq_micro
FROM f GROUP BY 1, 2
"""
    oracles["media_feature_components"] = f"""
WITH {CORPUS_CTE},
media AS (
  SELECT doc_id, CAST(j AS BIGINT) AS span_ord,
         'media://' || md5(doc_id || '-' || CAST(j AS VARCHAR)) AS media_ref
  FROM attrs WHERE NOT is_text
),
fdims AS (SELECT unnest(range({FEATURE_DIM})) AS fj)
SELECT doc_id, span_ord, CAST(fj AS BIGINT) AS fj,
       CAST(({feat_v} % 2000001) - 1000000 AS BIGINT) AS comp_micro
FROM media CROSS JOIN fdims
"""
    # Q6 shape: pure filter-aggregate; discounts compared as integer bp
    oracles["forecast_revenue"] = f"""
SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * l_discount * 100)
                         AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m-%d') >= '{relational.Q6_LO}'
  AND strftime(l_shipdate, '%Y-%m-%d') < '{relational.Q6_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""
    # Q12 shape: conditional counts over the big-by-big join
    hi = ", ".join(f"'{{p}}'".format(p=p) for p in relational._HIGH_PRIO)
    oracles["priority_lineitem_counts"] = f"""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ({hi}) THEN 1 ELSE 0 END)
            AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o_orderpriority IN ({hi}) THEN 0 ELSE 1 END)
            AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE strftime(l_shipdate, '%Y-%m-%d') >= '{relational.Q12_LO}'
  AND strftime(l_shipdate, '%Y-%m-%d') < '{relational.Q12_HI}'
GROUP BY l_returnflag ORDER BY l_returnflag
"""
    # Q15 shape: revenue view + global argmax (all ties kept)
    oracles["top_supplier_revenue"] = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS total_revenue_cents
  FROM lineitem
  WHERE strftime(l_shipdate, '%Y-%m-%d') >= '{relational.Q15_LO}'
    AND strftime(l_shipdate, '%Y-%m-%d') < '{relational.Q15_HI}'
  GROUP BY 1
)
SELECT r.s_suppkey, s.s_name,
       CAST(r.total_revenue_cents AS BIGINT) AS total_revenue_cents
FROM r JOIN supplier s USING (s_suppkey)
WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM r)
ORDER BY r.s_suppkey
"""
    # Q19 shape: OR-of-ANDs predicate groups (first matching group wins,
    # mirrored by the engine's first-match group assignment)
    g1, g2, g3 = relational.Q19_GROUPS
    oracles["brand_quantity_revenue"] = f"""
WITH pg AS (
  SELECT p_partkey,
         CASE WHEN p_brand = '{g1[0]}' AND p_size BETWEEN 1 AND {g1[1]} THEN 1
              WHEN p_brand = '{g2[0]}' AND p_size BETWEEN 1 AND {g2[1]} THEN 2
              WHEN p_brand = '{g3[0]}' AND p_size BETWEEN 1 AND {g3[1]} THEN 3
              ELSE 0 END AS grp
  FROM part
)
SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN pg ON l_partkey = p_partkey
WHERE (grp = 1 AND l_quantity BETWEEN {g1[2]} AND {g1[3]})
   OR (grp = 2 AND l_quantity BETWEEN {g2[2]} AND {g2[3]})
   OR (grp = 3 AND l_quantity BETWEEN {g3[2]} AND {g3[3]})
"""
    # Q8 shape: per-year market-share ppm from exact integer cents
    oracles["market_share"] = f"""
WITH rc AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{relational.Q8_REGION}'
),
f AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
         CASE WHEN s_nationkey = (SELECT n_nationkey FROM nation
                                  WHERE n_name = '{relational.Q8_NATION}')
              THEN 1 ELSE 0 END AS is_target
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN rc ON o_custkey = rc.c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE strftime(l_shipdate, '%Y-%m-%d') >= '{relational.Q8_LO}'
    AND strftime(l_shipdate, '%Y-%m-%d') < '{relational.Q8_HI}'
)
SELECT l_year,
       CAST(sum(cents * is_target) AS BIGINT) AS nation_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(floor(sum(cents * is_target) * 1000000.0
                  / greatest(sum(cents), 1)) AS BIGINT) AS share_ppm
FROM f GROUP BY l_year ORDER BY l_year
"""
    # RANGE frame (peer-inclusive): tied timestamps share the frame, so
    # no tie-break enters the semantics
    oracles["events_rolling_window"] = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) OVER w AS BIGINT)
         AS win_sum_micro,
       CAST(count(*) OVER w AS BIGINT) AS win_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""
    # radius search: every pair at cosine >= tau, self excluded
    oracles["sim_range_search"] = f"""
SELECT CAST(q.vec_id AS BIGINT) AS query_id, CAST(v.vec_id AS BIGINT) AS vec_id,
       round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(v.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings q JOIN embeddings v ON q.vec_id != v.vec_id
WHERE q.vec_id < {similarity.N_QUERIES}
  AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                             CAST(v.embedding AS DOUBLE[])) >= {similarity.RANGE_TAU}
"""
    # text-format roundtrips: oracle reads the ORIGINAL parquet — the
    # aggregate only hash-matches if the jsonl/csv roundtrip is lossless
    oracles["docs_jsonl_stats"] = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""
    oracles["events_csv_stats"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
         AS total_value_micro
FROM events GROUP BY event_type ORDER BY event_type
"""
    # winnowing: every w-window min over k-gram hashes, distinct per doc
    from hebrew_ner_ray.kg.ids import sql_stable_id as _ssid

    _wk, _ww = textstats.WINNOW_K, textstats.WINNOW_W
    oracles["text_winnow_fingerprints"] = f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text
  FROM documents WHERE length(text) >= {_wk}
),
pos AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) - {_wk} + 2)) AS p
  FROM d
),
g AS (
  SELECT doc_id, p,
         {_ssid(f"substr(text, CAST(p AS INTEGER), {_wk})")} AS h
  FROM pos
),
w AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {_ww - 1} FOLLOWING) AS fp
  FROM g
)
SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp FROM w
"""
    # 3-sigma outliers via the exact integer cross-multiply — no sqrt,
    # no division, no float anywhere on either side
    oracles["events_zscore_outliers"] = """
WITH v AS (
  SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS x
  FROM events
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sv, sum(x * x) AS sv2
  FROM v GROUP BY event_type
)
SELECT v.event_id, v.event_type, v.x AS value_centi,
       CASE WHEN s.n * v.x > s.sv THEN 'high' ELSE 'low' END AS direction
FROM v JOIN s USING (event_type)
WHERE (s.n * v.x - s.sv) * (s.n * v.x - s.sv)
      > 9 * (s.n * s.sv2 - s.sv * s.sv)
"""
    # full CUBE lattice; GROUPING() bitmask, rolled keys render ''
    oracles["pricing_cube"] = """
SELECT coalesce(l_returnflag, '') AS l_returnflag,
       coalesce(l_linestatus, '') AS l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag, l_linestatus
"""
    # the snapshot layout reproduces the parity split exactly, so the
    # true base/delta query shares the parity query's oracle verbatim
    oracles["dedup_incremental_snapshot"] = oracles["dedup_incremental"]
    return oracles
