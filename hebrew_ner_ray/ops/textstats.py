"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline staples: language ID, quality scoring, token
counting, fingerprinting. Each is a stateless vectorized ``map_batches``
over column-pruned reads, with an exact DuckDB oracle (registry.py).

Tokenization contract shared with the SQL oracles: whitespace split of
``lower(trim(text))``; "BPE-ish" tokens are ``[a-z0-9_]+|[^a-z0-9_\\s]``
(ASCII classes on both sides — RE2 and Python agree).
"""

from __future__ import annotations

from hebrew_ner_ray.ops.io import read_parquet_clean

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


KMV_K = 256
_HASH_SPACE = 1 << 60  # stable_id is the top 15 hex digits of md5 → 60 bits


def kmv_partial_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch KMV combiner: the KMV_K smallest distinct token hashes in
    this batch (the sketch's mergeable partial — the exchange ships ≤ K
    int64s per block, never the token stream)."""
    from hebrew_ner_ray.kg.ids import stable_ids

    toks: set[str] = set()
    for t in batch["text"]:
        toks.update(ws_tokens(t))
    if not toks:
        return pd.DataFrame({"h": pd.Series(dtype="int64")})
    h = np.unique(stable_ids(sorted(toks)))  # unique → already ascending
    return pd.DataFrame({"h": h[:KMV_K]})


def distinct_tokens_kmv(sf_dir: str, k: int = KMV_K):
    """K-minimum-values distinct-count sketch over the corpus vocabulary.

    Deterministic end-to-end: hashes are the shared 60-bit md5
    ``stable_id``, so the kth-minimum — and therefore the ESTIMATE
    itself — is exactly reproducible in SQL (the oracle checks the
    estimate, not just plumbing). Mergeable partials: each batch ships
    its k smallest distinct hashes; the final merge sees ≤ k×blocks rows
    in one small task. If the corpus has fewer than k distinct tokens the
    sketch is exact (estimate = distinct count).

    Output: one row (k_used, kth_hash, est_distinct)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    partials = ds.map_batches(kmv_partial_batch, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(g["h"].to_numpy(dtype=np.int64)) if len(g) else np.array([], dtype=np.int64)
        k_used = int(min(len(h), k))
        if k_used == 0:
            return pd.DataFrame({"k_used": [0], "kth_hash": [0], "est_distinct": [0]}).astype("int64")
        kth = int(h[k_used - 1])  # np.unique output is ascending
        if len(h) < k:
            est = len(h)  # sketch saw everything — exact
        else:
            est = (k - 1) * _HASH_SPACE // kth  # python ints: no overflow
        return pd.DataFrame(
            {"k_used": [k_used], "kth_hash": [kth], "est_distinct": [est]}
        ).astype("int64")

    return small_key_aggregate(partials, merge)


def corpus_sample_k(sf_dir: str, k: int = 100):
    """Deterministic distributed sample: the k docs with the smallest
    ``stable_id(doc_id)`` — hash order is a uniform, reproducible,
    rank-stable shuffle, so the same k docs come back on any cluster
    shape (ORDER BY hash LIMIT k in SQL). Per-batch local top-k partials
    → one small merge task (≤ k×blocks rows)."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate

    from hebrew_ner_ray.kg.ids import stable_ids

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        h = stable_ids([str(d) for d in ids])
        order = np.argsort(h, kind="stable")[:k]
        return pd.DataFrame({"doc_id": ids[order], "h": h[order]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "h": pd.Series(dtype="int64")})
        return (g.sort_values(["h", "doc_id"]).head(k)
                .reset_index(drop=True).astype("int64"))

    partials = ds.map_batches(partial, batch_format="pandas")
    return small_key_aggregate(partials, merge)


def corpus_sample_stratified(sf_dir: str, k: int = 20):
    """Stratified deterministic sample: the k smallest-hash docs PER
    ``lang`` stratum (row_number-over-partition in SQL). Same combiner
    discipline as :func:`corpus_sample_k` — each batch keeps at most k
    rows per stratum it sees, one small merge task finishes the ranks."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import small_key_aggregate

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        rank = b.groupby("lang", sort=False).cumcount() + 1
        return b[rank <= k]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        return topk(pd.DataFrame({
            "doc_id": ids,
            "lang": b["lang"].to_numpy(),
            "h": stable_ids([str(d) for d in ids]),
        }))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "lang": pd.Series(dtype="object"),
                                 "h": pd.Series(dtype="int64")})
        out = topk(g).reset_index(drop=True)
        return out.astype({"doc_id": "int64", "h": "int64"})

    return small_key_aggregate(ds.map_batches(partial, batch_format="pandas"), merge)


QUANTILES = (0.5, 0.9, 0.99)
_QT_COLS = {"lang": "object", "n_docs": "int64",
            "p50": "int64", "p90": "int64", "p99": "int64"}


def token_quantiles(sf_dir: str):
    """EXACT distributed quantiles (p50/p90/p99 of whitespace token count
    per ``lang``) via value histograms — no sort, no sampling, no sketch
    error.

    The trick that makes exact quantiles cheap at 100 TB: the VALUE
    domain (distinct token counts per lang) is tiny even when the corpus
    is not, so each batch emits a (lang, n_tokens) → count histogram
    partial (combiner), one keyed exchange merges histograms (rows ≈
    langs × distinct counts, corpus-size-independent), and a single
    small task takes per-lang cumulative sums. Quantile semantics are
    pinned explicitly (not delegated to an engine builtin): q-quantile =
    the smallest value whose running count reaches ``ceil(q · N)`` —
    stated identically in the SQL twin's window form.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, small_key_aggregate, typed_empty

    _HIST = {"lang": "object", "n": "int64", "cnt": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "lang": b["lang"].to_numpy(),
            "n": b["text"].str.count(r"\S+").to_numpy(dtype=np.int64),
        }).groupby(["lang", "n"], as_index=False).size().rename(columns={"size": "cnt"})
        return g.astype(_HIST)

    def merge_hist(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_HIST)
        return (g.groupby(["lang", "n"], as_index=False)["cnt"].sum()
                .astype(_HIST))

    hist = sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                           ["lang", "n"], merge_hist)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_QT_COLS)
        g = (g.groupby(["lang", "n"], as_index=False)["cnt"].sum()
             .sort_values(["lang", "n"], kind="mergesort"))
        out = []
        for lang, h in g.groupby("lang", sort=False):
            cum = h["cnt"].cumsum().to_numpy()
            n_docs = int(cum[-1])
            vals = h["n"].to_numpy()
            row = {"lang": lang, "n_docs": n_docs}
            for q, name in zip(QUANTILES, ("p50", "p90", "p99")):
                need = int(np.ceil(q * n_docs))
                row[name] = int(vals[np.searchsorted(cum, need)])
            out.append(row)
        return pd.DataFrame(out)[list(_QT_COLS)].astype(_QT_COLS)

    return small_key_aggregate(hist, finalize)


TFIDF_K = 5
_TFIDF_COLS = {"doc_id": "int64", "token": "object", "tf": "int64",
               "df": "int64", "score_ppm": "int64", "rnk": "int64"}
_TF_ROWS = {"doc_id": "int64", "token": "object", "tf": "int64"}


def _tf_rows(b: pd.DataFrame) -> pd.DataFrame:
    """Per-batch (doc_id, token, tf) — complete per doc, since a doc's
    text lives in one row and map tasks never split a row."""
    toks = b["text"].str.lower().str.findall(r"\S+")
    e = pd.DataFrame({"doc_id": b["doc_id"], "token": toks}).explode("token")
    e = e[e["token"].notna()]
    if e.empty:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _TF_ROWS.items()})
    g = e.groupby(["doc_id", "token"], as_index=False).size().rename(
        columns={"size": "tf"})
    return g.astype(_TF_ROWS)


def _idf_ppm(n_docs: int, dfs: np.ndarray) -> np.ndarray:
    """floor(ln(N/df)·1e6) computed with math.log per DISTINCT df value —
    C libm, the same code path DuckDB's ln() takes, so the integer is
    reproducible cross-engine (numpy's SIMD log can differ by an ulp)."""
    import math

    uniq = np.unique(dfs)
    lut = {int(d): int(math.floor(math.log(n_docs / d) * 1_000_000)) for d in uniq}
    return np.array([lut[int(d)] for d in dfs], dtype=np.int64)


def _topk_per_doc(sc: pd.DataFrame, k: int) -> pd.DataFrame:
    sc = sc.sort_values(["doc_id", "score_ppm", "token"],
                        ascending=[True, False, True], kind="mergesort")
    sc["rnk"] = sc.groupby("doc_id", sort=False).cumcount() + 1
    return sc[sc["rnk"] <= k][list(_TFIDF_COLS)].astype(_TFIDF_COLS)


def tfidf_topk(sf_dir: str, k: int = TFIDF_K, broadcast_vocab_limit: int = 2_000_000):
    """Top-k TF-IDF terms per document — the two-pass global-statistic
    pattern every curation pipeline needs (a per-doc score that depends
    on a corpus-wide table).

    Pass A computes document frequencies with a per-batch
    distinct-doc combiner (the exchange ships (token, df_partial), not
    postings). Pass B is size-aware:

    - vocab ≤ ``broadcast_vocab_limit``: the df table is ``ray.put``
      ONCE and every task scores + takes its docs' top-k locally — one
      corpus pass, zero further exchange (docs are batch-local).
    - larger vocab: no broadcast — tf rows and df rows meet in a keyed
      exchange on token, then one grouped exchange on doc_id takes the
      top-k. Two exchanges, nothing corpus-cardinality on any driver.

    Scoring is integer-exact: score_ppm = tf · floor(ln(N/df)·1e6); ties
    break token-ascending (stated identically in the SQL twin's window).
    """
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        grouped_exchange,
        partitions_for,
        sized_aggregate,
        typed_empty,
    )

    _DF = {"token": "object", "df": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+")
        e = pd.DataFrame({"doc_id": b["doc_id"], "token": toks}).explode("token")
        e = e[e["token"].notna()].drop_duplicates(["doc_id", "token"])
        if e.empty:
            return typed_empty(_DF)
        g = e.groupby("token", as_index=False).size().rename(columns={"size": "df"})
        return g.astype(_DF)

    def df_merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_DF)
        return g.groupby("token", as_index=False)["df"].sum().astype(_DF)

    df_ds = sized_aggregate(ds.map_batches(df_partial, batch_format="pandas"),
                            ["token"], df_merge).materialize()
    vocab = df_ds.count()

    if vocab <= broadcast_vocab_limit:
        df_pd = df_ds.to_pandas()
        df_ref = ray.put(dict(zip(df_pd["token"], df_pd["df"].astype(np.int64))))

        class ScoreTopK:
            def __init__(self):
                self.df = ray.get(df_ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                tf = _tf_rows(b)
                if tf.empty:
                    return typed_empty(_TFIDF_COLS)
                tf["df"] = tf["token"].map(self.df).astype(np.int64)
                tf["score_ppm"] = (tf["tf"].to_numpy()
                                   * _idf_ppm(n_docs, tf["df"].to_numpy()))
                return _topk_per_doc(tf, k)

        from hebrew_ner_ray.runtime import default_concurrency

        return ds.map_batches(ScoreTopK, batch_format="pandas",
                              concurrency=default_concurrency())

    # exchange arm: tf and df meet on token, then top-k per doc
    tf_rows = ds.map_batches(_tf_rows, batch_format="pandas")

    def tf_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["df"] = np.int64(0)
        b["side"] = np.int64(0)
        return b

    def df_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": np.zeros(len(b), dtype=np.int64),
            "token": b["token"].to_numpy(),
            "tf": np.zeros(len(b), dtype=np.int64),
            "df": b["df"].to_numpy(dtype=np.int64),
            "side": np.ones(len(b), dtype=np.int64),
        })

    _SC = {"doc_id": "int64", "token": "object", "tf": "int64",
           "df": "int64", "score_ppm": "int64"}

    def attach_df(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return typed_empty(_SC)
        dfs = part[part["side"] == 1][["token", "df"]]
        t = part[part["side"] == 0].drop(columns=["df", "side"])
        m = t.merge(dfs, on="token", how="inner")
        if m.empty:
            return typed_empty(_SC)
        m["score_ppm"] = m["tf"].to_numpy() * _idf_ppm(n_docs, m["df"].to_numpy())
        return m[list(_SC)].astype(_SC)

    scored = bucketed_aggregate(
        tf_rows.map_batches(tf_side, batch_format="pandas")
        .union(df_ds.map_batches(df_side, batch_format="pandas")),
        ["token"], attach_df, coalesce=partitions_for())

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_TFIDF_COLS)
        return _topk_per_doc(g, k)

    return grouped_exchange(scored, ["doc_id"], doc_topk)


HEAVY_K = 50

_HH_PARTIAL = {"token": "object", "tf": "int64"}
_HH_COLS = {"token": "object", "total_tf": "int64", "rnk": "int64"}


def heavy_hitters(sf_dir: str, k: int = HEAVY_K):
    """Corpus-wide top-k tokens by total frequency — the canonical
    combiner word count (heavy hitters, exact arm).

    Per-batch ``value_counts`` shrinks each block to its LOCAL vocabulary
    before anything is exchanged (Zipf makes this a huge combiner win:
    the hot tokens collapse to one row per block). The keyed exchange
    then holds each token wholly in one partition, which sums its
    partials and emits only its local top-k — so the final hop carries
    k rows per partition, never the vocabulary. One small task takes the
    global top-k. At 100 TB the only vocabulary-sized structure is the
    hash-partitioned partial set, which streams through the exchange.

    Tie-break pinned: (total_tf DESC, token ASC) — stated identically in
    the SQL window oracle.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        partitions_for,
        sized_aggregate,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+").explode().dropna()
        if toks.empty:
            return typed_empty(_HH_PARTIAL)
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype("object"), "tf": vc.to_numpy(dtype=np.int64)}
        )

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        # complete-key partition: sum this partition's tokens, keep its
        # top-k — the global top-k is a subset of the per-partition ones
        if g.empty:
            return typed_empty(_HH_PARTIAL)
        out = g.groupby("token", as_index=False).agg(tf=("tf", "sum"))
        out = out.sort_values(["tf", "token"], ascending=[False, True],
                              kind="mergesort").head(k)
        return out[list(_HH_PARTIAL)].astype(_HH_PARTIAL)

    agg = sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                          ["token"], part_topk, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_HH_COLS)
        # per-token sum is a no-op on complete-key top-k rows, but keeps
        # `final` exact even if an upstream dispatch ever hands it partials
        out = g.groupby("token", as_index=False).agg(total_tf=("tf", "sum"))
        out = out.sort_values(["total_tf", "token"], ascending=[False, True],
                              kind="mergesort").head(k).reset_index(drop=True)
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[list(_HH_COLS)].astype(_HH_COLS)

    return small_key_aggregate(agg, final)


_RANK_COLS = {"doc_id": "int64", "n_ws_tokens": "int64", "global_rank": "int64"}


def doc_global_rank(sf_dir: str):
    """EXACT global ranking (ROW_NUMBER over the whole corpus, ordered by
    token count then doc_id) WITHOUT a global sort.

    rank(d) = #docs with smaller count + ordinal of d among equal-count
    docs. The first term comes from a count histogram — domain-sized
    (bounded by the longest document, not the corpus), so the cumulative
    offsets are a tiny broadcast. The second term is computed inside a
    count-keyed exchange where each partition holds complete count
    groups: one vectorized mergesort + groupby-cumcount per partition.
    Two small exchanges total; nothing corpus-sized is sorted globally
    or touches the driver. Equal-count skew concentrates a hot count
    value in one partition — same per-key contract as sessionization; a
    100-TB deploy salts the ordinal step by doc_id ranges per count."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        sized_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(dtype=np.int64),
             "n": b["text"].str.count(r"\S+").to_numpy(dtype=np.int64)}
        )

    proj = ds.map_batches(project, batch_format="pandas").materialize()

    _H = {"n": "int64", "cnt": "int64"}

    def hist_part(b: pd.DataFrame) -> pd.DataFrame:
        n, c = np.unique(b["n"].to_numpy(), return_counts=True)
        return pd.DataFrame({"n": n, "cnt": c.astype(np.int64)})

    def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_H)
        return g.groupby("n", as_index=False).agg(cnt=("cnt", "sum")).astype(_H)

    hist = sized_aggregate(proj.map_batches(hist_part, batch_format="pandas"),
                           ["n"], hist_sum).to_pandas().sort_values("n")
    n_vals = hist["n"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(hist["cnt"].to_numpy())[:-1]]).astype(np.int64)
    off_ref = ray.put((n_vals, offsets))

    class Ranker:
        def __init__(self):
            self.n_vals, self.offsets = ray.get(off_ref)

        def __call__(self, p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_RANK_COLS)
            p = p.sort_values(["n", "doc_id"], kind="mergesort")
            ordinal = p.groupby("n", sort=False).cumcount().to_numpy()
            base = self.offsets[np.searchsorted(self.n_vals,
                                                p["n"].to_numpy())]
            return pd.DataFrame(
                {"doc_id": p["doc_id"].to_numpy(),
                 "n_ws_tokens": p["n"].to_numpy(),
                 "global_rank": base + ordinal + 1}
            ).astype(_RANK_COLS)

    return bucketed_aggregate(proj, ["n"], Ranker(),
                              coalesce=partitions_for())


_FUZZ_COLS = {"tok_a": "object", "tok_b": "object", "dist": "int64"}
FUZZ_MAX_DIST = 2


def _lev(a: str, b: str) -> int:
    """Exact Levenshtein (full DP — tokens are short and this runs only
    on neighborhood-join candidates, once per distinct pair)."""
    la, lb = len(a), len(b)
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def _deletion_variants(t: str, k: int) -> set[str]:
    """All strings reachable by ≤ k character deletions (FastSS keys)."""
    frontier = {t}
    out = {t}
    for _ in range(k):
        frontier = {s[:i] + s[i + 1:] for s in frontier for i in range(len(s))}
        out |= frontier
    return out


def fuzzy_token_pairs(sf_dir: str, max_dist: int = FUZZ_MAX_DIST):
    """String-similarity join: every distinct vocabulary pair at
    Levenshtein distance ≤ ``max_dist`` (spelling-variant linking for
    entity canonicalization). FastSS deletion neighborhoods: each
    distinct token emits keys for itself and every ≤max_dist-character
    deletion; any pair within distance d shares a key after deleting the
    ≤d edited positions from each side, so candidates = key-bucket pairs
    and the exact DP check runs once per distinct pair after a
    pair-keyed dedup exchange.
    The vocabulary-sized neighborhood index is the only exchanged
    structure — the corpus never leaves the distinct-token combiner.
    A production deploy caps degenerate buckets (e.g. the ''-variant
    bucket of 1-char tokens) the way dedup caps hot shingles."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    _V = {"token": "object"}

    def vocab_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+").explode().dropna()
        if toks.empty:
            return typed_empty(_V)
        return pd.DataFrame({"token": toks.unique().astype("object")})

    def vocab_dedup(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_V)
        return p.drop_duplicates().astype(_V)

    vocab = bucketed_aggregate(
        ds.map_batches(vocab_partial, batch_format="pandas"),
        ["token"], vocab_dedup, coalesce=partitions_for())

    _NB = {"nb_key": "int64", "token": "object"}

    def neighborhoods(b: pd.DataFrame) -> pd.DataFrame:
        toks, variants = [], []
        for t in b["token"]:
            forms = _deletion_variants(t, max_dist)
            toks.extend([t] * len(forms))
            variants.extend(forms)
        if not toks:
            return typed_empty(_NB)
        return pd.DataFrame({"nb_key": stable_ids(variants),
                             "token": np.asarray(toks, dtype=object)})

    nb = vocab.map_batches(neighborhoods, batch_format="pandas")

    _CAND = {"tok_a": "object", "tok_b": "object"}

    def candidates(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_CAND)
        outs = []
        for _, g in p.groupby("nb_key", sort=False):
            ts = np.sort(g["token"].unique())
            if len(ts) < 2:
                continue
            i, j = np.triu_indices(len(ts), 1)
            outs.append(pd.DataFrame({"tok_a": ts[i], "tok_b": ts[j]}))
        if not outs:
            return typed_empty(_CAND)
        return (pd.concat(outs, ignore_index=True).drop_duplicates()
                .astype(_CAND))

    cand = bucketed_aggregate(nb, ["nb_key"], candidates,
                              coalesce=partitions_for())

    def verify(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_FUZZ_COLS)
        p = p.drop_duplicates()
        d = np.asarray([_lev(a, b) for a, b in zip(p["tok_a"], p["tok_b"])],
                       dtype=np.int64)
        p = p[d <= max_dist].copy()
        p["dist"] = d[d <= max_dist]
        return p[list(_FUZZ_COLS)].astype(_FUZZ_COLS)

    pairs = bucketed_aggregate(cand, ["tok_a", "tok_b"], verify,
                               coalesce=partitions_for())
    return pairs.sort(["tok_a", "tok_b"])


PACK_WINDOW = 256

_PACK_COLS = {"doc_id": "int64", "n_ws_tokens": "int64", "tok_offset": "int64",
              "window_id": "int64", "pos_in_window": "int64"}


def doc_pack_offsets(sf_dir: str, window: int = PACK_WINDOW):
    """LLM sequence packing: assign every document its global token
    offset in doc_id order, and therefore its training window id and
    in-window position (window = {PACK_WINDOW} tokens). The ordered
    prefix sum WITHOUT a global sort:

    1. range-partition on doc_id (a monotone bucket function, so
       partition order IS key order — no sampling needed on an ordered
       integer key),
    2. tiny per-partition token totals → driver computes P prefix
       offsets (P = cluster partitions, not corpus) → broadcast,
    3. each partition mergesorts its own docs and adds its offset.

    Complement of doc_global_rank's histogram trick: that one ranks an
    UNORDERED value domain; this one prefix-sums an ordered key."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(dtype=np.int64),
             "n": b["text"].str.count(r"\S+").to_numpy(dtype=np.int64)}
        )

    proj = ds.map_batches(project, batch_format="pandas").materialize()
    # doc_id span from a cheap column-pruned aggregate (metadata-light)
    lo = int(proj.min("doc_id"))
    hi = int(proj.max("doc_id"))
    n_parts = partitions_for()
    span = max(1, (hi - lo + 1 + n_parts - 1) // n_parts)

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = (b["doc_id"].to_numpy(dtype=np.int64) - lo) // span
        return b

    parted = proj.map_batches(add_part, batch_format="pandas").materialize()

    _T = {"part": "int64", "total": "int64"}

    def totals(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_T)
        return (p.groupby("part", as_index=False).agg(total=("n", "sum"))
                .astype(_T))

    tot = (bucketed_aggregate(parted, ["part"], totals, coalesce=n_parts)
           .to_pandas().sort_values("part"))
    # P rows reach the driver — partition count, never corpus count
    offs = np.zeros(len(tot), dtype=np.int64)
    if len(tot) > 1:
        offs[1:] = np.cumsum(tot["total"].to_numpy())[:-1]
    off_map = dict(zip(tot["part"].astype(np.int64), offs))
    off_ref = ray.put(off_map)

    class Packer:
        def __init__(self):
            self.offs = ray.get(off_ref)

        def __call__(self, p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_PACK_COLS)
            # a hash partition may hold SEVERAL part keys — offset per
            # complete part group, not per partition
            outs = []
            for part, g in p.groupby("part", sort=False):
                g = g.sort_values("doc_id", kind="mergesort")
                base = self.offs[int(part)]
                n = g["n"].to_numpy(dtype=np.int64)
                off = base + np.concatenate([[0], np.cumsum(n)[:-1]])
                outs.append(pd.DataFrame(
                    {"doc_id": g["doc_id"].to_numpy(), "n_ws_tokens": n,
                     "tok_offset": off, "window_id": off // window,
                     "pos_in_window": off % window}))
            return pd.concat(outs, ignore_index=True).astype(_PACK_COLS)

    return bucketed_aggregate(parted, ["part"], Packer(), coalesce=n_parts)


_FCLUST_COLS = {"token": "object", "cluster_id": "int64"}


def fuzzy_token_clusters(sf_dir: str, max_dist: int = FUZZ_MAX_DIST):
    """Entity resolution by composition: the string-similarity join
    (:func:`fuzzy_token_pairs`) feeds the engine's size-aware connected
    components (ops/dedup.clusters_from_pairs — driver union-find small,
    pointer-doubling label propagation large), clustering spelling
    variants transitively. Output: (token, cluster_id) for every token
    in ≥1 fuzzy pair, cluster_id = min stable_id of the variant group —
    exactly the recursive-closure SQL twin's rule. Token names are
    re-attached by one id-keyed exchange (nothing vocabulary-sized
    reaches the driver on the distributed arm)."""
    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.dedup import clusters_from_pairs
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate, partitions_for, typed_empty

    pairs = fuzzy_token_pairs(sf_dir, max_dist).materialize()

    def to_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": stable_ids(list(b["tok_a"])),
                             "b": stable_ids(list(b["tok_b"]))})

    cl = clusters_from_pairs(pairs.map_batches(to_ids, batch_format="pandas"))

    _J = {"k": "int64", "token": "object", "cluster_id": "int64",
          "side": "int64"}

    def cl_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"k": b["doc_id"].to_numpy(dtype=np.int64),
             "token": np.full(n, "", dtype=object),
             "cluster_id": b["cluster_id"].to_numpy(dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_J)

    def map_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = pd.concat([b["tok_a"], b["tok_b"]],
                         ignore_index=True).drop_duplicates()
        return pd.DataFrame(
            {"k": stable_ids(list(toks)),
             "token": toks.to_numpy(dtype=object),
             "cluster_id": np.zeros(len(toks), dtype=np.int64),
             "side": np.ones(len(toks), dtype=np.int64)}).astype(_J)

    def join(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_FCLUST_COLS)
        c = p[p["side"] == 0][["k", "cluster_id"]]
        t = p[p["side"] == 1][["k", "token"]].drop_duplicates()
        m = t.merge(c, on="k")
        return m[list(_FCLUST_COLS)].astype(_FCLUST_COLS)

    u = cl.map_batches(cl_rows, batch_format="pandas").union(
        pairs.map_batches(map_rows, batch_format="pandas"))
    out = bucketed_aggregate(u, ["k"], join, coalesce=partitions_for())
    return out.sort("token")


LM_BROADCAST_LIMIT = 2_000_000
_LM_COLS = {"doc_id": "int64", "n_bigrams": "int64", "logprob_ppm": "int64"}


def _log_ratio_ppm(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """floor(ln(num/den)·1e6) per DISTINCT (num, den) pair via math.log —
    C libm, the same path DuckDB's ln() takes (idf trick generalized)."""
    import math

    pairs = {(int(a), int(b)) for a, b in zip(num, den)}
    lut = {p: int(math.floor(math.log(p[0] / p[1]) * 1_000_000)) for p in pairs}
    return np.asarray([lut[(int(a), int(b))] for a, b in zip(num, den)],
                      dtype=np.int64)


def _doc_bigrams(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, key, w1, tf): per-doc bigram occurrence counts — complete
    per doc (a doc's text lives in one row). Tokens contain no spaces, so
    'w1 w2' is an unambiguous bigram key (the shingle trick)."""
    rows_d, rows_k, rows_w = [], [], []
    for d, t in zip(b["doc_id"], b["text"]):
        ts = ws_tokens(t)
        for w1, w2 in zip(ts, ts[1:]):
            rows_d.append(d)
            rows_k.append(w1 + " " + w2)
            rows_w.append(w1)
    if not rows_d:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "key": pd.Series(dtype="object"),
                             "w1": pd.Series(dtype="object"),
                             "tf": pd.Series(dtype="int64")})
    return (pd.DataFrame({"doc_id": np.asarray(rows_d, dtype=np.int64),
                          "key": rows_k, "w1": rows_w})
            .groupby(["doc_id", "key", "w1"], as_index=False).size()
            .rename(columns={"size": "tf"}))


def lm_doc_logprob(sf_dir: str, broadcast_limit: int = LM_BROADCAST_LIMIT):
    """Bigram language-model scoring per document — the perplexity-style
    quality filter every LLM curation pipeline runs: logprob(doc) =
    Σ floor(ln(c(w1,w2) / c(w1·)) · 1e6) over the doc's bigrams, where
    the counts are CORPUS-wide (two-pass global statistic, the tfidf
    shape). Integer ppm log-probs via per-distinct-ratio libm log keep
    the distributed sums bit-exact against the SQL twin.

    Pass A: per-batch bigram-count combiner → bigram-keyed aggregate
    (the exchange ships distinct (bigram, n) per block, not the token
    stream); c(w1·) derives from the bigram table by a second, much
    smaller aggregate. Pass B is size-aware like tfidf: the (bigram →
    lp) map broadcasts under ``broadcast_limit`` rows; above it the
    occurrence rows meet the stats in a bigram-keyed exchange and a
    doc-keyed aggregate finishes the sums."""
    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        sized_aggregate,
        typed_empty,
    )
    from hebrew_ner_ray.runtime import default_concurrency

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    _C12 = {"key": "object", "w1": "object", "c12": "int64"}

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = _doc_bigrams(b)
        if g.empty:
            return typed_empty(_C12)
        out = (g.groupby(["key", "w1"], as_index=False).agg(c12=("tf", "sum")))
        return out[list(_C12)].astype(_C12)

    def count_reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_C12)
        return (g.groupby(["key", "w1"], as_index=False).agg(c12=("c12", "sum"))
                [list(_C12)].astype(_C12))

    c12 = sized_aggregate(ds.map_batches(count_partial, batch_format="pandas"),
                          ["key"], count_reduce,
                          coalesce=partitions_for()).materialize()
    n_keys = c12.count()

    def doc_reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_LM_COLS)
        out = g.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"), logprob_ppm=("logprob_ppm", "sum"))
        return out[list(_LM_COLS)].astype(_LM_COLS)

    if n_keys <= broadcast_limit:
        pdf = c12.to_pandas()
        c1 = pdf.groupby("w1")["c12"].sum()
        lp = _log_ratio_ppm(pdf["c12"].to_numpy(),
                            c1.loc[pdf["w1"]].to_numpy())
        lp_ref = ray.put(dict(zip(pdf["key"], lp)))

        class Scorer:
            def __init__(self):
                self.lp = ray.get(lp_ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                g = _doc_bigrams(b)
                if g.empty:
                    return typed_empty(_LM_COLS)
                # every doc bigram exists in the corpus map by construction
                g["lp"] = np.asarray([self.lp[k] for k in g["key"]],
                                     dtype=np.int64) * g["tf"].to_numpy()
                out = g.groupby("doc_id", as_index=False).agg(
                    n_bigrams=("tf", "sum"), logprob_ppm=("lp", "sum"))
                return out[list(_LM_COLS)].astype(_LM_COLS)

        return ds.map_batches(Scorer, batch_format="pandas",
                              concurrency=default_concurrency())

    # exchange arm: c1 table → attach to c12 on w1 → lp per bigram →
    # attach lp to occurrences on key → doc-keyed sums
    _C1 = {"w1": "object", "c1": "int64"}

    def c1_reduce(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_C1)
        return (g.groupby("w1", as_index=False).agg(c1=("c12", "sum"))
                [list(_C1)].astype(_C1))

    _W = {"w1": "object", "key": "object", "c12": "int64", "c1": "int64",
          "side": "int64"}

    def c12_w_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"w1": b["w1"], "key": b["key"], "c12": b["c12"],
             "c1": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_W)

    def c1_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"w1": b["w1"], "key": np.full(n, "", dtype=object),
             "c12": np.zeros(n, dtype=np.int64), "c1": b["c1"],
             "side": np.ones(n, dtype=np.int64)}).astype(_W)

    c1_tbl = bucketed_aggregate(
        c12.map_batches(lambda b: b[["w1", "c12"]], batch_format="pandas"),
        ["w1"], c1_reduce, coalesce=partitions_for())

    _LP = {"key": "object", "lp": "int64"}

    def attach_c1(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_LP)
        c = p[p["side"] == 1][["w1", "c1"]]
        e = p[p["side"] == 0][["w1", "key", "c12"]]
        m = e.merge(c, on="w1")
        if m.empty:
            return typed_empty(_LP)
        return pd.DataFrame(
            {"key": m["key"],
             "lp": _log_ratio_ppm(m["c12"].to_numpy(),
                                  m["c1"].to_numpy())}).astype(_LP)

    lp_tbl = bucketed_aggregate(
        c12.map_batches(c12_w_rows, batch_format="pandas").union(
            c1_tbl.map_batches(c1_rows, batch_format="pandas")),
        ["w1"], attach_c1, coalesce=partitions_for())

    _O = {"key": "object", "doc_id": "int64", "tf": "int64", "lp": "int64",
          "side": "int64"}

    def occ_rows(b: pd.DataFrame) -> pd.DataFrame:
        g = _doc_bigrams(b)
        n = len(g)
        return pd.DataFrame(
            {"key": g["key"], "doc_id": g["doc_id"], "tf": g["tf"],
             "lp": np.zeros(n, dtype=np.int64),
             "side": np.zeros(n, dtype=np.int64)}).astype(_O)

    def lp_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"key": b["key"], "doc_id": np.zeros(n, dtype=np.int64),
             "tf": np.zeros(n, dtype=np.int64), "lp": b["lp"],
             "side": np.ones(n, dtype=np.int64)}).astype(_O)

    _DP = {"doc_id": "int64", "n_bigrams": "int64", "logprob_ppm": "int64"}

    def attach_lp(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_DP)
        lps = p[p["side"] == 1][["key", "lp"]]
        occ = p[p["side"] == 0][["key", "doc_id", "tf"]]
        m = occ.merge(lps, on="key")
        if m.empty:
            return typed_empty(_DP)
        m["logprob_ppm"] = m["lp"].to_numpy() * m["tf"].to_numpy()
        # per-partition doc partials — the doc exchange finishes the sum
        out = m.groupby("doc_id", as_index=False).agg(
            n_bigrams=("tf", "sum"), logprob_ppm=("logprob_ppm", "sum"))
        return out[list(_DP)].astype(_DP)

    doc_partials = bucketed_aggregate(
        ds.map_batches(occ_rows, batch_format="pandas").union(
            lp_tbl.map_batches(lp_rows, batch_format="pandas")),
        ["key"], attach_lp, coalesce=partitions_for())

    return bucketed_aggregate(doc_partials, ["doc_id"], doc_reduce,
                              coalesce=partitions_for())


PMI_MIN_COUNT = 5
PMI_K = 30
_PMI_COLS = {"w1": "object", "w2": "object", "c12": "int64",
             "pmi_ppm": "int64", "rnk": "int64"}


def collocations_pmi(sf_dir: str, k: int = PMI_K,
                     min_count: int = PMI_MIN_COUNT):
    """Top-k collocations by pointwise mutual information:
    pmi = floor(ln(double(c12·T) / double(c1·c2)) · 1e6) for bigrams with
    c12 ≥ ``min_count`` (T = total bigrams, c1/c2 = first/second-slot
    marginals). Fully distributed, no broadcast: the bigram-keyed count
    aggregate stays sharded; the two marginal tables meet it in one
    w1-keyed then one w2-keyed exchange; each partition emits its local
    top-k and one small task finishes. Both float casts pinned: numerator
    and denominator are each rounded to DOUBLE before the divide, the
    same expression the SQL twin states."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        sized_aggregate,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    _B = {"w1": "object", "w2": "object", "c12": "int64"}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = _doc_bigrams(b)
        if g.empty:
            return typed_empty(_B)
        g["w2"] = [key.split(" ", 1)[1] for key in g["key"]]
        return (g.groupby(["w1", "w2"], as_index=False).agg(c12=("tf", "sum"))
                [list(_B)].astype(_B))

    def reduce_b(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_B)
        return (g.groupby(["w1", "w2"], as_index=False).agg(c12=("c12", "sum"))
                [list(_B)].astype(_B))

    c12 = sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                          ["w1", "w2"], reduce_b,
                          coalesce=partitions_for()).materialize()
    total = int(c12.sum("c12") or 0)
    if total == 0:
        return c12.map_batches(
            lambda b: pd.DataFrame({c: pd.Series(dtype=t)
                                    for c, t in _PMI_COLS.items()}),
            batch_format="pandas")

    def marginal(col: str, out: str):
        _M = {col: "object", out: "int64"}

        def red(g: pd.DataFrame) -> pd.DataFrame:
            if g.empty:
                return typed_empty(_M)
            return (g.groupby(col, as_index=False).agg(**{out: ("c12", "sum")})
                    [list(_M)].astype(_M))

        return bucketed_aggregate(
            c12.map_batches(lambda b: b[[col, "c12"]], batch_format="pandas"),
            [col], red, coalesce=partitions_for())

    c1_tbl = marginal("w1", "c1")
    c2_tbl = marginal("w2", "c2")

    # attach c1 (w1-keyed exchange)
    _A1 = {"w1": "object", "w2": "object", "c12": "int64", "c1": "int64",
           "side": "int64"}

    def bg_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        out = b[["w1", "w2", "c12"]].copy()
        out["c1"] = np.zeros(n, dtype=np.int64)
        out["side"] = np.zeros(n, dtype=np.int64)
        if "c1" in b.columns:
            out["c1"] = b["c1"]
        return out[list(_A1)].astype(_A1)

    def c1_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"w1": b["w1"], "w2": np.full(n, "", dtype=object),
             "c12": np.zeros(n, dtype=np.int64), "c1": b["c1"],
             "side": np.ones(n, dtype=np.int64)}).astype(_A1)

    def join_c1(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_A1)
        m = (p[p["side"] == 0].drop(columns=["c1", "side"])
             .merge(p[p["side"] == 1][["w1", "c1"]], on="w1"))
        m["side"] = np.zeros(len(m), dtype=np.int64)
        return m[list(_A1)].astype(_A1)

    with_c1 = bucketed_aggregate(
        c12.map_batches(bg_rows, batch_format="pandas").union(
            c1_tbl.map_batches(c1_rows, batch_format="pandas")),
        ["w1"], join_c1, coalesce=partitions_for())

    # attach c2 + score + local top-k (w2-keyed exchange)
    _A2 = {"w1": "object", "w2": "object", "c12": "int64", "c1": "int64",
           "c2": "int64", "side": "int64"}

    def wc1_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        out = b[["w1", "w2", "c12", "c1"]].copy()
        out["c2"] = np.zeros(n, dtype=np.int64)
        out["side"] = np.zeros(n, dtype=np.int64)
        return out[list(_A2)].astype(_A2)

    def c2_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {"w1": np.full(n, "", dtype=object), "w2": b["w2"],
             "c12": np.zeros(n, dtype=np.int64),
             "c1": np.zeros(n, dtype=np.int64), "c2": b["c2"],
             "side": np.ones(n, dtype=np.int64)}).astype(_A2)

    def _pmi(c12v: np.ndarray, c1v: np.ndarray, c2v: np.ndarray) -> np.ndarray:
        import math

        trips = {(int(a), int(b), int(c)) for a, b, c in zip(c12v, c1v, c2v)}
        lut = {t: int(math.floor(
            math.log(float(t[0] * total) / float(t[1] * t[2])) * 1_000_000))
            for t in trips}
        return np.asarray([lut[(int(a), int(b), int(c))]
                           for a, b, c in zip(c12v, c1v, c2v)], dtype=np.int64)

    _S = {"w1": "object", "w2": "object", "c12": "int64", "pmi_ppm": "int64"}

    def score_topk(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_S)
        m = (p[p["side"] == 0].drop(columns=["c2", "side"])
             .merge(p[p["side"] == 1][["w2", "c2"]], on="w2"))
        m = m[m["c12"] >= min_count]
        if m.empty:
            return typed_empty(_S)
        m["pmi_ppm"] = _pmi(m["c12"].to_numpy(), m["c1"].to_numpy(),
                            m["c2"].to_numpy())
        m = m.sort_values(["pmi_ppm", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(k)
        return m[list(_S)].astype(_S)

    partials = bucketed_aggregate(
        with_c1.map_batches(wc1_rows, batch_format="pandas").union(
            c2_tbl.map_batches(c2_rows, batch_format="pandas")),
        ["w2"], score_topk, coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_PMI_COLS)
        g = g.sort_values(["pmi_ppm", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[list(_PMI_COLS)].astype(_PMI_COLS)

    return small_key_aggregate(partials, final)


GROUP_HH_K = 10
_GHH_COLS = {"lang": "object", "token": "object", "tf": "int64",
             "rnk": "int64"}


def heavy_hitters_by_lang(sf_dir: str, k: int = GROUP_HH_K):
    """Grouped heavy hitters: the top-k tokens PER language stratum (the
    QUALIFY row_number ≤ k idiom over a two-level key). Per-batch
    (lang, token) value_counts combiner → exchange keyed on BOTH columns
    (complete (lang, token) keys per partition) → per-partition sum →
    per-lang local top-k (k rows per (lang, partition) cross the final
    hop) → one small task ranks within each lang. Tie-break
    (tf DESC, token ASC) pinned in the window oracle."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        partitions_for,
        sized_aggregate,
        small_key_aggregate,
        typed_empty,
    )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    _P = {"lang": "object", "token": "object", "tf": "int64"}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+")
        e = pd.DataFrame({"lang": b["lang"], "token": toks}).explode("token")
        e = e[e["token"].notna()]
        if e.empty:
            return typed_empty(_P)
        return (e.groupby(["lang", "token"], as_index=False).size()
                .rename(columns={"size": "tf"})[list(_P)].astype(_P))

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_P)
        out = g.groupby(["lang", "token"], as_index=False).agg(tf=("tf", "sum"))
        out = out.sort_values(["lang", "tf", "token"],
                              ascending=[True, False, True], kind="mergesort")
        out = out.groupby("lang", sort=False).head(k)
        return out[list(_P)].astype(_P)

    agg = sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                          ["lang", "token"], part_topk,
                          coalesce=partitions_for())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_GHH_COLS)
        out = g.groupby(["lang", "token"], as_index=False).agg(tf=("tf", "sum"))
        out = out.sort_values(["lang", "tf", "token"],
                              ascending=[True, False, True], kind="mergesort")
        out = out.groupby("lang", sort=False).head(k).reset_index(drop=True)
        out["rnk"] = (out.groupby("lang", sort=False).cumcount() + 1
                      ).astype(np.int64)
        return out[list(_GHH_COLS)].astype(_GHH_COLS)

    return small_key_aggregate(agg, final)


CMS_D = 4        # sketch rows (independent hash functions)
CMS_W = 1024     # cells per row
_CMS_COLS = {"token": "object", "exact_tf": "int64", "cms_tf": "int64",
             "overcount": "int64", "rnk": "int64"}


def _cms_cells(tokens, r: int) -> np.ndarray:
    """Row-r CMS cell per token: stable_id('cms{r}|token') mod CMS_W —
    the engine's shared md5 contract, so the SQL twin reproduces every
    cell exactly (collisions included)."""
    from hebrew_ner_ray.kg.ids import stable_ids

    salted = [f"cms{r}|{t}" for t in tokens]
    return (stable_ids(salted) % CMS_W).astype(np.int64)


def cms_heavy_estimate(sf_dir: str, k: int = HEAVY_K):
    """Count-min sketch point queries checked against exact counts — the
    mergeable-sketch pattern with a VALUE oracle (not just a recall
    number): for each of the exact top-k tokens, emit its true frequency,
    its CMS estimate, and the overcount (≥ 0 by construction).

    The sketch is the 100-TB story: every batch folds its local token
    counts into a fixed CMS_D×CMS_W = 4096-cell grid, partials are summed
    by cell (CMS merge = cell-wise add, exactly associative in int64), so
    the exchange carries ≤ 4096 rows per block REGARDLESS of corpus or
    vocabulary size. The exact top-k side reuses :func:`heavy_hitters`
    (its own combiner pipeline); the two tiny results meet in one final
    task that reads each heavy token's CMS_D cells and takes the min.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    _CELL = {"r": "int64", "cell": "int64", "cnt": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def sketch_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+").explode().dropna()
        if toks.empty:
            return typed_empty(_CELL)
        vc = toks.value_counts()
        tokens = vc.index.to_numpy(dtype=object)
        tf = vc.to_numpy(dtype=np.int64)
        grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        for r in range(CMS_D):
            np.add.at(grid[r], _cms_cells(tokens, r), tf)
        r_idx, cells = np.nonzero(grid)
        return pd.DataFrame({"r": r_idx.astype(np.int64),
                             "cell": cells.astype(np.int64),
                             "cnt": grid[r_idx, cells]})

    def merge_cells(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_CELL)
        return (g.groupby(["r", "cell"], as_index=False)["cnt"].sum()
                .astype(_CELL))

    # ≤ 4096 distinct (r, cell) keys → single-task merge, no exchange
    sketch = small_key_aggregate(
        ds.map_batches(sketch_partial, batch_format="pandas"), merge_cells)

    heavy = heavy_hitters(sf_dir, k=k)

    # both sides are tiny (4096 + k rows); side-mark, union, one task
    def mark_sketch(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"token": "", "tf": b["cnt"].astype(np.int64),
                             "rnk": b["r"].astype(np.int64),
                             "cell": b["cell"].astype(np.int64),
                             "side": np.zeros(len(b), dtype=np.int64)})

    def mark_heavy(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"token": b["token"].astype(object),
                             "tf": b["total_tf"].astype(np.int64),
                             "rnk": b["rnk"].astype(np.int64),
                             "cell": np.zeros(len(b), dtype=np.int64),
                             "side": np.ones(len(b), dtype=np.int64)})

    both = (sketch.map_batches(mark_sketch, batch_format="pandas")
            .union(heavy.map_batches(mark_heavy, batch_format="pandas")))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or not (g["side"] == 1).any():
            return typed_empty(_CMS_COLS)
        sk = g[g["side"] == 0]
        grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        grid[sk["rnk"].to_numpy(dtype=np.int64),
             sk["cell"].to_numpy(dtype=np.int64)] = sk["tf"].to_numpy(dtype=np.int64)
        hv = g[g["side"] == 1]
        tokens = hv["token"].to_numpy(dtype=object)
        est = np.min(np.stack([grid[r, _cms_cells(tokens, r)]
                               for r in range(CMS_D)]), axis=0)
        exact = hv["tf"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "token": tokens, "exact_tf": exact, "cms_tf": est,
            "overcount": est - exact,
            "rnk": hv["rnk"].to_numpy(dtype=np.int64),
        }).astype(_CMS_COLS)

    return small_key_aggregate(both, final)


_PARETO_COLS = {"n_chars": "int64", "n_tokens": "int64", "n_docs": "int64",
                "min_doc_id": "int64"}


def _skyline(pts: pd.DataFrame) -> pd.DataFrame:
    """Frontier of (n_chars min, n_tokens max) points: per n_chars keep
    the max-token point, then a running-max sweep over ascending n_chars
    keeps strictly-increasing n_tokens. Distinct points only; dominance
    requires strict improvement on at least one axis, so ties merge
    upstream rather than dominate."""
    best = (pts.sort_values(["n_chars", "n_tokens"], ascending=[True, False],
                            kind="mergesort")
            .drop_duplicates("n_chars", keep="first"))
    t = best["n_tokens"].to_numpy(dtype=np.int64)
    run = np.maximum.accumulate(t)
    keep = np.ones(len(t), dtype=bool)
    keep[1:] = t[1:] > run[:-1]
    return best[keep]


def doc_pareto_frontier(sf_dir: str):
    """Pareto frontier (skyline) of documents on (fewest chars, most
    whitespace tokens) — the densest-documents frontier, a multi-criteria
    top set no single ORDER BY can produce.

    Distributed skyline identity: a globally non-dominated point is
    non-dominated in every batch that contains it, so the global frontier
    is the skyline of the union of per-batch skylines. Each batch groups
    to distinct (n_chars, n_tokens) points (cnt, min doc_id), prunes to
    its local frontier — typically a few dozen points — and only those
    candidates travel; the final task merges counts per point and prunes
    once more. Counts stay exact because a surviving point survives in
    EVERY batch it appears in. The SQL twin states dominance as the
    canonical NOT EXISTS.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = pd.DataFrame({
            "n_chars": b["n_chars"].to_numpy(dtype=np.int64),
            "n_tokens": b["text"].str.count(r"\S+").to_numpy(dtype=np.int64),
            "doc_id": b["doc_id"].to_numpy(dtype=np.int64),
        })
        pts = m.groupby(["n_chars", "n_tokens"], as_index=False).agg(
            n_docs=("doc_id", "size"), min_doc_id=("doc_id", "min"))
        return _skyline(pts)[list(_PARETO_COLS)].astype(_PARETO_COLS)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_PARETO_COLS)
        pts = g.groupby(["n_chars", "n_tokens"], as_index=False).agg(
            n_docs=("n_docs", "sum"), min_doc_id=("min_doc_id", "min"))
        return _skyline(pts)[list(_PARETO_COLS)].astype(_PARETO_COLS)

    return small_key_aggregate(
        ds.map_batches(partial, batch_format="pandas"), final)


KCORE_K = 16
KCORE_MAX_ROUNDS = 64
_KCORE_COLS = {"token": "object", "deg": "int64"}


def text_kcore(sf_dir: str, k: int = KCORE_K, max_rounds: int = KCORE_MAX_ROUNDS):
    """K-core of the token-adjacency graph (nodes = distinct lowercased
    tokens, edges = distinct unordered adjacent-token pairs): iteratively
    peel nodes of degree < k until a FIXED POINT, then emit every
    surviving node with its core degree.

    Peeling runs a driver loop of keyed exchanges — per round one degree
    aggregation and one low-node count; edges incident to low nodes are
    dropped by two side-marked anti-join exchanges (one per endpoint).
    The loop iterates until NO node is below k (never a silent round
    cap — the dedup_clusters lesson: a bounded-round graph algorithm
    whose oracle unrolls the same bound just mirrors its own bug), and
    raises past ``max_rounds`` as a safety bound. The SQL twin unrolls a
    fixed number of peels, which is sound in THIS direction: peeling is
    idempotent at the fixed point, so oracle rounds ≥ engine rounds give
    identical answers (verified at test scale; the engine raising on
    round overflow protects the other direction).
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import (
        bucketed_aggregate,
        partitions_for,
        typed_empty,
    )

    _E = {"a": "object", "b": "object"}
    _D = {"node": "object", "d": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(r"\S+")
        rows_a, rows_b = [], []
        for tk in toks:
            if len(tk) < 2:
                continue
            l = np.asarray(tk, dtype=object)
            x, y = l[:-1], l[1:]
            keep = x != y
            rows_a.append(np.minimum(x[keep], y[keep]))
            rows_b.append(np.maximum(x[keep], y[keep]))
        if not rows_a:
            return typed_empty(_E)
        return (pd.DataFrame({"a": np.concatenate(rows_a),
                              "b": np.concatenate(rows_b)})
                .drop_duplicates().astype(_E))

    def dedup(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_E)
        return p.drop_duplicates().astype(_E)

    edges = bucketed_aggregate(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["a", "b"], dedup, coalesce=partitions_for()).materialize()

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        ends = np.concatenate([b["a"].to_numpy(dtype=object),
                               b["b"].to_numpy(dtype=object)])
        node, cnt = np.unique(ends, return_counts=True)
        return pd.DataFrame({"node": node.astype(object),
                             "d": cnt.astype(np.int64)})

    def deg_reduce(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return typed_empty(_D)
        return p.groupby("node", as_index=False).agg(d=("d", "sum")).astype(_D)

    def degrees(e):
        return bucketed_aggregate(
            e.map_batches(deg_partial, batch_format="pandas"),
            ["node"], deg_reduce, coalesce=partitions_for())

    def drop_low(e, low, endpoint: str):
        """Anti-join: keep edges whose ``endpoint`` is NOT in ``low``."""
        _ROW = {"a": "object", "b": "object", "side": "int64"}

        def e_rows(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"a": b["a"], "b": b["b"],
                                 "side": np.zeros(len(b), dtype=np.int64)})

        def low_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            return pd.DataFrame({
                "a": b["node"] if endpoint == "a" else np.full(n, "", dtype=object),
                "b": b["node"] if endpoint == "b" else np.full(n, "", dtype=object),
                "side": np.ones(n, dtype=np.int64)}).astype(
                    {"a": "object", "b": "object", "side": "int64"})

        def anti(p: pd.DataFrame) -> pd.DataFrame:
            if p.empty:
                return typed_empty(_E)
            bad = set(p.loc[p["side"] == 1, endpoint])
            keep = p[(p["side"] == 0) & ~p[endpoint].isin(bad)]
            return keep[["a", "b"]].astype(_E)

        u = e.map_batches(e_rows, batch_format="pandas").union(
            low.map_batches(low_rows, batch_format="pandas"))
        return bucketed_aggregate(u, [endpoint], anti,
                                  coalesce=partitions_for())

    def below_k(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["d"] < k]

    for _round in range(max_rounds):
        deg = degrees(edges).materialize()
        low = deg.map_batches(below_k, batch_format="pandas").materialize()
        if low.count() == 0:
            break
        edges = drop_low(drop_low(edges, low, "a"), low, "b").materialize()
        if edges.count() == 0:
            break
    else:
        raise RuntimeError(
            f"text_kcore did not converge in {max_rounds} peel rounds")

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return (b.rename(columns={"node": "token", "d": "deg"})
                [list(_KCORE_COLS)].astype(_KCORE_COLS))

    return degrees(edges).map_batches(rename, batch_format="pandas")


SPLIT_TRAIN, SPLIT_VAL = 80, 90  # percent buckets of the md5 space
_SPLIT_COLS = {"doc_id": "int64", "bucket": "int64", "split": "object"}


def corpus_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment — the split every training
    pipeline needs to be REPRODUCIBLE and join-free: bucket =
    stable_id('split|doc_id') mod 100, train < 80 ≤ val < 90 ≤ test.
    Content-addressed like every engine id, so the same doc lands in the
    same split on any cluster, any partitioning, any rerun — and the
    assignment never needs to be stored or shuffled, only recomputed.
    Pure stateless map; the SQL twin recomputes the identical md5."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        bucket = stable_ids([f"split|{i}" for i in ids]) % 100
        split = np.where(bucket < SPLIT_TRAIN, "train",
                         np.where(bucket < SPLIT_VAL, "val", "test"))
        return pd.DataFrame({"doc_id": ids, "bucket": bucket.astype(np.int64),
                             "split": split.astype(object)}).astype(_SPLIT_COLS)

    return ds.map_batches(assign, batch_format="pandas")


_MAD_COLS = {"lang": "object", "n_docs": "int64", "median_chars": "int64",
             "mad_chars": "int64"}


def doc_len_mad_by_lang(sf_dir: str):
    """Grouped robust statistics: per-language median and median absolute
    deviation of document length — the outlier-resistant quality-filter
    pair (median ± c·MAD clipping).

    One streaming pass: the (lang, n_chars) → count histogram partials
    (the token_quantiles trick — the VALUE domain stays tiny at any
    corpus size) merge in one keyed exchange; the finalize derives BOTH
    statistics from the histogram alone — median at rank ceil(N/2), then
    the |v − median| deviation histogram is a re-weighting of the same
    rows, so MAD needs NO second pass over the corpus. Rank semantics
    pinned as (N+1)//2 (1-based) identically in the SQL window twin.
    """
    import ray.data

    from hebrew_ner_ray.ops.shuffle import sized_aggregate, small_key_aggregate, typed_empty

    _HIST = {"lang": "object", "v": "int64", "cnt": "int64"}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"lang": b["lang"].astype(object),
                           "v": b["n_chars"].to_numpy(dtype=np.int64)})
             .groupby(["lang", "v"], as_index=False).size()
             .rename(columns={"size": "cnt"}))
        return g.astype(_HIST)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_HIST)
        return (g.groupby(["lang", "v"], as_index=False)["cnt"].sum()
                .astype(_HIST))

    hist = sized_aggregate(ds.map_batches(partial, batch_format="pandas"),
                           ["lang", "v"], merge)

    def _rank_value(vals: np.ndarray, cnts: np.ndarray) -> int:
        """Smallest value whose cumulative count reaches ceil(N/2)."""
        order = np.argsort(vals, kind="mergesort")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        r = (cum[-1] + 1) // 2
        return int(vals[np.searchsorted(cum, r)])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_MAD_COLS)
        rows = []
        for lang, grp in g.groupby("lang", sort=True):
            v = grp["v"].to_numpy(dtype=np.int64)
            c = grp["cnt"].to_numpy(dtype=np.int64)
            med = _rank_value(v, c)
            mad = _rank_value(np.abs(v - med), c)
            rows.append((lang, int(c.sum()), med, mad))
        return pd.DataFrame(rows, columns=list(_MAD_COLS)).astype(_MAD_COLS)

    return small_key_aggregate(hist, final)


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
BM25_NQ = 3


_BM25_COLS = {"doc_id": "int64", "score_ppm": "int64", "rnk": "int64"}


def bm25_topk(sf_dir: str, k: int = BM25_TOPK, n_query: int = BM25_NQ):
    """BM25 retrieval over the corpus for a deterministic query (the
    top-``n_query`` heavy-hitter tokens — self-contained, no external
    input): the scoring shape every retrieval-augmented data pipeline
    runs at corpus scale.

    Lucene idf form (ln(1 + (N − df + ½)/(df + ½)) — non-negative even
    for stopword-frequent terms), floored to integer ppm PER TERM before
    summation so distributed sums are exact; the tf normalization
    (k1 = 1.2, b = 0.75) is the identical float64 expression on both
    sides, so floor rounding agrees bit-for-bit. Three streaming passes:
    (1) the heavy-hitter query terms (existing combiner pipeline),
    (2) per-doc (dl, per-term tf) projection + tiny (N, T, df) stats,
    (3) broadcast-stats scoring with per-partition top-k → one final
    task. Nothing corpus-sized reaches the driver."""
    import math

    import ray
    import ray.data

    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    heavy = heavy_hitters(sf_dir, k=n_query).to_pandas()
    terms = heavy["token"].tolist()
    if not terms:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({c: pd.Series(dtype=t) for c, t in _BM25_COLS.items()}))

    tf_cols = [f"tf{i}" for i in range(len(terms))]
    _PROJ = {"doc_id": "int64", "dl": "int64",
             **{c: "int64" for c in tf_cols}}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+")
        out = {"doc_id": b["doc_id"].to_numpy(dtype=np.int64),
               "dl": toks.str.len().to_numpy(dtype=np.int64)}
        e = toks.explode()  # one explode, vectorized == per term
        for i, t in enumerate(terms):
            cnt = (e == t).groupby(level=0).sum()
            out[tf_cols[i]] = cnt.reindex(toks.index, fill_value=0
                                          ).to_numpy(dtype=np.int64)
        return pd.DataFrame(out).astype(_PROJ)

    proj = ds.map_batches(project, batch_format="pandas").materialize()

    _ST = {"n": "int64", "tt": "int64", **{f"df{i}": "int64"
                                           for i in range(len(terms))}}

    def stat_partial(b: pd.DataFrame) -> pd.DataFrame:
        row = {"n": [np.int64(len(b))], "tt": [np.int64(b["dl"].sum())]}
        for i, c in enumerate(tf_cols):
            row[f"df{i}"] = [np.int64((b[c] > 0).sum())]
        return pd.DataFrame(row)

    def stat_merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_ST)
        return pd.DataFrame({c: [np.int64(g[c].sum())] for c in _ST}).astype(_ST)

    st = small_key_aggregate(
        proj.map_batches(stat_partial, batch_format="pandas"), stat_merge
    ).to_pandas()
    n, tt = int(st["n"].iloc[0]), int(st["tt"].iloc[0])
    # math.log(1.0 + x), NOT log1p: the SQL twin computes ln(1 + x) and
    # the two can differ in the last ulp, flipping the ppm floor
    idf_ppm = [np.int64(math.floor(
        math.log(1.0 + (n - int(st[f"df{i}"].iloc[0]) + 0.5)
                 / (int(st[f"df{i}"].iloc[0]) + 0.5)) * 1_000_000))
        for i in range(len(terms))]
    params = ray.put((idf_ppm, n, tt, BM25_K1, BM25_B))

    class Score:
        def __init__(self):
            self.idf, self.n, self.tt, self.k1, self.b = ray.get(params)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            dl = batch["dl"].to_numpy(dtype=np.int64)
            norm = self.k1 * ((1.0 - self.b)
                              + self.b * (dl * self.n / self.tt))
            score = np.zeros(len(batch), dtype=np.int64)
            for i, c in enumerate(tf_cols):
                tf = batch[c].to_numpy(dtype=np.int64)
                s = np.floor(self.idf[i] * tf * (self.k1 + 1.0)
                             / (tf + norm)).astype(np.int64)
                score += np.where(tf > 0, s, 0)
            out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                                "score_ppm": score})
            out = out[out["score_ppm"] > 0]
            # per-partition top-k: global top-k ⊆ union of local top-ks
            return (out.sort_values(["score_ppm", "doc_id"],
                                    ascending=[False, True], kind="mergesort")
                    .head(k).reset_index(drop=True))

    from hebrew_ner_ray.runtime import default_concurrency

    cands = proj.map_batches(Score, batch_format="pandas",
                             concurrency=default_concurrency())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_BM25_COLS)
        g = (g.sort_values(["score_ppm", "doc_id"],
                           ascending=[False, True], kind="mergesort")
             .head(k).reset_index(drop=True))
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[list(_BM25_COLS)].astype(_BM25_COLS)

    return small_key_aggregate(cands, final)


_ENT_COLS = {"doc_id": "int64", "n_tokens": "int64", "entropy_ppm": "int64"}


def text_entropy(sf_dir: str):
    """Per-document unigram entropy (nats, integer ppm) — the
    distribution-shape quality signal (near-zero entropy = degenerate
    repetition). H = Σ_distinct floor(c · ln(n/c) · 1e6 / n): the floor
    is applied PER DISTINCT TOKEN so the sum is an exact integer sum,
    and the ln argument/multiplier order matches the SQL twin
    expression exactly (the lm_doc_logprob contract). Stateless
    vectorized map — no corpus statistic, no exchange."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import typed_empty

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def run(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+")
        e = pd.DataFrame({
            "doc_id": np.repeat(b["doc_id"].to_numpy(dtype=np.int64),
                                toks.str.len().to_numpy(dtype=np.int64)),
            "token": np.concatenate([np.asarray(t, dtype=object)
                                     for t in toks if len(t)]
                                    ) if toks.str.len().sum() else
                     np.empty(0, dtype=object),
        })
        if e.empty:
            return typed_empty(_ENT_COLS)
        c = (e.groupby(["doc_id", "token"], as_index=False).size()
             .rename(columns={"size": "c"}))
        n = c.groupby("doc_id")["c"].transform("sum").to_numpy(dtype=np.int64)
        cc = c["c"].to_numpy(dtype=np.int64)
        term = np.floor(cc * np.log(n * 1.0 / cc) * 1_000_000.0 / n
                        ).astype(np.int64)
        out = (pd.DataFrame({"doc_id": c["doc_id"], "n_tokens": n,
                             "entropy_ppm": term})
               .groupby("doc_id", as_index=False)
               .agg(n_tokens=("n_tokens", "first"),
                    entropy_ppm=("entropy_ppm", "sum")))
        return out[list(_ENT_COLS)].astype(_ENT_COLS)

    return ds.map_batches(run, batch_format="pandas")


_REP_COLS = {"doc_id": "int64", "n_trigrams": "int64", "dup_trigram_ppm": "int64",
             "top_token_ppm": "int64"}


def text_repetition(sf_dir: str):
    """Gopher-style repetition signals per document: the fraction of
    token-trigram occurrences that are repeats (1 − distinct/total) and
    the most-frequent-token share — the two cheapest high-precision
    filters for boilerplate and degenerate generations. Integer ppm via
    the same floor((a·1e6)/b) both sides; docs shorter than 3 tokens
    report n_trigrams = 0 and dup ppm 0. Stateless map."""
    import ray.data

    from hebrew_ner_ray.ops.shuffle import typed_empty

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def run(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        doc_ids = b["doc_id"].to_numpy(dtype=np.int64)
        n3 = np.maximum(lens - 2, 0)
        out = pd.DataFrame({"doc_id": doc_ids, "n_trigrams": n3})
        if lens.sum() == 0:
            out["dup_trigram_ppm"] = np.int64(0)
            out["top_token_ppm"] = np.int64(0)
            return out[list(_REP_COLS)].astype(_REP_COLS)
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)])
        docrep = np.repeat(doc_ids, lens)
        # most-frequent-token share, fully vectorized
        topc = (pd.DataFrame({"d": docrep, "t": flat})
                .groupby(["d", "t"]).size().groupby(level=0).max())
        top = pd.Series(doc_ids).map(topc).fillna(0).to_numpy(dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out["top_token_ppm"] = np.where(
                lens > 0, np.floor(top * 1_000_000.0
                                   / np.maximum(lens, 1)), 0).astype(np.int64)
        # distinct trigrams per doc: shifted key columns, doc-boundary mask
        same = (docrep[:-2] == docrep[1:-1]) & (docrep[1:-1] == docrep[2:])
        # ' ' is a safe join char: tokens are \S+ so no token contains it
        key = (pd.Series(flat[:-2]) + " " + pd.Series(flat[1:-1])
               + " " + pd.Series(flat[2:]))
        d3 = (pd.DataFrame({"d": docrep[:-2][same],
                            "k": key.to_numpy(dtype=object)[same]})
              .drop_duplicates().groupby("d").size())
        dd = pd.Series(doc_ids).map(d3).fillna(0).to_numpy(dtype=np.int64)
        out["dup_trigram_ppm"] = np.where(
            n3 > 0, np.floor((n3 - dd) * 1_000_000.0 / np.maximum(n3, 1)),
            0).astype(np.int64)
        return out[list(_REP_COLS)].astype(_REP_COLS)

    return ds.map_batches(run, batch_format="pandas")


_CARD_COLS = {"n_docs": "int64", "n_empty": "int64", "n_tokens": "int64",
              "mean_tokens_milli": "int64", "vocab_kmv": "int64",
              "n_langs": "int64"}


def corpus_card(sf_dir: str):
    """One-row dataset card — the summary every published training corpus
    ships: doc/empty counts, token totals, mean length (milli), KMV
    vocabulary estimate, language count. ONE streaming pass; each batch
    folds to a fixed-size partial (counts + k smallest token hashes +
    the tiny distinct-lang set), merged associatively in a single task.
    The KMV and tokenization contracts are the text_distinct_kmv ones."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids
    from hebrew_ner_ray.ops.shuffle import small_key_aggregate, typed_empty

    _HASH_SPACE = 1 << 60
    _P = {"n_docs": "int64", "n_empty": "int64", "n_tokens": "int64",
          "hashes": "object", "langs": "object"}

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        vocab = sorted({t for l in toks for t in l})
        h = np.unique(stable_ids(vocab))[:KMV_K] if vocab else \
            np.empty(0, dtype=np.int64)
        return pd.DataFrame({
            "n_docs": [np.int64(len(b))],
            "n_empty": [np.int64((lens == 0).sum())],
            "n_tokens": [np.int64(lens.sum())],
            "hashes": [h.astype(np.int64)],
            "langs": [sorted(set(b["lang"]))],
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return typed_empty(_CARD_COLS)
        h = np.unique(np.concatenate(list(g["hashes"])))[:KMV_K]
        if len(h) < KMV_K:
            vocab = np.int64(len(h))
        else:
            vocab = np.int64((KMV_K - 1) * _HASH_SPACE // int(h[KMV_K - 1]))
        n_docs = np.int64(g["n_docs"].sum())
        n_tok = np.int64(g["n_tokens"].sum())
        return pd.DataFrame({
            "n_docs": [n_docs], "n_empty": [np.int64(g["n_empty"].sum())],
            "n_tokens": [n_tok],
            "mean_tokens_milli": [np.int64(n_tok * 1000 // n_docs)
                                  if n_docs else np.int64(0)],
            "vocab_kmv": [vocab],
            "n_langs": [np.int64(len(set().union(*g["langs"])))],
        }).astype(_CARD_COLS)

    return small_key_aggregate(
        ds.map_batches(partial, batch_format="pandas"), final)


WINNOW_K = 8  # character k-gram width
WINNOW_W = 4  # winnowing window (consecutive gram hashes per min)
_WINNOW_COLS = {"doc_id": "int64", "fp": "int64"}


def winnow_fingerprints(sf_dir: str, k: int = WINNOW_K, w: int = WINNOW_W):
    """Document fingerprinting by winnowing (the MOSS primitive): hash
    every character k-gram, slide a w-window over the hash sequence,
    keep each window's minimum, emit the DISTINCT minima per doc. Docs
    shorter than k produce no fingerprints. Tail windows (fewer than w
    grams) still contribute their min — mirrored exactly by the SQL
    twin's ``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`` frame.

    Pure per-doc map (a doc's text is one row, so the distinct set is
    batch-local) — no exchange anywhere; output streams to the sink."""
    import ray.data

    from hebrew_ner_ray.kg.ids import stable_ids

    def fps(b: pd.DataFrame) -> pd.DataFrame:
        from hebrew_ner_ray.ops.shuffle import typed_empty

        ids_out, fp_out = [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            n = len(text)
            if n < k:
                continue
            h = stable_ids([text[i:i + k] for i in range(n - k + 1)])
            pad = np.concatenate([h, np.full(w - 1, np.iinfo(np.int64).max)])
            mins = np.lib.stride_tricks.sliding_window_view(pad, w).min(axis=1)
            u = np.unique(mins)
            ids_out.append(np.full(len(u), np.int64(doc_id)))
            fp_out.append(u)
        if not ids_out:
            return typed_empty(_WINNOW_COLS)
        return pd.DataFrame({"doc_id": np.concatenate(ids_out),
                             "fp": np.concatenate(fp_out)}).astype(_WINNOW_COLS)

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fps, batch_format="pandas")
