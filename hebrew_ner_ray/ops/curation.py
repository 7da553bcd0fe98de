"""Corpus curation — the composite training-data pipeline: quality
filter → exact-dup removal → near-dup removal, fully distributed.

Scale shape (the 100-TB contract):
- Exact-canonical selection is a bucketed aggregate on the content hash,
  NOT a driver-side keep-set: each batch emits at most one row per
  distinct text (batch-local min-doc combiner), the bucketed reduce picks
  the global min, and the quality decision rides along on the surviving
  row. Nothing of corpus cardinality ever leaves the cluster.
- Only the near-dup LOSER set is broadcast (docs appearing in a jaccard
  cluster under a different head) — bounded by the number of near-dup
  pairs, which LSH/threshold pruning keeps tiny relative to the corpus.
"""

from __future__ import annotations

import pandas as pd

_CURATE_COLS = {"doc_id": "int64", "n_tokens": "int64"}


def curated_docs(sf_dir: str):
    """(doc_id, n_tokens) of documents that survive curation:

    - canonical representative of their exact-text group (min doc_id over
      ALL docs — a low-quality canonical does NOT promote a dup)
    - quality_ok (ops/textstats.py rules)
    - not a near-dup cluster loser (cluster member under another head)
    """
    import hashlib

    import ray
    import ray.data

    from hebrew_ner_ray.ops.dedup import dedup_clusters
    from hebrew_ner_ray.ops.shuffle import bucketed_aggregate
    from hebrew_ner_ray.ops.textstats import quality_batch

    # near-dup losers: genuinely small (only docs in >=1 near-dup pair)
    clusters = dedup_clusters(sf_dir).to_pandas()
    near_losers = set(
        clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"].astype(int)
    )
    losers_ref = ray.put(near_losers)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    from hebrew_ner_ray.ops.shuffle import typed_empty

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        """Quality fields + content hash, combined batch-locally: only the
        min-doc row per hash can ever be the global canonical."""
        q = quality_batch(b)
        q["text_hash"] = [hashlib.md5(t.encode()).hexdigest() for t in b["text"]]
        q = q.sort_values("doc_id", kind="stable").drop_duplicates("text_hash")
        return q[["text_hash", "doc_id", "n_tokens", "quality_ok"]]

    partials = ds.map_batches(partial, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket: global canonical per hash, then quality + near-dup
        filters. Loser set read from the object store (zero re-ship: the
        ref travels in the closure, the set lives in plasma once)."""
        if g.empty:
            return typed_empty(_CURATE_COLS)
        near_losers = ray.get(losers_ref)
        g = g.sort_values("doc_id", kind="stable").drop_duplicates("text_hash")
        keep = (g["quality_ok"] == 1) & ~g["doc_id"].isin(near_losers)
        out = g.loc[keep, ["doc_id", "n_tokens"]].astype("int64")
        if out.empty:  # schema-stable empty block
            return typed_empty(_CURATE_COLS)
        return out

    return bucketed_aggregate(partials, ["text_hash"], finish, coalesce=32)
