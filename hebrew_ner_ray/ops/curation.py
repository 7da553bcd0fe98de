"""Corpus curation — the composite training-data pipeline: quality
filter → exact-dup removal → near-dup removal, as one streaming pass
with BROADCAST anti-joins (the removal sets are small by construction:
non-canonical exact dups + non-canonical near-dup cluster members), so
no shuffle touches the main corpus.
"""

from __future__ import annotations

import pandas as pd


def curated_docs(sf_dir: str):
    """(doc_id, n_tokens) of documents that survive curation:

    - quality_ok (ops/textstats.py rules)
    - canonical representative of their exact-text group (min doc_id)
    - canonical representative of their near-dup cluster (min doc_id),
      i.e. any doc appearing in a jaccard cluster under its cluster head
      is dropped.
    """
    import ray
    import ray.data

    from hebrew_ner_ray.ops.dedup import dedup_clusters, dedup_exact
    from hebrew_ner_ray.ops.textstats import quality_batch

    # small removal sets, computed once and broadcast
    exact = dedup_exact(sf_dir).to_pandas()
    dup_extra = int(exact["n_dups"].sum()) - len(exact)  # non-canonical exact dups
    clusters = dedup_clusters(sf_dir).to_pandas()
    near_losers = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"])
    exact_keep = set(exact["canonical_doc_id"])
    removal_ref = ray.put((exact_keep, near_losers, dup_extra))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Curate:
        def __init__(self):
            self.exact_keep, self.near_losers, _ = ray.get(removal_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            q = quality_batch(b)
            keep = (
                (q["quality_ok"] == 1)
                & q["doc_id"].isin(self.exact_keep)
                & ~q["doc_id"].isin(self.near_losers)
            )
            out = q.loc[keep, ["doc_id", "n_tokens"]].copy()
            out["doc_id"] = out["doc_id"].astype("int64")
            out["n_tokens"] = out["n_tokens"].astype("int64")
            return out

    return ds.map_batches(Curate, batch_format="pandas", concurrency=(1, 4))
