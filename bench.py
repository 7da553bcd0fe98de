"""Benchmark harness.

Runs the headline KG-construction pipeline plus representative per-family
pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
JSON line. ``--scaling`` runs the headline job at two parallelism levels
in fresh processes (the sandbox stand-in for N vs 4N node clusters) and
reports throughputs + scaling efficiency.

This script OWNS its Ray session (ray.init/shutdown); library code never
initializes Ray.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# replicate the doc ids so the headline job is a meaningful corpus
# (sf0.1 → 5000 base docs × 40 = 200k docs ≈ 880k spans)
REPLICAS = int(os.environ.get("GRAFT_REPLICAS", "40"))


def _burn(n: int) -> int:
    # module-level: ProcessPoolExecutor must pickle it by reference
    s = 0
    for i in range(n):
        s += i * i
    return s


def host_parallel_efficiency(workers: int = NUM_CPUS) -> float:
    """~2 s probe of the sandbox host's ACTUAL parallel capacity: the
    wall-time ratio of one CPU-burn task vs ``workers`` identical tasks
    run concurrently. 1.0 = uncontended; well below 1.0 means external
    neighbor load is stealing cores and every timing in this report is
    inflated by roughly that factor (measured as low as 0.26 on this
    sandbox). Recorded so BENCH numbers are comparable across rounds."""
    import concurrent.futures as cf

    n = 5_000_000
    t0 = time.perf_counter()
    _burn(n)
    one = time.perf_counter() - t0
    with cf.ProcessPoolExecutor(workers) as ex:
        t0 = time.perf_counter()
        list(ex.map(_burn, [n] * workers))
        par = time.perf_counter() - t0
    return round(one / par, 3)


def run_benchmarks() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import hebrew_ner_ray

    hebrew_ner_ray.enable_hash_shuffle()
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from hebrew_ner_ray.pipelines.kg import annotated, build_graph, text_spans

    # warm the page cache so we measure compute + shuffle, not first disk read
    _ = text_spans(SF_DIR).count()

    timings: dict[str, float] = {}
    n_docs = 0

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # headline: full KG build — single annotation pass (emit='kg'), combined
    # streaming partials, sorted node/edge output
    def kg_build():
        nodes, edges = build_graph(SF_DIR, replicas=REPLICAS)
        return nodes.count(), edges.count()

    timed("kg_build", kg_build)
    from hebrew_ner_ray.sources.interleaved import read_interleaved

    n_docs = read_interleaved(SF_DIR, replicas=REPLICAS).count()

    # non-degenerate variant: every sentence distinct AND entity keys
    # scaled to the corpus (docs/16 distinct פלוני entities) — measures the
    # pipeline with a realistic cache-hit rate and aggregate cardinality
    def kg_build_mixed():
        nodes, edges = build_graph(SF_DIR, replicas=REPLICAS, diversify=True,
                                   entity_mix=max(64, n_docs // 16),
                                   concurrency=max(2, NUM_CPUS * 7 // 8))
        return nodes.count(), edges.count()

    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        timed("kg_build_mixed", kg_build_mixed)

    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        ray.shutdown()
        headline = timings["kg_build"]
        return {
            "metric": "kg_build_sec", "value": headline, "unit": "sec",
            "queries": timings, "sf": SF_DIR, "num_cpus": NUM_CPUS,
            "replicas": REPLICAS, "docs": n_docs,
            "docs_per_sec": round(n_docs / headline, 1) if headline else None,
            "host_parallel_efficiency": host_parallel_efficiency(),
        }

    # cache-defeating variant: every sentence distinct → true per-sentence
    # tagger throughput (the 16-template corpus otherwise amortizes to
    # payload replication). Fixed pool: autoscaling ramps too slowly for
    # compute-heavy batches.
    def kg_diverse():
        return annotated(SF_DIR, "mentions", replicas=REPLICAS,
                         diversify=True, concurrency=max(2, NUM_CPUS * 7 // 8),
                         batch_size=2048).count()  # smaller batches balance
                         # the pool when per-batch compute is heavy

    timed("annotate_diverse", kg_diverse)

    # per-family representatives
    def q_hybrid():
        return annotated(SF_DIR, "hybrid", replicas=4).count()

    timed("hybrid_tag", q_hybrid)

    from hebrew_ner_ray.ops.dedup import dedup_jaccard
    timed("dedup_jaccard", lambda: dedup_jaccard(SF_DIR).count())

    from hebrew_ner_ray.ops.similarity import ann_topk
    timed("ann_topk", lambda: ann_topk(SF_DIR).count())

    from hebrew_ner_ray.ops.windows import events_sessions
    timed("events_sessions", lambda: events_sessions(SF_DIR).count())

    from hebrew_ner_ray.ops.relational import pricing_summary
    timed("pricing_summary", lambda: pricing_summary(SF_DIR).count())

    from hebrew_ner_ray.ops.textstats import tfidf_topk
    timed("tfidf_topk", lambda: tfidf_topk(SF_DIR).count())

    from hebrew_ner_ray.ops.relational import local_supplier_revenue
    timed("local_supplier_revenue",
          lambda: local_supplier_revenue(SF_DIR).count())

    from hebrew_ner_ray.ops.windows import events_running_total
    timed("events_running_total",
          lambda: events_running_total(SF_DIR).count())

    from hebrew_ner_ray.ops.textstats import bm25_topk
    timed("text_bm25_topk", lambda: bm25_topk(SF_DIR).count())

    from hebrew_ner_ray.ops.similarity import kmeans_lloyd
    timed("sim_kmeans_lloyd", lambda: kmeans_lloyd(SF_DIR).count())

    # round-4 family representatives
    from hebrew_ner_ray.ops.windows import events_rolling_window
    timed("events_rolling_window",
          lambda: events_rolling_window(SF_DIR).count())

    from hebrew_ner_ray.ops.relational import market_share
    timed("market_share", lambda: market_share(SF_DIR).count())

    ray.shutdown()

    headline = timings["kg_build"]
    return {
        "metric": "kg_build_sec",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicas": REPLICAS,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1) if headline else None,
        "host_parallel_efficiency": host_parallel_efficiency(),
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes."""
    def run(ncpu: int) -> dict:
        # larger corpus for the scaling criterion so steady-state compute
        # dominates fixed startup costs at both parallelism levels
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1")
        env.setdefault("GRAFT_REPLICAS", "800")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "docs_per_sec_lo": r_lo.get("docs_per_sec"),
        "docs_per_sec_hi": r_hi.get("docs_per_sec"),
        "host_parallel_efficiency_lo": r_lo.get("host_parallel_efficiency"),
        "host_parallel_efficiency_hi": r_hi.get("host_parallel_efficiency"),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
