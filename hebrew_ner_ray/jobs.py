"""Job entrypoint for ``ray job submit`` — the north rule's cluster
execution surface.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m hebrew_ner_ray.jobs --pipeline kg \
            --sf-dir s3://bucket/corpus --out-dir s3://bucket/graph \
            --n-partitions 256

The module owns its Ray session when run as ``__main__`` (connecting to
the cluster via RAY_ADDRESS, which ``ray job submit`` sets); as a library
import it never initializes Ray. The resumable path writes per-partition
checkpoints with lineage manifests (state/checkpoint.py), so re-submitting
the same job after a node loss skips completed partitions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_job(args: argparse.Namespace) -> dict:
    from hebrew_ner_ray.config import build_pipeline

    cfg = {
        "pipeline": args.pipeline,
        "sf_dir": args.sf_dir,
        "replicas": str(args.replicas),
    }
    if args.out_dir:
        cfg["out_dir"] = args.out_dir
    if args.n_partitions:
        cfg["n_partitions"] = str(args.n_partitions)
    if args.emit:
        cfg["emit"] = args.emit

    import pandas as pd

    t0 = time.perf_counter()
    result = build_pipeline(cfg)
    if isinstance(result, tuple):  # (nodes, edges) datasets
        counts = {"nodes": result[0].count(), "edges": result[1].count()}
    elif isinstance(result, str):  # sink path
        counts = {"out_dir": result}
    elif isinstance(result, pd.DataFrame):  # driver-side result (eval_vs_gold)
        counts = {"rows": len(result), "result": result.to_dict("records")}
    else:  # ray Dataset
        counts = {"rows": result.count()}
    return {
        "pipeline": args.pipeline,
        "sf_dir": args.sf_dir,
        "sec": round(time.perf_counter() - t0, 3),
        **counts,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="hebrew_ner_ray job entrypoint")
    parser.add_argument("--pipeline", default="kg",
                        choices=["ner", "crf", "kg", "kg_resumable", "curation",
                                 "eval_vs_gold"])
    parser.add_argument("--sf-dir", required=True)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--emit", default=None)
    parser.add_argument("--replicas", type=int, default=1)
    parser.add_argument("--n-partitions", type=int, default=None)
    args = parser.parse_args(argv)
    if args.pipeline == "kg_resumable" and not args.out_dir:
        parser.error("--pipeline kg_resumable requires --out-dir (checkpoint root)")
    # reject flags the selected pipeline would silently ignore — an
    # operator believing an 8-replica run happened when it didn't is worse
    # than an up-front error
    applicable = {
        "ner": {"emit", "replicas"},
        "crf": {"replicas"},
        "kg": {"replicas", "out_dir"},
        "kg_resumable": {"replicas", "out_dir", "n_partitions"},
        "curation": set(),
        "eval_vs_gold": set(),
    }[args.pipeline]
    given = {name for name, default in
             [("emit", None), ("out_dir", None), ("n_partitions", None), ("replicas", 1)]
             if getattr(args, name) != default}
    extra = given - applicable
    if extra:
        parser.error(f"--{'/--'.join(sorted(extra))} not applicable to "
                     f"--pipeline {args.pipeline}")

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; locally
        # this starts a sandbox session
        ray.init(include_dashboard=False)
    import hebrew_ner_ray

    hebrew_ner_ray.enable_hash_shuffle()
    try:
        print(json.dumps(run_job(args)))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
