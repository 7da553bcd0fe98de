"""End-to-end kill-and-resume drill for the checkpointed KG build.

Proves the resumability contract AT BENCH SCALE (not just unit scale):

1. launch ``build_graph_resumable`` over a large replicated corpus in a
   child process;
2. SIGKILL the child after the manifest shows >= ``--kill-after``
   committed partitions but before completion (a real mid-run power
   loss: no atexit, no cleanup);
3. resume in a fresh process and record which partitions actually
   re-ran (the manifest's commit count delta);
4. run a clean build in a separate work dir and assert the resumed
   node/edge tables match it exactly (sorted-frame equality).

Usage:
    python tools/resilience_drill.py [sf_dir] [--replicas N]
        [--partitions P] [--kill-after K] [--cpus C]

Prints one JSON line:
    {"docs": ..., "killed_after_commits": ..., "resumed_partitions": ...,
     "skipped_partitions": ..., "tables_match": true, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
import hebrew_ner_ray
hebrew_ner_ray.enable_hash_shuffle()
from hebrew_ner_ray.pipelines.kg import build_graph_resumable
nodes, edges = build_graph_resumable({sf!r}, {work!r}, n_partitions={parts},
                                     replicas={replicas}, diversify={diversify},
                                     entity_mix={entity_mix})
print("NODES", nodes.count(), "EDGES", edges.count(), flush=True)
ray.shutdown()
"""


def _commit_count(work_dir: str) -> int:
    n = 0
    for emit in ("mentions", "triples"):
        p = os.path.join(work_dir, emit, "manifest.jsonl")
        if os.path.exists(p):
            with open(p) as f:
                n += sum(1 for line in f if line.strip())
    return n


def _run_child(repo, sf, work, parts, replicas, cpus, kill_after=None,
               diversify=False, entity_mix=0):
    code = CHILD.format(repo=repo, sf=sf, work=work, parts=parts,
                        replicas=replicas, cpus=cpus, diversify=diversify,
                        entity_mix=entity_mix)
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, cwd=repo)
    if kill_after is None:
        out, _ = proc.communicate()
        return proc.returncode, out
    # poll the manifests; SIGKILL once enough partitions committed
    while proc.poll() is None:
        if _commit_count(work) >= kill_after:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return -9, ""
        time.sleep(0.25)
    out, _ = proc.communicate()
    return proc.returncode, out  # finished before the kill threshold


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--kill-after", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--diversify", action="store_true")
    ap.add_argument("--entity-mix", type=int, default=0)
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = tempfile.mkdtemp(prefix="drill_")
    work_killed = os.path.join(base, "killed")
    work_clean = os.path.join(base, "clean")

    import pyarrow.parquet as pq

    docs = pq.read_metadata(os.path.join(args.sf_dir, "documents.parquet")).num_rows
    t0 = time.time()

    mix = dict(diversify=args.diversify, entity_mix=args.entity_mix)
    rc, _ = _run_child(repo, args.sf_dir, work_killed, args.partitions,
                       args.replicas, args.cpus, kill_after=args.kill_after, **mix)
    commits_at_kill = _commit_count(work_killed)
    killed = rc == -9
    t_kill = time.time()

    rc2, out2 = _run_child(repo, args.sf_dir, work_killed, args.partitions,
                           args.replicas, args.cpus, **mix)
    commits_after_resume = _commit_count(work_killed)
    t_resume = time.time()

    rc3, out3 = _run_child(repo, args.sf_dir, work_clean, args.partitions,
                           args.replicas, args.cpus, **mix)
    t_clean = time.time()

    # compare the materialized tables of the resumed run vs the clean run
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    def table(work, emit):
        files = []
        for k in range(args.partitions):
            d = os.path.join(work, emit, f"part={k}")
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
        df = ray.data.read_parquet(files).to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    match = True
    for emit in ("mentions", "triples"):
        a, b = table(work_killed, emit), table(work_clean, emit)
        try:
            pd.testing.assert_frame_equal(a, b)
        except AssertionError:
            match = False
    ray.shutdown()

    result = {
        "metric": "resilience_drill",
        "docs": docs * args.replicas,
        "diversify": args.diversify,
        "entity_mix": args.entity_mix,
        "partitions_per_table": args.partitions,
        "killed": killed,
        "commits_at_kill": commits_at_kill,
        "commits_after_resume": commits_after_resume,
        "total_commits_expected": 2 * args.partitions,
        "resumed_partitions": commits_after_resume - commits_at_kill,
        "skipped_partitions": commits_at_kill,
        "tables_match": match,
        "resume_rc": rc2,
        "clean_rc": rc3,
        "kill_run_sec": round(t_kill - t0, 2),
        "resume_sec": round(t_resume - t_kill, 2),
        "clean_sec": round(t_clean - t_resume, 2),
    }
    print(json.dumps(result))
    return 0 if (killed and match and rc2 == 0 and rc3 == 0
                 and commits_after_resume == 2 * args.partitions) else 1


if __name__ == "__main__":
    raise SystemExit(main())
