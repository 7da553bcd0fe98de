"""Per-partition checkpointing + lineage manifest (resumable execution).

Ray Data retries tasks but has no job-level checkpointing; the north rule
requires resumable runs over 10^12 docs. Design (ray_guide §sources &
sinks, SURVEY.md §4):

- The input id-space is split into fixed PARTITIONS (hash buckets of the
  doc id range). Each partition is processed and written independently to
  ``out_dir/part=<k>/`` via an ATOMIC commit: write to ``_tmp-<k>``, fsync,
  rename to the final name, then append a manifest line.
- The manifest (``manifest.jsonl``) records one line per completed
  partition: id, row count, wall time, and the engine/gazetteer version —
  the lineage needed to audit or invalidate a partition.
- On resume, completed partitions are anti-joined away (set difference on
  the manifest) and only the remainder runs. A crashed partition leaves
  only a ``_tmp`` directory, which is ignored and overwritten.

Each partition is itself a streaming Ray Data pipeline — the checkpoint
granularity bounds lost work, not parallelism (inside a partition the
streaming executor still fans out over all cores).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Iterable, List

MANIFEST = "manifest.jsonl"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def completed_partitions(out_dir: str, version: str | None = None,
                         lineage: dict | None = None) -> set[int]:
    """Partitions with a fully-written manifest line MATCHING the current
    run's ``version`` and ``lineage`` (when given): a line committed under
    different inputs/parameters does NOT count as done, so changing the
    corpus, replicas, or bumping version forces those partitions to
    rebuild (and atomically overwrite) instead of silently reusing stale
    data.

    A torn/partial trailing line (crash between ``write`` and ``fsync``)
    is SKIPPED, not fatal: the data rename happens before the manifest
    append, so an uncommitted partition simply reruns and overwrites —
    a brittle read path here would permanently brick resume, defeating
    the durability the write path pays for."""
    path = _manifest_path(out_dir)
    last: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    last[rec["partition"]] = rec  # LAST commit wins: the
                    # on-disk data is whatever the most recent rebuild
                    # wrote, so only the newest line may vouch for it
                except (json.JSONDecodeError, KeyError):
                    continue  # torn tail — rerun that partition
    done: set[int] = set()
    for k, rec in last.items():
        if rec.get("invalidated"):
            continue  # tombstone: data was (or was about to be) destroyed
        if version is not None and rec.get("version") != version:
            continue
        if lineage is not None and rec.get("lineage", {}) != lineage:
            continue
        done.add(k)
    return done


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _commit(out_dir: str, record: dict) -> None:
    path = _manifest_path(out_dir)
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def run_partitioned(
    out_dir: str,
    partitions: Iterable[int],
    build: Callable[[int], "object"],
    version: str = "1",
    lineage: dict | None = None,
) -> List[int]:
    """Run ``build(partition) -> Dataset`` for every not-yet-done partition,
    writing each to ``out_dir/part=<k>`` atomically and appending to the
    manifest. Returns the list of partitions executed this run.

    ``lineage`` is recorded verbatim on every manifest line (input source,
    generator parameters, code identifiers) so a partition can be audited
    or invalidated later: change the lineage-relevant inputs → bump
    ``version`` (or delete the manifest) to force a rebuild.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir, version=version, lineage=lineage)
    ran: List[int] = []
    for k in partitions:
        if k in done:
            continue
        final = os.path.join(out_dir, f"part={k}")
        tmp = os.path.join(out_dir, f"_tmp-{k}")
        if os.path.exists(final):
            # tombstone BEFORE destroying previously-committed data: if we
            # crash anywhere in the rebuild (after rmtree, mid-write, after
            # rename but before the new commit line — even if that line is
            # torn), the invalidation is the last intact manifest line for
            # this partition and no stale line can vouch for it
            _commit(out_dir, {"partition": k, "invalidated": True,
                              "ts": time.strftime("%Y-%m-%dT%H:%M:%S")})
        for d in (tmp, final):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.perf_counter()
        ds = build(k)
        ds.write_parquet(tmp)
        # an EMPTY partition writes no files and write_parquet then never
        # creates the directory — commit an empty dir rather than crash
        # (valid: zero rows for this partition)
        os.makedirs(tmp, exist_ok=True)
        import pyarrow.parquet as pq

        n_rows = 0
        # durability barrier: fsync every data file + the tmp dir BEFORE the
        # rename, and the parent dir AFTER, so a manifest-committed
        # partition can never hold incomplete data even across power loss
        # (rename alone only orders metadata, not file contents)
        for f in os.listdir(tmp):
            fp = os.path.join(tmp, f)
            if f.endswith(".parquet"):
                n_rows += pq.read_metadata(fp).num_rows
            fd = os.open(fp, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        _fsync_dir(tmp)
        os.rename(tmp, final)
        _fsync_dir(out_dir)
        record = {
            "partition": k,
            "rows": n_rows,
            "sec": round(time.perf_counter() - t0, 3),
            "version": version,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        if lineage is not None:
            record["lineage"] = lineage
        _commit(out_dir, record)
        ran.append(k)
    return ran
