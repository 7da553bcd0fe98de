"""Checkpoint/resume: partition manifest skips completed work and the
resumable build matches the streaming build exactly."""

import json
import os

import pytest

SF = "/root/testdata/sf0.001"


def test_resume_skips_completed(ray_session, tmp_path):
    from hebrew_ner_ray.pipelines.kg import annotated_partition
    from hebrew_ner_ray.state.checkpoint import completed_partitions, run_partitioned

    out = str(tmp_path / "mentions")
    build = lambda k: annotated_partition(SF, "mentions", k, 4)

    ran1 = run_partitioned(out, [0, 1], build)
    assert ran1 == [0, 1]
    assert completed_partitions(out) == {0, 1}

    ran2 = run_partitioned(out, range(4), build)
    assert ran2 == [2, 3]  # 0 and 1 skipped
    assert completed_partitions(out) == {0, 1, 2, 3}

    # manifest lineage records rows + version per partition
    with open(os.path.join(out, "manifest.jsonl"), encoding="utf-8") as f:
        recs = [json.loads(l) for l in f]
    assert {r["partition"] for r in recs} == {0, 1, 2, 3}
    assert all(r["rows"] > 0 for r in recs)


@pytest.mark.gate
def test_resumable_build_matches_streaming(ray_session, tmp_path):
    from hebrew_ner_ray.pipelines.kg import build_graph, build_graph_resumable

    nodes_r, edges_r = build_graph_resumable(SF, str(tmp_path / "kg"), n_partitions=3)
    nodes_s, edges_s = build_graph(SF)

    ndf_r = nodes_r.to_pandas().reset_index(drop=True)
    ndf_s = nodes_s.to_pandas().reset_index(drop=True)
    assert ndf_r.equals(ndf_s)

    edf_r = edges_r.to_pandas().reset_index(drop=True)
    edf_s = edges_s.to_pandas().reset_index(drop=True)
    assert edf_r.equals(edf_s)


def test_crashed_tmp_dir_is_ignored(ray_session, tmp_path):
    from hebrew_ner_ray.pipelines.kg import annotated_partition
    from hebrew_ner_ray.state.checkpoint import run_partitioned

    out = str(tmp_path / "m2")
    os.makedirs(os.path.join(out, "_tmp-0"))  # simulated crash leftovers
    ran = run_partitioned(out, [0], lambda k: annotated_partition(SF, "mentions", k, 4))
    assert ran == [0]
    assert os.path.isdir(os.path.join(out, "part=0"))
    assert not os.path.exists(os.path.join(out, "_tmp-0"))


def test_lineage_aba_rebuilds(ray_session, tmp_path):
    """A→B→A lineage cycle: the stale A line must NOT vouch for data last
    written under B — last manifest line per partition wins."""
    import ray.data

    from hebrew_ner_ray.state.checkpoint import run_partitioned

    d = str(tmp_path / "aba")

    def build(k):
        return ray.data.range(3)

    a, b = {"input": "A"}, {"input": "B"}
    assert run_partitioned(d, [0], build, lineage=a) == [0]
    assert run_partitioned(d, [0], build, lineage=b) == [0]
    assert run_partitioned(d, [0], build, lineage=a) == [0]  # rebuild, not reuse
    assert run_partitioned(d, [0], build, lineage=a) == []   # now current


def test_lineage_empty_dict_roundtrip(ray_session, tmp_path):
    import ray.data

    from hebrew_ner_ray.state.checkpoint import run_partitioned

    d = str(tmp_path / "empty")

    def build(k):
        return ray.data.range(3)

    assert run_partitioned(d, [0], build, lineage={}) == [0]
    assert run_partitioned(d, [0], build, lineage={}) == []  # skip, not rerun
