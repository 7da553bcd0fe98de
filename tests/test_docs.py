"""Docs stay in lockstep with the registry.

Round-4 verdict flagged doc drift (OPERATORS.md/COVERAGE.md counts
lagging the code) and star overstatement (★ on queries never recorded in
a driver gate). These assertions make both impossible to reintroduce:
they recompute every number from the live registry and the committed
``CORRECTNESS_r*.json`` files.
"""

import glob
import json
import os
import re

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def registry():
    return _registry()


def _driver_covered() -> set:
    covered: set = set()
    for p in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        covered.update(json.load(open(p)))
    return covered


def test_operators_md_rows_match_registry(registry):
    queries, oracles = registry
    text = open(os.path.join(HERE, "OPERATORS.md")).read()
    rows = re.findall(r"^\| `([a-z0-9_]+)`( \(rows-only\))? [★☆]? ?\|",
                      text, re.M)
    names = {r[0] for r in rows}
    assert names == set(queries), (
        f"OPERATORS.md rows != queries(): missing={set(queries) - names} "
        f"extra={names - set(queries)}")
    # the headline count is literal in the intro line
    assert f"All **{len(queries)} driver queries**" in text
    assert f"({len(oracles)} with exact DuckDB value oracles" in text


def test_operators_md_stars_match_driver_coverage(registry):
    """★ ONLY on queries recorded green in some round's driver gate;
    everything else is ☆ (repo-gate-only)."""
    queries, _ = registry
    covered = _driver_covered()
    text = open(os.path.join(HERE, "OPERATORS.md")).read()
    starred = set(re.findall(r"^\| `([a-z0-9_]+)` ★ \|", text, re.M))
    hollow = set(re.findall(r"^\| `([a-z0-9_]+)` ☆ \|", text, re.M))
    overstated = starred - covered
    assert not overstated, f"★ without a CORRECTNESS row: {overstated}"
    understated = hollow & covered
    assert not understated, f"☆ but driver-covered: {understated}"


def test_coverage_md_count_current(registry):
    queries, oracles = registry
    text = open(os.path.join(HERE, "COVERAGE.md")).read()
    assert f"**{len(queries)} queries, {len(oracles)} exact oracles**" in text


def test_rotation_puts_never_driver_checked_first(registry):
    queries, _ = registry
    covered = _driver_covered()
    names = list(queries)
    never = [n for n in names if n not in covered]
    assert names[: len(never)] == never
