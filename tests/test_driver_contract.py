"""Driver-contract simulation: import __spark_entry__ from a FOREIGN
cwd in a fresh process and execute the Python-closure-bearing queries.

This is the exact failure mode the _pickle module exists for: Spark
pickles functions from importable modules by reference, so a repo-cwd
test run would mask executors failing to import minimapreduce_spark
when a real driver runs from anywhere else. The subprocess runs from
/tmp with only the repo appended to sys.path by __spark_entry__ itself.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from minimapreduce_spark.session import get_spark

spark = get_spark(app_name="contract", master="local[2]", shuffle_partitions=2)
df = e.entry(spark)
rows = df.collect()
assert len(rows) > 0 and set(df.columns) == {{"word", "cnt"}}, rows[:2]

# Python-closure paths: pandas UDAF, grouped-map, mapInArrow, RDD compat
sf = "/root/testdata/sf0.001"
q = e.queries()
for name in ["udaf_weighted_discount", "user_longest_daily_streak",
             "arrow_embedding_norms", "mr_wordcount"]:
    n = q[name](spark, sf).count()
    assert n > 0, name
oracles = e.oracle_sql()
assert set(oracles) <= set(q)
print("CONTRACT-OK", len(q), len(oracles))
"""


def test_entry_and_python_closures_from_foreign_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "CONTRACT-OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-3000:]}"
    )


def _round_coverage(rounds) -> set[str]:
    import json

    checked: set[str] = set()
    for r in rounds:
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(path):
            checked |= set(json.load(open(path)))
    return checked


def test_driver_priority_tier_leads_with_oracles():
    """The driver verifies the first 50 registrations: they must exist,
    lead the queries() dict, and carry oracles. (The round-2-4
    every-module-sampled invariant is superseded by the cumulative form
    in test_driver_priority_closes_coverage: after round 5 every module
    is fully driver-verified, so per-window module sampling would force
    pointless canary repeats.)"""
    from minimapreduce_spark import queries as _q
    from minimapreduce_spark.registry import DRIVER_PRIORITY, REGISTRY

    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    names = list(_q.queries().keys())
    assert names[:50] == DRIVER_PRIORITY
    assert set(names) == set(REGISTRY)

    assert all(REGISTRY[n].oracle for n in names[:50])


def test_driver_priority_closes_coverage():
    """Round-6 rotation, robust to the missing round-5 artifact: the
    round-5 driver run was staged over the exact 50-query remainder but
    CORRECTNESS_r05.json never landed in the repo, so the round-6 window
    leads with every post-r05 registration and re-covers the remainder
    minus the audited DROPPED_IF_R05_MISSING trivials. Pins:

    - the window stays disjoint from the r01-r04 hard coverage (no
      wasted slots on four-times-verified queries; overlap with r05,
      if it surfaces, is deliberate canary re-verification);
    - every registered query is windowed, previously verified, ledgered
      late, or on the audited dropped list — nothing falls through;
    - if CORRECTNESS_r05.json IS present, the dropped list must be
      covered by it, i.e. cumulative coverage closes at the full
      registry."""
    from minimapreduce_spark.registry import (
        DRIVER_PRIORITY,
        DROPPED_IF_R05_MISSING,
        LATE_REGISTERED,
        REGISTRY,
    )

    checked_r14 = _round_coverage((1, 2, 3, 4))
    r05 = _round_coverage((5,))
    window = set(DRIVER_PRIORITY)

    assert window & checked_r14 == set(), sorted(window & checked_r14)
    assert set(LATE_REGISTERED) <= set(REGISTRY), "LATE_REGISTERED names must be registered"
    assert window & set(LATE_REGISTERED) == set()
    missed = (
        set(REGISTRY) - window - checked_r14 - r05 - set(LATE_REGISTERED)
    )
    assert missed <= set(DROPPED_IF_R05_MISSING), (
        f"registered but neither windowed, verified, ledgered late, nor on "
        f"the audited dropped list: {sorted(missed - set(DROPPED_IF_R05_MISSING))}"
    )
    if r05:
        assert set(DROPPED_IF_R05_MISSING) <= r05, (
            "r05 artifact present but does not cover the dropped list — "
            "cumulative closure claim is broken; re-window"
        )
    # late registrations still carry full pytest-oracle coverage
    assert all(REGISTRY[n].oracle for n in LATE_REGISTERED)
    assert all(REGISTRY[n].oracle for n in DROPPED_IF_R05_MISSING)
