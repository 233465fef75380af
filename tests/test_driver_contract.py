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


def _last_verified() -> dict[str, int]:
    """name -> most recent round whose committed CORRECTNESS artifact
    hash-verified it (r05 never landed; absent = never verified)."""
    import glob
    import json

    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        r = int(path.rsplit("_r", 1)[1][:2])
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                last[name] = max(last.get(name, 0), r)
    return last


def test_driver_priority_closes_coverage():
    """Round-8 rotation — FRESHNESS under closure (round-7 closed
    cumulative driver-hash coverage at the full registry, so the
    window's job changes from closure to staleness rotation). Pins:

    - closure first: any registered query absent from EVERY committed
      artifact must be in the window (new registrations lead);
    - the staleness rule: every other window slot re-verifies a query
      whose last verification is no FRESHER than that of any verified
      query left outside the window (ties allowed — the r01 cohort is
      45 queries for 44 slots);
    - nothing registered falls outside window ∪ verified ∪
      LATE_REGISTERED, and late registrations carry oracles."""
    import minimapreduce_spark.queries  # noqa: F401 — populate REGISTRY
    from minimapreduce_spark.registry import (
        DRIVER_PRIORITY,
        LATE_REGISTERED,
        REGISTRY,
    )

    last = _last_verified()
    window = set(DRIVER_PRIORITY)
    closure = set(REGISTRY) - set(last) - set(LATE_REGISTERED)

    assert closure <= window, (
        f"never-driver-verified queries missing from the window: "
        f"{sorted(closure - window)}"
    )
    canaries = window - closure
    assert canaries <= set(last), (
        f"window slots that are neither closure nor previously verified: "
        f"{sorted(canaries - set(last))}"
    )
    outside = {n: r for n, r in last.items() if n in REGISTRY and n not in window}
    if canaries and outside:
        stalest_out = min(outside.values())
        freshest_in = max(last[c] for c in canaries)
        assert freshest_in <= stalest_out, (
            f"staleness rule violated: a canary last verified in round "
            f"{freshest_in} occupies a slot while a query last verified "
            f"in round {stalest_out} waits outside"
        )
    assert set(LATE_REGISTERED) <= set(REGISTRY)
    assert window & set(LATE_REGISTERED) == set()
    # late registrations still carry full pytest-oracle coverage
    assert all(REGISTRY[n].oracle for n in LATE_REGISTERED)


def test_bench_final_line_fits_driver_tail_buffer():
    """BENCH_r06's `parsed: null` root cause, pinned: the driver keeps
    only ~2000 chars of stdout and parses the final JSON line. Since
    round 7 the headliner count exceeds what fits raw, so bench.py caps
    the final line at the FINAL_LINE_TOP_K slowest queries (full record
    in bench_detail.json); this test pins that the CAPPED line — with
    worst-case-width timings over the LONGEST-NAMED headliners (the
    adversarial cap content) — still fits under the limit with margin."""
    import json

    import bench as _bench
    from minimapreduce_spark import queries as _q

    names = sorted(_q.bench_queries(), key=len, reverse=True)
    kept = names[: _bench.FINAL_LINE_TOP_K]
    worst = {name: 9999.999 for name in kept}
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "unit": "sec",
            "sf": 0.1,
            "warm": True,
            "ab_drift_pct": -99.9,
            "queries": worst,
            "queries_elided": max(0, len(names) - len(kept)),
            "detail": "bench_detail.json",
            "value": round(9999.999 * len(names), 3),
        }
    )
    assert len(line) <= 1900, (
        f"bench final line would be {len(line)} chars with the "
        f"{len(worst)} longest-named headliners at worst-case width — "
        "lower FINAL_LINE_TOP_K or trim the bench set"
    )
