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


CANARIES = {
    # the round-2 verdict's named three
    "wordcount", "mr_wordcount", "q1_pricing_summary",
    # forced by the every-module-sampled invariant: these modules have
    # no never-driver-checked queries left after rounds 1-3
    "q6_forecast_revenue",          # operators.tpch_more
    "pagerank_nation_trade",        # operators.graph
    "stream_user_stats_stateful",   # streaming.stateful
    "stream_upsert_latest_state",   # streaming.upsert
    "q21_suppliers_kept_waiting",   # operators.tpch_rest (verified r03)
    "stream_view_purchase_join",    # streaming.dedup_join (verified r03)
    "binaryfile_manifest",          # sources.pydatasource (verified r03)
}


def test_driver_priority_tier_samples_every_family():
    """The driver verifies the first 50 registrations: they must exist,
    lead the queries() dict, sample every operator module, and carry
    oracles."""
    from minimapreduce_spark import queries as _q
    from minimapreduce_spark.registry import DRIVER_PRIORITY, REGISTRY

    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    names = list(_q.queries().keys())
    assert names[:50] == DRIVER_PRIORITY
    assert set(names) == set(REGISTRY)

    first50_mods = {REGISTRY[n].fn.__module__ for n in names[:50]}
    all_mods = {REGISTRY[n].fn.__module__ for n in names}
    assert first50_mods == all_mods, all_mods - first50_mods

    assert all(REGISTRY[n].oracle for n in names[:50])


def test_driver_priority_rotated_from_prior_rounds():
    """Round-4 rotation (round-3 verdict item 3): the driver window must
    be disjoint from what CORRECTNESS_r01-r03 already hard-verified,
    except for the named canaries — so round 4's driver run extends
    hard-verified coverage instead of re-proving the same 50."""
    import json

    from minimapreduce_spark.registry import DRIVER_PRIORITY

    checked = set()
    for f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        path = os.path.join(REPO, f)
        if os.path.exists(path):
            checked |= set(json.load(open(path)))
    overlap = set(DRIVER_PRIORITY) & checked
    assert overlap == CANARIES, (
        f"unexpected repeats: {sorted(overlap - CANARIES)}; "
        f"missing canaries: {sorted(CANARIES - overlap)}"
    )
