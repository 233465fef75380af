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


def test_driver_priority_tier_samples_every_family():
    """The driver verifies the first 50 registrations: they must exist,
    lead the queries() dict, sample every operator module, carry oracles,
    and include the round-1 verdict's named must-verify set."""
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

    must_verify = {
        "dedup_minhash", "dedup_simhash", "ann_ivf_topk",
        "events_sessionization", "stream_session_window",
        "multimodal_features", "text_tfidf_top_terms",
        "merge_upsert_customers", "pack_token_batches", "fuzzy_join_blocked",
        # round-1 weak list: re-planned queries must be driver-verified
        "histogram_equidepth_prices", "customer_rfm_segments",
        "abc_part_classification", "pareto_revenue_concentration",
        "gini_revenue_inequality", "vocab_growth_curve",
        "sessions_peak_concurrency", "text_unigram_logprob",
        "ts_similarity_topk",
    }
    assert must_verify <= set(names[:50])
