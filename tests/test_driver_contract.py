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
