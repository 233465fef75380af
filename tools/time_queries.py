#!/usr/bin/env python
"""Time a subset of registered queries through the noop sink.

Usage: python tools/time_queries.py name [name ...] [--runs N]

Same methodology as bench.py (warm session, per-query best-of-N via the
noop sink) for fast optimize-measure iteration on individual queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minimapreduce_spark import queries as q  # noqa: E402
from minimapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_queries")
    allq = q.queries()
    # one warm pass (JVM/codegen/footers), then best-of-N timed
    for name in args:
        allq[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in args:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            allq[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f}s")


if __name__ == "__main__":
    main()
