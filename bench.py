#!/usr/bin/env python
"""Headline-query benchmark (driver contract).

Times every ``bench=True`` query in the engine registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through Spark's noop sink (executes
the whole plan, no driver-side collect cost). Everything else goes to
stderr so stdout stays a single JSON line.

PAIRED PROTOCOL (round-4 verdict item 5): ambient environment drift on
a shared machine moved untouched queries ±20-30% between rounds 2-4 and
consumed two rounds of analysis disentangling "plan regressed" from
"machine was busier". The fix: run the whole headliner sweep TWICE in
one session (pass A, then pass B) and emit both — the A→B delta on
identical code in one process IS the session's noise floor, so a
cross-round comparison can subtract it instead of guessing. Paired is
the default (the driver runs bench.py bare); ``--single`` or
``SPARK_GRAFT_BENCH_PAIRED=0`` restores the one-pass protocol for quick
iteration. The headline ``queries``/``value`` fields stay the per-query
min across passes — best-of-all-runs, the steady-state plan cost, and
backward-comparable with BENCH_r01-r04 (which were best-of-2 single
pass; min over 2x2 runs tightens the same estimator).

ROUND-7 TAIL CONTRACT: the driver keeps only the last ~2000 chars of
stdout, so stdout now carries EXACTLY ONE compact JSON line (per-query
mins + total), size-guarded; the paired per-pass record goes to
bench_detail.json and stderr. BENCH_r06 recorded `parsed: null`
because the old final line (paired dict inline) outgrew that buffer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from minimapreduce_spark import queries as q  # noqa: E402
from minimapreduce_spark.session import get_spark  # noqa: E402

# Max per-query entries on the FINAL stdout JSON line (the slowest
# queries — the regression watchlist); the full record always lands in
# bench_detail.json. 44 worst-case-width entries fit the 1900-char
# driver tail-buffer contract with margin (test-pinned).
FINAL_LINE_TOP_K = 44


def sweep(spark, sf_dir: str, runs: int, tag: str) -> dict[str, float]:
    """One best-of-``runs`` timing pass over every bench=True query."""
    timings: dict[str, float] = {}
    for name, fn in q.bench_queries().items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"[bench:{tag}] {name}: {best:.3f}s", file=sys.stderr)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    paired = (
        "--single" not in sys.argv
        and os.environ.get("SPARK_GRAFT_BENCH_PAIRED", "1") != "0"
    ) or "--paired" in sys.argv

    spark = get_spark(app_name="bench")

    # Warm the JVM + parquet footers on the flagship query so the first
    # timed query doesn't pay one-time session costs.
    q.queries()["wordcount"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # WARM-UP SWEEP (round-8 verdict item 5): BENCH_r08 carried −43.3%
    # A→B drift because pass A ran cold/contended — codegen compilation,
    # parquet footer caches, streaming staging dirs and index artifacts
    # are all built during the first sweep. One UNTIMED full sweep
    # before pass A moves those one-time costs out of the recorded
    # passes, so the headline (and the A→B noise floor) measure the
    # steady-state plan cost. SPARK_GRAFT_BENCH_WARMUP=0 skips it for
    # quick iteration.
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    if warmup:
        sweep(spark, sf_dir, 1, "warmup")

    # Best-of-N: single runs on a shared machine carry ±25% scheduler
    # noise; the min is the steady-state cost of the plan itself.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    pass_a = sweep(spark, sf_dir, runs, "A")
    out: dict[str, object] = {
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "sf": sf,
        "warm": warmup,  # explicit cold/warm protocol marker
    }
    detail: dict[str, object] = {}
    if paired:
        pass_b = sweep(spark, sf_dir, runs, "B")
        timings = {n: min(pass_a[n], pass_b[n]) for n in pass_a}
        ta, tb = round(sum(pass_a.values()), 3), round(sum(pass_b.values()), 3)
        detail["paired"] = {
            "pass_a": pass_a,
            "pass_b": pass_b,
            "pass_a_total": ta,
            "pass_b_total": tb,
            # same code, same process, minutes apart: any delta here is
            # ambient noise, not a plan change — the session's noise floor
            "ab_drift_pct": round(100.0 * (tb - ta) / ta, 1) if ta else 0.0,
        }
        out["ab_drift_pct"] = detail["paired"]["ab_drift_pct"]
    else:
        timings = pass_a
    out["queries"] = timings
    out["value"] = round(sum(timings.values()), 3)

    # DRIVER TAIL-BUFFER CONTRACT (round-6 verdict item 2): the driver
    # keeps only the last ~2000 chars of stdout and parses the final
    # JSON line — BENCH_r06's line (paired dict + 46 queries) outgrew
    # the buffer and recorded `parsed: null`. The paired per-pass dump
    # now goes to bench_detail.json (+ a non-final stdout line for the
    # log), and the FINAL line is kept under the buffer by eliding the
    # fastest queries first if the headliner set ever outgrows it —
    # the total (`value`) is always exact and the slowest queries (the
    # regression watchlist) always survive.
    detail.update(out)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_detail.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)  # full record, off stdout

    limit = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_LIMIT", "1900"))
    # hard cap FIRST (round-7): the headliner set grew past the point
    # where all worst-case-width entries fit, so the final line always
    # carries at most the FINAL_LINE_TOP_K slowest queries (the
    # regression watchlist); the full per-query record lives in
    # bench_detail.json either way. The elision loop below remains as
    # the belt-and-braces fallback for pathological name lengths.
    if len(timings) > FINAL_LINE_TOP_K:
        by_cost = sorted(timings, key=timings.get, reverse=True)
        out["queries"] = {n: timings[n] for n in by_cost[:FINAL_LINE_TOP_K]}
        out["queries_elided"] = len(timings) - FINAL_LINE_TOP_K
        out["detail"] = "bench_detail.json"
    line = json.dumps(out)
    if len(line) > limit:
        kept = dict(out["queries"])
        by_cost = sorted(kept, key=kept.get, reverse=True)
        for name in reversed(by_cost):  # drop fastest first
            if len(line) <= limit:
                break
            kept.pop(name)
            out["queries"] = kept
            out["queries_elided"] = len(timings) - len(kept)
            out["detail"] = "bench_detail.json"
            line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
