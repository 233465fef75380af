#!/usr/bin/env python
"""Interleaved same-session A/B of the streaming drains' tuning knobs
(round-12, verdict items 2/4): exactly-once {files_per_trigger} x
{state partitions}, upsert width, session-window width. Interleaved
passes (cfg1, cfg2, ..., cfg1, cfg2, ...) so ambient drift hits every
config equally — the round-11 measurement discipline.

Usage: python tools/stream_ab_probe.py [exactly_once|upsert|session] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minimapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "exactly_once"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="stream_ab_probe")

    if which == "exactly_once":
        import minimapreduce_spark.streaming.dedup_join as dj

        fn = dj.stream_exactly_once_watermarked
        cfgs = [(1, 8), (1, 4), (1, 2), (2, 8), (2, 4), (2, 2)]
        # warm: stage dirs, codegen
        dj.EXACTLY_ONCE_FILES_PER_TRIGGER = cfgs[0][0]
        dj._exactly_once_state_width = lambda s, d, _w=cfgs[0][1]: _w
        timed(fn, spark)
        results = {c: [] for c in cfgs}
        for r in range(reps):
            for c in cfgs:
                dj.EXACTLY_ONCE_FILES_PER_TRIGGER = c[0]
                dj._exactly_once_state_width = lambda s, d, _w=c[1]: _w
                dt = timed(fn, spark)
                results[c].append(dt)
                print(f"rep{r} fpt={c[0]} parts={c[1]}: {dt:.3f}s", flush=True)
        for c in cfgs:
            print(f"BEST fpt={c[0]} parts={c[1]}: {min(results[c]):.3f}s "
                  f"(all: {[round(x,3) for x in results[c]]})")

    elif which == "upsert":
        import minimapreduce_spark.streaming.upsert as up

        fn = up.stream_upsert_latest_state
        widths = [8, 4, 2, 1]
        up._upsert_state_width = lambda s, d, _w=widths[0]: _w
        timed(fn, spark)
        results = {w: [] for w in widths}
        for r in range(reps):
            for w in widths:
                up._upsert_state_width = lambda s, d, _w=w: _w
                dt = timed(fn, spark)
                results[w].append(dt)
                print(f"rep{r} width={w}: {dt:.3f}s", flush=True)
        for w in widths:
            print(f"BEST width={w}: {min(results[w]):.3f}s "
                  f"(all: {[round(x,3) for x in results[w]]})")

    elif which == "session":
        import minimapreduce_spark.streaming.windows as wn

        fn = wn.stream_session_window
        widths = [8, 4, 2]
        wn._session_state_width = lambda s, d, _w=widths[0]: _w
        timed(fn, spark)
        results = {w: [] for w in widths}
        for r in range(reps):
            for w in widths:
                wn._session_state_width = lambda s, d, _w=w: _w
                dt = timed(fn, spark)
                results[w].append(dt)
                print(f"rep{r} width={w}: {dt:.3f}s", flush=True)
        for w in widths:
            print(f"BEST width={w}: {min(results[w]):.3f}s "
                  f"(all: {[round(x,3) for x in results[w]]})")


if __name__ == "__main__":
    main()
