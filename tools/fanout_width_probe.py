#!/usr/bin/env python
"""Interleaved same-session A/B of fan-out width for the Python-codec
lane (multimodal_jpeg_decode) at the session's core count — round-11
verdict item 5: three driver records spanned 0.74-2.42 s and the
32-wide fan-out was the suspect.

Usage: python tools/fanout_width_probe.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minimapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="fanout_width_probe")
    import minimapreduce_spark.operators.multimodal as mm

    fn = mm.multimodal_jpeg_decode
    widths = [None, 16, 8, 4]  # None = defaultParallelism (current)
    mm.JPEG_FANOUT_WIDTH = widths[0]
    fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
    results = {w: [] for w in widths}
    for r in range(reps):
        for w in widths:
            mm.JPEG_FANOUT_WIDTH = w
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[w].append(dt)
            print(f"rep{r} width={w}: {dt:.3f}s", flush=True)
    for w in widths:
        print(f"BEST width={w}: {min(results[w]):.3f}s "
              f"(all: {[round(x, 3) for x in results[w]]})")


if __name__ == "__main__":
    main()
