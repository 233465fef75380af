#!/usr/bin/env python
"""Dump .explain("formatted") for bench queries into plans/r11/.

Usage: python tools/explain_r11.py <suffix> [name ...]

Writes plans/r11/<query>_<suffix>.txt for each requested bench query
(default: all batch bench queries). Streaming drains (run_to_memory
inside the query fn) are captured as the pre-drain streaming plan where
the module exposes one, else skipped with a note — their physical work
happens inside the micro-batch runtime, not in the returned frame.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minimapreduce_spark import queries as q  # noqa: E402
from minimapreduce_spark.session import get_spark  # noqa: E402

# Queries whose fn() drains a stream into a memory sink: the returned
# frame is a memory-table scan, so the formatted plan carries no signal.
STREAM_DRAINS = {
    "stream_session_window",
    "stream_exactly_once_watermarked",
    "stream_upsert_latest_state",
}


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain_r11")
    bench = q.bench_queries()
    todo = names or [n for n in bench if n not in STREAM_DRAINS]
    for name in todo:
        fn = bench.get(name) or q.queries()[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}) sf_dir={sf_dir}\n")
            f.write(text)
        print(
            f"[explain] {name}: {len(text)} chars in "
            f"{time.perf_counter() - t0:.2f}s -> {path}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
