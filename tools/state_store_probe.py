#!/usr/bin/env python
"""State-store provider experiment (round-8 verdict stretch 8): the
HDFS-backed default vs RocksDB (+ changelog checkpointing) on the two
stateful streaming headliners whose wall is state-commit-dominated —
`stream_exactly_once_watermarked` (dropDuplicatesWithinWatermark, 11
time-sliced batches) and `stream_sessions_timer_finalized`
(applyInPandasWithState + EventTimeTimeout).

SCALING.md's round-8 state-sharding analysis named RocksDB + changelog
checkpointing as the production lane for large state (incremental
changelog upload instead of full-snapshot per commit); this probe
measures whether it wins at THIS fixture's state scale. Provider is a
context-level conf (the cloned drain sessions inherit it), so each
mode runs in its own process:

    python tools/state_store_probe.py hdfs
    python tools/state_store_probe.py rocksdb

Prints one JSON line: {"provider": ..., per-query min-of-3 walls}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ("stream_exactly_once_watermarked", "stream_sessions_timer_finalized")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "hdfs"
    # get_spark now DEFAULTS to RocksDB (the adoption this probe
    # motivated), so the hdfs baseline must override it back
    # explicitly — an empty extra_conf would silently measure RocksDB
    # under the hdfs label (round-9 review finding)
    if mode == "rocksdb":
        extra = {
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled": "true",
        }
    else:
        extra = {
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "HDFSBackedStateStoreProvider"
            ),
        }

    from minimapreduce_spark import queries as q
    from minimapreduce_spark.session import get_spark

    spark = get_spark(app_name=f"state-store-{mode}", extra_conf=extra)
    out = {"provider": mode, "sf_dir": SF}
    for name in QUERIES:
        fn = q.queries()[name]
        fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
        best = min(
            _timed(fn, spark) for _ in range(3)
        )
        out[name] = round(best, 2)
    print(json.dumps(out), flush=True)


def _timed(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
