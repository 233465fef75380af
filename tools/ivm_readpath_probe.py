#!/usr/bin/env python
"""IVM read-path payoff probe: what does the nightly fold-in buy per
read? At $SPARK_GRAFT_SF_DIR (default sf0.1), warm, min of REPS runs:

  - merge-on-read (`incremental_join_view_upserts`): base-artifact
    anti-join + two delta joins at EVERY read — the day path;
  - rebuilt read (`incremental_join_view_rebuild`): ONE parquet scan
    of the folded artifact — the night path (fold cost reported once);
  - stream-rebuilt read (`stream_incremental_join_view_rebuild`): the
    same one-scan read off the stream-drained fold (drain cost
    reported once, its first invocation).

All three return the identical frame (the shared recompute oracle), so
the walls are a pure read-path comparison. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def wall(fn) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    from minimapreduce_spark import queries as q
    from minimapreduce_spark.operators.relational import join_view_rebuild
    from minimapreduce_spark.session import get_spark
    from minimapreduce_spark.streaming.upsert import stream_join_view_rebuild

    spark = get_spark(app_name="ivm_readpath_probe")
    reg = q.queries()

    # one-time offline fold costs, measured into FRESH roots (the
    # default roots are idempotent and may already be published)
    import tempfile

    scratch = tempfile.mkdtemp(prefix="ivm_probe_")
    t0 = time.monotonic()
    join_view_rebuild(spark, SF, root=os.path.join(scratch, "batch_rebuilt"))
    batch_fold_s = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    stream_join_view_rebuild(
        spark, SF, root=os.path.join(scratch, "stream_rebuilt")
    )
    stream_fold_s = round(time.monotonic() - t0, 3)

    merge_on_read = wall(lambda: reg["incremental_join_view_upserts"](spark, SF))
    rebuilt_read = wall(lambda: reg["incremental_join_view_rebuild"](spark, SF))
    stream_rebuilt_read = wall(
        lambda: reg["stream_incremental_join_view_rebuild"](spark, SF)
    )
    n = reg["incremental_join_view_rebuild"](spark, SF).count()

    print(json.dumps({
        "sf_dir": SF,
        "view_rows": n,
        "merge_on_read_s": merge_on_read,
        "rebuilt_read_s": rebuilt_read,
        "stream_rebuilt_read_s": stream_rebuilt_read,
        "read_speedup_x": round(merge_on_read / rebuilt_read, 2)
        if rebuilt_read
        else None,
        "batch_fold_once_s": batch_fold_s,
        "stream_fold_once_s": stream_fold_s,
        "fold_breakeven_reads": (
            round(batch_fold_s / (merge_on_read - rebuilt_read), 1)
            if merge_on_read > rebuilt_read
            else None
        ),
    }))


if __name__ == "__main__":
    main()
