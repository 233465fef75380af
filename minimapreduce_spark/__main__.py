"""CLI — the reference's three binaries as one command.

The reference is driven as (README.MD "How to run"):

    mrmaster pg-*.txt            # distributed: master + N mrworker wc.so
    mrsequential wc.so pg-*.txt  # single-threaded oracle

Here both entry points are::

    python -m minimapreduce_spark wc OUT_DIR 'data/pg-*.txt'
    python -m minimapreduce_spark --sequential wc OUT_DIR data/a.txt ...

The app name replaces the reference's ``.so`` plugin selection
(main/mrworker.go:36-55); ``--n-reduce`` replaces the hardcoded
nReduce=10 (main/mrmaster.go:23). Output is the reference's sink
format: ``"key value"`` lines, one part file per reduce partition
(mr/worker.go:159-174), or a single ``mr-out-0`` in sequential mode
(main/mrsequential.go:81).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from minimapreduce_spark import mrapps
from minimapreduce_spark.mapreduce import (
    DEFAULT_N_REDUCE,
    run_job,
    run_job_sequential,
    write_text_output,
)

APPS = {
    "wc": (mrapps.wc_map, mrapps.wc_reduce),
    "indexer": (mrapps.indexer_map, mrapps.indexer_reduce),
    "nocrash": (mrapps.crash_map, mrapps.crash_reduce),
}


def _read_files(patterns: list[str]) -> list[tuple[str, str]]:
    paths: list[str] = []
    for p in patterns:
        hits = sorted(glob.glob(p))
        if not hits and os.path.exists(p):
            hits = [p]
        paths.extend(hits)
    if not paths:
        raise SystemExit(f"no input files match {patterns}")
    out = []
    for path in paths:
        with open(path, encoding="utf-8", errors="replace") as f:
            out.append((os.path.basename(path), f.read()))
    return out


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m minimapreduce_spark", description=__doc__)
    ap.add_argument("app", choices=sorted(APPS))
    ap.add_argument("out_dir")
    ap.add_argument("inputs", nargs="+", help="input text files or globs")
    ap.add_argument("--n-reduce", type=int, default=DEFAULT_N_REDUCE)
    ap.add_argument(
        "--sequential",
        action="store_true",
        help="single-threaded oracle engine (mrsequential), no Spark",
    )
    ap.add_argument(
        "--source-mode",
        choices=["whole_files", "lines"],
        default="whole_files",
        help="whole_files = reference semantics (1 file = 1 split); "
        "lines = byte-scalable splits for large inputs",
    )
    args = ap.parse_args(argv)
    mapf, reducef = APPS[args.app]

    if args.sequential:
        rows = run_job_sequential(_read_files(args.inputs), mapf, reducef)
        os.makedirs(args.out_dir, exist_ok=True)
        with open(os.path.join(args.out_dir, "mr-out-0"), "w", encoding="utf-8") as f:
            for k, v in rows:
                f.write(f"{k} {v}\n")
        return 0

    if spark is None:
        from minimapreduce_spark.session import get_spark

        spark = get_spark(app_name=f"mr-{args.app}")
    source: object
    if args.source_mode == "whole_files":
        # materialize the file list driver-side so globs behave like the
        # reference CLI (one task per file) even for local paths
        source = _read_files(args.inputs)
    else:
        source = ",".join(args.inputs)
    df = run_job(
        spark, source, mapf, reducef, n_reduce=args.n_reduce, source_mode=args.source_mode
    )
    write_text_output(df, args.out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
