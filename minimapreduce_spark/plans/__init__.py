"""Physical-plan inspection & assertion helpers (scale posture).

The reference has no optimizer (SURVEY §4) — its "plan" is a hardcoded
task list. Here the plan is Catalyst's, and this module is how the
engine PROVES its plans have the shape a 100 TB run needs: dimension
joins broadcast, filters reach the parquet scan, projections prune
columns, hot paths stay inside whole-stage codegen, and shuffles only
happen where an operator semantically requires one.

Used by tests/test_plans.py; also handy interactively::

    from minimapreduce_spark import plans
    plans.assert_broadcast_join(df)
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-Catalyst, pre-AQE-finalization),
    captured from ``df.explain("formatted")``."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    """The one-line-per-operator physical plan (``df.explain()``),
    where an exchange and its partitioning print on the SAME line —
    required for counting; the formatted mode splits them across an
    operator list and an arguments section."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges are
    NOT counted — they move only the small side; neither is the final
    SinglePartition gather of a global aggregate's 1-row result)."""
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning)",
                          simple_plan(df)))


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    n = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", physical_plan(df)))
    assert n >= at_least, f"expected ≥{at_least} broadcast join(s), plan has {n}"


def assert_no_broadcast_nested_loop(df: DataFrame) -> None:
    """BNLJ with a non-trivial build side is the classic accidental
    cross-product; plans here must never rely on one except for tiny
    bounded frames (where we assert its presence explicitly instead)."""
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, "unexpected BroadcastNestedLoopJoin"


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a PushedFilters: [...] list of some
    scan — i.e. the filter reached the parquet reader, so row groups
    can be skipped at 100 TB instead of scanned and discarded."""
    plan = physical_plan(df)
    pushed = " | ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed down; PushedFilters: {pushed}"


def assert_pruned_schema(df: DataFrame, table_fragment: str, max_cols: int) -> None:
    """The scan matching ``table_fragment`` must read ≤ max_cols columns
    (column pruning reached the reader)."""
    plan = physical_plan(df)
    for m in re.finditer(r"Location: [^\n]*" + re.escape(table_fragment) + r"[^\n]*", plan):
        # ReadSchema appears within the same scan block, a few lines down
        block = plan[m.start(): m.start() + 600]
        rs = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if rs:
            ncols = len([c for c in rs.group(1).split(",") if ":" in c])
            assert ncols <= max_cols, (
                f"scan of {table_fragment} reads {ncols} cols (> {max_cols}): {rs.group(1)}"
            )
            return
    raise AssertionError(f"no scan of {table_fragment} with ReadSchema found")


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Under AQE the pre-execution plan is AdaptiveSparkPlan with no
    codegen subtrees yet ('Found 0'); physical planning happens at
    explain time, so momentarily disabling AQE yields the concrete plan
    whose codegen spans we can count."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
        assert m and int(m.group(1)) >= 1, "no WholeStageCodegen subtree in plan"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def assert_no_single_partition_window(df: DataFrame) -> None:
    """No Window operator may run with an empty partition spec over
    data-scale input — that funnels the whole dataset through ONE task
    (Spark itself warns 'Moving all data to a single partition').

    The one sanctioned exception is the two-phase offset pattern
    (operators/ordered.py): its offsets window orders by the range
    partition id ``__tp_pid`` and therefore sees ≤ n_ranges rows —
    bounded by the partition count, not the data.

    In the one-line plan an unpartitioned window prints
    ``Window [exprs], [orderSpec]`` (two bracket groups) while a
    partitioned one prints ``Window [exprs], [partSpec], [orderSpec]``.
    """
    for line in simple_plan(df).splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups = re.findall(r"\[[^\[\]]*(?:\[[^\[\]]*\][^\[\]]*)*\]", m.group(1))
        if len(groups) <= 2 and "__tp_pid" not in line:
            raise AssertionError(f"single-partition window in plan: {line.strip()}")
