"""Unit tests for the two-phase ordered-analytics helpers
(operators/ordered.py) — the machinery every re-planned global-order
query stands on, exercised on edge shapes the queries don't hit:
empty input, single row, duplicate-heavy keys, N < k ntiles."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from minimapreduce_spark.operators.ordered import (
    ntile_expr,
    with_global_row_number,
    with_global_running_sum,
    with_scalars,
)


def _df(spark, rows):
    return spark.createDataFrame([(i, v) for i, v in rows], "id: long, v: long")


def test_row_number_matches_sql_total_order(spark):
    rows = [(i, (i * 37) % 11) for i in range(100)]
    df = _df(spark, rows)
    got = {
        r.id: r.rn
        for r in with_global_row_number(
            df, [F.asc("v"), F.asc("id")], out="rn", n_ranges=5
        ).collect()
    }
    want = {
        i: rank + 1
        for rank, (v, i) in enumerate(sorted((v, i) for i, v in rows))
    }
    assert got == want


def test_row_number_empty_and_single(spark):
    empty = _df(spark, [])
    assert with_global_row_number(empty, [F.asc("id")]).count() == 0
    one = _df(spark, [(7, 1)])
    assert [(r.id, r.rn) for r in with_global_row_number(one, [F.asc("id")]).collect()] == [(7, 1)]


def test_running_sum_matches_python_fold(spark):
    rows = [(i, (i * 13) % 7 - 3) for i in range(57)]
    df = _df(spark, rows)
    got = {
        r.id: r.cum
        for r in with_global_running_sum(
            df, [F.asc("id")], F.col("v"), out="cum", n_ranges=4
        ).collect()
    }
    acc, want = 0, {}
    for i, v in sorted(rows):
        acc += v
        want[i] = acc
    assert got == want


def test_running_sum_duplicate_heavy_keys_need_tiebreak(spark):
    """With a unique tie-break column the running sum is deterministic
    even when the primary key is a single repeated value."""
    rows = [(i, 5) for i in range(40)]
    df = _df(spark, rows)
    got = sorted(
        r.cum
        for r in with_global_running_sum(
            df, [F.asc("v"), F.asc("id")], F.col("v"), out="cum", n_ranges=4
        ).collect()
    )
    assert got == [5 * k for k in range(1, 41)]


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (23, 5), (100, 8)])
def test_ntile_expr_matches_spark_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"))
    from pyspark.sql.window import Window as W

    want = {
        r.id: r.nt
        for r in df.select(
            "id", F.ntile(k).over(W.orderBy("id")).alias("nt")
        ).collect()
    }
    rn = with_global_row_number(df, [F.asc("id")], out="rn", n_ranges=3)
    cnt = df.agg(F.count(F.lit(1)).alias("_n"))
    got = {
        r.id: r.nt
        for r in with_scalars(rn, cnt)
        .select("id", ntile_expr(F.col("rn"), F.col("_n"), k).alias("nt"))
        .collect()
    }
    assert got == want
