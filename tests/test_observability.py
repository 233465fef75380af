"""Pipeline observability via DataFrame.observe(): named metrics ride
the job itself (computed during the action, no second scan) — the
mechanism a 100 TB pipeline uses for row-count/invariant telemetry
instead of re-aggregating its inputs."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from minimapreduce_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_observe_metrics_match_direct_aggregation(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_c"),
        F.min("l_shipdate").alias("min_ship"),
    )
    # One pass: the aggregate consumes the observed frame; metrics are
    # a side product of THIS job, not a second scan.
    result = observed.groupBy("l_returnflag").count().collect()
    assert len(result) > 0
    got = obs.get
    direct = li.agg(
        F.count(F.lit(1)),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
        F.min("l_shipdate"),
    ).first()
    assert got["n_rows"] == direct[0]
    assert got["price_c"] == direct[1]
    assert got["min_ship"] == direct[2]


def test_observe_sees_post_filter_rows(spark):
    """Metrics observe the frame WHERE they're attached: after a
    filter, the counts reflect surviving rows — the property that makes
    observe() a per-stage audit point."""
    orders = load_table(spark, SF_DIR, "orders")
    obs = Observation("filtered")
    filtered = orders.where(F.col("o_orderstatus") == "F").observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    n_direct = filtered.count()
    assert obs.get["n"] == n_direct
    assert n_direct < orders.count()


def test_streaming_progress_accounts_for_every_input_row(spark):
    """Streaming observability: the query's progress telemetry must
    account for exactly the rows the source holds — the monitoring
    signal a production stream alerts on (lag, dropped input)."""
    from minimapreduce_spark.streaming.source import events_stream

    sdf = events_stream(spark, SF_DIR).groupBy("event_type").count()
    q = (
        sdf.writeStream.format("memory")
        .queryName("obs_progress_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total_in = sum(p["numInputRows"] for p in (q.recentProgress or []))
    expected = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total_in == expected
    assert spark.table("obs_progress_sink").count() > 0
