"""Streaming mergeable sketches: bounded-state summaries accumulated
across real micro-batches whose DRAINED state equals the batch sketch
bit-for-bit — the property that makes a sketch deployable on a stream
at all (state is D×W counters regardless of key cardinality, and the
drain can be checked against the batch twin exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.operators.scale import (
    CMS_D,
    CMS_TOP,
    cms_bucket,
    cms_pairs,
)
from minimapreduce_spark.registry import REGISTRY, register
from minimapreduce_spark.streaming.source import events_stream_sharded, run_to_memory

# identical output contract → identical oracle: the streaming sum over
# micro-batches IS the batch sum (exactly-once availableNow drain), so
# the batch CMS oracle checks the streaming twin unchanged.
_CMS_ORACLE = REGISTRY["sketch_cms_heavy_hitters"].oracle


@register("stream_cms_heavy_hitters", oracle=_CMS_ORACLE)
def stream_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Count-Min sketch: the D×W counter table is accumulated
    by a streaming aggregation across real micro-batches (the sharded
    replay source: 4 single-file triggers), then drained and probed
    exactly like the batch ``sketch_cms_heavy_hitters`` — same
    row-salted portable hash, same integer counters, same top-{CMS_TOP}
    output, same DuckDB oracle. The point is the deployment shape: a
    frequency monitor on a live event stream carries {CMS_D}×64 longs
    of streaming state REGARDLESS of how many distinct users flow by
    (contrast stream_user_stats_stateful, whose state is per-key), and
    because counter accumulation is cell-wise addition — the
    mergeability theorem — the drained stream state is BIT-IDENTICAL
    to the batch sketch over the same events, which the pytest asserts
    cell by cell and the shared oracle hash-checks end to end.

    Scale posture: streaming state bounded at D×W longs by
    construction; each micro-batch contributes a map-side-combined
    partial; the estimate probe broadcasts the drained sketch. The
    exact-count side exists (as in the batch twin) to measure the
    one-sided guarantee in-engine; a production monitor keeps only the
    sketch and probes candidates.
    """
    from minimapreduce_spark.operators.ordered import with_bounded_rank

    sdf = events_stream_sharded(spark, sf_dir, n_shards=4)
    counters_stream = (
        sdf.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("d"),
        )
        .withColumn("bucket", cms_bucket(F.col("d"), F.col("user_id")))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("counter"))
    )
    counters = run_to_memory(counters_stream, "cms_stream", "complete")

    ev = load_table(spark, sf_dir, "events")
    ec = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    est = (
        cms_pairs(ec)
        .join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("user_id", "cnt")
        .agg(F.min("counter").alias("cms_est"))
    )
    top = est.orderBy(F.desc("cnt"), F.asc("user_id")).limit(CMS_TOP)
    return with_bounded_rank(top, F.desc("cnt"), F.asc("user_id"), out="rnk").select(
        "user_id",
        F.col("cnt").cast("bigint").alias("exact_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("cnt")).cast("bigint").alias("overest"),
        "rnk",
    )
