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
    KMV_K,
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
    row-salted portable hash, same integer counters, same top-20
    output, same DuckDB oracle. The point is the deployment shape: a
    frequency monitor on a live event stream carries 4×64 longs
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


# ---------------------------------------------------------------------------
# Streaming KMV — bounded per-group distinct sketch in the state store
# ---------------------------------------------------------------------------

_KMV_OUT_SCHEMA = "event_type string, n_retained bigint, h_k bigint, n_rows bigint"
_KMV_STATE_SCHEMA = "ks array<bigint>, n_rows bigint"


def _kmv_update_factory(k: int):
    """applyInPandasWithState kernel: per-group state is the bottom-k
    DISTINCT portable hashes (union + re-bottom — the KMV mergeability
    operation itself, applied per micro-batch) plus a strictly
    increasing processed-row counter used to select the FINAL emission
    batch-side. All-integer state; no floats anywhere."""

    def update(key, pdfs, state):
        import pandas as pd

        ks, n_rows = (list(state.get[0]), int(state.get[1])) if state.exists else ([], 0)
        seen = set(ks)
        for pdf in pdfs:
            n_rows += len(pdf)
            seen.update(int(h) for h in pdf["h"])
        ks = sorted(seen)[:k]
        state.update((ks, n_rows))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_retained": [len(ks)],
                "h_k": [ks[k - 1] if len(ks) >= k else None],
                "n_rows": [n_rows],
            }
        )

    return update


@register(
    "stream_kmv_distinct_users",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM d
    )
    SELECT event_type,
           CAST(least(count(*), {KMV_K}) AS BIGINT) AS n_retained,
           round(CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
                      ELSE ({KMV_K} - 1.0) * 1152921504606846976.0
                           / max(CASE WHEN rn = {KMV_K} THEN h END)
                 END, 4) AS kmv_est
    FROM r GROUP BY event_type
    """,
)
def stream_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING K-minimum-values distinct sketch: per event_type, the
    bottom-32 distinct portable hashes live in the state store and
    are folded across real micro-batches by union + re-bottom — the KMV
    mergeability operation itself, so the drained state is BIT-IDENTICAL
    to the batch `sketch_kmv_distinct_users` sketch over the same
    events (pytest asserts the hash lists element-wise). State is ≤K
    longs per group REGARDLESS of how many distinct users flow by — the
    distinct-count companion to `stream_cms_heavy_hitters`' frequency
    monitor, and the custom-state counterpart of its built-in streaming
    aggregation (CMS state fits a groupBy-sum; bottom-K needs
    `applyInPandasWithState`).

    The kernel emits only integers (retained count, the K-th smallest
    hash, a strictly-increasing row counter); the estimator division —
    (K−1)·2⁶⁰ / h₍K₎, exact-double, the batch twin's arithmetic — runs
    JVM-side AFTER the drain, on each group's final emission (selected
    by max row-counter over the ≤4 per-group update rows). The oracle
    is the batch KMV SQL minus its n_exact column — the one number a
    bounded sketch, by design, cannot know.

    Scale posture: state ≤ K longs per group; each micro-batch ships
    one Arrow frame per group per batch; the estimator join is over
    |groups| rows. Production sinks would emit the running estimate per
    trigger — the memory-sink drain here exists to compare against the
    batch oracle exactly.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.window import Window as W

    from minimapreduce_spark.operators.scale import kmv_hash60

    sdf = events_stream_sharded(spark, sf_dir, n_shards=4)
    hashed = sdf.select("event_type", kmv_hash60(F.col("user_id")).alias("h"))
    updates = hashed.groupBy("event_type").applyInPandasWithState(
        _kmv_update_factory(KMV_K),
        outputStructType=_KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = run_to_memory(updates, "kmv_stream", "update")
    w = W.partitionBy("event_type").orderBy(F.desc("n_rows"))
    final = (
        drained.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "n_rows")
    )
    est = F.when(
        F.col("n_retained") < KMV_K, F.col("n_retained").cast("double")
    ).otherwise(
        (F.lit(float(KMV_K) - 1.0) * F.lit(1152921504606846976.0)) / F.col("h_k")
    )
    return final.select(
        "event_type",
        F.col("n_retained").cast("bigint").alias("n_retained"),
        F.round(est, 4).alias("kmv_est"),
    )


# ---------------------------------------------------------------------------
# Streaming HLL — 64 registers per group in the state store
# ---------------------------------------------------------------------------

_HLL_OUT_SCHEMA = (
    "event_type string, v_zero bigint, sum_rho bigint, z_reg bigint, n_rows bigint"
)
_HLL_STATE_SCHEMA = "regs array<int>, n_rows bigint"


def _hll_update_factory(m: int, p: int):
    """applyInPandasWithState kernel: per-group state is the m HLL
    registers (index j = h mod m, value = max first-1-bit rank of the
    54-bit hash suffix; 0 = empty) plus the processed-row counter that
    selects the final emission batch-side. Folding a micro-batch is the
    HLL merge itself — element-wise max — so the drained state is
    bit-identical to the batch registers (python's int.bit_length() IS
    length(bin(w)): both count to the highest set bit). The kernel also
    emits the exact integer Z·2⁵⁵ so the estimator stays one shared-text
    division JVM-side after the drain."""

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            regs, n_rows = list(state.get[0]), int(state.get[1])
        else:
            regs, n_rows = [0] * m, 0
        for pdf in pdfs:
            n_rows += len(pdf)
            for h in pdf["h"]:
                h = int(h)
                w = h >> p
                rho = 55 if w == 0 else 55 - w.bit_length()
                j = h % m
                if rho > regs[j]:
                    regs[j] = rho
        state.update((regs, n_rows))
        v_zero = sum(1 for r in regs if r == 0)
        z_reg = sum(1 << (55 - r) for r in regs if r > 0) + v_zero * (1 << 55)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "v_zero": [v_zero],
                "sum_rho": [sum(regs)],
                "z_reg": [z_reg],
                "n_rows": [n_rows],
            }
        )

    return update


def _stream_hll_oracle() -> str:
    from minimapreduce_spark.operators.scale import (
        _HLL_EST,
        _HLL_HASH60,
        HLL_M,
        HLL_P,
    )

    return f"""
    WITH d AS (
      SELECT DISTINCT event_type, {_HLL_HASH60} AS h FROM events
    ),
    p AS (
      SELECT event_type, h % {HLL_M} AS j,
             max(CASE WHEN (h >> {HLL_P}) = 0 THEN 55
                      ELSE 55 - length(bin(h >> {HLL_P})) END) AS mj
      FROM d GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type,
             CAST({HLL_M} - count(*) AS BIGINT) AS v_zero,
             CAST(sum(mj) AS BIGINT) AS sum_rho,
             CAST(sum(CAST(pow(2.0, 55 - mj) AS BIGINT))
                  + ({HLL_M} - count(*)) * 36028797018963968 AS BIGINT)
               AS z_reg
      FROM p GROUP BY 1
    )
    SELECT event_type, v_zero, sum_rho, z_reg,
           round({_HLL_EST}, 4) AS hll_est
    FROM g
    """


@register("stream_hll_distinct_users", oracle=_stream_hll_oracle())
def stream_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING HyperLogLog: the 64-register sketch lives in the state
    store per event_type and folds each real micro-batch by
    element-wise register max — the HLL merge operation itself — so the
    drained state is BIT-IDENTICAL to the batch
    ``sketch_hll_distinct_users`` registers over the same events
    (pytest asserts register-by-register), and the shared estimator
    text reads the same number off either engine. Completes the
    streaming-twin discipline across the whole mergeable family: CMS
    (built-in streaming sum), KMV (bottom-K custom state), and now the
    register sketch every production monitor actually deploys.

    The kernel is all-integer (registers, v_zero, Σrho, the exact
    Z·2⁵⁵); the only doubles are the post-drain shared-text division
    and the margin-pinned small-range ln. The oracle is the batch HLL
    SQL minus its n_exact column — the number a bounded sketch cannot
    know (same honesty as the KMV twin).

    Scale posture: state = 64 small ints per group at ANY cardinality —
    the cheapest stateful operator in the module; each micro-batch
    ships one Arrow frame per group; estimator join over |groups| rows.
    Production emits the running estimate per trigger; the memory-sink
    drain exists to compare against the batch oracle exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.window import Window as W

    from minimapreduce_spark.operators.scale import _HLL_EST, HLL_M, HLL_P

    sdf = events_stream_sharded(spark, sf_dir, n_shards=4)
    hashed = sdf.select(
        "event_type",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    updates = hashed.groupBy("event_type").applyInPandasWithState(
        _hll_update_factory(HLL_M, HLL_P),
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = run_to_memory(updates, "hll_stream", "update")
    w = W.partitionBy("event_type").orderBy(F.desc("n_rows"))
    final = (
        drained.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "n_rows")
    )
    return final.selectExpr(
        "event_type",
        "v_zero",
        "sum_rho",
        "z_reg",
        f"round({_HLL_EST}, 4) AS hll_est",
    )
