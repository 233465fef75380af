"""UDF / UDAF / UDTF showcase queries — the DataFrame-native successors
of the reference's Go-plugin ``Map``/``Reduce`` contract
(mr/worker.go:55-109, 146; plugin load main/mrworker.go:36-55).

Every flavor here is Arrow-batched (pandas series in, pandas/scalar
out), so the Python boundary costs one columnar transfer per batch, not
one call per row. All three are registered queries with full DuckDB
oracles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.registry import register

# Concrete type objects, not DDL strings: DDL parsing needs an active
# SparkSession, and this module must be importable before one exists
# (the driver imports __spark_entry__ first, then builds the session).
_DOUBLE = DoubleType()
_SENT_SCHEMA = StructType(
    [StructField("sent_no", IntegerType()), StructField("sentence", StringType())]
)


@pandas_udf(_DOUBLE)
def sigmoid_centered(v: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: logistic squash of value/100. One Arrow
    batch per invocation — the ~10-100× faster path vs row-at-a-time
    ``udf()`` (which this engine never uses in a data path)."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-v / 100.0))


@register(
    "udf_vectorized_sigmoid",
    oracle="""
    SELECT event_type,
           round(avg(1.0 / (1.0 + exp(-value / 100.0))), 6) AS avg_sigmoid,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def udf_vectorized_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in a projection, aggregated by built-ins."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type", sigmoid_centered("value").alias("s")).groupBy(
        "event_type"
    ).agg(F.round(F.avg("s"), 6).alias("avg_sigmoid"), F.count("*").alias("n"))


@pandas_udf(_DOUBLE)
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: arbitrary per-group aggregate — the
    moral equivalent of the reference's ``reducef(key, values)`` with
    real types and Arrow transfer instead of string lists."""
    return float((v * w).sum() / w.sum())


@register(
    "udaf_weighted_discount",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_discount * l_extendedprice) / sum(l_extendedprice), 6)
             AS wavg_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_weighted_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted average discount per return flag via a custom
    pandas UDAF. Note the scale contrast with built-ins: a GROUPED_AGG
    UDAF sees each whole group, so Spark plans a full shuffle of the
    group's rows (no partial aggregation, and no mixing with built-in
    aggs in the same agg); keep custom UDAFs for genuinely
    non-decomposable aggregates and groups that fit memory."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_mean("l_discount", "l_extendedprice"), 6).alias("wavg_discount")
    )


_COGROUP_SCHEMA = StructType(
    [
        StructField("key_id", LongType()),
        StructField("n_orders", LongType()),
        StructField("total_spend", DoubleType()),
        StructField("n_events", LongType()),
        StructField("total_event_value", DoubleType()),
    ]
)


def _merge_customer_activity(key, orders_pdf: pd.DataFrame, events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped merge: both sides of one key arrive as whole pandas
    frames; emit one merged row (full-outer semantics — either side may
    be empty)."""
    return pd.DataFrame(
        [
            {
                "key_id": key[0],
                "n_orders": len(orders_pdf),
                "total_spend": round(float(orders_pdf["o_totalprice"].sum()), 2),
                "n_events": len(events_pdf),
                "total_event_value": round(float(events_pdf["value"].sum()), 2),
            }
        ]
    )


@register(
    "cogroup_customer_activity",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS key_id, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    e AS (
      SELECT user_id AS key_id, count(*) AS n_events,
             round(sum(value), 2) AS total_event_value
      FROM events GROUP BY user_id
    )
    SELECT coalesce(o.key_id, e.key_id)      AS key_id,
           coalesce(n_orders, 0)             AS n_orders,
           coalesce(total_spend, 0.0)        AS total_spend,
           coalesce(n_events, 0)             AS n_events,
           coalesce(total_event_value, 0.0)  AS total_event_value
    FROM o FULL OUTER JOIN e ON o.key_id = e.key_id
    """,
)
def cogroup_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: orders grouped by custkey and events
    grouped by user_id meet per-key in one Python function — the typed,
    Arrow-batched successor of a reduce-side merge join written as a
    reducef over tagged values. Each side shuffles once on its key;
    groups (not the corpus) must fit executor memory, which is the same
    contract the reference's per-key []string reduce had
    (mr/worker.go:137-146)."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return (
        orders.groupBy("o_custkey")
        .cogroup(events.groupBy("user_id"))
        .applyInPandas(_merge_customer_activity, schema=_COGROUP_SCHEMA)
    )


@udtf(returnType=_SENT_SCHEMA)
class SplitSentences:
    """Python UDTF (one row in, N rows out) — the typed successor of the
    reference's ``mapf(filename, contents) []KeyValue`` UDTF shape
    (mr/worker.go:68). Splits on '.', numbering by original position."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split("."), start=1):
            s = tok.strip()
            if s:
                yield i, s


@register(
    "udtf_split_sentences",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(regexp_split_to_array(text, '\\.'), 1) AS sent_no,
             trim(unnest(regexp_split_to_array(text, '\\.'))) AS sentence
      FROM documents
    )
    SELECT doc_id, sent_no, sentence
    FROM toks WHERE sentence <> ''
    """,
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join the UDTF against documents: doc_id × its sentences."""
    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_no, s.sentence
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


def _arrow_norm_batches(it):
    """mapInArrow worker: per Arrow RecordBatch, fixed-point squared-L2
    of each embedding — numpy over Arrow buffers, no pandas
    materialization. Half-away-from-zero rounding to match both SQL
    engines (numpy's default round is half-to-even)."""
    import numpy as np
    import pyarrow as pa

    for batch in it:
        vec_ids = batch.column(0)
        emb = batch.column(1)
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        scaled = flat * 1_000_000.0
        codes = np.where(
            scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
        ).astype(np.int64)
        offsets = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ssq = np.add.reduceat(codes * codes, offsets[:-1])
        ssq[offsets[:-1] == offsets[1:]] = 0  # empty vectors
        yield pa.RecordBatch.from_arrays(
            [vec_ids, pa.array(ssq, type=pa.int64())], ["vec_id", "ssq"]
        )


@register(
    "arrow_embedding_norms",
    oracle="""
    WITH x AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos, embedding AS arr
      FROM embeddings
    ),
    c AS (
      SELECT vec_id,
             CAST(round(CAST(arr[pos] AS DOUBLE) * 1000000) AS BIGINT) AS code
      FROM x
    )
    SELECT vec_id,
           round(sqrt(CAST(sum(code * code) AS DOUBLE)) / 1000000.0, 6)
             AS l2_norm
    FROM c GROUP BY vec_id
    """,
)
def arrow_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm of every embedding via ``mapInArrow`` — the
    lowest-overhead Python path: Arrow RecordBatches flow straight into
    numpy (zero pandas boxing, unlike the mapInPandas stages in
    operators/multimodal.py), vectorized squared-sum per batch, Arrow
    back out. The per-vector reduction is np.add.reduceat over the list
    array's own offsets — one C loop for the whole batch.

    Exactness: components are fixed-pointed to int64 millionths with
    half-away-from-zero rounding (matching SQL ``round``, NOT numpy's
    banker's default — the one-ULP trap in Python numeric parity), so
    the squared sum is exact and the final sqrt/divide is one identical
    IEEE op. The oracle recomputes it in pure SQL.

    Scale posture: embarrassingly parallel scan→batch→batch; the only
    exchange is whatever downstream wants. Arrow batch size bounds
    worker memory.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ssq = emb.mapInArrow(_arrow_norm_batches, schema="vec_id long, ssq long")
    return ssq.select(
        "vec_id",
        F.round(F.sqrt(F.col("ssq").cast("double")) / 1_000_000.0, 6).alias("l2_norm"),
    )


_STREAK_SCHEMA = "user_id bigint, n_active_days bigint, longest_streak bigint"


def _longest_streak(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map worker: longest run of consecutive active days for
    one user's partition of (user_id, day) rows."""
    days = pd.Series(sorted(pdf["day"].unique()))
    if len(days) == 0:
        return pd.DataFrame(columns=["user_id", "n_active_days", "longest_streak"])
    gaps = days.diff().dt.days.fillna(1)
    # new streak wherever the gap from the previous active day isn't 1
    streak_ids = (gaps != 1).cumsum()
    longest = int(streak_ids.value_counts().max())
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_active_days": [len(days)],
            "longest_streak": [longest],
        }
    )


@register(
    "user_longest_daily_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    islands AS (
      SELECT user_id,
             datediff('day', DATE '1992-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, count(*) AS run_len FROM islands GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS n_active_days,
           max(run_len) AS longest_streak
    FROM runs GROUP BY user_id
    """,
)
def user_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-days streak per user — the
    engagement metric — via grouped-map ``applyInPandas``: each user's
    distinct active days arrive as ONE pandas frame and arbitrary
    imperative Python computes the runs (the modern typed successor to
    the reference's Reduce UDAF contract, mr/worker.go:146 — whole
    group in, one row out).

    The oracle proves the same semantics declaratively (gaps-and-
    islands: day − row_number collapses consecutive runs), so this
    doubles as the engine's demonstration that the Python escape hatch
    and the relational form agree exactly.

    Scale posture: one shuffle on user_id; per-group memory is the
    user's distinct-day list (bounded by the calendar, not event
    volume — the distinct happens BEFORE the Python stage).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    return days.groupBy("user_id").applyInPandas(
        _longest_streak, schema=_STREAK_SCHEMA
    )
