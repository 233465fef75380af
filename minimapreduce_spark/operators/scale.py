"""Skew- and shuffle-management operators (100 TB posture).

The reference has no skew handling at all — one hot key means one slow
reduce task (SURVEY §4 "Skew handling: None"). At 100 TB a hot key is
the norm, not the exception, so the engine exposes the two standard
mitigations as first-class, oracle-checked operators:

- **salted aggregation** — two-stage decomposable aggregation: stage 1
  groups by (key, salt) so a hot key's rows spread over ``n_salts``
  reducers and combine map-side; stage 2 merges the partials by key.
  Semantically identical to a plain groupBy (the oracle proves it).
- **salted join** — replicate the small/hot-key side ``n_salts`` ways,
  salt the big side deterministically, join on (key, salt): a hot join
  key's probe rows land on ``n_salts`` tasks instead of one.

Salts are derived from ``xxhash64`` of high-cardinality columns, never
``rand()`` — deterministic input → deterministic output, so retried
tasks (the reference's whole fault-tolerance story, SURVEY §2a#10)
recompute identical results.

Spark's AQE (``spark.sql.adaptive.skewJoin``) does split skewed SMJ
partitions at runtime; explicit salting remains the portable fix for
skewed *aggregations* and for engines/joins AQE doesn't cover, and
makes the technique visible to the plan tests.

Also here: bucketed co-located joins (``bucketed_join``) — pre-bucket
both fact tables on the join key at write time so repeated joins run
with ZERO shuffle exchanges (the reference's nReduce-bucket intermediate
files, mr/worker.go:94-101, are exactly this idea persisted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.registry import register

N_SALTS = 16


def salt_col(n_salts: int, *entropy_cols: str) -> Column:
    """Deterministic salt in [0, n_salts): hash of high-cardinality
    columns (NOT rand() — task retries must be idempotent)."""
    return F.pmod(F.xxhash64(*entropy_cols), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt: Column,
    partials: dict[str, Column],
    finals: dict[str, Column],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partials`` are stage-1 aggregates over (keys..., salt);
    ``finals`` are stage-2 merges over keys referencing stage-1 names.
    Only decomposable aggregates qualify (sum/count/min/max and
    anything derivable from them, e.g. avg = sum/count).
    """
    stage1 = (
        df.withColumn("_salt", salt % n_salts)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(name) for name, c in partials.items()])
    )
    return stage1.groupBy(*keys).agg(*[c.alias(name) for name, c in finals.items()])


@register(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(avg(l_discount), 6)      AS avg_disc,
           max(l_quantity)                AS max_qty,
           count(*)                       AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a 3-value key (l_returnflag — maximal skew: the
    whole table funnels into 3 groups) via salted two-stage agg. The
    oracle is the PLAIN group-by: salting must be invisible in the
    result. avg is recombined exactly as sum-of-sums / sum-of-counts.

    (For built-in aggregates Spark's partial+final hash agg already
    spreads this load; the operator exists for aggregation pipelines —
    e.g. collect_list-based or applyInPandas UDAFs — where the partial
    step would otherwise concentrate a hot key on one task.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag"],
        salt=salt_col(N_SALTS, "l_orderkey", "l_linenumber"),
        partials={
            "p_sum_qty": F.sum("l_quantity"),
            "p_sum_price": F.sum("l_extendedprice"),
            "p_sum_disc": F.sum("l_discount"),
            "p_max_qty": F.max("l_quantity"),
            "p_n": F.count("*"),
        },
        finals={
            "sum_qty": F.round(F.sum("p_sum_qty"), 2),
            "sum_base_price": F.round(F.sum("p_sum_price"), 2),
            "avg_disc": F.round(F.sum("p_sum_disc") / F.sum("p_n"), 6),
            "max_qty": F.max("p_max_qty"),
            "n_rows": F.sum("p_n"),
        },
    )


@register(
    "join_salted_suppliers",
    oracle="""
    SELECT s_suppkey, s_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_suppkey, s_name
    """,
)
def join_salted_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact→dim join via salting: every supplier key is hot
    (lineitem/supplier ≈ 600:1), so a plain shuffle join gives each
    reducer one giant probe group. The dim side is exploded ×N_SALTS,
    the fact side salted deterministically, and the join key becomes
    (suppkey, salt) → each hot key spreads over N_SALTS tasks. A merge
    hint forces the shuffle path (a 100-row dim would otherwise
    broadcast, hiding the pattern under test); the oracle is the plain
    join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_orderkey", "l_linenumber"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sup_rep = sup.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])))
    li_salted = li.withColumn("_salt", salt_col(N_SALTS, "l_orderkey", "l_linenumber"))
    joined = li_salted.hint("merge").join(
        sup_rep,
        (li_salted.l_suppkey == sup_rep.s_suppkey) & (li_salted._salt == sup_rep._salt),
    )
    return (
        joined.groupBy("s_suppkey", "s_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           round(sum(o_totalprice), 2) AS total_price,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-priority,
    per-status, and grand-total aggregates in ONE pass over orders —
    Catalyst expands the sets into a single Expand+hash-agg plan, so
    the fact table is scanned once, not once per set."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count("*").alias("n_orders"),
        )
    )


@register("agg_approx_sketch")  # rows-only: sketch outputs are engine-specific
def agg_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for 100 TB interactive profiling:
    HyperLogLog++ distinct counts and quantile sketches over lineitem,
    grouped by return flag. Sketches are mergeable across partitions
    (constant memory per group, single shuffle of sketch bytes — never
    the rows). Error bounds vs exact values are asserted in pytest;
    the driver records a rows-only check since sketch estimates are
    engine-specific by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_quantiles"
        ),
        F.count("*").alias("n_rows"),
    )


@register(
    "join_bloom_pruned_revenue",
    oracle="""
    SELECT l_orderkey,
           round(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) / 10000.0, 2)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_orderkey
    """,
)
def join_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: per-order lineitem revenue for
    urgent orders, shaped so Catalyst's InjectRuntimeFilter rewrites the
    fact side to ``might_contain(bloom_filter_agg(o_orderkey), ...)`` —
    the selective dim predicate prunes lineitem rows BEFORE the
    aggregation shuffle, not after the join.

    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~20% that can possibly match: the bloom
    filter (a few MB of bits) ships to every scan task, while the
    default thresholds (application side > 10 GB, creation side <
    100 MB) ensure the rewrite only fires when it pays. Locally the
    application-side threshold is dropped for the duration of plan
    optimization (the QueryExecution caches the injected plan; the
    session conf is restored before returning) so the plan shape is
    testable at sf0.01 — asserted in tests/test_plans.py.

    The merge hint pins the dim side to a shuffle join: broadcast would
    also be correct (and AQE may pick it at this scale), but the bloom
    pattern under test only applies to shuffle joins.
    """
    key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    rev = li.groupBy("l_orderkey").agg(
        (F.sum(F.round(F.col("l_extendedprice") * 10000).cast("long")) / 10000.0).alias(
            "_rev"
        )
    )
    df = rev.join(o.hint("merge"), rev.l_orderkey == o.o_orderkey).select(
        "l_orderkey", F.round("_rev", 2).alias("revenue")
    )
    old = spark.conf.get(key)
    spark.conf.set(key, "1KB")
    try:
        # Force optimization NOW so the injected bloom plan is cached in
        # this DataFrame's QueryExecution, then restore the threshold so
        # other queries in the session keep the at-scale default.
        df._jdf.queryExecution().optimizedPlan()
    finally:
        spark.conf.set(key, old)
    return df


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist a frame bucketed+sorted by the join key. At 100 TB this
    is the write-once/join-many contract: both sides bucketed the same
    way join with no exchange (only per-bucket sorts if needed)."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an in-memory catalog forgets tables between sessions but leaves the
    # warehouse directory behind; clear the orphan so overwrite succeeds
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table)
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> DataFrame:
    """orders ⋈ lineitem with both sides pre-bucketed on the order key:
    writes bucketed tables into the session warehouse, then joins the
    bucketed relations — the resulting plan has ZERO shuffle exchanges
    (asserted in tests/test_plans.py). Repeated/iterative joins against
    the same fact tables amortize the one-time bucketed write."""
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_b", "o_orderkey", n_buckets
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "lineitem_b",
        "l_orderkey",
        n_buckets,
    )
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total_price"))
    )
