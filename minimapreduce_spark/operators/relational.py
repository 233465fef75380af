"""Relational operator suite over the star schema (SURVEY §2c).

The reference has none of these as named operators — its Map/Reduce UDF
surface subsumes them by construction (SURVEY §2 intro). Here each
category is a first-class declarative plan; Catalyst supplies pushdown,
pruning, join selection, partial aggregation, and AQE supplies runtime
coalescing + skew handling (SURVEY §4: zero custom rules needed).

Scale posture:
- Fact-to-fact joins (lineitem ⋈ orders) shuffle on the join key only;
  dimension joins broadcast (`F.broadcast`) so the 100 TB fact side
  never shuffles for them.
- Aggregates are expressed so Spark plans partial (map-side) + final
  hash aggregation — the combiner the reference lacks.
- Top-k is per-group window + filter or global orderBy+limit (Spark
  plans TakeOrderedAndProject — no global sort materialization).
- Float aggregates are rounded in BOTH engines to absorb
  summation-order nondeterminism; every computed column is aliased
  identically in the plan and the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

import os

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.operators.money import exact_revenue_sum, exact_sum, grid_c
from minimapreduce_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Headline multi-operator queries (TPC-H-shaped)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_base_price,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(100 - round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000, 2) AS sum_disc_price,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(100 - round(l_discount * 100) AS BIGINT)
                          * CAST(100 + round(l_tax * 100) AS BIGINT)) AS DOUBLE) / 1000000, 2) AS sum_charge,
           round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100 / count(*), 6) AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → 2-key groupBy with 8 aggs.
    Catalyst plans partial+final hash agg; only 6 groups survive the map
    side, so shuffle traffic is O(partitions), not O(rows).

    EXACT fixed-point arithmetic (round-5 160×-caught boundary): the
    original round-in-both-engines float sums held at sf0.01 and 40×,
    but at 160× (96M rows) one group's sum_charge accumulated a 2e-14
    relative summation-order difference that landed ACROSS the 2-dp
    rounding boundary — the third instance of the float-boundary class
    the 40× methodology caught (events_resample_gapfill,
    agg_salted_skew). Fix per the repo playbook: the money columns live
    on exact grids (prices are integer cents, discount/tax integer
    percents, quantity integer — grid recovery verified ≤ 1e-9 on the
    fixture), so every sum is an integer sum — price_c for base price,
    price_c·(100−d_c) in 1e-4 dollars for disc price,
    price_c·(100−d_c)·(100+t_c) in 1e-6 dollars for charge — summed
    exactly via the two-BIGINT int128 emulation (money.exact_sum;
    HUGEINT on the DuckDB side), then presented through the identical
    CAST→divide→round chain. Both engines now compute the same integer
    and therefore the same rounded double at ANY scale (exact to
    ~4.6e12 rows per group — see money.SPLIT); the averages divide
    exact sums by exact counts with the same left-to-right double
    expression on both sides."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity")).cast("bigint")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    d_c = F.round(F.col("l_discount") * 100).cast("bigint")
    disc_c = F.lit(100) - d_c
    tax_c = F.lit(100) + F.round(F.col("l_tax") * 100).cast("bigint")
    cnt = F.count(F.lit(1))
    # exact_sum = the two-BIGINT int128 emulation (operators/money.py):
    # the direct DECIMAL(38,0) sums cost ~8 s/column at the 640× octave
    # (boxed BigDecimal adds); the split reproduces the identical exact
    # integer — same hash — at codegen'd BIGINT speed.
    sum_qty = exact_sum(qty_c, 1)
    sum_price = exact_sum(price_c, 100)
    sum_disc = exact_sum(price_c * disc_c, 10_000)
    sum_charge = exact_sum(price_c * disc_c * tax_c, 1_000_000)
    sum_d = exact_sum(d_c, 100)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(sum_qty, 2).alias("sum_qty"),
            F.round(sum_price, 2).alias("sum_base_price"),
            F.round(sum_disc, 2).alias("sum_disc_price"),
            F.round(sum_charge, 2).alias("sum_charge"),
            F.round(sum_qty / cnt, 4).alias("avg_qty"),
            F.round(sum_price / cnt, 4).alias("avg_price"),
            F.round(sum_d / cnt, 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into a fact join,
    then agg + top-10. The customer side is filtered FIRST so the
    broadcast is the small filtered set; lineitem never shuffles for the
    dim join. Tie-break on l_orderkey makes the limit deterministic."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(100 - round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000, 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey   = o_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON l_suppkey   = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. All four dimension sides
    (customer, supplier, nation, region) broadcast; the only shuffle is
    lineitem ⋈ orders on orderkey + the final 1-key agg."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        # exact grid sum (money.py): a per-nation revenue aggregates an
        # O(fact) slice — the q1-class float-boundary risk at scale
        .agg(F.round(exact_revenue_sum(), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Filters / projections
# --------------------------------------------------------------------------


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS net_price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_quantity > 45
      AND l_returnflag <> 'A'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown: the parquet scan must read only 7
    of 11 columns and push the shipdate/quantity/returnflag filters
    (verified in tests via the explain output)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") != "A")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
        "l_returnflag",
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, n_name,
           count(*)                    AS n_customers,
           round(sum(c_acctbal), 2)    AS total_acctbal,
           round(avg(c_acctbal), 4)    AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-dim rollup: nation and region broadcast — zero shuffle on the
    customer side until the final small agg."""
    cust = _t(spark, sf_dir, "customer")
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    reg = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@register(
    "join_left_order_counts",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                          AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2)   AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers (every customer
    has orders in this data, so the join is restricted to URGENT ones to
    make the null path real)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 450000
    )
    """,
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): returns each qualifying customer once —
    no duplication, no columns from the right side shuffled."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_anti_no_urgent",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def join_anti_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no URGENT order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------


@register(
    "agg_distinct_priority",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey)       AS n_customers,
           count(*)                        AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100, 2) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) beside plain aggs — Spark expands to a two-phase
    plan; stays fully distributed."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(exact_sum(grid_c("o_totalprice"), 100), 2).alias("total_price"),
        )
    )


@register(
    "agg_rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*)                     AS n_items,
           round(sum(l_quantity), 2)    AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals incl. grand total (null-filled
    grouping columns match the oracle's)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                       AS n_orders,
           round(avg(o_totalprice), 4)    AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


@register(
    "agg_conditional_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_filled,
           count(*) FILTER (WHERE l_discount > 0.05)                   AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation — the portable (and
    shuffle-free-beyond-the-agg) form of groupBy().pivot()."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))), 2).alias("qty_open"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 2).alias("qty_filled"),
        F.count(F.when(F.col("l_discount") > 0.05, True)).alias("n_discounted"),
    )


@register(
    "stats_summary",
    oracle="""
    SELECT o_orderstatus,
           round(stddev_samp(o_totalprice), 4)          AS sd_price,
           round(quantile_cont(o_totalprice, 0.5), 4)   AS median_price,
           round(min(o_totalprice), 2)                  AS min_price,
           round(max(o_totalprice), 2)                  AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats: sample stddev + exact interpolated median
    (Spark `percentile` ≡ DuckDB `quantile_cont`)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100, 2) AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer — one shuffle on the partition key,
    then an in-partition sort (orderkey tie-break keeps it exact)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        # exact cents running sum (money.py): bigint window accumulation
        # can't pick up summation-order noise at any partition length
        F.round(
            F.sum(grid_c("o_totalprice")).over(w).cast("double") / 100, 2
        ).alias("running_spend"),
    )


@register(
    "window_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    bench=True,
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: row_number window + filter — the scalable top-k
    (no global sort; AQE coalesces the post-shuffle partitions)."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@register(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE))       AS days_since_prev,
           lead(o_orderpriority) OVER w               AS next_priority
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: inter-order gap in days and the next order's priority."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag(F.col("o_orderdate").cast("date")).over(w)
        )
        .cast("bigint")
        .alias("days_since_prev"),
        F.lead("o_orderpriority").over(w).alias("next_priority"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops
# --------------------------------------------------------------------------


@register(
    "topk_global_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full sort. Unique
    (orderkey, linenumber) tie-break keeps the cut deterministic."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@register(
    "set_ops_customers",
    oracle="""
    WITH building AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    rich AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
    UNION ALL
    SELECT 'union' AS op, c_custkey FROM (SELECT * FROM building UNION SELECT * FROM rich)
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union (distinct) in one tagged result."""
    cust = _t(spark, sf_dir, "customer")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        building.intersect(rich).select(F.lit("intersect").alias("op"), "c_custkey")
        .unionAll(building.exceptAll(rich).distinct().select(F.lit("except").alias("op"), "c_custkey"))
        .unionAll(building.union(rich).distinct().select(F.lit("union").alias("op"), "c_custkey"))
    )


# --------------------------------------------------------------------------
# Scalar function library
# --------------------------------------------------------------------------


@register(
    "scalar_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority)                                   AS pri_upper,
           substr(o_orderpriority, 1, 1)                            AS pri_code,
           length(o_orderpriority)                                  AS pri_len,
           concat_ws('#', o_orderstatus, o_orderpriority)           AS status_tag,
           CAST(year(o_orderdate) AS BIGINT)                        AS order_year,
           CAST(month(o_orderdate) AS BIGINT)                       AS order_month,
           CAST(day(o_orderdate) AS BIGINT)                         AS order_day,
           round(abs(o_totalprice - 250000.0), 2)                   AS price_dev,
           round(sqrt(o_totalprice), 4)                             AS price_sqrt,
           round(ln(o_totalprice + 1), 6)                           AS price_ln,
           CAST(floor(o_totalprice) AS BIGINT) % 97                 AS price_mod
    FROM orders
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar functions — all JVM-side, whole-stage
    codegen'd (the reference could only do this inside Go UDFs)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.length("o_orderpriority").cast("bigint").alias("pri_len"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("status_tag"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.round(F.abs(F.col("o_totalprice") - 250000.0), 2).alias("price_dev"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        # NB: double→bigint CAST truncates in Spark but rounds in DuckDB;
        # floor() first makes both engines agree.
        (F.floor("o_totalprice").cast("bigint") % 97).alias("price_mod"),
    )


@register(
    "correlated_above_avg_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS total FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey, round(total, 2) AS total_spend
    FROM spend
    WHERE total > 2 * (SELECT avg(total) FROM spend)
    """,
)
def correlated_above_avg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: customers spending > 2× the mean total.
    The scalar aggregate broadcasts; no driver-side collect."""
    spend = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    threshold = spend.agg((F.avg("total") * 2).alias("thr"))
    return (
        spend.join(F.broadcast(threshold))
        .where(F.col("total") > F.col("thr"))
        .select(F.col("o_custkey").alias("custkey"), F.round("total", 2).alias("total_spend"))
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS modal_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    )
    WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value) with an EXPLICIT tie-break:
    highest count first, then lexicographically smallest value. Built-in
    ``mode()`` is unusable cross-engine (Spark and DuckDB both document
    ties as nondeterministic), so the engine's deterministic variant is
    count + row_number over (count DESC, value ASC) — same rule spelled
    out on both sides, bit-stable anywhere.

    Scale: a two-level hash agg (status, priority) — tiny intermediate —
    then a window over the handful of groups. The fact table is scanned
    once; nothing about the plan changes at 1000× rows, only the first
    agg's input.
    """
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.col("n").desc(), "o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            "n",
        )
    )


@register(
    "join_shuffle_hash_revenue",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(100 - round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000, 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_shuffle_hash_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join pinned to the SHUFFLE_HASH strategy — the third
    join algorithm in the engine's toolbox (broadcast for dims, SMJ for
    sorted/huge-both-sides, shuffled-hash when one side fits a task's
    memory but is too big to broadcast). Skipping SMJ's sorts saves two
    O(n log n) passes when the build side hashes comfortably — the
    right call for a mid-sized orders side against a huge lineitem at
    100 TB (and what AQE's OptimizeShuffledHashJoin picks by local size
    at runtime). Plan pinned by tests/test_plans.py; values equal the
    plain join oracle.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.round(exact_revenue_sum(), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance for JOINS — the delta-join identity
# ---------------------------------------------------------------------------

IVM_FACT_MOD = 10  # o_orderkey % 10 == 0 → "orders that arrived today"
IVM_DIM_MOD = 13  # c_custkey % 13 == 0 → "customers onboarded today"

_IVM_VIEW_SQL = """
    SELECT o_orderkey, o_custkey, c_mktsegment,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
    FROM orders JOIN customer ON o_custkey = c_custkey
"""


def join_view_root(sf_dir: str) -> str:
    """Deterministic root for the persisted base join view — the
    artifact-root discipline (path + content fingerprint of BOTH input
    tables, so a regenerated fixture gets a fresh root)."""
    import hashlib
    import tempfile

    from minimapreduce_spark.catalog import content_fingerprint, table_path

    parts = [os.path.abspath(sf_dir)]
    for t in ("orders", "customer"):
        parts.append(content_fingerprint(table_path(sf_dir, t)))
    tag = hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"minimapreduce_joinview_{tag}")


def join_view_build(spark: SparkSession, sf_dir: str, root: str | None = None) -> str:
    """BUILD-ONCE: materialize the BASE join view (yesterday's orders ⋈
    yesterday's customers) as a parquet artifact with atomic-rename
    publish — the `minhash_index_build` discipline applied to a
    materialized join view."""
    import shutil
    import tempfile

    root = root or join_view_root(sf_dir)
    if os.path.isdir(os.path.join(root, "view")):
        return root
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % IVM_FACT_MOD != 0
    )
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % IVM_DIM_MOD != 0
    )
    v = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "o_custkey",
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    stage = tempfile.mkdtemp(prefix="joinview_build_")
    v.write.mode("overwrite").parquet(os.path.join(stage, "view"))
    try:
        os.rename(stage, root)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)  # lost the race
    return root


@register("incremental_join_view", oracle=_IVM_VIEW_SQL)
def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE FOR JOINS — the delta-join identity
    (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, with A⋈B the
    PERSISTED base view (`join_view_build` artifact): the day's arrival
    deltas (new orders: o_orderkey % 10 == 0; newly onboarded
    customers: c_custkey % 13 == 0, both INSERT-only by contract)
    maintain the materialized orders⋈customer view without re-joining
    the base — the join-side completion of the engine's IVM story
    (`incremental_rollup_merge` covers algebraic aggregates; this
    covers the join a reporting view sits on). Note the A⋈ΔB term is
    where base orders referencing a just-onboarded customer FIRST
    appear — the inner base view correctly excluded them, and the
    identity picks them up without touching A⋈B.

    The output is the maintained view itself, so the oracle is simply
    the full join recomputed — maintenance ≡ recompute is the IVM
    correctness contract, and the pytest additionally pins the four
    terms pairwise DISJOINT (each row produced exactly once) and the
    artifact rebuild a no-op.

    Scale posture: ΔA⋈B and ΔA⋈ΔB cost ∝ |ΔA| (the dim side
    broadcasts); A⋈ΔB is the honest expensive term — a dim insert
    forces one fact-side probe scan with the ≤|ΔB| keys broadcast
    (semi-join shape), which a production deployment avoids by
    bucketing the fact on the join key (`join_bucketed_smb`'s layout)
    or by folding dim-inserts into the next base rebuild. UPDATE/
    DELETE deltas need the tombstone/SCD2 discipline
    (`stream_scd2_band_history`) on top of the same identity —
    documented, out of the insert-only contract here. At 100 TB the
    base view never recomputes: today's maintenance appends
    delta-term rows, exactly what this plan does."""
    root = join_view_build(spark, sf_dir)
    base_view = spark.read.parquet(os.path.join(root, "view"))

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    proj = lambda o, c: o.join(c, o.o_custkey == c.c_custkey).select(  # noqa: E731
        "o_orderkey",
        "o_custkey",
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    d_o = orders.where(F.col("o_orderkey") % IVM_FACT_MOD == 0)
    b_o = orders.where(F.col("o_orderkey") % IVM_FACT_MOD != 0)
    d_c = cust.where(F.col("c_custkey") % IVM_DIM_MOD == 0)
    b_c = cust.where(F.col("c_custkey") % IVM_DIM_MOD != 0)
    # broadcast ONLY the Δ-side frames (bounded by the day's arrivals);
    # the base dim b_c is corpus-sized by contract — forcing it into a
    # broadcast would OOM at a real dim size where an unhinted plan
    # falls back to a shuffle join (round-9 review finding; at fixture
    # scale AQE still picks broadcast for it on its own)
    return (
        base_view.unionByName(proj(d_o, b_c))
        .unionByName(proj(b_o, F.broadcast(d_c)))
        .unionByName(proj(d_o, F.broadcast(d_c)))
    )


IVM_UPD_MOD = 7  # base customers with c_custkey % 7 == 0 → segment updated today
IVM_DEL_MOD = 11  # base customers with c_custkey % 11 == 0 → deleted today
IVM_UPD_SEGMENT = "REPRICED"  # the updated rows' new c_mktsegment value

# Maintenance ≡ recompute against the dim's end-of-day state — shared
# by the merge-on-read query, the copy-on-write rebuild, and the
# streaming CDC twin (identical end state by contract).
IVM_UPSERTS_ORACLE = f"""
    WITH cust_final AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % {IVM_DIM_MOD} <> 0
                   AND c_custkey % {IVM_DEL_MOD} <> 0
                   AND c_custkey % {IVM_UPD_MOD} = 0
                  THEN '{IVM_UPD_SEGMENT}' ELSE c_mktsegment END AS c_mktsegment
      FROM customer
      WHERE NOT (c_custkey % {IVM_DIM_MOD} <> 0
                 AND c_custkey % {IVM_DEL_MOD} = 0)
    )
    SELECT o_orderkey, o_custkey, c_mktsegment,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
    FROM orders JOIN cust_final ON o_custkey = c_custkey
    """


@register("incremental_join_view_upserts", oracle=IVM_UPSERTS_ORACLE)
def incremental_join_view_upserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM WITH UPDATE/DELETE DELTAS — the tombstone discipline
    `incremental_join_view`'s docstring names, now composed into the
    same delta-join identity (round-9 verdict item 5): real dimension
    tables don't only gain rows, they update and delete, and an update
    delta IS a delete tombstone plus an insert — exactly how
    `stream_scd2_band_history` closes a version and opens the next.

    The day's dimension changes, all modular stand-ins on the BASE
    customers (c_custkey % DIM_MOD != 0, the rows the artifact was
    built on):
      - DELETE:  c_custkey % {IVM_DEL_MOD} == 0 → tombstone only;
      - UPDATE:  c_custkey % {IVM_UPD_MOD} == 0 (and not deleted) →
                 tombstone(old row) + insert(row with c_mktsegment =
                 '{IVM_UPD_SEGMENT}');
      - INSERT:  the `incremental_join_view` arrivals
                 (c_custkey % DIM_MOD == 0), unchanged.
    Fact-side arrivals (ΔA: o_orderkey % FACT_MOD == 0) compose
    unchanged.

    Maintenance, term by term (V = A⋈B is the persisted artifact):
      1. V ⟕̸ tombstone-keys (LEFT ANTI on o_custkey) — subtracts
         A⋈Δ⁻B without recomputing anything: each fact row joins
         exactly one dim row, so the tombstoned view rows are exactly
         the anti-join's complement;
      2. + A ⋈ Δ⁺B (base facts × broadcast insert-set: updated rows'
         new versions ∪ today's onboards) — the updated customers'
         orders REAPPEAR here with the new segment;
      3. + ΔA ⋈ B_final (arrival facts × the dim's end-of-day state).
    The three terms partition the output (pytest-pinned): term 1 is
    base facts with un-touched customers, term 2 base facts with
    touched-surviving customers, term 3 arrival facts.

    The oracle is the full recompute against the dim's final state —
    maintenance ≡ recompute, the IVM correctness contract, now under
    deletes and updates.

    Scale posture: tombstone keys and Δ⁺ rows are bounded by the day's
    dim churn — both broadcast; the anti-join rewrites nothing (at
    100 TB it lands as a broadcast-anti over the artifact scan, or a
    partition-pruned delete-vector write in a table format). ΔA⋈B_final
    is the same honest fact-arrival term as the insert-only query. The
    view artifact itself stays immutable — tombstones compose at read
    time until the next base rebuild folds them in, the classic
    merge-on-read discipline."""
    root = join_view_build(spark, sf_dir)
    base_view = spark.read.parquet(os.path.join(root, "view"))

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    is_ins = ck % IVM_DIM_MOD == 0
    is_del = (~is_ins) & (ck % IVM_DEL_MOD == 0)
    is_upd = (~is_ins) & (~is_del) & (ck % IVM_UPD_MOD == 0)

    tomb_keys = cust.where(is_del | is_upd).select("c_custkey")
    plus_c = (
        cust.where(is_upd)
        .withColumn("c_mktsegment", F.lit(IVM_UPD_SEGMENT))
        .unionByName(cust.where(is_ins))
    )
    # the dim's end-of-day state: base minus deletes, updates rewritten,
    # plus onboards — corpus-sized, so never force-broadcast
    b_c_final = (
        cust.where(~is_ins & ~is_del)
        .withColumn(
            "c_mktsegment",
            F.when(is_upd, F.lit(IVM_UPD_SEGMENT)).otherwise(F.col("c_mktsegment")),
        )
        .unionByName(cust.where(is_ins))
    )

    proj = lambda o, c: o.join(c, o.o_custkey == c.c_custkey).select(  # noqa: E731
        "o_orderkey",
        "o_custkey",
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    b_o = orders.where(F.col("o_orderkey") % IVM_FACT_MOD != 0)
    d_o = orders.where(F.col("o_orderkey") % IVM_FACT_MOD == 0)
    return (
        base_view.join(
            F.broadcast(tomb_keys),
            base_view["o_custkey"] == tomb_keys["c_custkey"],
            "left_anti",
        )
        .unionByName(proj(b_o, F.broadcast(plus_c)))
        .unionByName(proj(d_o, b_c_final))
    )


# explicit artifact-read schema (the MINHASH_BUCKET_SCHEMA lesson: a
# zero-row write leaves no inferable footer)
IVM_VIEW_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, c_mktsegment string, price_c bigint"
)


def join_view_rebuild(spark: SparkSession, sf_dir: str, root: str | None = None) -> str:
    """PERIODIC BASE REBUILD — the copy-on-write half of the IVM
    lifecycle that `incremental_join_view_upserts` (merge-on-read)
    defers: fold the day's tombstones, updates, inserts and fact
    arrivals into a FRESH base-view artifact (the maintained view
    materialized), atomic-rename published next to the original.
    After the fold-in, reads are one artifact scan — no anti-join, no
    delta joins — and the next day's deltas maintain against the new
    base. The rebuild pays one maintained-view scan + write (I/O ∝
    view size), which is why it is the scheduled job and merge-on-read
    is the daily path — the compaction discipline
    (`minhash_index_compact`) applied to a materialized view."""
    import shutil
    import tempfile

    root = root or f"{join_view_root(sf_dir)}_rebuilt"
    if os.path.isdir(os.path.join(root, "view")):
        return root
    maintained = incremental_join_view_upserts(spark, sf_dir)
    stage = tempfile.mkdtemp(prefix="joinview_rebuild_")
    maintained.write.mode("overwrite").parquet(os.path.join(stage, "view"))
    from minimapreduce_spark.artifacts import claim_parent

    claim_parent(stage, join_view_root(sf_dir))  # retention derivation claim
    try:
        os.rename(stage, root)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)  # lost the race
    return root


@register("incremental_join_view_rebuild", oracle=IVM_UPSERTS_ORACLE, bench=True)
def incremental_join_view_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained view SERVED FROM THE REBUILT ARTIFACT —
    `join_view_rebuild` folds the tombstone/update/insert deltas into
    a fresh base (copy-on-write), and this query answers from that
    artifact ALONE: the plan is ONE parquet scan, zero joins
    (pytest-pinned), where the merge-on-read twin composes an
    anti-join and two delta joins at every read. Same oracle as
    `incremental_join_view_upserts` (the full recompute against the
    dim's end-of-day state) — rebuild-then-read ≡ maintain-at-read ≡
    recompute is the lifecycle's correctness chain, each link under
    the driver hash.

    Scale posture: read cost is the artifact scan (partition-prunable,
    column-prunable — what a reporting view wants); the fold-in cost
    was paid once offline. At 100 TB this is exactly the nightly
    materialized-view refresh discipline: deltas maintain during the
    day, the rebuild resets the tombstone set at night."""
    root = join_view_rebuild(spark, sf_dir)
    return spark.read.schema(IVM_VIEW_SCHEMA).parquet(os.path.join(root, "view"))
