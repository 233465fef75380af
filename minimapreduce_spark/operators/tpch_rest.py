"""Remaining TPC-H query shapes (SURVEY §2c — relational completeness).

With operators/relational.py and operators/tpch_more.py this closes the
full TPC-H shape family: Q2, Q7, Q8, Q9, Q11, Q13, Q15, Q16, Q17, Q20,
Q21, Q22.  The reference engine (Go MapReduce, mr/worker.go:55-157) can
express each of these only as hand-written map/reduce UDF chains; here
each is one declarative Catalyst plan.

The test star schema has no ``partsupp`` table and no
commit/receipt-date columns (TESTDATA.md), so the shapes that need them
are adapted while preserving the *plan structure* the original query
exercises:

- Q2   min-cost-supplier  → unit cost from lineitem (min price/qty per
       part+supplier) instead of ps_supplycost; same correlated-min.
- Q9   profit             → cost modeled as 0.1·p_retailprice·quantity.
- Q11  important stock    → part value from shipped revenue instead of
       ps_availqty·ps_supplycost; same HAVING-vs-global-scalar shape.
- Q16  supplier counts    → part+supplier pairs from lineitem; the
       "customer complaints" NOT-IN becomes low-acctbal suppliers.
- Q20  excess inventory   → share-of-part-quantity threshold.
- Q21  kept-waiting       → "late" is l_shipdate > o_orderdate + 60 d.

Scale posture: every dimension side (part/supplier/nation/region, and
per-part or per-supplier aggregate rows compared against a scalar) is
either broadcast or reduced before the join; facts shuffle only on
their join/agg keys; global scalars (Q11/Q15/Q17/Q22 thresholds) are
computed as 1-row aggregates and broadcast-cross-joined — never
collect()ed to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.operators.money import exact_sum, grid_c
from minimapreduce_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    # Lazy: building a Column requires an active SparkContext, so this
    # must not run at import time.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _exact_sum(expr, scale: int = 10000):
    """Order-independent exact sum of a fixed-decimal double expression.

    Monetary per-row values here have ≤4 exact decimal digits, so group
    sums frequently land *exactly* on a round-half boundary; summing
    doubles in different orders (Spark partial aggs vs DuckDB serial)
    then rounding flips the last cent non-deterministically. Scaling
    each row to an integer, summing as BIGINT (exact, associative), and
    dividing once produces bit-identical doubles in both engines. The
    oracle-side twin is ``sum(CAST(round(expr * scale) AS BIGINT)) /
    scale.0``.
    """
    return F.sum(F.round(expr * scale).cast("long")) / float(scale)


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'STANDARD' AND p_size <= 10
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT *, min(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
      FROM cost
    )
    SELECT l_partkey AS p_partkey, s_name, n_name,
           round(unit_cost, 4) AS unit_cost
    FROM best
    JOIN supplier ON l_suppkey   = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE unit_cost = best_cost AND r_name = 'EUROPE'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min — for each part, the supplier(s)
    offering the lowest unit cost, restricted to one region. One shuffle
    for the (part, supplier) agg, one for the per-part window min; the
    supplier→nation→region chain broadcasts. The double equality
    (unit_cost = best_cost) is safe cross-engine because both sides are
    the same IEEE value produced by the same min()."""
    part = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.withColumn("best_cost", F.min("unit_cost").over(W.partitionBy("l_partkey")))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        best.where(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           sum(CAST(round(volume * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON l_suppkey   = s_suppkey
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bi-directional nation-pair volume by ship year.
    The disjunctive nation-pair predicate lands after both broadcast
    nation joins; the only shuffles are lineitem ⋈ orders on orderkey
    and the final 3-key agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_exact_sum(_rev()).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS nation
      FROM lineitem
      JOIN part     ON l_partkey   = p_partkey
      JOIN supplier ON l_suppkey   = s_suppkey
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation n2 ON c_nationkey  = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      JOIN nation n1 ON s_nationkey  = n1.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
    bench=True,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a target nation's share of a region's market for
    one part type, by order year — 8-table join where every non-fact
    side broadcasts, then a conditional-ratio agg on a 1-column key."""
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(reg), F.col("c_rkey") == reg.r_regionkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("s_nkey"))
    )
    vol = _rev()
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    bench=True,
    oracle="""
    SELECT nation, o_year,
           sum(CAST(round(amount * 10000) AS BIGINT)) / 10000.0 AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part     ON l_partkey   = p_partkey
      JOIN supplier ON l_suppkey   = s_suppkey
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name pattern. ps_supplycost doesn't exist in this schema, so
    cost is modeled as 0.1·p_retailprice·quantity — same plan: fact ⋈
    broadcast part (LIKE filter pushed to the dim), fact ⋈ orders
    shuffle, broadcast supplier→nation, 2-key agg."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    amount = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(_exact_sum(amount).alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH value_per_part AS (
      SELECT l_partkey AS p_partkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS part_value_e4
      FROM lineitem
      JOIN supplier ON l_suppkey   = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT p_partkey, part_value_e4 / 10000.0 AS part_value
    FROM value_per_part
    WHERE part_value_e4 > (SELECT 0.0008 * sum(part_value_e4) FROM value_per_part)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global-scalar threshold
    (HAVING > fraction of the grand total). The per-part aggregate is
    computed once; the grand total is a 1-row re-aggregate of it,
    broadcast-cross-joined back — no collect(), no second scan of the
    fact."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.round(_rev() * 10000).cast("long")).alias("part_value_e4"))
    )
    total = per_part.agg((0.0008 * F.sum("part_value_e4")).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value_e4") > F.col("threshold"))
        .select("p_partkey", (F.col("part_value_e4") / 10000.0).alias("part_value"))
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    keeping zero-order customers via a filtered LEFT join. Two aggs:
    the first shuffles on custkey (count(o_orderkey) skips the NULLs a
    left join produces), the second on the small count domain."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_e4 / 10000.0 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_e4 = (SELECT max(rev_e4) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue. The
    per-supplier agg is an exact integer sum so the max-equality tie is
    exact in both engines; the max is a 1-row broadcast, not a global
    window (which would single-partition the agg output at scale)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.round(_rev() * 10000).cast("long")).alias("rev_e4")
    )
    top = revenue.agg(F.max("rev_e4").alias("max_rev_e4"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("rev_e4") == F.col("max_rev_e4"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_e4") / 10000.0).alias("total_revenue"))
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute,
    excluding a NOT-IN supplier set (the original's "complaints"
    subquery → low-acctbal suppliers here). The exclusion is a
    broadcast anti join — NOT IN on a nullable-free key is exactly
    left_anti, with no driver round-trip."""
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
      AND l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average as a filter
    threshold. The correlated scalar subquery becomes a window avg over
    partkey on the *unfiltered* lineitem (the correlation ranges over
    all lineitems of the part, not just the brand-filtered ones), then
    the brand filter lands via broadcast part join. Quantities are
    integer-valued doubles, so the 0.5·avg threshold is bit-identical
    across engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    with_avg = li.withColumn(
        "part_avg_qty", F.avg("l_quantity").over(W.partitionBy("l_partkey"))
    )
    return (
        with_avg.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .where(F.col("l_quantity") < 0.5 * F.col("part_avg_qty"))
        .agg(
            F.round(exact_sum(grid_c("l_extendedprice"), 100) / 7.0, 2).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey, sum(supp_qty) AS part_qty FROM pq GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM pq
    JOIN tot      USING (l_partkey)
    JOIN supplier ON l_suppkey   = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE supp_qty > 0.3 * part_qty AND r_name = 'ASIA'
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized share of some
    part's flow in a year (the original's availqty-vs-half-of-shipped
    threshold, re-based on shipped share since partsupp doesn't exist).
    The per-part total re-aggregates the (part, supplier) rollup — both
    aggs hash-partition on partkey so AQE keeps them co-located; the
    final DISTINCT is over the small supplier domain."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("supp_qty"))
    tot = pq.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        pq.join(tot, "l_partkey")
        .where(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@register(
    "q21_suppliers_kept_waiting",
    bench=True,
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM li GROUP BY l_orderkey
    )
    SELECT s_name, count(DISTINCT li.l_orderkey) AS numwait
    FROM li
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE late AND n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier
    finished orders ("late" = shipped >60 days after the order date,
    standing in for receipt>commit which this schema lacks). The
    original's EXISTS/NOT-EXISTS pair collapses into one per-order
    aggregate (distinct suppliers, distinct late suppliers) joined back
    to the late rows — two shuffles on orderkey instead of two
    self-joins."""
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    # Per-order supplier counts as windows over the join key rather than
    # an aggregate joined back: the join-back form makes Catalyst
    # recompute the lineitem ⋈ orders join for BOTH references (no
    # cross-branch subplan reuse) — two full fact scans at 100 TB.
    w = W.partitionBy("l_orderkey")
    counted = li.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late", F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        counted.where(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 2, 3, 4, 5)
      AND c_acctbal > (
        SELECT avg(c_acctbal) FROM customer
        WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 4, 5)
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers from a nation
    set with no *recent* orders (every synthetic customer has at least
    one order overall, so the churn cutoff keeps the NOT-EXISTS
    non-degenerate; the nationkey list stands in for the phone country
    codes). Scalar avg → 1-row broadcast cross join; NOT EXISTS →
    left_anti against the filtered orders custkey projection."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(1, 2, 3, 4, 5))
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
