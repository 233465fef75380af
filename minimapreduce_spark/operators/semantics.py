"""SQL NULL-semantics showcase.

The reference engine has no NULLs at all — its data model is
non-nullable strings (SURVEY §1), so every NULL behavior below is new
surface the Spark engine must get right: three-valued logic in
predicates, NULL-skipping aggregates, null-safe equality, and empty-set
aggregates. One oracle-checked query pins them against DuckDB so a
regression in any of these semantics (e.g. a filter rewrite that turns
``<=>`` into ``=``) breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.registry import register


@register(
    "null_semantics_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                   AS c_star,
           count(nullif(o_orderstatus, 'P'))          AS c_col,
           count(DISTINCT nullif(o_orderstatus, 'P')) AS c_distinct,
           CAST(sum(CASE WHEN nullif(o_orderstatus, 'P')
                          IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
                AS BIGINT)                            AS c_null_safe_eq,
           coalesce(sum(CASE WHEN o_orderstatus = 'X'
                             THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        END) / 100.0, -1.0)           AS sum_empty_coalesced,
           CAST(sum(CASE WHEN o_orderstatus <> 'P' OR o_orderstatus IS NULL
                         THEN 0 ELSE 1 END) AS BIGINT) AS c_p_rows
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def null_semantics_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics under aggregation, all pinned in one result:

    - ``count(*)`` counts rows, ``count(col)`` skips NULLs,
      ``count(DISTINCT col)`` ignores NULL as a value;
    - ``<=>`` (null-safe equality) is true for NULL vs NULL where
      ``=`` would be unknown;
    - an aggregate over the empty set is NULL (not 0) — surfaced via
      ``coalesce(sum(...), -1)``;
    - three-valued logic: ``x <> 'P'`` is unknown for NULL x, so the
      complement needs an explicit ``IS NULL`` arm.

    NULLs are injected deterministically with ``nullif`` since the
    source tables are fully populated."""
    orders = load_table(spark, sf_dir, "orders")
    status_n = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("c_star"),
        F.count(status_n).alias("c_col"),
        F.countDistinct(status_n).alias("c_distinct"),
        F.sum(F.when(status_n.eqNullSafe(F.lit(None).cast("string")), 1).otherwise(0))
        .cast("bigint")
        .alias("c_null_safe_eq"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "X",
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                )
            )
            / 100.0,
            F.lit(-1.0),
        ).alias("sum_empty_coalesced"),
        F.sum(
            F.when(
                (F.col("o_orderstatus") != "P") | F.col("o_orderstatus").isNull(), 0
            ).otherwise(1)
        )
        .cast("bigint")
        .alias("c_p_rows"),
    )


@register(
    "datetime_arithmetic_showcase",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT)                    AS order_quarter,
           CAST(date_diff('day', TIMESTAMP '2000-01-01', o_orderdate)
                AS BIGINT)                                          AS days_since_y2k,
           date_trunc('month', o_orderdate)                        AS month_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP)                AS month_end,
           o_orderdate + INTERVAL 3 MONTH                          AS plus_quarter,
           CAST(epoch(o_orderdate) AS BIGINT)                      AS epoch_s
    FROM orders
    """,
)
def datetime_arithmetic_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic the reference's string-only model couldn't
    express at all: quarters, day distances, month truncation/ends,
    calendar-aware interval addition (month-end clamping behaves the
    same in both engines), and epoch conversion (exact under the pinned
    UTC session). All codegen'd JVM expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.datediff(F.col("o_orderdate"), F.lit("2000-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_y2k"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.expr("o_orderdate + INTERVAL 3 MONTH").alias("plus_quarter"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "array_set_ops",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             list_sort(list_distinct(list(o_orderstatus))) AS statuses
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey,
           array_to_string(statuses, ',') AS statuses,
           -- DuckDB's array_to_string returns NULL (not '') for an
           -- empty list; Spark's array_join returns '' — coalesce the
           -- columns that can legitimately empty out.
           coalesce(array_to_string(
             list_sort(list_filter(statuses, s -> s IN ('F', 'O'))), ','), '')
             AS inter_fo,
           array_to_string(list_sort(list_distinct(list_concat(statuses, ['X']))), ',')
             AS union_x,
           coalesce(array_to_string(
             list_sort(list_filter(statuses, s -> s <> 'P')), ','), '')
             AS except_p
    FROM per_cust
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra over collected groups: per-customer distinct
    status sets, then intersect / union / except with literal sets —
    the array-column manipulation layer (collect_set, array_intersect,
    array_union, array_except, array_sort) the reference's flat
    string-pair model had no analog for. Arrays serialize through
    array_join so the cross-engine value hash is representation-free.
    One shuffle: the per-customer collect_set."""
    orders = load_table(spark, sf_dir, "orders")
    statuses = F.array_sort(F.collect_set("o_orderstatus"))
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        statuses.alias("statuses")
    )
    return per_cust.select(
        "custkey",
        F.array_join("statuses", ",").alias("statuses"),
        F.array_join(
            F.array_sort(F.array_intersect("statuses", F.array(F.lit("F"), F.lit("O")))), ","
        ).alias("inter_fo"),
        F.array_join(
            F.array_sort(F.array_union("statuses", F.array(F.lit("X")))), ","
        ).alias("union_x"),
        F.array_join(
            F.array_sort(F.array_except("statuses", F.array(F.lit("P")))), ","
        ).alias("except_p"),
    )


@register(
    "decimal_exact_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                AS DECIMAL(30,4)) AS VARCHAR)                     AS revenue,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                AS DECIMAL(30,2)) AS VARCHAR)                     AS sum_qty,
           count(*)                                              AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def decimal_exact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic — the money-safe type family the engine
    supports beyond DOUBLE: prices and discounts widen to DECIMAL(18,4),
    multiply exactly (scale 8), and sum without floating error in ANY
    aggregation order, which is the property that makes decimal the
    100 TB accounting type (no scaled-integer workaround needed). The
    result surfaces as the decimal's exact string form — a terminal
    CAST to DOUBLE would reintroduce a last-ulp that diverges between
    engines once sums pass ~2^45 (observed in the 10× scale-up run)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,4)")
    d = F.col("l_discount").cast("decimal(18,4)")
    one = F.lit(1).cast("decimal(18,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(p * (one - d)).cast("decimal(30,4)").cast("string").alias("revenue"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(30,2)")
        .cast("string")
        .alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT coalesce(o_orderpriority, '<all>') AS priority,
           coalesce(o_orderstatus, '<all>')   AS status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() flags: subtotal rows are distinguishable
    from genuine NULL group keys — the metadata that makes rollup
    results safely machine-consumable. The flags come from the same
    Expand operator as the rollup itself; no extra pass."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            "g_priority",
            "g_status",
            "n_orders",
        )
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                          AS n_all,
           count(*) FILTER (WHERE o_orderstatus = 'F')       AS n_finished,
           count(*) FILTER (WHERE o_totalprice > 300000)     AS n_large,
           CAST(sum(round(o_totalprice * 100)::BIGINT)
                FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clauses — per-aggregate predicates in one pass
    (the SQL-standard form of conditional aggregation; Catalyst plans
    it identically to CASE-WHEN inputs, one scan + one hash agg)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("filter_clause_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*)                                            AS n_all,
               count(*) FILTER (WHERE o_orderstatus = 'F')         AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 300000)       AS n_large,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O') AS BIGINT)  AS open_cents
        FROM filter_clause_orders
        GROUP BY o_orderpriority
        """
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           )                              AS last_order,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           )                              AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-window family (first_value / last_value / nth_value):
    each customer's first, last, and second order. last/nth need the
    full-partition frame (the default frame stops at CURRENT ROW —
    the classic last_value gotcha); ordering carries an o_orderkey
    tiebreak so results are deterministic."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@register(
    "lateral_top2_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer,
    LATERAL (
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    )
    WHERE c_nationkey = 7
    """,
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — each customer's two largest
    orders via a per-row dependent subquery (the SQL-standard spelling
    of per-group top-k; Catalyst rewrites it into the same
    window/rank plan as the explicit form, so there's no
    nested-loop execution)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM lat_customer,
        LATERAL (
          SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
          FROM lat_orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        )
        WHERE c_nationkey = 7
        """
    )


@register(
    "set_ops_multiset",
    oracle="""
    SELECT status, cnt FROM (
      SELECT 'except_all' AS tag, o_orderstatus AS status, count(*) AS cnt FROM (
        SELECT o_orderstatus FROM orders WHERE o_orderpriority <> '5-LOW'
        EXCEPT ALL
        SELECT o_orderstatus FROM orders WHERE o_totalprice > 250000
      ) GROUP BY o_orderstatus
      UNION ALL
      SELECT 'intersect_all', o_orderstatus, count(*) FROM (
        SELECT o_orderstatus FROM orders WHERE o_orderpriority <> '5-LOW'
        INTERSECT ALL
        SELECT o_orderstatus FROM orders WHERE o_totalprice > 250000
      ) GROUP BY o_orderstatus
    )
    """,
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL keep
    duplicate cardinalities (|A⧵B| = max(count_A − count_B, 0) per
    value), unlike the distinct-set variants in set_ops_customers.
    Rolled up to counts so the result is order-free."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderpriority") != "5-LOW").select("o_orderstatus")
    b = orders.where(F.col("o_totalprice") > 250000).select("o_orderstatus")
    ex = (
        a.exceptAll(b)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("o_orderstatus").alias("status"), "cnt")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("o_orderstatus").alias("status"), "cnt")
    )
    return ex.unionByName(inter)


@register(
    "page_orders_offset",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def page_orders_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: global ORDER BY with LIMIT/OFFSET (rows
    101–150 of the price leaderboard). The o_orderkey tiebreak makes
    the page deterministic; prices are 2-decimal doubles, so the sort
    compares identical values in both engines. (At 100 TB, deep OFFSET
    pages degrade — a keyset predicate is the scale path; this pins the
    semantics of the SQL construct itself.)"""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
        .offset(100)
        .limit(50)
    )


@register(
    "map_agg_event_counts",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           count(*)                                              AS n_types,
           CAST(coalesce(sum(n) FILTER (event_type = 'purchase'), 0) AS BIGINT)
             AS n_purchases,
           string_agg(event_type || ':' || n, ',' ORDER BY event_type)
             AS type_counts
    FROM per
    GROUP BY user_id
    """,
)
def map_agg_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: aggregate each user's event history into a real
    ``map<string,bigint>`` (event_type → count), then read it back out
    with map functions — ``size``, ``element_at`` point lookup, and a
    ``map_entries`` + ``transform`` fold into a canonical string.

    The map is built with ``map_from_entries(array_sort(collect_list(
    struct(...))))`` — the array_sort is the engine's determinism
    contract (SURVEY §1): collect_list order depends on which shuffle
    partition fed the group, exactly like the reference's Reduce values
    slice (mr/worker.go:137), so any map serialization must sort first.
    The oracle builds the same answer relationally — proving the map
    round-trip loses nothing.

    Scale: two hash aggs on (user_id[, event_type]) — the second
    reuses the first's user_id-compatible partitioning; per-user state
    is bounded by event-type cardinality (5), not event count.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    g = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    entry_str = lambda e: F.concat_ws(":", e["key"], e["value"].cast("string"))  # noqa: E731
    return g.select(
        "user_id",
        F.size("m").cast("bigint").alias("n_types"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("n_purchases"),
        F.concat_ws(",", F.transform(F.map_entries("m"), entry_str)).alias(
            "type_counts"
        ),
    )


@register(
    "sort_nulls_ordering",
    oracle="""
    WITH gaps AS (
      SELECT o_orderkey, o_custkey,
             datediff('day', o_orderdate,
                      lead(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey))
               AS gap_days
      FROM orders
    )
    SELECT o_orderkey, o_custkey, gap_days
    FROM gaps
    ORDER BY gap_days ASC NULLS FIRST, o_orderkey
    LIMIT 20
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ORDER BY — the cross-engine trap this
    engine refuses to leave implicit: Spark defaults to NULLS FIRST on
    ASC, DuckDB to NULLS LAST, so any sorted output with nullable keys
    silently diverges unless the placement is spelled out. Here the
    nullable key is real (each customer's final order has no next-order
    gap), the placement is explicit on BOTH engines (asc_nulls_first ≡
    ASC NULLS FIRST), and the tie-break key makes the LIMIT
    deterministic.

    Scale posture: one shuffle on custkey for the lead window; the
    global top-k is a TakeOrdered — no full sort materialization.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.lead(F.col("o_orderdate").cast("date")).over(w),
            F.col("o_orderdate").cast("date"),
        ).alias("gap_days"),
    )
    return gaps.orderBy(
        F.col("gap_days").asc_nulls_first(), F.col("o_orderkey").asc()
    ).limit(20)


@register(
    "explode_outer_semantics",
    oracle="""
    WITH arr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),
                         w -> len(w) >= 12) AS lw
      FROM documents
    ),
    ex AS (SELECT doc_id, unnest(lw) AS long_word FROM arr)
    SELECT a.doc_id, e.long_word
    FROM arr a LEFT JOIN ex e USING (doc_id)
    """,
)
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode`` vs ``explode_outer`` — the row-dropping trap: plain
    explode silently DELETES every document whose array is empty (here:
    docs with no 12+-letter words), which in a pipeline reads as data
    loss, not as "no matches". explode_outer keeps the parent row with
    a NULL element — the semantics a LEFT JOIN against the unnested
    rows reproduces, which is exactly how the oracle states it.

    Scale posture: pure per-row projection, no shuffle; the NULL rows
    cost nothing and preserve auditability (counts reconcile against
    the input)."""
    docs = load_table(spark, sf_dir, "documents")
    lw = F.filter(
        F.split("text", r"[^A-Za-z]+"), lambda w: F.length(w) >= 12
    )
    return docs.select(
        "doc_id", F.explode_outer(lw).alias("long_word")
    )


@register(
    "union_schema_evolution",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             o_orderpriority AS priority
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (FROM v1 UNION ALL BY NAME FROM v2)
    SELECT coalesce(priority, '(pre-upgrade)') AS priority,
           count(*) AS n_orders,
           CAST(count(priority) AS BIGINT) AS n_with_priority,
           round(sum(price_c) / 100.0, 2) AS total_price
    FROM unioned GROUP BY 1
    """,
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: combine a v1 batch (no ``priority``
    column — even orderkeys stand in for pre-upgrade files) with a v2
    batch that added it, via ``unionByName(allowMissingColumns=True)``
    — missing columns become NULLs, by NAME, never by position (the
    silent-corruption mode of positional UNION when a column was
    inserted mid-schema). The rollup shows the canonical downstream
    handling: NULL priority surfaces as an explicit '(pre-upgrade)'
    bucket and ``count(col)`` vs ``count(*)`` quantifies coverage.

    Scale posture: a metadata-only concat (no shuffle) + one hash agg;
    this is how heterogeneous parquet generations coexist in one scan
    at 100 TB (parquet's mergeSchema read is the file-level analog).
    """
    orders = load_table(spark, sf_dir, "orders")
    price_c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    v1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", price_c.alias("price_c")
    )
    v2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        price_c.alias("price_c"),
        F.col("o_orderpriority").alias("priority"),
    )
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce("priority", F.lit("(pre-upgrade)")).alias("priority")
    ).agg(
        F.count("*").alias("n_orders"),
        F.count("priority").cast("bigint").alias("n_with_priority"),
        F.round(F.sum("price_c") / 100.0, 2).alias("total_price"),
    )


@register(
    "try_arithmetic_semantics",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(count(CASE WHEN o_orderkey % 10 <> 0
                           THEN o_totalprice / (o_orderkey % 10) END)
                AS BIGINT) AS n_divisible,
           CAST(count(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
                AS BIGINT) AS n_numeric_prefix,
           CAST(count(TRY_CAST(o_orderstatus AS BIGINT)) AS BIGINT)
             AS n_status_numeric
    FROM orders GROUP BY o_orderpriority
    """,
)
def try_arithmetic_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression semantics: ``try_divide`` yields NULL on a
    zero divisor (never a job abort — at 100 TB one poison row must not
    kill the stage) and ``try_cast`` yields NULL on malformed input
    ('1-URGENT' → 1 via its prefix; 'F'/'O'/'P' → NULL). The NULL-count
    aggregation quantifies how much data each guard absorbed — the
    dead-letter accounting a robust pipeline reports instead of
    swallowing.

    DuckDB oracle: TRY_CAST is portable; the zero-divisor guard is the
    explicit CASE that try_divide desugars to.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 10)
        ).cast("bigint").alias("n_divisible"),
        F.count(
            F.try_to_number(F.substring("o_orderpriority", 1, 1), F.lit("9"))
        ).cast("bigint").alias("n_numeric_prefix"),
        F.count(F.col("o_orderstatus").try_cast("bigint")).cast("bigint").alias(
            "n_status_numeric"
        ),
    )
