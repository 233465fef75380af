"""Iterative graph algorithms over derived relational graphs.

The reference has no graph surface at all — its closest shape is the
iterative driver loop of mr/master.go (poll until all tasks done). This
module shows the Spark-native pattern for *data-dependent iteration*:
unrolled DataFrame iterations over a checkpointed edge frame, each
iteration one shuffle, the loop bound chosen at plan-build time.

Cross-engine determinism: ranks are carried as scaled BIGINTs
(rank × 10^12) and every update uses only integer multiply / integer
division (DIV here, // in DuckDB), so the Spark result and the DuckDB
oracle are bit-identical regardless of float summation order — the same
trick as tpch_rest._exact_sum, applied to an iterative fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimapreduce_spark.catalog import load_table
from minimapreduce_spark.registry import register

SCALE = 10**12  # rank fixed-point scale
DAMPING_NUM, DAMPING_DEN = 85, 100  # 0.85 as an exact ratio
N_ITER = 3

_PAGERANK_ORACLE = f"""
    WITH edges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    nodes AS (SELECT n_name FROM nation),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT n_name, {SCALE} // (SELECT n FROM nn) AS r FROM nodes),
    it1 AS (
      SELECT nd.n_name,
             ({SCALE} * 15 // 100) // (SELECT n FROM nn)
             + ({DAMPING_NUM} * COALESCE(sum((p.r * e.w) // o.ow), 0)) // {DAMPING_DEN} AS r
      FROM nodes nd
      LEFT JOIN edges e ON e.dst = nd.n_name
      LEFT JOIN outw o  ON o.src = e.src
      LEFT JOIN r0 p    ON p.n_name = e.src
      GROUP BY nd.n_name
    ),
    it2 AS (
      SELECT nd.n_name,
             ({SCALE} * 15 // 100) // (SELECT n FROM nn)
             + ({DAMPING_NUM} * COALESCE(sum((p.r * e.w) // o.ow), 0)) // {DAMPING_DEN} AS r
      FROM nodes nd
      LEFT JOIN edges e ON e.dst = nd.n_name
      LEFT JOIN outw o  ON o.src = e.src
      LEFT JOIN it1 p   ON p.n_name = e.src
      GROUP BY nd.n_name
    ),
    it3 AS (
      SELECT nd.n_name,
             ({SCALE} * 15 // 100) // (SELECT n FROM nn)
             + ({DAMPING_NUM} * COALESCE(sum((p.r * e.w) // o.ow), 0)) // {DAMPING_DEN} AS r
      FROM nodes nd
      LEFT JOIN edges e ON e.dst = nd.n_name
      LEFT JOIN outw o  ON o.src = e.src
      LEFT JOIN it2 p   ON p.n_name = e.src
      GROUP BY nd.n_name
    )
    SELECT n_name AS nation, CAST(r AS BIGINT) AS rank_e12 FROM it3
"""


@register("pagerank_nation_trade", oracle=_PAGERANK_ORACLE)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation→nation trade graph (edge
    cust_nation → supp_nation, weight = lineitem count), 3 unrolled
    iterations, damping 0.85.

    rank_new(v) = 0.15/N + 0.85 · Σ_{{u→v}} rank(u) · w(u,v) / outweight(u)

    carried entirely in fixed-point BIGINT (rank × 10^12): every term is
    an integer multiply + DIV, so Spark and DuckDB agree bit-for-bit —
    no float summation-order drift across 3 iterations. Dangling nodes
    (no out-edges) leak their mass, the standard simplification.

    Scale posture: the edge list is built once from the fact table
    (broadcast joins against the four dims), aggregated to at most
    N_nations² rows, then localCheckpoint'd — the three iteration joins
    re-read the materialized edges instead of re-scanning lineitem three
    times. Each iteration is one small-key shuffle. N (node count) is a
    plan-build-time count of the fixed 25-row nation dim — the same
    class of driver-side scalar as a broadcast threshold, not a
    data-path collect. Fixed-point caveat: r·w needs r·w < 2^63, i.e.
    per-edge weight < ~9×10^6 at SCALE=10^12; at a 100 TB edge count,
    pre-normalize w to per-src fractions at reduced scale first.
    """
    nation = load_table(spark, sf_dir, "nation")
    n_nodes = nation.count()  # fixed 25-row dimension; plan-build scalar
    nodes = nation.select("n_name")

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=False)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow")).localCheckpoint(eager=False)

    base = (SCALE * 15 // 100) // n_nodes
    r = nodes.select("n_name", F.lit(SCALE // n_nodes).cast("bigint").alias("r"))
    for _ in range(N_ITER):
        contrib = (
            edges.join(outw, "src")
            .join(r.select(F.col("n_name").alias("src_name"), "r"), F.col("src") == F.col("src_name"))
            .select("dst", F.expr("(r * w) DIV ow").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = (
            nodes.join(incoming, nodes.n_name == incoming.dst, "left")
            .select(
                "n_name",
                (
                    F.lit(base)
                    + F.expr(f"({DAMPING_NUM} * coalesce(s, 0)) DIV {DAMPING_DEN}")
                ).cast("bigint").alias("r"),
            )
        )
    return r.select(F.col("n_name").alias("nation"), F.col("r").alias("rank_e12"))
