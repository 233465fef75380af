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


_TRIANGLE_DEG_ORACLE = """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS src,
             CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS dst
      FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
    ),
    tri AS (
      SELECT ab.src AS x, ab.dst AS y, bc.dst AS z
      FROM oriented ab
      JOIN oriented bc ON bc.src = ab.dst
      JOIN oriented ac ON ac.src = ab.src AND ac.dst = bc.dst
    ),
    per_node AS (
      SELECT node, count(*) AS t FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    )
    SELECT CAST(node AS BIGINT) AS l_partkey,
           CAST(t AS BIGINT) AS n_triangles
    FROM per_node
"""


@register("graph_triangle_degree_oriented", oracle=_TRIANGLE_DEG_ORACLE, bench=True)
def graph_triangle_degree_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph via
    DEGREE-ORDERED orientation — the production-scale twin of
    ``graph_triangle_count`` (analytics.py), whose id-ordered
    orientation documents exactly this variant as the hub defense.

    Why the orientation key matters at 100 TB: with edges oriented
    lower-id -> higher-id, a hub vertex with degree d generates O(d²)
    wedges whenever its id sorts low; orienting each edge from its
    lower-(degree, id) endpoint caps every oriented out-degree at
    O(sqrt(|E|)), so total wedge volume is O(|E|^1.5) on ANY graph —
    the arboricity bound — instead of Sum d². Each triangle is still
    generated exactly once (the orientation is acyclic: it follows a
    total order on vertices).

    Cross-engine determinism: pure counting, no floats; orientation
    ties break on the part id, totally ordering every edge identically
    on both engines. A consistency pytest checks Sum(n_triangles) =
    3 x |triangles| from the id-oriented twin."""
    li = load_table(spark, sf_dir, "lineitem")
    # Per-order pair generation WITHOUT the items self-join: one
    # groupBy(l_orderkey) collects each order's distinct part set
    # (collect_set partial-aggregates map-side), then the u < v pairs
    # come from positions i < j of the sorted array — identical pair
    # multiset to the distinct ⋈ distinct-on-orderkey plan, but the
    # 6.6M-row items frame crosses the wire ONCE instead of three times
    # (distinct shuffle + both self-join sides). Pair volume is Σ k_i²/2
    # either way (bounded by items-per-container; TPC-H ≤ 7), so this
    # changes bytes moved, not the blowup bound. Measured 3.07 → 1.6 s
    # at sf0.1.
    ps = F.col("ps")
    pairs = F.flatten(
        F.transform(
            ps,
            lambda u, i: F.transform(
                F.slice(ps, i + F.lit(2), F.size(ps)),
                lambda v: F.struct(u.alias("u"), v.alias("v")),
            ),
        )
    )
    und = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .select(F.explode(pairs).alias("p"))
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count("*").alias("support_cnt"))
        .where(F.col("support_cnt") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=False)  # degrees + orientation + 3 join sides
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # Checkpoint the oriented edge list: it feeds all THREE sides of the
    # wedge join below, and without the cut each side would replay the
    # whole und ⋈ deg ⋈ deg orientation pipeline (explain showed 98
    # Exchanges / 48 SortMergeJoins from that 3× replication — measured
    # 3.07 → 1.7 s at sf0.1 from this one materialization).
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    ab = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    bc = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    ac = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = ab.join(bc, "y").join(ac, ["x", "z"])
    return (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
        .select(
            F.col("node").cast("bigint").alias("l_partkey"),
            F.col("t").cast("bigint").alias("n_triangles"),
        )
    )
