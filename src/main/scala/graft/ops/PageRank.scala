package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed PageRank — the iterative-graph workload class (the other
  * one, next to [[Components]]' connected components), engine-exact
  * across 10 damped power iterations.
  *
  * Graph: the customer↔supplier trade graph from orders × lineitem —
  * a customer links to every supplier it bought from and back (node
  * spaces disjoint via +100000 on suppliers). The symmetric closure
  * means every node has out-edges, so no dangling-mass term is needed
  * (a general dangling treatment is one extra 1-row aggregate per
  * round — same machinery, documented rather than dead-coded here).
  *
  * Determinism contract (the [[TextAnalysis.classifierTrain]] recipe):
  * per-edge contributions are rounded to 12 dp in DOUBLE — identical
  * IEEE value on both engines — then cast to DECIMAL(38,18) so the
  * per-node SUM is exact integer arithmetic, independent of
  * aggregation order; the damped update re-rounds to 12 dp. The DuckDB
  * oracle replays the identical expression tree as 10 unrolled CTEs.
  *
  * Scale shape: ranks and edges shuffle on the node id only (join on
  * src, aggregate on dst — the same key layout Pregel uses); outdeg is
  * precomputed once and rides the edge table; each iteration is ONE
  * join + ONE aggregate, localCheckpoint'd so lineage stays flat (at
  * 100 TB: checkpoint to durable storage every few rounds, same call).
  * The only driver-side values are the node count and the loop —
  * never a rank vector.
  */
object PageRank {

  val PrIters = 10
  val Damping = 0.85

  /** Edges with the source's out-degree attached, built once;
    * [[pagerank]] re-partitions them on src (the loop's join key) with
    * a data-sized partition count, so no iteration re-shuffles them. */
  private def edgesWithDeg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 100000L).as("supp"))
      .distinct()
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    edges.join(outdeg, "src").localCheckpoint()
  }

  /** Target edge rows per loop partition: the static stand-in for
    * AQE's coalescing (AQE is off inside the loop — see below). */
  val EdgeRowsPerPartition = 100000L

  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val ed0 = edgesWithDeg(s, dir)
    // size the loop's partitioning from the data, capped at the
    // cluster's parallelism — exactly what AQE's coalescing would pick,
    // decided once so every round keeps the SAME partitioning (AQE
    // itself must stay off inside the loop: its re-planning invalidates
    // the carried co-partitioning and reinserts per-round exchanges)
    val parts = math.max(1L, math.min(
      s.sparkContext.defaultParallelism.toLong,
      ed0.count() / EdgeRowsPerPartition + 1)).toInt
    val ed = ed0.repartition(parts, col("src")).localCheckpoint()
    // nodes partitioned on node: the left join against per-round
    // contributions (hash-partitioned on dst by their aggregate) is
    // then co-partitioned — no exchange on either side
    val nodes = ed.select(col("src").as("node")).distinct()
      .repartition(parts, col("node")).localCheckpoint()
    val n = nodes.count()
    val base = 0.15 / n // raw double, same expression as the oracle's
    var ranks = nodes.withColumn("rank", round(lit(1.0 / n), 12))
    val aqeBefore = s.conf.get("spark.sql.adaptive.enabled", "true")
    val spBefore = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      // each round costs exactly ONE exchange (the dst aggregate):
      // ranks leave every round partitioned on node == the next join's
      // key, the edge side is pinned above, and shuffle_hash joins skip
      // the per-round sorts a merge join would redo on the same data
      for (i <- 1 to PrIters) {
        val contrib = ranks.join(ed.hint("shuffle_hash"),
            col("node") === col("src"))
          .select(col("dst"),
            round(col("rank") / col("outdeg"), 12)
              .cast("decimal(38,18)").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
        val next = nodes.join(contrib.hint("shuffle_hash"),
            col("node") === col("dst"), "left")
          .select(col("node"),
            round(lit(base) + lit(Damping) *
              coalesce(col("sc").cast("double"), lit(0.0)), 12).as("rank"))
        // cut lineage every few rounds — one materialization per cut,
        // not per round (at 100 TB: durable checkpoint, same cadence)
        ranks = if (i % 4 == 0 || i == PrIters) next.localCheckpoint()
          else next
      }
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      s.conf.set("spark.sql.shuffle.partitions", spBefore)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  /** Distributed triangle counting (the third graph workload, next to
    * PageRank and connected components) over the part CO-PURCHASE graph
    * (parts sharing an order, id-deduped).
    *
    * Degree-ordered edge orientation (Suri & Vassilvitskii, WWW'11 /
    * the standard "compact-forward" trick): every edge points from its
    * lower-(degree, id) endpoint to the higher, so each triangle is
    * counted exactly once AND every wedge enumeration fans out over
    * out-neighborhoods bounded by O(√m) — a hub with millions of
    * co-purchases never anchors the wedge join; its edges all point
    * INTO it. The closing-edge check is an equi-join on the oriented
    * pair (never a cross product); the triangle count is
    * orientation-independent, so the oracle replays a plain id-ordered
    * 3-way join. */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val (pairs, tri) = triangleDataflow(s, dir)
    // 1-row × 1-row stats join — the only nested-loop in the query, by
    // construction over two scalar aggregates (the dataflow itself is
    // plan-asserted cross-product-free in PLANS.md §graph_triangles)
    pairs.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** (distinct co-purchase edges, closed-triangle rows) — the asserted
    * dataflow, shared by the gate and the plan section. */
  private[graft] def triangleDataflow(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      // LAZY checkpoint: edges feed degree + orientation + closure, but
      // materialize only when a consumer runs — the plan gate stringifies
      // this dataflow without paying the self-join jobs
      .localCheckpoint(false)
    val deg = pairs.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient: (s → t) with (d_s, s) < (d_t, t); carry t's rank key so
    // wedge endpoints order without another degree join
    val oriented = pairs
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(
            struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint(false)
    val w1 = oriented.select(col("s"), col("t").as("a"), col("dt").as("da"))
    val w2 = oriented.select(col("s"), col("t").as("b"), col("dt").as("db"))
    val wedges = w1.join(w2, Seq("s"))
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("a"), col("b"))
    val tri = wedges.join(
      oriented.select(col("s").as("a"), col("t").as("b")), Seq("a", "b"))
    (pairs, tri)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank _),
    "graph_triangles" -> (triangles _))

  /** 10 unrolled damped iterations in DuckDB — same rounding points,
    * same DECIMAL(38,18) contribution sums. */
  private def oracleSql: String = {
    val iters = (1 to PrIters).map { k =>
      s"""r$k AS (
        SELECT n.node,
          ROUND(0.15/(SELECT n FROM nn) + $Damping *
            CAST(COALESCE(c.s, 0) AS DOUBLE), 12) AS rank
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node,
            SUM(CAST(ROUND(r.rank / e.outdeg, 12) AS DECIMAL(38,18))) AS s
          FROM r${k - 1} r JOIN edeg e ON r.node = e.src
          GROUP BY e.dst) c
        ON n.node = c.node)"""
    }.mkString(",\n")
    s"""
      WITH pairs AS (
        SELECT DISTINCT o_custkey AS cust, 100000 + l_suppkey AS supp
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      ed AS (
        SELECT cust AS src, supp AS dst FROM pairs
        UNION ALL
        SELECT supp AS src, cust AS dst FROM pairs),
      outd AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY src),
      edeg AS (
        SELECT ed.src, ed.dst, outd.outdeg
        FROM ed JOIN outd ON ed.src = outd.src),
      nodes AS (SELECT DISTINCT src AS node FROM ed),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT node, ROUND(1.0/(SELECT n FROM nn), 12) AS rank
             FROM nodes),
      $iters
      SELECT node, ROUND(rank, 6) AS rank FROM r$PrIters ORDER BY node"""
  }

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> oracleSql,
    // orientation-independent count: the plain id-ordered 3-way join
    "graph_triangles" -> """
      WITH pp AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM pp) AS n_edges,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM pp e1 JOIN pp e2 ON e1.v = e2.u
         JOIN pp e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles""")
}
