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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank _))

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

  val oracle: Map[String, String] = Map("graph_pagerank" -> oracleSql)
}
