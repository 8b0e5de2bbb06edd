package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Sharding

/** Scalable global row number + shard assignment: parity with the
  * single-task window, the no-global-window plan property, determinism,
  * and the token-balance outcome the round-robin packing promises. */
class ShardingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def assigned = Sharding.shardAssign(spark, dir)

  test("rank matches the naive global window bit-for-bit") {
    val docs = Tables.load(spark, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val naive = docs.select(col("doc_id"), nTok.as("n_tokens"))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_tokens").desc, col("doc_id")))
        .cast("long"))
      .select("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = assigned.select("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == naive)
  }

  test("physical plan contains NO empty-partition-spec window") {
    val df = assigned
    df.collect() // finalize AQE so the true executed plan is inspectable
    val plan = df.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty, s"expected the per-partition-id window\n$plan")
    windowLines.foreach { l =>
      assert(l.contains("_pid"),
        "a window not partitioned by _pid serializes the corpus into one " +
          s"task — the exact shape globalRowNumber exists to avoid:\n$l")
    }
  }

  test("deterministic across runs") {
    val a = assigned.collect().map(_.toSeq).toSeq
    val b = assigned.collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("prefix sum matches the naive global running-sum window bit-for-bit") {
    val docs = Tables.load(spark, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val base = docs.select(col("doc_id"), nTok.as("n_tokens"))
      .withColumn("draw", expr(graft.ops.Sharding.ShuffleDrawSql))
    val naive = base.withColumn("cum", sum("n_tokens")
        .over(Window.orderBy(col("draw"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = graft.ops.Sharding.packBatches(spark, dir)
      .select("doc_id", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == naive)
  }

  test("packing: first batch is 0, ids never decrease, formula holds") {
    val rows = graft.ops.Sharding.packBatches(spark, dir)
      .orderBy("cum_tokens")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val budget = graft.ops.Sharding.PackBudget
    assert(rows.head._3 == 0L)
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    // each doc STARTS in its assigned batch: (cum - n) div budget
    rows.foreach { case (n, cum, id) => assert((cum - n) / budget == id) }
  }

  test("round-robin packing balances token mass across shards") {
    val sums = assigned.groupBy("shard").agg(sum("n_tokens").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.length == Sharding.NumShards)
    // descending-order round-robin keeps shard totals within the largest
    // single document of each other in theory; allow 5% slack for ties
    val spread = (sums.max - sums.min).toDouble / sums.max
    assert(spread < 0.05, s"shard token totals too skewed: ${sums.toSeq}")
  }
}
