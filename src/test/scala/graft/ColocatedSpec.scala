package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Colocated

/** Bucketed co-located join: result parity with the plain parquet join
  * and the no-join-side-exchange plan contract. */
class ColocatedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed join result == plain parquet join; no exchange under the join") {
    val bucketed = Colocated.bucketedJoin(spark, dir)
    val plain = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy("o_orderpriority")
    assert(bucketed.collect().toSeq.map(_.toSeq) ==
      plain.collect().toSeq.map(_.toSeq))
    val finalPlan = bucketed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.linesIterator.count(_.contains("Bucketed: true")) == 2)
    assert(finalPlan.linesIterator
      .count(_.contains("Exchange hashpartitioning")) == 1,
      "only the post-join rollup may shuffle")
  }
}
