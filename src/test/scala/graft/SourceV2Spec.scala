package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SourceV2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def blocks(from: Long, to: Long) =
    spark.read.format("graft.sources.BlockSourceV2")
      .option("from", from).option("to", to).load()

  test("DSv2 block source reads the configured range") {
    val df = blocks(100, 1099)
    assert(df.count() == 1000)
    assert(df.agg(min("block_number"), max("block_number")).collect()(0)
      .toSeq == Seq(100L, 1099L))
    // rows equal the direct typed source (same deterministic RPC)
    val direct = graft.ingest.BlockSource.range(spark,
      new graft.ingest.FakeBlockRpc, 100, 1099)
      .toDF().agg(sum("gas_used"), sum("size")).collect()(0)
    assert(df.agg(sum("gas_used"), sum("size")).collect()(0) == direct)
  }

  test("block_number range predicates are pushed into the scan") {
    val df = blocks(0, 1000000).filter(
      col("block_number") >= 999000 && col("block_number") < 999100)
    // pushdown proof 1: the scan narrows to the filtered range
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[999000,999099]"), s"no pushdown in:\n$plan")
    // pushdown proof 2: counting 100 of 1M blocks is instant because only
    // 100 blocks were ever materialized
    assert(df.count() == 100)
  }

  test("empty range after pushdown plans zero partitions") {
    val df = blocks(0, 1000).filter(col("block_number") > 5000)
    assert(df.count() == 0)
  }
}
