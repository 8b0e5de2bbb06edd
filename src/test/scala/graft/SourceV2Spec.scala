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

  test("pushed COUNT/MIN/MAX fetch ZERO blocks; unanswerable aggs still fetch") {
    import graft.ingest.FakeBlockRpc
    val agg = blocks(1000, 5999)
      .filter(col("block_number") >= 2000 && col("block_number") < 4000)
      .agg(expr("COUNT(*)").as("n"),
        min(col("block_number")).as("mn"), max(col("block_number")).as("mx"))
    FakeBlockRpc.fetches.set(0L)
    assert(agg.collect().toSeq.map(_.toSeq) == Seq(Seq(2000L, 2000L, 3999L)))
    assert(FakeBlockRpc.fetches.get() == 0L,
      "a completely-pushed aggregate must not fetch any block")
    assert(agg.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    // SUM(gas_used) is not range arithmetic: the source must refuse the
    // push and the row scan fetches exactly the filtered range
    FakeBlockRpc.fetches.set(0L)
    blocks(1000, 5999)
      .filter(col("block_number") >= 2000 && col("block_number") < 4000)
      .agg(sum(col("gas_used"))).collect()
    assert(FakeBlockRpc.fetches.get() == 2000L)
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

  // ------------------------------------------------------------ log source

  private def logs(from: Long, to: Long) = {
    graft.fixtures.MakerFixtures.ensure(spark)
    spark.read.format("graft.sources.LogSourceV2")
      .option("path", graft.fixtures.MakerFixtures.rawLogsPath)
      .option("from", from).option("to", to)
      .option("blocksStep", 100000L)
      .load()
  }

  test("DSv2 log source reads the configured range and matches the parquet") {
    val lo = 8928160L
    val hi = 20000000L
    val df = logs(lo, hi)
    val expected = spark.read.parquet(graft.fixtures.MakerFixtures.rawLogsPath)
      .filter(col("block_number").between(lo, hi)).count()
    assert(df.count() == expected && expected > 1000)
  }

  test("log source pushes block range and address equality into the scan") {
    val vatAddr = spark.read
      .parquet(graft.fixtures.MakerFixtures.truthPath("contracts"))
      .filter(col("name") === "vat").head().getAs[Array[Byte]]("address")
    val df = logs(0, 20000000L)
      .filter(col("address") === lit(vatAddr))
      .filter(col("block_number") >= 9000000L && col("block_number") < 9500000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[9000000,9499999]"), s"no range pushdown in:\n$plan")
    assert(plan.contains("address=pushed"), s"no address pushdown in:\n$plan")
    // all rows really are vat rows in range (the fake applies the pushed
    // filters server-side; Spark re-applies them too — same result)
    val expected = spark.read.parquet(graft.fixtures.MakerFixtures.rawLogsPath)
      .filter(col("address") === lit(vatAddr) &&
        col("block_number") >= 9000000L && col("block_number") < 9500000L)
      .count()
    assert(df.count() == expected && expected > 0)
  }

  test("DSv2 log scan never materializes the corpus on the driver") {
    graft.ingest.LogSource.clearReplayCache()
    val df = logs(8928160L, 20000000L)
    assert(df.count() > 1000)
    // the scan planned on the counts-only index and read executor-side —
    // the driver-side replay corpus cache must stay empty
    assert(graft.ingest.LogSource.replayCacheSize == 0,
      "DSv2 scan populated the driver-side replay corpus cache")
    assert(graft.ingest.BlockCountIndex.cacheSize > 0,
      "DSv2 scan should have built the counts-only planning index")
  }

  test("executor-side slice read matches the driver replay corpus exactly") {
    graft.fixtures.MakerFixtures.ensure(spark)
    val path = graft.fixtures.MakerFixtures.rawLogsPath
    val rpc = new graft.ingest.ParquetLogRpc(
      graft.ingest.LogSource.listParquetFiles(spark, path))
    val replay = graft.ingest.LogSource.replayFromParquet(spark, path)
    val lo = 9000000L
    val hi = 9500000L
    def key(l: graft.ingest.RawLog) =
      (l.block_number, l.log_index, l.transaction_index)
    val got = rpc.getLogs(lo, hi, None).map(key).toVector.sorted
    val want = replay.getLogs(lo, hi, None).map(key).toVector.sorted
    assert(got.nonEmpty && got == want)
    graft.ingest.LogSource.clearReplayCache() // don't leak into other tests
  }

  test("session Hadoop conf survives serialization into task-side readers") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("graft.test.custom", "value-42")
    val holder = new graft.ingest.SerializableHadoopConf(conf)
    val bytes = new java.io.ByteArrayOutputStream()
    val oo = new java.io.ObjectOutputStream(bytes)
    oo.writeObject(holder); oo.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[graft.ingest.SerializableHadoopConf]
    assert(back.value.get("graft.test.custom") == "value-42")
  }

  test("footer-based estimateLogs tracks exact counts without draining records") {
    graft.fixtures.MakerFixtures.ensure(spark)
    val path = graft.fixtures.MakerFixtures.rawLogsPath
    val rpc = new graft.ingest.ParquetLogRpc(
      graft.ingest.LogSource.listParquetFiles(spark, path))
    val exact = rpc.getLogs(0L, Long.MaxValue, None).size.toLong
    // full-range estimate is exact (every row group fully covered)
    assert(rpc.estimateLogs(0L, Long.MaxValue, None) == exact)
    // a partial window interpolates: positive, no larger than the corpus
    val est = rpc.estimateLogs(9000000L, 9500000L, None)
    assert(est > 0 && est <= exact)
  }

  test("adaptive partition planning responds to log density (S12)") {
    import graft.ingest.{LogRpc, RawLog}
    // synthetic density: blocks < 1M are dense (1 log/block), rest empty
    class DensityRpc extends LogRpc {
      override def getLogs(from: Long, to: Long, address: Option[Array[Byte]]) =
        Iterator.empty
      override def estimateLogs(from: Long, to: Long, address: Option[Array[Byte]]): Long =
        math.max(0L, math.min(to, 999999L) - from + 1)
    }
    // call the planner directly (the scan class is private → go through
    // the public planning rules by constructing partitions over the rpc)
    val parts = graft.sources.LogPlanning.plan(new DensityRpc, 0L, 2000000L,
      None, blocksStep = 100000L, maxLogs = 10000L)
    val dense = parts.filter(_._1 < 1000000L)
    val sparse = parts.filter(_._1 >= 1000000L)
    // dense region: chunks shrink to ≤ maxLogs blocks (10k at 1 log/block)
    assert(dense.forall { case (s, e) => e - s + 1 <= 10000 })
    assert(dense.size > 50, s"dense region should split into many partitions, got ${dense.size}")
    // sparse region: step doubles → few, growing partitions
    assert(sparse.size < 10, s"sparse region should coalesce, got ${sparse.size}")
  }
}
