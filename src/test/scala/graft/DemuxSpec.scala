package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.abi.{AbiJson, AbiSchema}
import graft.fixtures.MakerFixtures
import graft.ingest.Demux

class DemuxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("one-pass demux write + partition-pruned per-table read") {
    val raw = MakerFixtures.rawLogs(spark)
    val out = java.nio.file.Files.createTempDirectory("graft_demux").toString
    Demux.writeDemuxed(raw, MakerFixtures.fixtureDefs, out)

    val frob = Demux.readTable(spark, out, MakerFixtures.tableDef("vat_call_frob"))
    assert(frob.count() == 800)
    assert(frob.columns.contains("dart"))

    // the per-table read prunes on the table_name partition column
    val plan = spark.read.parquet(out)
      .filter(col("table_name") === "vat_call_frob")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("table_name"), s"no partition pruning in:\n$plan")
  }

  test("same-topic0, different indexed layout: decode DROPS the foreign " +
    "log, never fails the task (r15)") {
    import scala.jdk.CollectionConverters._
    // the real-universe hazard: two ABIs share an event SIGNATURE
    // (hence topic0 — the dispatch key) but split the params
    // indexed/non-indexed differently, so a log that legitimately
    // lands in BOTH collision-group tables is physically undecodable
    // by one of them (wrong topics count / data layout)
    val defs = graft.fixtures.UniverseFixture.defs()
    assume(defs.nonEmpty, "reference config tree not present")
    val clash = defs.filter(_.isEvent)
      .groupBy(d => Demux.topic0Key(d).toSeq).values
      .find(g => g.map(_.entry.inputs.map(_.indexed)).distinct.size > 1)
    assume(clash.isDefined,
      "universe lost its indexed-layout collision corpus")
    val group = clash.get.sortBy(_.qualified)
    // one batch holding rows for EVERY def of the group; decode each
    // def over the full raw set: own rows decode, foreign-layout rows
    // DROP on the _params null-filter — pre-fix this THREW in the task
    val batch = graft.fixtures.UniverseFixture.batch(group)
    val raw = spark.createDataFrame(batch.rows.asJava, Demux.rawLogSchema)
    for (d <- group) {
      val decoded = Demux.table(raw, d)
      val n = decoded.count() // would THROW pre-fix (task failure)
      val own = batch.truth(d.qualified).size
      assert(n >= own,
        s"${d.qualified}: decoded $n rows, own rows $own went missing")
      assert(n <= batch.rows.size,
        s"${d.qualified}: decoded more rows than the batch holds")
    }
    // at least one def of the group must actually DROP something —
    // otherwise this test stopped exercising the mismatch path
    val counts = group.map(d => Demux.table(raw, d).count())
    assert(counts.exists(_ < batch.rows.size),
      s"every def decoded every row ($counts of ${batch.rows.size}) — " +
        "no layout mismatch exercised")
  }

  test("dispatch scales to the full 412-table universe (broadcast join)") {
    val confDir = new java.io.File("/root/reference/conf")
    val allDefs = confDir.listFiles.filter(_.isDirectory).flatMap(_.listFiles)
      .filter(_.getName.endsWith(".abi"))
      .flatMap { f =>
        AbiSchema.tables(f.getName.stripSuffix(".abi"), AbiJson.parseFile(f.getPath))
      }.toSeq
    assert(allDefs.size >= 400)
    val tagged = Demux.tagged(MakerFixtures.rawLogs(spark), allDefs)
    val hit = tagged.filter(col("table_name").isNotNull)
      .select("table_name").distinct().collect().map(_.getString(0)).toSet
    // fixture logs dispatch to their vat/jug/psm tables even with the
    // whole universe registered — and to nothing else spurious at the
    // *table* level for calls (distinct ABIs can share an event shape)
    assert(hit.exists(_.startsWith("vat_call_")))
    assert(hit.exists(_.startsWith("jug_call_")))
    assert(tagged.filter(col("table_name") === "vat_call_frob").count() == 800)
  }

  test("unknown topics are dropped, not misrouted (no stale-j fallthrough)") {
    import spark.implicits._
    val junk = Seq((Array.fill[Byte](20)(1), Seq(Array.fill[Byte](32)(9)),
      Array.fill[Byte](4)(0), 1L, Array.fill[Byte](32)(2), 0, 0,
      Array.fill[Byte](32)(3)))
      .toDF("address", "topics", "data", "block_number", "block_hash",
        "log_index", "transaction_index", "transaction_hash")
    val tagged = Demux.tagged(junk, MakerFixtures.fixtureDefs)
    assert(tagged.filter(col("table_name").isNotNull).count() == 0)
  }
}
