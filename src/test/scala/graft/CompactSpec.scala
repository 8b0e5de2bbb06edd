package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.MakerFixtures
import graft.ingest.{Compact, Demux}

/** Small-file compaction of the demux store (layout-only rewrite). */
class CompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("compaction shrinks file counts without changing content or pruning") {
    MakerFixtures.ensure(spark)
    val store = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/store"
    val raw = spark.read.parquet(MakerFixtures.rawLogsPath)
    // simulate incremental appends → many small files per partition
    (0 until 5).foreach { i =>
      Demux.writeDemuxed(raw.filter(pmod(col("block_number"), lit(5)) === i),
        MakerFixtures.fixtureDefs, store)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val before = Compact.countDataFiles(fs, new org.apache.hadoop.fs.Path(store))
    val checksumBefore = spark.read.parquet(store)
      .agg(sum(xxhash64(col("transaction_hash"), col("block_number"),
        col("log_index")).cast("decimal(38,0)")).as("h"), count(lit(1)).as("n")).head()

    val after = Compact.run(spark, store)
    assert(after < before, s"$after !< $before")
    assert(after >= MakerFixtures.fixtureDefs.size) // ≥1 file per partition

    val checksumAfter = spark.read.parquet(store)
      .agg(sum(xxhash64(col("transaction_hash"), col("block_number"),
        col("log_index")).cast("decimal(38,0)")).as("h"), count(lit(1)).as("n")).head()
    assert(checksumBefore == checksumAfter)
    // partition-pruned decode still works
    val frob = Demux.readTable(spark, store,
      MakerFixtures.tableDef("vat_call_frob"))
    assert(frob.count() == 800)
  }
}
