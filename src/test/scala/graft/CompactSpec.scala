package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.MakerFixtures
import graft.ingest.{Compact, Demux, ManifestStore}

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

  test("manifest store: append/overwriteRange/compact are atomic and snapshot-isolated") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mstore").toString + "/store"
    val store = new ManifestStore(root)
    assert(store.read(spark).isEmpty)

    // three appends → three snapshots, contents accumulate
    (0 until 3).foreach { i =>
      store.append(spark,
        (i * 100 until (i + 1) * 100).map(n => (n.toLong, s"row$n")).toDF("block_number", "v"))
    }
    assert(store.currentVersion(spark) == 3L)
    assert(store.read(spark).get.count() == 300)

    // idempotence key: a replayed commit is a no-op
    store.append(spark, Seq((999L, "dup")).toDF("block_number", "v"),
      commitKey = Some("batch-7"))
    store.append(spark, Seq((999L, "dup")).toDF("block_number", "v"),
      commitKey = Some("batch-7"))
    assert(store.read(spark).get.filter(col("v") === "dup").count() == 1)

    // overwriteRange replaces [100, 199] atomically
    store.overwriteRange(spark,
      Seq((150L, "replaced")).toDF("block_number", "v"), 100L, 199L)
    val snap = store.read(spark).get
    assert(snap.count() == 202) // 300 - 100 + 1 + the dup row
    assert(snap.filter(col("v") === "replaced").count() == 1)
    assert(snap.filter(col("block_number").between(100, 199)).count() == 1)

    // concurrent reader during compaction: every read sees a complete
    // snapshot (constant row count), never a partial swap
    val expected = store.read(spark).get.count()
    @volatile var failure: Option[String] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        val n = store.read(spark).get.count()
        if (n != expected) failure = Some(s"reader saw $n rows, expected $expected")
      }
    })
    reader.start()
    try store.compact(spark, targetBytes = 1L << 30)
    finally { stop = true; reader.join(30000) }
    assert(failure.isEmpty, failure.getOrElse(""))
    assert(store.read(spark).get.count() == expected)

    // vacuum drops unreferenced files but keeps the live snapshot intact
    store.vacuum(spark, keepVersions = 1)
    assert(store.read(spark).get.count() == expected)

    // crash simulation: a leftover temp manifest is invisible to readers
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root + "/_manifests/.tmp-crashed")
    val out = fs.create(tmp, false)
    out.write("data/garbage/nonexistent.parquet\n".getBytes("UTF-8")); out.close()
    assert(store.read(spark).get.count() == expected)
  }

  test("manifest store: partitioned demux layout keeps partition pruning") {
    MakerFixtures.ensure(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_mstore_p").toString + "/store"
    val store = new ManifestStore(root)
    val raw = spark.read.parquet(MakerFixtures.rawLogsPath)
    store.append(spark, Demux.taggedKnown(raw, MakerFixtures.fixtureDefs),
      partitionCols = Seq("table_name"))
    val snap = store.read(spark).get
    assert(snap.columns.contains("table_name")) // recovered from layout
    val frob = snap.filter(col("table_name") === "vat_call_frob")
    assert(frob.count() == 800)
    // compaction preserves the partition column and contents
    store.compact(spark, targetBytes = 1L << 30, partitionCols = Seq("table_name"))
    assert(store.read(spark).get.filter(col("table_name") === "vat_call_frob")
      .count() == 800)
  }
}
