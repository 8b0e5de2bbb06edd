package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.MakerFixtures
import graft.ingest.{Demux, IngestJob, LogSource}

/** EP1 end-to-end: resume → adaptive plan → parallel fetch → demux append. */
class IngestJobSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("incremental ingest: catch-up, idempotent re-run, resume") {
    MakerFixtures.ensure(spark)
    val rpc = LogSource.replayFromParquet(spark, MakerFixtures.rawLogsPath)
    val store = java.nio.file.Files.createTempDirectory("graft_ingest").toString + "/store"
    val defs = MakerFixtures.fixtureDefs
    val corpus = spark.read.parquet(MakerFixtures.rawLogsPath)
    val creation = 8928160L
    val head1 = 10500000L

    // pass 1: ingest up to head1
    val n1 = IngestJob.run(spark, rpc, defs, None, store, creation, head1)
    val taggedUpToHead1 = Demux.tagged(
      corpus.filter(col("block_number") <= head1), defs)
      .filter(col("table_name").isNotNull).count()
    assert(n1 == taggedUpToHead1 && n1 > 0)

    // pass 2 at the same head: no-op
    val n2 = IngestJob.run(spark, rpc, defs, None, store, creation, head1)
    assert(n2 == 0L)
    assert(spark.read.parquet(store).count() == n1)

    // pass 3: chain advanced → only the delta is appended
    val headMax = 20000000L
    val n3 = IngestJob.run(spark, rpc, defs, None, store, creation, headMax)
    val taggedAll = Demux.tagged(corpus, defs)
      .filter(col("table_name").isNotNull).count()
    assert(n1 + n3 == taggedAll)

    // per-table reads from the ingested store match direct decode
    val viaStore = Demux.readTable(spark, store,
      MakerFixtures.tableDef("vat_call_frob")).count()
    val direct = Demux.table(corpus,
      MakerFixtures.tableDef("vat_call_frob")).count()
    assert(viaStore == direct && direct > 0)
  }

  test("atomic ingest: catch-up, idempotent re-run, resume (manifest commits)") {
    MakerFixtures.ensure(spark)
    val rpc = LogSource.replayFromParquet(spark, MakerFixtures.rawLogsPath)
    val root = java.nio.file.Files.createTempDirectory("graft_aingest").toString + "/store"
    val store = new graft.ingest.ManifestStore(root)
    val defs = MakerFixtures.fixtureDefs
    val corpus = spark.read.parquet(MakerFixtures.rawLogsPath)
    val creation = 8928160L
    val head1 = 10500000L

    val n1 = IngestJob.runAtomic(spark, rpc, defs, None, store, creation, head1)
    val expected1 = Demux.taggedKnown(
      corpus.filter(col("block_number") <= head1), defs).count()
    assert(n1 == expected1 && n1 > 0)

    // same head: resume watermark says nothing new
    assert(IngestJob.runAtomic(spark, rpc, defs, None, store, creation, head1) == 0L)
    assert(store.read(spark).get.count() == n1)

    // chain advance → delta only; total equals the full tagged corpus
    val n3 = IngestJob.runAtomic(spark, rpc, defs, None, store, creation, 20000000L)
    val taggedAll = Demux.taggedKnown(corpus, defs).count()
    assert(n1 + n3 == taggedAll)
    assert(store.read(spark).get.count() == taggedAll)
    // no duplicate (block, log) keys after the two commits
    assert(store.read(spark).get
      .groupBy("block_number", "log_index", "transaction_hash").count()
      .filter(col("count") > 1).count() == 0)
    // decoded read straight off the manifest store matches direct decode
    assert(Demux.readTable(spark, store,
      MakerFixtures.tableDef("vat_call_frob")).count() ==
      Demux.table(corpus, MakerFixtures.tableDef("vat_call_frob")).count())

    // runAtomic bloom-indexes transaction_hash by default: a point
    // probe on one tx opens fewer files than the store holds, across
    // BOTH commits (each delta wrote its own sidecar) — the chain
    // store's "find my tx" shape, served without a full scan
    val total = store.currentFiles(spark).size
    assert(total >= 2, s"need multiple files to prove pruning, got $total")
    val someTx = corpus.filter(col("block_number") <= head1)
      .select("transaction_hash").head.getAs[Array[Byte]](0)
    val probe = store.read(spark).get
      .filter(col("transaction_hash") === lit(someTx))
    assert(probe.count() >= 1L)
    assert(Plans.filesRead(probe) < total.toLong,
      s"tx point probe read ${Plans.filesRead(probe)} of $total files — " +
        "the ingest path did not bloom-index transaction_hash")
  }
}
