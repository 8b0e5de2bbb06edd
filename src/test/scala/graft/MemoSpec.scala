package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 optimization internals: the metadata memos that removed the
  * per-invocation fixed costs (table loads, view registration, corpus
  * fingerprints) must stay (a) effective — repeat calls do no new
  * metadata work — and (b) honest — an in-place rewrite or a different
  * relation is never served a stale memo. */
class MemoSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("Tables.load memoizes per (session, dir, table) and notices rewrites") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_memo").toString
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val d1 = Tables.load(s, dir, "documents")
    val d2 = Tables.load(s, dir, "documents")
    assert(d1 eq d2, "repeat load of an unchanged fixture must be the memoized frame")
    assert(d2.count() == 2)
    // in-place rewrite (the mutable-corpus spec pattern): the memo must
    // miss on the changed mtime and serve the NEW file set
    Thread.sleep(5) // ensure a distinct mtime even at coarse granularity
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    s.catalog.refreshByPath(s"$dir/documents.parquet")
    val d3 = Tables.load(s, dir, "documents")
    assert(!(d3 eq d2), "a rewritten path must not be served the stale frame")
    assert(d3.count() == 3)
  }

  test("registerAll skips repeat registration; registerOne invalidates it") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    Tables.registerAll(s, sf)
    val n1 = s.table("events").count()
    // registerOne re-points ONE of the shared view names elsewhere …
    val other = java.nio.file.Files.createTempDirectory("graft_memo_reg").toString
    Tables.load(s, sf, "events").limit(1)
      .write.mode("overwrite").parquet(s"$other/events.parquet")
    Tables.registerOne(s, other, "events")
    assert(s.table("events").count() == 1)
    // … so the next registerAll of the fixture dir must NOT be skipped
    Tables.registerAll(s, sf)
    assert(s.table("events").count() == n1,
      "registerAll after registerOne must re-bind the fixture views")
  }

  test("fingerprint memo: repeat fingerprints of one memoized frame run one scan") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    import graft.ops.IvfModel
    // prime: both gates' fingerprint paths go through the memoized load
    val v1 = graft.ops.Similarity.rawVecs(Tables.load(s, sf, "embeddings"))
    IvfModel.fingerprint(v1)
    val c0 = IvfModel.fingerprintScans.get()
    val v2 = graft.ops.Similarity.rawVecs(Tables.load(s, sf, "embeddings"))
    assert(v2 eq v1,
      "rawVecs over the memoized load must return the memoized frame")
    val fp2 = IvfModel.fingerprint(v2)
    assert(IvfModel.fingerprintScans.get() == c0,
      "a repeat fingerprint over the memoized relation must not re-scan")
    // a FRESH read of the same path is a different relation: the guard
    // stays load-bearing and re-scans
    val fresh = graft.ops.Similarity.rawVecs(
      s.read.parquet(s"$sf/embeddings.parquet"))
    val fp3 = IvfModel.fingerprint(fresh)
    assert(IvfModel.fingerprintScans.get() == c0 + 1,
      "a freshly constructed relation must be re-scanned")
    assert(fp2 == fp3, "memoized and fresh fingerprints must agree")
  }
}
