package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ExactIndex

/** The persisted exact-dedup index: probe correctness against a plain
  * anti-join, the bloom short-circuit + shard-pruning scale claims, and
  * the crash-ordering/idempotency contract. */
class ExactIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_exact_$tag").toString + "/index"

  private def docs = Tables.load(spark, dir, "documents")
  private def even = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
  private def odd = docs.filter(pmod(col("doc_id"), lit(2)) === 1)

  /** Reference: batch rows whose md5 is absent from the corpus, by a
    * plain anti-join over the raw tables. */
  private def reference(batch: org.apache.spark.sql.DataFrame,
                        corpus: org.apache.spark.sql.DataFrame): Set[Long] = {
    val b = batch.select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("fp"))
    val c = corpus.select(md5(coalesce(col("text"), lit(""))).as("fp")).distinct()
    b.join(c, Seq("fp"), "left_anti").select("doc_id")
      .collect().map(_.getLong(0)).toSet
  }

  private def probedIds(batch: org.apache.spark.sql.DataFrame,
                        root: String): Set[Long] =
    ExactIndex.probeNew(batch, root).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("probe == plain anti-join of batch md5s against the corpus") {
    val root = freshRoot("full")
    ExactIndex.append(even, root)
    assert(probedIds(odd, root) == reference(odd, even))
  }

  test("all-new batch: bloom clears it and ZERO stored files are read") {
    val root = freshRoot("allnew")
    ExactIndex.append(even, root)
    // texts guaranteed absent from the corpus — fingerprints differ
    val fresh = odd.limit(5)
      .withColumn("text", concat(col("text"), lit(" #fresh-batch-marker")))
    val got = probedIds(fresh, root)
    assert(got == fresh.select("doc_id").collect().map(_.getLong(0)).toSet)
    val (read, total) = ExactIndex.lastHashRead.get()
    assert(total > 0, "index should have stored files")
    assert(read == 0,
      s"a bloom-cleared batch must not open the hash store (read $read/$total)")
  }

  test("dup-bearing batch: shard pruning reads a strict subset of files") {
    val root = freshRoot("pruned")
    ExactIndex.append(even, root)
    // one known duplicate of corpus text under a fabricated new id
    val dup = even.orderBy("doc_id").limit(1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val got = probedIds(dup, root)
    assert(got.isEmpty, "a corpus-text duplicate must not probe as new")
    val (read, total) = ExactIndex.lastHashRead.get()
    assert(read > 0 && read < total,
      s"one candidate fp should open its shard only (read $read/$total)")
  }

  test("crash ordering: bloom landed but hash commit did not -> still correct") {
    val root = freshRoot("crash")
    ExactIndex.append(even, root)
    // simulate the stranded half of a crashed SECOND append: its bloom
    // published (bits for the odd batch) but no hash rows — emulated by
    // appending odd to a scratch root and copying ONLY the bloom dir in
    val scratch = freshRoot("scratch")
    ExactIndex.append(odd, scratch)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val from = new org.apache.hadoop.fs.Path(s"$scratch/bloom")
    val to = new org.apache.hadoop.fs.Path(s"$root/bloom")
    fs.listStatus(from).foreach { s =>
      org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
        new org.apache.hadoop.fs.Path(to, s.getPath.getName),
        false, spark.sparkContext.hadoopConfiguration)
    }
    // extra bloom bits are superset-safe: result identical to the clean index
    assert(probedIds(odd, root) == reference(odd, even))
  }

  test("keyed replay: double append is exactly-once; probe is idempotent") {
    val root = freshRoot("replay")
    ExactIndex.append(even, root, commitKey = Some("batch-0"))
    ExactIndex.append(even, root, commitKey = Some("batch-0")) // replay
    val expected = reference(odd, even)
    assert(probedIds(odd, root) == expected)
    // batch-wins: after odd itself lands (a completed ingest), a REPLAYED
    // probe of odd must still answer as if odd were new — its own stored
    // rows are excluded, so ingest replays reconverge
    ExactIndex.append(odd, root, commitKey = Some("batch-1"))
    assert(probedIds(odd, root) == expected)
  }

  test("in-batch duplicates collapse to min id in the gate aggregate") {
    val out = ExactIndex.dedupExactIncremental(spark, dir)
    assert(out.columns.toSeq == Seq("fp", "keep_id", "n"))
    val viaRef = reference(odd, even)
    val keepIds = out.select("keep_id").collect().map(_.getLong(0)).toSet
    assert(keepIds.subsetOf(viaRef))
    // group count equals distinct new fingerprints
    val nFps = out.count()
    val expectFps = odd
      .select(md5(coalesce(col("text"), lit(""))).as("fp"), col("doc_id"))
      .join(even.select(md5(coalesce(col("text"), lit(""))).as("fp")).distinct(),
        Seq("fp"), "left_anti")
      .select("fp").distinct().count()
    assert(nFps == expectFps)
  }
}
