package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, LshIndex}

/** The persisted LSH index: probe correctness against the full-corpus
  * LSH result, the no-corpus-rehash property (the at-scale claim), and
  * incremental growth via append. */
class LshIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshRoot(tag: String): String = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_lsh_$tag").toString + "/index"
    root
  }

  private def docs = Tables.load(spark, dir, "documents")
  private def even = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
  private def odd = docs.filter(pmod(col("doc_id"), lit(2)) === 1)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe of stored index == full LSH restricted to pairs touching new docs") {
    val root = freshRoot("full")
    LshIndex.append(even, root)
    val expected = pairSet(Dedup.minhashLsh(docs, 0.7))
      .filter { case (i, j) => i % 2 == 1 || j % 2 == 1 }
    val probed = pairSet(LshIndex.probe(odd, root, 0.7))
    assert(probed == expected && probed.nonEmpty)
  }

  test("probe shingles ONLY the new batch — the frozen corpus is never re-hashed") {
    val root = freshRoot("count")
    LshIndex.append(even, root)
    val nOdd = odd.count()
    val counter = spark.sparkContext.longAccumulator("graft.test.probe_hashed")
    val res = LshIndex.probe(odd, root, 0.7, Some(counter)).collect()
    assert(res.nonEmpty)
    // == nOdd: the probe's shingle stage ran exactly once over exactly
    // the new batch; any corpus re-hash would add the even-doc count
    assert(counter.value == nOdd,
      s"probe hashed ${counter.value} docs, new batch is $nOdd")
  }

  test("probe against an absent index degrades to in-batch LSH dedup") {
    val root = freshRoot("empty") + "_never_built"
    val expected = pairSet(Dedup.minhashLsh(odd, 0.7))
    val probed = pairSet(LshIndex.probe(odd, root, 0.7))
    assert(probed == expected)
  }

  test("a build stranded before the bands commit leaves the batch un-probed, not half-verified") {
    val root = freshRoot("crash")
    LshIndex.append(even, root)
    // simulate the crash window: shingles+sizes committed, bands not yet
    // (bands commit LAST precisely so this state reads as "batch absent")
    val bands = new java.io.File(s"$root/bands")
    assert(bands.exists())
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(bands)
    val probed = pairSet(LshIndex.probe(odd, root, 0.7))
    val inBatch = pairSet(Dedup.minhashLsh(odd, 0.7))
    assert(probed == inBatch)
  }

  test("append extends the index: two-batch build == one-shot build") {
    val root2 = freshRoot("grow")
    LshIndex.append(even.filter(col("doc_id") < 250), root2)
    LshIndex.append(even.filter(col("doc_id") >= 250), root2)
    val root1 = freshRoot("oneshot")
    LshIndex.append(even, root1)
    val p2 = pairSet(LshIndex.probe(odd, root2, 0.7))
    val p1 = pairSet(LshIndex.probe(odd, root1, 0.7))
    assert(p2 == p1 && p1.nonEmpty)
  }

  test("shingles widens a narrow scan but never reshuffles an already-parallel input") {
    // the fixture is one parquet file → 1 scan partition → widened
    assert(Dedup.shingles(docs).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // an input already at/above parallelism keeps its partitioning —
    // at 100 TB an unconditional repartition would re-shuffle the corpus
    val pre = docs.repartition(8)
    assert(Dedup.shingles(pre).rdd.getNumPartitions == 8)
  }

  test("probe ignores the batch's own stranded rows (replay after crashed append)") {
    import spark.implicits._
    val rootClean = freshRoot("replay_clean")
    LshIndex.append(even, rootClean)
    val expected = pairSet(LshIndex.probe(odd, rootClean, 0.7))
    assert(expected.nonEmpty)
    // same index, but a crashed LshIndex.append(odd) stranded the odd
    // batch's SHINGLES in the store (shingles commit first; sizes/bands
    // never landed). A replayed probe must not union those rows with its
    // own hashing — that double-counts every intersection and emits a
    // different (wrong) pair set.
    val rootCrash = freshRoot("replay_crash")
    LshIndex.append(even, rootCrash)
    new graft.ingest.ManifestStore(s"$rootCrash/shingles").append(spark,
      Dedup.shingles(odd).select(col("doc_id"), xxhash64(col("sh")).as("sh")))
    val replayed = pairSet(LshIndex.probe(odd, rootCrash, 0.7))
    assert(replayed == expected,
      s"missing=${(expected -- replayed).take(5)} extra=${(replayed -- expected).take(5)}")
  }

  test("a pre-fingerprint (string-shingle) index is refused, not silently mis-probed") {
    import spark.implicits._
    val root = freshRoot("oldfmt")
    // simulate an index persisted before shingles were hashed to longs
    new graft.ingest.ManifestStore(s"$root/shingles").append(spark,
      Seq((1L, "a b c")).toDF("doc_id", "sh"))
    new graft.ingest.ManifestStore(s"$root/sizes").append(spark,
      Seq((1L, 1L)).toDF("doc_id", "sz"))
    new graft.ingest.ManifestStore(s"$root/bands").append(spark,
      Seq((0, 123, 1L)).toDF("band", "bandkey", "doc_id"))
    val ex = intercept[IllegalArgumentException] {
      LshIndex.probe(odd, root, 0.7).collect()
    }
    assert(ex.getMessage.contains("pre-fingerprint"))
  }

  test("verification values match the exact jaccard of the brute path") {
    val root = freshRoot("vals")
    LshIndex.append(even, root)
    val brute = Dedup.jaccardPairs(Dedup.shingles(docs), 0.7).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    LshIndex.probe(odd, root, 0.7).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key), s"pair $key not in brute truth")
      assert(brute(key) == r.getDouble(2), s"jaccard mismatch at $key")
    }
  }
}
