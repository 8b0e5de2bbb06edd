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

  test("probe data-skips stored shingles to the candidates' id range") {
    import spark.implicits._
    // distinct 20-token vocabularies per doc → no cross-doc candidates
    // except the planted pair
    def doc(id: Long, tag: String) =
      (id, (0 until 20).map(t => s"w${tag}_$t").mkString(" "))
    val low = (0L until 50L).map(i => doc(i, s"lo$i")).toDF("doc_id", "text")
    val highDf = ((100001L until 100050L).map(i => doc(i, s"hi$i")) :+
      (100000L, (0 until 20).map(t => s"p_$t").mkString(" ")))
      .toDF("doc_id", "text")
    val root = freshRoot("skip")
    LshIndex.append(low, root)    // files stats: doc_id in [0, 49]
    LshIndex.append(highDf, root) // files stats: doc_id in [100000, 100049]
    // probe batch: one near-dup of doc 100000 (drop one token → j≈0.86)
    val batch = Seq((200000L,
      (0 until 19).map(t => s"p_$t").mkString(" "))).toDF("doc_id", "text")
    val pairs = pairSet(LshIndex.probe(batch, root, 0.7))
    assert(pairs == Set((100000L, 200000L)), s"pairs=$pairs")
    val (read, total) = LshIndex.lastShingleRead.get()
    assert(total >= 2, s"expected one file per append at least, saw $total")
    assert(read >= 1 && read < total,
      s"shingle read touched $read of $total files — doc_id data-skipping " +
        "is not pruning")
  }

  test("compact drops keys that went hot only ACROSS appends; non-degenerate probes unchanged") {
    import spark.implicits._
    val root = freshRoot("compact")
    val hotText = (0 until 20).map(t => s"hot_$t").mkString(" ")
    val vText = (0 until 20).map(t => s"v_$t").mkString(" ")
    def nearV(drop: Int) = (0 until 20).filterNot(_ == drop)
      .map(t => s"v_$t").mkString(" ")
    // batch 1: six copies of the hot text + the non-degenerate doc 20
    LshIndex.append(((0L until 6L).map(i => (i, hotText)) :+ (20L, vText))
      .toDF("doc_id", "text"), root)
    // batch 2: six more copies + near-dup of doc 20 — per-append
    // occupancy (6) never crosses the cap (8); the union (12) does
    LshIndex.append(((10L until 16L).map(i => (i, hotText)) :+ (21L, nearV(19)))
      .toDF("doc_id", "text"), root)
    val batch = Seq((100L, nearV(0)), (101L, hotText)).toDF("doc_id", "text")
    val before = pairSet(LshIndex.probe(batch, root, 0.7))
    assert(before.contains((20L, 100L)) && before.contains((21L, 100L)))
    assert(before.exists(_._2 == 101L), "pre-compact, the hot key still probes")
    LshIndex.compact(spark, root, maxBucket = 8)
    val after = pairSet(LshIndex.probe(batch, root, 0.7))
    // the degenerate key is gone: nothing pairs with the hot-text probe
    assert(!after.exists(p => p._1 == 101L || p._2 == 101L),
      s"hot-key pairs survived compaction: $after")
    // non-degenerate results are unchanged
    assert(after.filterNot(p => p._1 == 101L || p._2 == 101L) ==
      before.filterNot(p => p._1 == 101L || p._2 == 101L))
    // and the hot docs' band rows are physically gone from the store
    val bands = new graft.ingest.ManifestStore(s"$root/bands").read(spark).get
    assert(bands.filter(col("doc_id") < 16).count() == 0)
  }

  test("mixed-format index: pre-shard commits stay probe-able; compact re-shards them") {
    import spark.implicits._
    import graft.ingest.ManifestStore
    val root = freshRoot("mixed")
    // simulate a PRE-SHARD append: the three tables committed without the
    // bk_shard layout, exactly as the previous release wrote them
    val oldDocs = even.filter(col("doc_id") < 250)
    val oldSh = Dedup.shingles(oldDocs)
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    new ManifestStore(s"$root/shingles").append(spark, oldSh,
      rangeCol = Some("doc_id"))
    new ManifestStore(s"$root/sizes").append(spark,
      oldSh.groupBy("doc_id").agg(count(lit(1)).as("sz")),
      rangeCol = Some("doc_id"))
    val r = Dedup.NumHashes / Dedup.Bands
    val oldBands = Dedup.minhash(oldSh).as[(Long, Seq[Long])].collect()
      .flatMap { case (id, mins) =>
        (0 until Dedup.Bands).map { b =>
          (b, scala.util.hashing.MurmurHash3.orderedHash(
            mins.slice(b * r, b * r + r)), id)
        }
      }.toSeq.toDF("band", "bandkey", "doc_id")
    new ManifestStore(s"$root/bands").append(spark, oldBands)
    // a new-format append on top makes the store MIXED: old rows read
    // with bk_shard = NULL through the union's null-fill
    LshIndex.append(even.filter(col("doc_id") >= 250), root)
    val rootRef = freshRoot("mixed_ref")
    LshIndex.append(even, rootRef)
    val expected = pairSet(LshIndex.probe(odd, rootRef, 0.7))
    assert(expected.exists(_._1 < 250) && expected.exists(_._1 >= 250),
      "fixture must plant pairs on both sides of the format split")
    assert(pairSet(LshIndex.probe(odd, root, 0.7)) == expected,
      "pre-shard corpus rows must not be dropped by the shard filter")
    // compaction re-derives every shard: no NULL partition remains, and
    // the probe result is unchanged
    LshIndex.compact(spark, root)
    val bands = new ManifestStore(s"$root/bands").read(spark).get
    assert(bands.filter(col("bk_shard").isNull).count() == 0)
    assert(pairSet(LshIndex.probe(odd, root, 0.7)) == expected)
  }

  test("vacuum reclaims the files compaction replaced; probe results unchanged") {
    import spark.implicits._
    val root = freshRoot("vacuum")
    LshIndex.append(even.filter(col("doc_id") < 250), root)
    LshIndex.append(even.filter(col("doc_id") >= 250), root)
    val before = pairSet(LshIndex.probe(odd, root, 0.7))
    assert(before.nonEmpty)
    LshIndex.compact(spark, root) // replace-all commit leaves old files
    def dataFiles(sub: String): Int = {
      def walk(f: java.io.File): Iterator[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).iterator.flatten.flatMap(walk)
        else Iterator(f)
      walk(new java.io.File(s"$root/$sub/data")).count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = dataFiles("bands")
    LshIndex.vacuum(spark, root, keepVersions = 1, minDataAgeMs = 0)
    val filesAfter = dataFiles("bands")
    assert(filesAfter < filesBefore,
      s"vacuum reclaimed nothing ($filesBefore -> $filesAfter)")
    assert(pairSet(LshIndex.probe(odd, root, 0.7)) == before)
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
