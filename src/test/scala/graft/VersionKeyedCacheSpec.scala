package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.ops.{Components, IvfModel, PageRank}

/** Version-keyed graph/label caches (round-10 agenda #3).
  *
  * The TruthCache consumers' default keys are CORPUS-SCAN fingerprints —
  * cheap at sf0.1, a full corpus scan per warm cache check at 100 TB.
  * Every graph/label entry point now accepts a caller-supplied version
  * (the [[IvfModel.trainedOrLoad]] contract): when the corpus lives in
  * a versioned store, the version pair replaces the fingerprint and
  * cache validation costs a manifest read. The gates stay
  * fingerprint-keyed (the driver testdata is raw parquet); this spec
  * proves the version-keyed path mechanically:
  *
  *  - ZERO fingerprint scans, cold AND warm ([[IvfModel.fingerprintScans]]
  *    counter — stronger than a plan-string check, it counts the eager
  *    driver-side aggregate jobs themselves);
  *  - results hash-identical to the fingerprint-keyed baseline;
  *  - distinct versions don't alias (a bumped store version recomputes).
  */
class VersionKeyedCacheSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def hashOf(df: DataFrame): String = {
    val rows = df.collect().map(_.toString).sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** A store-snapshot-shaped version pair: (version number, a stable
    * content tag). The caller contract — it must change with the data —
    * is the store's, not this spec's. */
  private val ver = (7L, 0x5eed5eedL)

  /** Unique-per-run version component: the mechanical "fresh cache entry
    * appears" assertions below would fail spuriously on a re-run of an
    * UNCHANGED build (graft_truth_* dirs persist in tmpdir across JVMs
    * under one codeStamp), so the versions they probe must be new every
    * run — exactly how a real store's snapshot versions behave. */
  private val runTag = System.nanoTime()

  private val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
  private def truthDirs(): Int =
    tmpRoot.listFiles().count(_.getName.startsWith("graft_truth_"))

  test("graph consumers under a version key: zero fingerprint scans, same hashes") {
    // fingerprint-keyed baselines first (these DO scan — that's the
    // contract being replaced)
    val basePr = hashOf(PageRank.pagerank(spark, dir))
    val baseDang = hashOf(PageRank.pagerankDangling(spark, dir))
    val baseTri = hashOf(PageRank.triangles(spark, dir))
    val baseKcore = hashOf(PageRank.kcore(spark, dir))
    val baseLabels = hashOf(Components.dedupComponents(spark, dir))

    val c0 = IvfModel.fingerprintScans.get()
    // cold (first use of the version key: caches build under it) + warm
    val v = Some(ver)
    val vPr = Seq(PageRank.pagerank(spark, dir, v),
      PageRank.pagerank(spark, dir, v)).map(hashOf)
    val vDang = Seq(PageRank.pagerankDangling(spark, dir, v),
      PageRank.pagerankDangling(spark, dir, v)).map(hashOf)
    val vTri = Seq(PageRank.triangles(spark, dir, v),
      PageRank.triangles(spark, dir, v)).map(hashOf)
    val vKcore = Seq(PageRank.kcore(spark, dir, v),
      PageRank.kcore(spark, dir, v)).map(hashOf)
    val vLabels = Seq(Components.labelsVersioned(spark, dir, ver),
      Components.labelsVersioned(spark, dir, ver))
      .map(df => hashOf(df.orderBy("doc_id")))
    val scans = IvfModel.fingerprintScans.get() - c0
    assert(scans == 0L,
      s"version-keyed path ran $scans corpus fingerprint scans; must be 0")

    assert(vPr.forall(_ == basePr), "pagerank diverged under version key")
    assert(vDang.forall(_ == baseDang), "dangling PR diverged under version key")
    assert(vTri.forall(_ == baseTri), "triangles diverged under version key")
    assert(vKcore.forall(_ == baseKcore), "kcore diverged under version key")
    assert(vLabels.forall(_ == hashOf(
      Components.dedupComponents(spark, dir))),
      "component labels diverged under version key")
    assert(vLabels.head == baseLabels)
  }

  test("distinct versions never alias: a bumped version recomputes, same result") {
    // value-equality alone can't catch aliasing here (the corpus didn't
    // change, so a wrongly-aliased read and an honest recompute hold the
    // same rows) — require the MECHANICAL signal too: a bumped version
    // must materialize fresh graft_truth_* cache entries
    val v2 = (runTag, ver._2)
    val before = truthDirs()
    val h = hashOf(PageRank.triangles(spark, dir, Some(v2)))
    assert(truthDirs() > before,
      "bumped version created no fresh cache entry — version keys alias")
    assert(h == hashOf(PageRank.triangles(spark, dir)),
      "recomputed-under-new-version result must match")
  }

  test("version keys and content fingerprints occupy disjoint tag namespaces") {
    // versionKey XOR-folds (version, dir) into the SAME (Long, Long)
    // space content fingerprints use; a numeric collision for one tag
    // would serve the wrong cached table. The vtag namespace ("tag_v"
    // for version-derived keys) makes that structurally impossible —
    // proven here by forcing the collision: one numeric key, two key
    // families, two distinct cached tables.
    import graft.ops.TruthCache
    import spark.implicits._
    val collidingKey = (runTag + 2, 0x600dcafeL)
    val tag = s"ns_probe_$runTag"
    val asVersion = TruthCache.cached(spark,
      TruthCache.vtag(tag, Some(collidingKey)), collidingKey,
      Seq(("version", 1L)).toDF("family", "v"))
    val asFingerprint = TruthCache.cached(spark,
      TruthCache.vtag(tag, None), collidingKey,
      Seq(("fingerprint", 2L)).toDF("family", "v"))
    assert(asVersion.collect().head.getString(0) == "version")
    assert(asFingerprint.collect().head.getString(0) == "fingerprint",
      "fingerprint-keyed read served the version-keyed entry — namespaces alias")
  }

  test("same version, different corpus dir: keys never alias across corpora") {
    // a bare store version is NOT globally unique — the cache key mixes
    // the absolute corpus dir (TruthCache.versionKey), so two stores
    // both at snapshot v7 resolve to different entries. Mechanical
    // check: the same version pair against a different dir builds fresh
    // entries instead of serving the first corpus's tables.
    val sharedVer = (runTag + 1, ver._2)
    val otherDir = "/root/testdata/sf0.01"
    val hMine = hashOf(PageRank.triangles(spark, dir, Some(sharedVer)))
    val before = truthDirs()
    val h = hashOf(PageRank.triangles(spark, otherDir, Some(sharedVer)))
    assert(truthDirs() > before,
      "same version on a different corpus served the first corpus's cache")
    assert(h != hMine,
      "different corpora must not produce identical triangle stats")
  }
}
