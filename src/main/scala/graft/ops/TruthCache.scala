package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fingerprint-keyed cache for tables that are deterministic functions
  * of a corpus version: GATE-SIDE truths (brute-force top-k, exact
  * jaccard pairs) that recall gates compare against, and SHARED DERIVED
  * STAGES consumed by several downstream products (the dedup component
  * labels feeding five reports — [[Components.labelsFor]]). Without it,
  * gates re-paid a full brute pass per invocation ("gates don't scale
  * even though the operators do") and every labels consumer re-ran
  * LSH + star rounds. The table is computed once per (code build,
  * definition tag, corpus fingerprint) and reused; a changed corpus or
  * a recompiled definition resolves to a different directory and
  * recomputes, so sensitivity is untouched — only the redundant
  * recomputation goes. Publishing goes through
  * [[AnnIndex.publishAtomically]]. */
private[graft] object TruthCache {

  private val ready = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Build stamp folded into every cache path: the NEWEST mtime under
    * this class's code source. A recompiled truth DEFINITION (new
    * classes/jar) can therefore never be satisfied by a truth cached
    * under older code — without relying on anyone remembering to bump a
    * version constant. The code source must be stamped as a TREE walk
    * when it is a classes directory: the directory's own mtime only
    * moves when a direct child is added or removed, so an incremental
    * recompile of a nested .class file would keep the old stamp and —
    * now that operator outputs route through this cache
    * ([[Components.labelsFor]]) — let a stale cached result false-PASS
    * a gate. One bounded walk per JVM; a jar stays the cheap file-mtime
    * case. Caching still amortizes across all gate invocations of one
    * build (the bench's passes, a Verify run, repeated sessions on one
    * artifact). */
  private lazy val codeStamp: String =
    try {
      val root = new java.io.File(
        getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
      val stamp =
        if (root.isDirectory) {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(root.toPath)
          try walk.iterator().asScala.map(_.toFile.lastModified()).max
          finally walk.close()
        } else root.lastModified()
      java.lang.Long.toHexString(stamp)
    } catch { case _: Throwable => "0" }

  /** Caller-supplied version pair → cache key, with the CORPUS IDENTITY
    * (absolute dir) mixed in. A content fingerprint identifies the data
    * by value, so two corpora never alias unless they are equal; a bare
    * store version does NOT — two different stores both at snapshot v7
    * would otherwise resolve to one cache entry and silently serve each
    * other's derived tables. Every version-keyed consumer must key
    * through this. */
  private[graft] def versionKey(dir: String, v: (Long, Long)): (Long, Long) = {
    val d = CorpusId.hash(dir).toLong
    (v._1 ^ java.lang.Long.rotateLeft(d, 13), v._2 ^ d)
  }

  /** Tag namespace dispatch: version-derived keys live under "<tag>_v",
    * content-fingerprint keys under the bare tag. The two key families
    * fold different inputs into the same (Long, Long) space — a numeric
    * collision between a version-derived key and a fingerprint-derived
    * key for one tag would otherwise silently serve the wrong cached
    * table with no detection; disjoint tag namespaces make aliasing
    * structurally impossible. Every caller that passes a
    * [[versionKey]]-derived fp must pass the version through here. */
  private[graft] def vtag(tag: String, version: Option[(Long, Long)]): String =
    if (version.isDefined) tag + "_v" else tag

  private def path(tag: String, fp: (Long, Long)): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_truth_${codeStamp}_${tag}_" +
      java.lang.Long.toHexString(fp._1 * 1000003L ^ fp._2)

  /** Per-path build locks: two threads missing the SAME key serialize
    * (one build, the loser reads the winner's publication), while
    * builds of DIFFERENT keys proceed concurrently — a global lock
    * here would serialize every concurrent query's unrelated cache
    * build behind the slowest one (the engine's default execution mode
    * is concurrent; see ConcurrencySpec). */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The cached truth for (tag, fp), computing and persisting on miss. */
  def cached(spark: SparkSession, tag: String, fp: (Long, Long),
             compute: => DataFrame): DataFrame = {
    val p = path(tag, fp)
    if (!ready.contains(p)) locks.computeIfAbsent(p, _ => new Object).synchronized {
      if (!ready.contains(p)) {
        AnnIndex.publishAtomically(spark, p)(tmp => compute.write.parquet(tmp))
        ready.add(p)
      }
    }
    // publications are immutable (atomic rename into a never-reused name),
    // so the analyzed frame is memoized — the per-call listing + footer
    // read was a fixed cost on every warm gate invocation
    FrameMemo.parquet(spark, p)
  }
}
