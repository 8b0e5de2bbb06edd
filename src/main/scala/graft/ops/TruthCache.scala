package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fingerprint-keyed cache for the GATE-SIDE truth tables (brute-force
  * top-k, exact jaccard pairs) that recall gates compare against. The
  * operators under test are sublinear; without this their gates still
  * paid a full brute pass per invocation — the "gates don't scale even
  * though the operators do" seam. The truth is computed once per
  * (definition tag, corpus fingerprint) and reused; a changed corpus
  * resolves to a different directory and recomputes, so the gate's
  * sensitivity is untouched — only its redundant recomputation goes.
  * Same atomic-rename publish discipline as [[AnnIndex]]. */
private[graft] object TruthCache {

  private val ready = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Bump when a truth DEFINITION changes, so stale cached truths from
    * older code can never satisfy a newer gate. */
  private val Version = 1

  private def path(tag: String, fp: (Long, Long)): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_truth_v${Version}_${tag}_" +
      java.lang.Long.toHexString(fp._1 * 1000003L ^ fp._2)

  /** The cached truth for (tag, fp), computing and persisting on miss. */
  def cached(spark: SparkSession, tag: String, fp: (Long, Long),
             compute: => DataFrame): DataFrame = {
    val p = path(tag, fp)
    if (!ready.contains(p)) ready.synchronized {
      if (!ready.contains(p)) {
        val dst = new org.apache.hadoop.fs.Path(p)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(dst)) {
          val tmp = new org.apache.hadoop.fs.Path(
            p + ".tmp-" + java.util.UUID.randomUUID())
          compute.write.parquet(tmp.toString)
          if (!fs.rename(tmp, dst)) {
            fs.delete(tmp, true)
            require(fs.exists(dst),
              s"TruthCache: rename to $p failed and no concurrent writer published it")
          }
        }
        ready.add(p)
      }
    }
    spark.read.parquet(p)
  }
}
