package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN inverted lists: the EXPENSIVE search-time artifact —
  * cluster assignments (IVF), PQ code lists, hyperplane buckets (LSH) —
  * written once per (corpus fingerprint, hyperparameters) and laid out
  * `partitionBy(<probe key>)`, so a search reads ONLY the partitions its
  * probes name (Hive-style partition pruning in the parquet scan) instead
  * of re-assigning or re-bucketing the whole corpus per query. This is
  * the physical form of SURVEY §7.5's "IVF partition pruning": FAISS's
  * inverted lists, expressed as a partitioned columnar table.
  *
  * Freshness is by CONSTRUCTION, not by check-then-read: the artifact
  * directory name embeds the corpus fingerprint (same (count, value-hash)
  * contract as [[IvfModel.fingerprint]]), so a changed corpus resolves to
  * a different directory and simply rebuilds — a stale artifact can never
  * be read, and no delete-then-rename window exists (the publish is one
  * atomic rename into a never-before-used name; the loser of a concurrent
  * build race discards its temp copy, which holds the same ROW SET —
  * builds are value-deterministic, though shuffle fetch order makes the
  * bytes differ — so either copy serves every read identically).
  */
object AnnIndex {

  /** Paths this JVM has already built or verified present — repeat
    * searches skip even the existence check. Safe because a path embeds
    * the corpus fingerprint: it can never go stale, only orphaned. */
  private val ready = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Test hook: forget readiness so the next ensure() re-checks disk. */
  private[graft] def clearReady(): Unit = ready.clear()

  /** Artifact directory for (corpus dir, hyperparameter tag, corpus
    * fingerprint). Carries the ABSOLUTE path hash — two corpora in
    * different directories with the same basename must never alias —
    * and the fingerprint, so staleness is structural. */
  def path(dir: String, tag: String, fp: (Long, Long)): String = {
    s"${System.getProperty("java.io.tmpdir")}/graft_ann_${tag}_" +
      new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir) +
      "_" + java.lang.Long.toHexString(fp._1 * 1000003L ^ fp._2)
  }

  /** Write `build()` under a process-unique temp name and publish it at
    * `path` with one atomic rename — the shared publish discipline for
    * fingerprint-keyed artifacts (also used by [[TruthCache]]). A fixed
    * temp name would let two JVMs racing the same artifact delete each
    * other's in-flight build; a lost rename race means a value-identical
    * copy is already published (drop ours); any OTHER rename failure
    * published nothing and must fail loudly. */
  private[ops] def publishAtomically(spark: SparkSession, path: String)
                                    (write: String => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) return
    // causal cold-cost evidence (BuildLog): timing starts only on a REAL
    // build — the exists() early-return above keeps warm hits silent —
    // so the bench's named-build registry carries actual build wall, not
    // cache-check noise. Named by artifact basename (tag + fingerprint).
    BuildLog.timed("build:" + p.getName) {
      val tmp = new org.apache.hadoop.fs.Path(
        path + ".tmp-" + java.util.UUID.randomUUID())
      write(tmp.toString)
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, true)
        require(fs.exists(p),
          s"atomic publish: rename to $path failed and no concurrent writer published it")
      }
    }
  }

  /** Per-path build locks — same striping rationale as TruthCache:
    * concurrent first searches of the SAME index serialize onto one
    * build; different indexes build concurrently. */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Ensure the artifact at `path` exists: build + write partitioned by
    * `partCol` + atomic rename if absent. Serialized per JVM per PATH so
    * two concurrent first searches don't both build. */
  def ensure(spark: SparkSession, path: String, partCol: String,
             build: () => DataFrame): Unit = {
    if (ready.contains(path)) return
    locks.computeIfAbsent(path, _ => new Object).synchronized {
      if (ready.contains(path)) return
      publishAtomically(spark, path) { tmp =>
        // cluster by the partition column before writing: without this,
        // every write task emits a file into every partition dir
        // (tasks × partitions tiny files — measured 2.3 s of pure read
        // overhead per search on a 2000-vector corpus). One build-time
        // shuffle buys ~1 file per inverted list; at very large list
        // sizes use repartition(N, col) to keep write parallelism.
        build().repartition(col(partCol))
          .write.partitionBy(partCol).parquet(tmp)
      }
      ready.add(path)
    }
  }

  /** Read only the partitions whose `partCol` value is in `keys` — the
    * filter lands as PartitionFilters in the scan, so unprobed inverted
    * lists are never opened. `keys` is the probe set of a QUERY BATCH
    * (small by definition — it is the search input), so the IN-list stays
    * tiny at any corpus scale. */
  def readPruned(spark: SparkSession, path: String, partCol: String,
                 keys: Seq[Long]): DataFrame = {
    // artifact dirs are immutable by construction (fingerprint-named,
    // atomic publish) — memoize the analyzed frame; partition pruning
    // below is unaffected, only the repeated listing/footer cost goes
    val df = FrameMemo.parquet(spark, path)
    // match literal type to the INFERRED partition-column type: a cast
    // wrapped around the attribute would block partition-filter
    // extraction and silently degrade the pruned read to a full scan
    val typed: Seq[Any] = df.schema(partCol).dataType match {
      case org.apache.spark.sql.types.IntegerType => keys.map(_.toInt)
      case _ => keys
    }
    df.filter(col(partCol).isin(typed: _*))
  }
}
