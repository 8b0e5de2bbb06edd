package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF/PQ model artifacts: the coarse-quantizer centroids and
  * PQ codebooks are trained ONCE (out-of-band, as the Ivf scaladoc's
  * contract says) and stored as tiny parquet beside the search path —
  * a few KB at any corpus size — then loaded on search instead of
  * retrained per query.
  *
  * Staleness guard: artifacts are keyed by a fingerprint of the vector
  * set (row count + order-independent hash sum over (vec_id, vector
  * values)) — the fingerprint is PART OF THE DIRECTORY NAME, so a search
  * against a changed corpus resolves to a different path and retrains;
  * a stale quantizer (which can silently destroy recall) is structurally
  * unreadable. Publishing is a single atomic rename into that
  * never-before-used name — no delete-then-rename window where a racing
  * loader sees nothing — and the loser of a concurrent training race
  * discards its temp copy (bit-identical anyway: training is
  * deterministic). A failed/garbled load falls back to retraining (the
  * model is a cache, never the source of truth).
  */
object IvfModel {

  final case class Model(fp: (Long, Long),
                         cents: Array[Array[Double]],
                         cb: Array[Array[Array[Double]]])

  /** Per-JVM memo so repeated searches in one session skip even the
    * parquet read. Keyed by store root; fingerprint-checked like the
    * disk copy. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Model]()

  /** Test hook: drop the in-JVM memo so the next call exercises the
    * DISK load path (a fresh session would otherwise be needed). */
  private[graft] def clearMemo(): Unit = memo.clear()

  /** Order-independent fingerprint of the vector set: (count, sum of
    * xxhash64(vec_id, hash(e)) as decimal — an ANSI-mode long sum would
    * overflow). The hash covers the VECTOR VALUES, not just the ids:
    * re-embedded vectors under the same ids must miss the fingerprint,
    * or the stale quantizer silently destroys recall. A production
    * deployment keeps the corpus in a versioned store (ManifestStore)
    * whose snapshot version replaces this scan entirely. */
  private[graft] def fingerprint(v: DataFrame): (Long, Long) =
    fingerprintOf(v, xxhash64(col("vec_id"), hash(col("e")).cast("long")))

  /** The shared (count, decimal-safe sum of `h`) aggregate — one
    * fingerprint shape for vector sets and document corpora alike, so
    * the overflow handling lives once. */
  /** Fingerprint scans run by this JVM — the mechanical evidence for
    * the version-keyed cache contract: a version-keyed warm path must
    * leave this counter untouched (asserted in VersionKeyedCacheSpec),
    * because at 100 TB each of these aggregates is a full corpus scan. */
  private[graft] val fingerprintScans = new java.util.concurrent.atomic.AtomicLong()

  /** Fingerprint results memoized per (frame REFERENCE, hash-column SQL
    * text) within one JVM. Reference identity — not plan equality — is
    * deliberate: Spark 4's DSv2 relations compare structurally equal for
    * any two reads of one path, so plan-keying would serve a STALE
    * fingerprint to a genuinely fresh read of changed data. A fresh
    * `spark.read.parquet` is always a new object and always re-scans —
    * the guard stays fully load-bearing. Hits arise only when the SAME
    * frame flows in again, which the mtime-guarded `Tables.load` /
    * `rawVecs` memos make the steady state for every gate: an in-place
    * corpus rewrite bumps the mtime, those memos hand out a NEW frame,
    * and the fingerprint re-scans. The gates were paying this scalar
    * aggregate 0.2-0.7 s per invocation per corpus across ~20
    * fingerprint-keyed gates. (The hash column's identity is its
    * normalized SQL toString — the converted Catalyst expression's
    * toString embeds per-call-site Origin stack traces and never
    * compares equal.) */
  private val fpMemo = new java.util.concurrent.ConcurrentHashMap[
    (DataFrame, String), (Long, Long)]()

  private[ops] def fingerprintOf(df: DataFrame,
                                 h: org.apache.spark.sql.Column): (Long, Long) = {
    val key = (df, h.toString)
    val hit = fpMemo.get(key)
    if (hit != null) return hit
    fingerprintScans.incrementAndGet()
    val r = df.agg(count(lit(1)), sum(h.cast("decimal(38,0)"))).head()
    val out = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getDecimal(1).longValue())
    if (fpMemo.size > 256) fpMemo.clear()
    fpMemo.put(key, out)
    out
  }

  /** Model root for (corpus dir, hyperparameter tag): carries the
    * ABSOLUTE path hash so two corpora in different directories with the
    * same basename never alias to one store. */
  private def root(dir: String, tag: String): String = {
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_model_${tag}_" +
      new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir)
  }

  /** The fingerprint-unique model directory under `root`. */
  private def modelPath(root: String, fp: (Long, Long)): String =
    s"$root/m_${java.lang.Long.toHexString(fp._1 * 1000003L ^ fp._2)}"

  /** Load the model trained for `dir` if present and fingerprint-fresh;
    * otherwise train via `train`, persist, and return it. `tag` encodes
    * the hyperparameters (k, m, codes) so models with different shapes
    * never alias.
    *
    * `version`, when given, REPLACES the computed value fingerprint as
    * the artifact key — the caller asserts it uniquely identifies the
    * corpus CONTENT (a ManifestStore snapshot version qualifies; a
    * wall-clock date does not). This removes the one corpus-width scan
    * left in the search path; the price is that staleness detection is
    * now the caller's contract — a version that fails to change with
    * the data serves stale quantizers and inverted lists by design
    * (proven in AnnIndexSpec). */
  def trainedOrLoad(v: DataFrame, dir: String, tag: String,
                    train: () => (Array[Array[Double]], Array[Array[Array[Double]]]),
                    version: Option[(Long, Long)] = None)
      : Model = {
    val spark = v.sparkSession
    val r = root(dir, tag)
    val fp = version.getOrElse(fingerprint(v))
    Option(memo.get(r)).filter(_.fp == fp) match {
      case Some(m) => m
      case None =>
        val loaded = load(spark, modelPath(r, fp), fp)
        val m = loaded.getOrElse {
          // miss path only: a warm load records nothing (BuildLog is the
          // bench's causal cold-cost registry)
          BuildLog.timed(s"ivf_model:$tag") {
            val (cents, cb) = train()
            save(spark, modelPath(r, fp), Model(fp, cents, cb))
            Model(fp, cents, cb)
          }
        }
        memo.put(r, m)
        m
    }
  }

  private def load(spark: SparkSession, path: String,
                   fp: (Long, Long)): Option[Model] =
    try {
      val meta = spark.read.parquet(s"$path/meta").select("n", "h").head()
      if ((meta.getLong(0), meta.getLong(1)) != fp) None
      else {
        val cents = spark.read.parquet(s"$path/cents").select("c", "vec")
          .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
        val cb0 = spark.read.parquet(s"$path/cb").select("sub", "code", "vec")
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        val cb = cb0.groupBy(_._1).toArray.sortBy(_._1).map(_._2
          .sortBy(_._2).map(_._3.toArray))
        Some(Model(fp, cents, cb))
      }
    } catch { case _: Throwable => None }

  private def save(spark: SparkSession, path: String, m: Model): Unit =
    try {
      import spark.implicits._
      val conf = spark.sparkContext.hadoopConfiguration
      val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
      val dst = new org.apache.hadoop.fs.Path(path)
      val fs = tmp.getFileSystem(conf)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      Seq(m.fp).toDF("n", "h").coalesce(1)
        .write.parquet(s"$tmp/meta")
      m.cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("c", "vec").coalesce(1).write.parquet(s"$tmp/cents")
      m.cb.zipWithIndex.flatMap { case (sub, s) =>
        sub.zipWithIndex.map { case (e, code) => (s, code, e.toSeq) }
      }.toSeq.toDF("sub", "code", "vec").coalesce(1)
        .write.parquet(s"$tmp/cb")
      // dst is fingerprint-unique and never deleted: either this rename
      // publishes it atomically, or a concurrent (identical) trainer
      // already did and our temp copy is redundant
      if (!fs.rename(tmp, dst)) fs.delete(tmp, true)
    } catch { case _: Throwable => () } // cache write failure is benign
}
