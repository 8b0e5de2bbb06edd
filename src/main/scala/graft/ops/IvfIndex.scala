package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ingest.ManifestStore

/** Persisted, APPENDABLE IVF index over a GROWING vector corpus — the
  * incremental-ingest counterpart of the immutable, fingerprint-keyed
  * [[AnnIndex]] artifacts (which assume a frozen corpus and rebuild
  * wholesale on any change), and the vector twin of the [[LshIndex]]
  * dedup pattern: ingest assigns ONLY its own batch, search reads only
  * its probed clusters, and the accumulated corpus is never re-assigned.
  *
  * Storage (two [[ManifestStore]] tables under `root`, inheriting atomic
  * commits, snapshot isolation, commit-key idempotence and time travel):
  *
  *  - `cents` (c, vec)                  — the coarse quantizer, trained
  *                                        on the SEED batch and frozen
  *                                        (one commit, never appended);
  *  - `lists` (cluster, vec_id, e, nrm) — the inverted lists, laid out
  *                                        in `cluster=` partitions so a
  *                                        search's cluster IN-filter
  *                                        partition-prunes the read, with
  *                                        vec_id file stats for id-range
  *                                        maintenance reads.
  *
  * Frozen-quantizer contract (standard IVF ingest practice — FAISS `add`
  * after `train`): appended vectors are assigned to the SEED-trained
  * centroids, so recall for a batch whose distribution drifts far from
  * the seed degrades gracefully (vectors still land in their nearest
  * existing cluster) rather than corrupting the index. Re-clustering is
  * an offline rebuild into a fresh root, exactly like a dedup-index
  * rebuild; the store's snapshot versions make the cutover atomic.
  *
  * A ManifestStore snapshot version of `lists` is precisely the
  * "caller-supplied corpus version" [[Ivf.searchIvf]]'s `version`
  * parameter wants — the two paths compose: batch-built artifacts for a
  * frozen corpus, this store for a live one.
  */
object IvfIndex {

  private def centsStore(root: String) = new ManifestStore(s"$root/cents")
  private def listsStore(root: String) = new ManifestStore(s"$root/lists")

  /** Train the frozen coarse quantizer on `seed` and index the seed
    * batch. Exactly-once under replay via `commitKey` (both commits
    * derive their keys from it); refuses a root whose quantizer already
    * exists — retraining under live lists would silently re-route every
    * future append to different clusters than the stored rows. */
  def build(seed: DataFrame, root: String, k: Int,
            commitKey: Option[String] = None): Unit =
      BuildLog.timed("ivf_build:" + new java.io.File(root).getName) {
    val spark = seed.sparkSession
    import spark.implicits._
    val existing = centsStore(root).read(spark)
    require(existing.isEmpty || commitKey.exists(k =>
      centsStore(root).hasCommitKey(spark, s"$k-cents")),
      s"IvfIndex at $root already has a trained quantizer — appends must " +
        "use append(); a re-clustered index is a rebuild into a fresh root")
    val cents = Ivf.centroids(seed, k)
    centsStore(root).append(spark,
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("c", "vec"),
      commitKey = commitKey.map(_ + "-cents"))
    append(seed, root, commitKey)
  }

  /** The frozen quantizer, collected (k rows — tiny at any scale). */
  def centroids(spark: SparkSession, root: String): Array[Array[Double]] =
    centsStore(root).read(spark)
      .getOrElse(throw new IllegalStateException(
        s"IvfIndex at $root has no quantizer — build() first"))
      .select("c", "vec").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)

  /** Extend the lists with a batch: assignment touches ONLY the batch
    * (`assignCounter` counts assignments — the IvfIndexSpec witness),
    * against the frozen quantizer, and lands as one keyed atomic commit.
    * Batch vec_ids must be new to the index (the ingest append
    * invariant, as for [[LshIndex.append]]). */
  def append(v: DataFrame, root: String,
             commitKey: Option[String] = None,
             assignCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Unit = {
    val spark = v.sparkSession
    import spark.implicits._
    val cents = centroids(spark, root)
    val assigned = v.select("vec_id", "e", "nrm")
      .as[(Long, Seq[Double], Double)]
      .map { case (id, e, nrm) =>
        assignCounter.foreach(_.add(1))
        (id, e, nrm, Ivf.nearest(cents, e.toArray))
      }
      .toDF("vec_id", "e", "nrm", "cluster")
    listsStore(root).append(spark, assigned, partitionCols = Seq("cluster"),
      commitKey = commitKey, rangeCol = Some("vec_id"))
  }

  /** Top-`topN` cosine neighbors for `queries` (vec_id, e, nrm rows —
    * the tiny side, collected driver-side like every search path): each
    * query probes its `nProbe` nearest frozen centroids and the lists
    * read partition-prunes to exactly the probed clusters — cost is
    * O(probed partitions) of the CURRENT snapshot, sublinear in the
    * corpus, regardless of how many appends built it. */
  def search(queries: DataFrame, root: String, nProbe: Int = 4,
             topN: Int = 10): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftshim.Shim
    val cents = centroids(spark, root)
    val qRows = queries.select("vec_id", "e", "nrm")
      .as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
    val probesLocal = qRows.toSeq.flatMap { case (id, e, nrm) =>
      Ivf.nearestN(cents, e.toArray, nProbe).map(c => (id, e, nrm, c)) }
    val probes = probesLocal.toDF("qid", "ea", "na", "cluster")
    val lists = listsStore(root).read(spark)
      .getOrElse(Seq.empty[(Long, Seq[Double], Double, Int)]
        .toDF("vec_id", "e", "nrm", "cluster"))
      .filter(col("cluster").isin(probesLocal.map(_._4).distinct: _*))
      .select(col("vec_id").as("nid"), col("e").as("eb"),
        col("nrm").as("nb"), col("cluster"))
    val dot = Shim.column(DotDouble(
      Shim.expression(col("ea")), Shim.expression(col("eb"))))
    probes.join(lists, Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", round(dot / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))))
      .filter(col("rank") <= topN)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Reclaim unreferenced data files (crashed appends' unpublished
    * commit dirs) — [[ManifestStore.vacuum]]'s retention contract. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
             minDataAgeMs: Long = ManifestStore.DefaultVacuumMinAgeMs): Unit = {
    centsStore(root).vacuum(spark, keepVersions, minDataAgeMs)
    listsStore(root).vacuum(spark, keepVersions, minDataAgeMs)
  }

  /** Copy-on-write DELETE from the inverted lists — the GDPR/forget
    * path for a vector index, inherited from [[ManifestStore.delete]]:
    * only list files actually containing victims are rewritten (into
    * one atomic commit), the frozen quantizer and every untouched list
    * file stay byte-identical, searches see wholly-old or wholly-new,
    * and the pre-delete snapshot stays time-travelable until
    * [[vacuum]] erases it. Replay-safe via `commitKey` (a re-delivered
    * forget request is a no-op). Returns rows deleted. */
  def delete(spark: SparkSession, root: String,
             predicate: org.apache.spark.sql.Column,
             commitKey: Option[String] = None): Long =
    listsStore(root).delete(spark, predicate,
      partitionCols = Seq("cluster"), commitKey = commitKey)

  // ----------------------------------------------------------- gate

  /** Per-JVM build memo for the gate, keyed by resolved root (same
    * contract and caveats as Dedup.builtRoots: fixtures are immutable
    * in the gate harness). */
  private val builtRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Gate-store root under tmpdir for (prefix, corpus dir, corpus
    * fingerprint): carries the dir basename for readability, a hash of
    * the ABSOLUTE path so two corpora with the same basename never
    * alias, AND the corpus VALUE fingerprint (the TruthCache recipe) so
    * a fixture regenerated in-place misses — without it, the per-JVM
    * builtRoots memo would happily reuse a pre-built/pre-deleted index
    * over data the oracle no longer reads. */
  private def gateStoreRoot(prefix: String, dir: String,
                            fp: (Long, Long)): String = {
    s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
      new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir) +
      "_" + java.lang.Long.toHexString(fp._1 ^ java.lang.Long.rotateLeft(fp._2, 17))
  }

  /** Gate: the quantizer trains on the even-vec_id HALF (the seed
    * corpus); odd ids arrive as a second append against the frozen
    * quantizer; queries (vec_id < 10) then search the accumulated index.
    * Recall is gated against the brute-force truth over the FULL corpus
    * — the frozen-quantizer ingest must still find ≥ 70% of the true
    * neighbors, including ones that arrived after training.
    *
    * Cost attribution (measured at sf0.1, local[32]): cold ≈ 12 s — the
    * one-time quantizer train + the two lifecycle appends, which ARE
    * the operator under test — warm ≈ 1.3 s (probes + recall against
    * the fingerprint-cached brute truth; search alone ≈ 0.7 s). The
    * bench's per-pass p1/p2 maps in bench_out.json now expose exactly
    * this split per round, so a warm-path regression is visible without
    * hand-run probe passes. The build is not shared with the
    * frozen-corpus `ann_topk_*` gates on purpose: their
    * [[Ivf.trainedModel]] quantizer is a different artifact with
    * different training data (full corpus vs the seed half), and
    * sharing it would stop exercising the frozen-quantizer append
    * semantics this gate exists to prove. */
  def incrementalRecall(s: SparkSession, dir: String): DataFrame = {
    val v = Similarity.rawVecs(graft.Tables.load(s, dir, "embeddings"))
    val root = gateStoreRoot("graft_ivf_index", dir, IvfModel.fingerprint(v))
    builtRoots.synchronized {
      if (!builtRoots.contains(root)) {
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        build(v.filter(pmod(col("vec_id"), lit(2)) === 0), root, k = 8)
        append(v.filter(pmod(col("vec_id"), lit(2)) === 1), root)
        builtRoots.add(root)
      }
    }
    Similarity.recallGate(s, dir, "ivf_inc",
      search(v.filter(col("vec_id") < 10), root))
  }

  /** Gate: build a bounded index (vec_id < 2000, quantizer trained on
    * the subset), CoW-DELETE every odd id, then search with nProbe = k
    * (every cluster probed, so IVF degenerates to EXACT search over
    * the remaining rows — the gate is hash-exact against a DuckDB
    * brute pass over the surviving evens, not a recall bound). A
    * deleted vector appearing in any top-k, or a surviving one
    * missing, breaks the hash. */
  def deleteGate(s: SparkSession, dir: String): DataFrame = {
    val v = Similarity.rawVecs(graft.Tables.load(s, dir, "embeddings"))
      .filter(col("vec_id") < 2000)
    val root = gateStoreRoot("graft_ivf_del", dir, IvfModel.fingerprint(v))
    builtRoots.synchronized {
      if (!builtRoots.contains(root)) {
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        build(v, root, k = 8)
        delete(s, root, pmod(col("vec_id"), lit(2)) === 1)
        builtRoots.add(root)
      }
    }
    search(v.filter(col("vec_id") < 10 && pmod(col("vec_id"), lit(2)) === 0),
      root, nProbe = 8)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_incremental" -> (incrementalRecall _),
    "ann_delete" -> (deleteGate _))

  val oracle: Map[String, String] = Map(
    // exact: brute cosine top-10 over the SURVIVING evens < 2000 — the
    // same rounding recipe as ann_topk_brute
    "ann_delete" -> """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
        FROM embeddings WHERE vec_id < 2000 AND vec_id % 2 = 0),
      withn AS (SELECT vec_id, e,
        sqrt(list_sum(list_transform(e, x -> x*x))) nrm FROM v),
      scored AS (
        SELECT q.vec_id qid, n.vec_id nid,
          ROUND(list_sum(list_transform(generate_series(1, 64),
            k -> q.e[k] * n.e[k])) / (q.nrm * n.nrm), 6) AS cosine
        FROM withn q, withn n WHERE q.vec_id < 10 AND q.vec_id <> n.vec_id),
      ranked AS (
        SELECT qid, nid, cosine,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
        FROM scored)
      SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 10
      ORDER BY qid, rank""",
    "ann_incremental" -> """
      SELECT 'ivf_inc' AS method,
        CAST(10*COUNT(*) AS BIGINT) AS n_expected,
        CAST((10*COUNT(*)*7 + 9)//10 AS BIGINT) AS min_hits,
        TRUE AS recall_ok
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 10)""")
}
