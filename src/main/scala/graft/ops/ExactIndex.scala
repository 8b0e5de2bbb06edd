package graft.ops

import java.io.ByteArrayInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

import graft.Tables
import graft.ingest.ManifestStore

/** `bloom.mightContain(fp)` over ANY of a set of serialized Bloom
  * filters — the membership prefilter of [[ExactIndex]], as a native
  * codegen'd expression (no Scala UDF on the hot path). Keeping the
  * filters a LIST (one per index append) instead of merging makes the
  * loader insensitive to appends built with different `expectedNumItems`
  * — `BloomFilter.mergeInPlace` requires identical sizing, which an
  * incremental index cannot promise across batches.
  *
  * Filters deserialize lazily ON EACH EXECUTOR (the byte payload ships
  * with the plan, exactly how Spark's own runtime bloom-join filters
  * travel); probing is `mightContainBinary` over the UTF-8 bytes,
  * matching `DataFrameStatFunctions.bloomFilter`'s `putBinary` of
  * string columns bit-for-bit. */
case class BloomAnyContain(child: Expression, blooms: Seq[Array[Byte]])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  @transient private lazy val filters: Array[BloomFilter] =
    blooms.map(b => BloomFilter.readFrom(new ByteArrayInputStream(b))).toArray

  def contains(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var i = 0
    while (i < filters.length) {
      if (filters(i).mightContainBinary(bytes)) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAny", this, classOf[BloomAnyContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_any_contain"
}

/** Persisted EXACT-dedup index — the content-hash counterpart of the
  * MinHash [[LshIndex]]: the corpus's md5 fingerprints are stored ONCE,
  * at ingest time; each new batch hashes only itself and probes the
  * store. Per-batch cost is O(batch) hashing + a verification join of
  * only the batch's Bloom-POSITIVE rows against only the hash shards
  * those rows map to — never a corpus re-scan.
  *
  * Layout under `root`:
  *
  *  - `hashes/` — a [[ManifestStore]] table (fp, doc_id) laid out in
  *    [[Shards]] `fp_shard` partitions (xxhash64 of the fingerprint), so
  *    a probe's verification read partition-prunes to the shards its
  *    candidate fingerprints actually hash into (manifest file stats
  *    carry the shard value: min = max = the partition dir);
  *  - `bloom/` — one serialized Bloom filter per append. Membership is
  *    "might be in ANY filter", so a batch row failing EVERY filter is
  *    DEFINITIVELY new and skips the join; only false positives (~fpp
  *    of the batch) reach verification.
  *
  * Crash consistency is ordering, mirrored from [[LshIndex.append]] but
  * REVERSED to match the bloom's one-sided error: the bloom lands FIRST.
  * A stranded bloom without hash rows only mints false candidates, which
  * verification rejects (correct, slightly slower); hash rows without
  * bloom bits would make their docs probe "definitively new" — silent
  * wrong answers. Bloom files are named by commit key when one is given,
  * so keyed replays overwrite their own file instead of accreting.
  *
  * Scale note: a Bloom filter is ~10 bits/doc at 1% fpp — per-TIER
  * sizing (this index covers an ingest partition/epoch, like the LSH
  * index), not one filter for a 10¹¹-doc warehouse. The sharded hash
  * store IS the unbounded-scale path; the bloom is the short-circuit
  * that keeps the common mostly-new batch from touching it at all.
  *
  * Contract: doc_ids unique across index and batches (the ingest
  * append invariant); same-text re-ingests are exactly what the probe
  * reports. */
object ExactIndex {

  /** Hash-table partition count — same sizing logic as
    * [[LshIndex.BandShards]]. */
  val Shards = 32

  /** Bloom false-positive rate: 0.1% keeps the expected verify-join
    * input under one row per thousand batch docs. */
  val BloomFpp = 0.001

  /** Test hook: (files read, files total) of the last probe's hash-store
    * verification read — the mechanical witness that shard pruning
    * limits the physical read (0 read when the bloom clears the whole
    * batch). */
  private[graft] val lastHashRead =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))

  private def store(root: String) = new ManifestStore(s"$root/hashes")
  private def bloomDir(root: String) = new Path(s"$root/bloom")

  /** Content fingerprint: md5 hex of the (null-coalesced) text — the
    * same key [[Dedup.dedupExact]] groups on, so index and batch agree
    * with the DuckDB oracle bit-for-bit. */
  private[graft] def fpCol: Column = md5(coalesce(col("text"), lit("")))

  private def shardCol: Column = pmod(xxhash64(col("fp")), lit(Shards.toLong))

  private def bloomAnyContain(c: Column, blooms: Seq[Array[Byte]]): Column =
    Shim.column(BloomAnyContain(Shim.expression(c), blooms))

  /** Serialize-and-publish one bloom over `fps`: write to a temp name,
    * atomic-rename to the final one. Keyed appends overwrite their own
    * file (replay-idempotent); unkeyed ones get a UUID. */
  private def writeBloom(spark: SparkSession, fps: DataFrame, root: String,
                         key: Option[String]): Unit = {
    val n = fps.count()
    // empty batch: nothing to member-test — and Spark's stat.bloomFilter
    // NPEs on a zero-row input (its aggregate returns a null buffer)
    if (n == 0L) return
    val bf = fps.stat.bloomFilter("fp", n, BloomFpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val dir = bloomDir(root)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val name = key.getOrElse(java.util.UUID.randomUUID().toString)
    val tmp = new Path(dir, s".bloom-$name.tmp")
    val dst = new Path(dir, s"bloom-$name.bin")
    val out = fs.create(tmp, true)
    try out.write(bos.toByteArray) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) { fs.delete(tmp, false); () }
  }

  /** All published bloom payloads (empty when the index has none — the
    * probe then treats every batch row as a candidate: correct, no
    * short-circuit). */
  private def loadBlooms(spark: SparkSession, root: String): Seq[Array[Byte]] = {
    val dir = bloomDir(root)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.startsWith("bloom-") &&
        s.getPath.getName.endsWith(".bin"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val in = fs.open(s.getPath)
        try {
          val buf = new Array[Byte](s.getLen.toInt)
          in.readFully(0, buf)
          buf
        } finally in.close()
      }
  }

  /** Extend the index with a corpus batch: one fingerprint pass, bloom
    * first (superset-safe), hash rows second, both idempotent under a
    * keyed replay. */
  def append(docs: DataFrame, root: String,
             commitKey: Option[String] = None): Unit =
      BuildLog.timed("exact_append:" + new java.io.File(root).getName) {
    val spark = docs.sparkSession
    val fps = docs.select(col("doc_id"), fpCol.as("fp")).persist()
    try {
      writeBloom(spark, fps, root, commitKey)
      store(root).append(spark, fps.withColumn("fp_shard", shardCol),
        partitionCols = Seq("fp_shard"), rangeCol = Some("fp_shard"),
        commitKey = commitKey)
    } finally { fps.unpersist(); () }
  }

  /** Batch rows whose text is NOT in the index: (doc_id, fp). Bloom-
    * negative rows short-circuit (definitively new); positives verify
    * with an anti-join against ONLY the hash shards the positive
    * fingerprints map to ([[ManifestStore.readRange]] per shard —
    * manifest-stat pruned, so unprobed shards are never opened).
    *
    * Batch-wins: stored rows carrying the batch's own doc_ids (a
    * crashed append's stranded hash commit) are excluded before the
    * anti-join, so a keyed replay probes as if its half-landed append
    * never happened — same idempotency contract as [[LshIndex.probe]]. */
  def probeNew(batch: DataFrame, root: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fps = batch.select(col("doc_id"), fpCol.as("fp"))
    val blooms = loadBlooms(spark, root)
    val (definitelyNew, candidates) =
      if (blooms.isEmpty) (fps.limit(0), fps)
      else (fps.filter(!bloomAnyContain(col("fp"), blooms)),
        fps.filter(bloomAnyContain(col("fp"), blooms)))

    val st = store(root)
    val candShards = candidates.select(shardCol.as("s"))
      .distinct().collect().map(_.getLong(0)).sorted
    val empty = Seq.empty[(String, Long)].toDF("fp", "doc_id")
    val stored =
      if (candShards.isEmpty) empty
      else if (st.currentRangeCol(spark).contains("fp_shard")) {
        val parts = candShards.toSeq.flatMap(sh => st.readRange(spark, sh, sh)
          .map(_.select(col("fp"), col("doc_id"))))
        if (parts.isEmpty) empty
        else parts.reduce(_.unionByName(_))
      } else st.read(spark).map(_.select(col("fp"), col("doc_id")))
        .getOrElse(empty)
    lastHashRead.set(
      (stored.inputFiles.length, st.currentFiles(spark).length))
    val storedFps = stored
      .join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
      .select("fp")
    definitelyNew.unionByName(
      candidates.join(storedFps, Seq("fp"), "left_anti"))
  }

  /** Maintenance: rebuild ONE right-sized bloom from the hash store and
    * retire the per-append filters (probe cost is linear in the filter
    * count, so a long-lived ingest stream consolidates on the same
    * cadence as [[LshIndex.compact]]). One corpus-width pass over the
    * store — a maintenance op, never on the probe path. Publish order
    * keeps the superset invariant: the consolidated filter lands
    * (atomic rename) BEFORE the old ones are deleted, so a crash
    * anywhere leaves membership a superset of the store. Callers hold
    * writer exclusivity (same contract as compact). */
  def consolidateBlooms(spark: SparkSession, root: String): Unit =
    store(root).read(spark).foreach { df =>
      val dir = bloomDir(root)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val old =
        if (fs.exists(dir))
          fs.listStatus(dir).toSeq.map(_.getPath)
            .filter(p => p.getName.startsWith("bloom-") &&
              p.getName.endsWith(".bin"))
        else Seq.empty
      writeBloom(spark, df.select("fp"), root,
        Some("consolidated-" + java.util.UUID.randomUUID().toString))
      old.foreach(p => fs.delete(p, false))
    }

  /** Reclaim unreferenced hash-store data files —
    * [[ManifestStore.vacuum]]'s retention contract. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
             minDataAgeMs: Long = ManifestStore.DefaultVacuumMinAgeMs): Unit =
    store(root).vacuum(spark, keepVersions, minDataAgeMs)

  // ------------------------------------------------------------- gate

  /** Index roots this JVM already built ([[Dedup.dedupIncremental]]'s
    * memo pattern — immutable-fixture assumption documented there). */
  private val builtRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Gate: even doc_ids are the frozen indexed corpus, odd ids the new
    * batch. The probe's survivors (batch texts absent from the corpus)
    * aggregate to (fp, keep_id, n) — in-batch duplicates collapse to
    * their min id, exactly the [[Dedup.dedupExact]] shape. */
  /** The gate's index root for `dir` — absolute-path-hashed so two dirs
    * named alike never alias (the [[Dedup.dedupIncremental]] rule). */
  private[graft] def gateRoot(dir: String): String = {
    s"${System.getProperty("java.io.tmpdir")}/graft_exact_index_" +
      new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir)
  }

  def dedupExactIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val root = gateRoot(dir)
    builtRoots.synchronized {
      if (!builtRoots.contains(root)) {
        val p = new Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        append(docs.filter(pmod(col("doc_id"), lit(2)) === 0), root)
        builtRoots.add(root)
      }
    }
    probeNew(docs.filter(pmod(col("doc_id"), lit(2)) === 1), root)
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("fp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_incremental" -> (dedupExactIncremental _))

  val oracle: Map[String, String] = Map(
    "dedup_exact_incremental" -> """
      WITH b AS (SELECT md5(COALESCE(text, '')) AS fp, doc_id
                 FROM documents WHERE doc_id % 2 = 1),
           c AS (SELECT DISTINCT md5(COALESCE(text, '')) AS fp
                 FROM documents WHERE doc_id % 2 = 0)
      SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n
      FROM b
      WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.fp = b.fp)
      GROUP BY fp ORDER BY fp""")
}
