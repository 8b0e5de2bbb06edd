package graft.ingest

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed parquet store: atomic, snapshot-isolated commits
  * over plain parquet files — the transactional layer the reference gets
  * from per-chunk Postgres transactions (classes.py:24-26,
  * eth-contract.py:85,145-146), re-expressed for a file warehouse.
  *
  * Layout:
  * {{{
  *   <root>/_manifests/v00000001.manifest   // one line per data file
  *   <root>/data/<commit-uuid>/...          // immutable data files
  * }}}
  *
  * Protocol: writers put data files into a fresh `data/<uuid>/` directory
  * (invisible to readers), then publish by renaming a temp manifest to
  * `v{N+1}.manifest` — a single atomic rename on local/HDFS file systems,
  * with exists-check retry as optimistic concurrency (first committer of
  * a version wins, the loser re-reads and retries on the next version).
  * Readers resolve the highest complete manifest and load exactly the
  * files it lists: they never observe a half-written commit, a swap
  * window, or a compaction in progress. Old files stay on disk until
  * [[vacuum]], so in-flight readers of older snapshots stay consistent.
  *
  * Exactly-once: [[overwriteRange]] commits a block window atomically,
  * replacing exactly the files the window overlaps (per-file min/max
  * stats in the manifest prune the rewrite; non-overlapping commits are
  * pure appends) — so re-delivery of a range, under any batching, is
  * idempotent. That is streaming ingest's commit primitive
  * (ChainStream.ingestStreamAtomic). Commits can additionally carry an
  * idempotence key (`commitKey`): re-committing a key some manifest
  * already records is a no-op — the cheap short-circuit for exact
  * replays of job-level runs.
  *
  * Object-store caveat (documented contract, same as Delta's): the
  * version-rename commit assumes rename-without-overwrite is atomic —
  * true on local FS and HDFS; S3-style stores need a coordination service
  * in front of the manifest directory.
  */
final class ManifestStore(val root: String) extends Serializable {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def manifestsDir = new Path(root, "_manifests")
  private def dataDir = new Path(root, "data")

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      name.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None

  /** Highest committed version, 0 if none. Incomplete temp manifests are
    * invisible (they don't match the v*.manifest pattern). */
  def currentVersion(spark: SparkSession): Long = {
    val f = fs(spark)
    if (!f.exists(manifestsDir)) 0L
    else f.listStatus(manifestsDir)
      .flatMap(s => versionOf(s.getPath.getName)).maxOption.getOrElse(0L)
  }

  /** One data file of a snapshot, with optional min/max stats on the
    * range column (Delta-style file statistics): overwriteRange uses them
    * to rewrite only the files its window overlaps. Files without stats
    * are conservatively treated as overlapping everything. */
  case class FileEntry(rel: String, min: Option[Long], max: Option[Long]) {
    def overlaps(from: Long, to: Long): Boolean = (min, max) match {
      case (Some(lo), Some(hi)) => hi >= from && lo <= to
      case _ => true
    }
    def serialized: String =
      rel + min.map(m => s"\t$m\t${max.getOrElse(m)}").getOrElse("")
  }

  private object FileEntry {
    def parse(line: String): FileEntry = line.split('\t') match {
      case Array(rel, lo, hi) => FileEntry(rel, lo.toLongOption, hi.toLongOption)
      case other => FileEntry(other.head, None, None)
    }
  }

  private case class Snapshot(version: Long, key: Option[String],
                              files: Seq[FileEntry])

  private def readManifest(f: FileSystem, v: Long): Snapshot = {
    val p = new Path(manifestsDir, f"v$v%08d.manifest")
    val in = f.open(p)
    val text = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      StandardCharsets.UTF_8)
    finally in.close()
    val lines = text.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    val (meta, files) = lines.partition(_.startsWith("#"))
    val key = meta.collectFirst { case m if m.startsWith("#key:") =>
      m.stripPrefix("#key:") }
    Snapshot(v, key, files.map(FileEntry.parse))
  }

  private def snapshot(spark: SparkSession): Option[Snapshot] = {
    val v = currentVersion(spark)
    if (v == 0L) None else Some(readManifest(fs(spark), v))
  }

  /** All data files of the current snapshot as absolute paths. */
  def currentFiles(spark: SparkSession): Seq[String] =
    snapshot(spark).map(_.files.map(e => new Path(root, e.rel).toString))
      .getOrElse(Nil)

  /** True if any committed manifest carries `key` (idempotent-append
    * check; scans manifest headers only). */
  def hasCommitKey(spark: SparkSession, key: String): Boolean = {
    val f = fs(spark)
    if (!f.exists(manifestsDir)) return false
    f.listStatus(manifestsDir)
      .flatMap(s => versionOf(s.getPath.getName))
      .exists(v => readManifest(f, v).key.contains(key))
  }

  /** Publish a manifest listing `files` (root-relative). Retries on
    * version collision with a concurrent committer. */
  private def commit(spark: SparkSession, files: Seq[FileEntry],
                     key: Option[String]): Long = {
    val f = fs(spark)
    f.mkdirs(manifestsDir)
    val body = (key.map("#key:" + _).toSeq ++ files.map(_.serialized))
      .mkString("", "\n", "\n")
    var attempts = 0
    while (attempts < 100) {
      val v = currentVersion(spark) + 1
      val tmp = new Path(manifestsDir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      val dest = new Path(manifestsDir, f"v$v%08d.manifest")
      // rename-without-overwrite is the atomic publish; false = lost the
      // race for this version, retry on the next
      if (!f.exists(dest) && f.rename(tmp, dest)) return v
      f.delete(tmp, false)
      attempts += 1
    }
    throw new IllegalStateException(
      s"ManifestStore($root): could not commit after $attempts attempts")
  }

  /** Write `df` into a fresh commit directory; returns entries with
    * per-file min/max stats on `rangeCol` (when set — one small
    * aggregation over the just-written files). Data is invisible until a
    * manifest references it. */
  private def writeData(spark: SparkSession, df: DataFrame,
                        partitionCols: Seq[String],
                        rangeCol: Option[String]): Seq[FileEntry] = {
    val commitId = java.util.UUID.randomUUID().toString
    val dir = new Path(dataDir, commitId)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir.toString)
    val f = fs(spark)
    val rels = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = f.listFiles(dir, true)
    val rootUri = new Path(root).makeQualified(f.getUri, f.getWorkingDirectory).toUri
    while (it.hasNext) {
      val file = it.next()
      val name = file.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith("."))
        rels += rootUri.relativize(file.getPath.toUri).getPath
    }
    val stats: Map[String, (Long, Long)] = rangeCol match {
      case Some(rc) if rels.nonEmpty =>
        // per-file min/max; keyed by file name (unique within the commit)
        spark.read.option("basePath", dir.toString)
          .parquet(rels.map(r => new Path(root, r).toString).toSeq: _*)
          .groupBy(input_file_name().as("_f"))
          .agg(min(col(rc)).as("_lo"), max(col(rc)).as("_hi"))
          .collect()
          .map(r => (new Path(new java.net.URI(r.getString(0)).getPath).getName,
            (r.getLong(1), r.getLong(2)))).toMap
      case _ => Map.empty
    }
    rels.toSeq.map { rel =>
      val st = stats.get(new Path(rel).getName)
      FileEntry(rel, st.map(_._1), st.map(_._2))
    }
  }

  /** Read specific snapshot entries. Files are grouped by commit
    * directory and each group reads with its commit dir as `basePath`, so
    * partition columns (`table_name=...` layout) are recovered per commit
    * and pruning works as on a plain partitioned store; groups union by
    * name. Compaction collapses the groups back to one. */
  private def readFiles(spark: SparkSession, files: Seq[FileEntry]): DataFrame = {
    // rel path shape: data/<commit-uuid>/[partition dirs/]file.parquet
    val byCommit = files.groupBy(_.rel.split('/').take(2).mkString("/"))
    byCommit.toSeq.sortBy(_._1).map { case (commitDir, entries) =>
      val abs = entries.map(e => new Path(root, e.rel).toString)
      spark.read.option("basePath", new Path(root, commitDir).toString)
        .parquet(abs: _*)
    }.reduce(_.unionByName(_))
  }

  /** Read the current snapshot. None = store is empty (no commits yet). */
  def read(spark: SparkSession): Option[DataFrame] =
    snapshot(spark).map(s => readFiles(spark, s.files))

  /** Atomic append: new files + previous snapshot in one commit. A
    * `commitKey` already present in any manifest makes this a no-op
    * (exactly-once under replay). `rangeCol` records per-file min/max
    * stats so later overwriteRange calls can prune. */
  def append(spark: SparkSession, df: DataFrame,
             partitionCols: Seq[String] = Nil,
             commitKey: Option[String] = None,
             rangeCol: Option[String] = None): Unit = synchronized {
    if (commitKey.exists(hasCommitKey(spark, _))) return
    val newFiles = writeData(spark, df, partitionCols, rangeCol)
    val prev = snapshot(spark).map(_.files).getOrElse(Nil)
    commit(spark, prev ++ newFiles, commitKey)
  }

  /** Atomic overwrite-by-range (the manifest form of
    * [[Writer.overwriteRange]], and the exactly-once commit for chain
    * ingest): rows in [from, to] are replaced by `df` in one manifest
    * flip — readers see wholly-old or wholly-new, never the in-between.
    * Per-file stats prune the rewrite to the files the window actually
    * overlaps: a forward-moving ingest whose new range touches nothing
    * degrades to a pure append (no rewrite at all), while re-delivered
    * ranges — whatever their batch boundaries — replace their previous
    * copy idempotently. Files without stats are conservatively
    * rewritten. */
  def overwriteRange(spark: SparkSession, df: DataFrame, from: Long, to: Long,
                     rangeCol: String = "block_number",
                     partitionCols: Seq[String] = Nil,
                     commitKey: Option[String] = None): Unit = synchronized {
    if (commitKey.exists(hasCommitKey(spark, _))) return
    val prev = snapshot(spark).map(_.files).getOrElse(Nil)
    val (hit, kept) = prev.partition(_.overlaps(from, to))
    val merged =
      if (hit.isEmpty) df
      else readFiles(spark, hit)
        .filter(col(rangeCol) < from || col(rangeCol) > to)
        .unionByName(df)
    val newFiles = writeData(spark, merged, partitionCols, Some(rangeCol))
    commit(spark, kept ++ newFiles, commitKey)
  }

  /** Atomic compaction: rewrite the current snapshot into
    * ceil(bytes/targetBytes) files (per partition directory when
    * `partitionCols` is set) and commit the compacted file set in one
    * manifest flip. Concurrent readers keep resolving the old manifest
    * until the instant the new one lands — no missing-partition window,
    * unlike directory-swap compaction on a plain store. Safe under crash
    * at any point: an unpublished commit directory is invisible and
    * vacuumable. */
  def compact(spark: SparkSession, targetBytes: Long = 128L * 1024 * 1024,
              partitionCols: Seq[String] = Nil,
              rangeCol: Option[String] = None): Unit = synchronized {
    snapshot(spark).foreach { s =>
      val f = fs(spark)
      val totalBytes = s.files.map(e =>
        f.getFileStatus(new Path(root, e.rel)).getLen).sum
      val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      val df = read(spark).get
      val compacted =
        if (partitionCols.isEmpty) df.repartition(nFiles)
        else df.repartition(nFiles, partitionCols.map(col): _*)
      val newFiles = writeData(spark, compacted, partitionCols, rangeCol)
      commit(spark, newFiles, None)
    }
  }

  /** Drop data files referenced by no recent manifest and manifests older
    * than `keepVersions`. Run when no reader can still hold a snapshot
    * older than the retained window (Delta-style retention contract). */
  def vacuum(spark: SparkSession, keepVersions: Int = 2): Unit = synchronized {
    val f = fs(spark)
    val latest = currentVersion(spark)
    if (latest == 0L) return
    val keepFrom = math.max(1L, latest - keepVersions + 1)
    val versions = f.listStatus(manifestsDir)
      .flatMap(s => versionOf(s.getPath.getName)).sorted
    val live: Set[String] = versions.filter(_ >= keepFrom)
      .flatMap(v => readManifest(f, v).files.map(_.rel)).toSet
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      val rootUri = new Path(root).makeQualified(f.getUri, f.getWorkingDirectory).toUri
      val dead = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val file = it.next()
        val rel = rootUri.relativize(file.getPath.toUri).getPath
        if (file.getPath.getName.endsWith(".parquet") && !live.contains(rel))
          dead += file.getPath
      }
      dead.foreach(f.delete(_, false))
    }
    versions.filter(_ < keepFrom).foreach { v =>
      f.delete(new Path(manifestsDir, f"v$v%08d.manifest"), false)
    }
  }
}
