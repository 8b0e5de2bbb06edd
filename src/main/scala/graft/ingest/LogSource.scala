package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Log ingestion fetch layer (S2, eth-contract.py:61-63): the reference
  * calls JSON-RPC `eth_getLogs{fromBlock,toBlock,address}` per address per
  * blocksStep chunk. Here the fetch is a pluggable [[LogRpc]] — production
  * speaks JSON-RPC to a provider; this zero-egress environment uses the
  * deterministic [[ReplayLogRpc]] (mirroring [[FakeBlockRpc]]) — and the
  * Spark shape is the scalable part: block ranges become input partitions,
  * so a 1000-executor cluster fetches in parallel instead of the
  * reference's single-threaded chunk loop (eth-contract.py:77-83).
  */
final case class RawLog(address: Array[Byte], topics: Seq[Array[Byte]],
                        data: Array[Byte], block_number: Long,
                        block_hash: Array[Byte], log_index: Int,
                        transaction_index: Int, transaction_hash: Array[Byte])

/** Planning-time density estimator — the only thing the partition planner
  * needs. Kept separate from [[LogRpc]] so the DSv2 scan can plan against a
  * driver-side counts-only index while readers fetch executor-side. */
trait LogCountEstimator extends Serializable {
  /** Cheap log-count estimate for partition planning. A production RPC
    * would derive this from provider hints or sampled trial calls; the
    * reference instead adapts at runtime on over-limit errors
    * (eth-contract.py:132-143) — planning-time estimation is the
    * deterministic Spark-side equivalent. */
  def estimateLogs(from: Long, to: Long, address: Option[Array[Byte]]): Long
}

trait LogRpc extends LogCountEstimator {
  /** `eth_getLogs{fromBlock,toBlock,address}`; address=None → no filter. */
  def getLogs(from: Long, to: Long, address: Option[Array[Byte]]): Iterator[RawLog]
}

/** Deterministic replay RPC over an in-memory corpus (the test/fixture
  * stand-in for a JSON-RPC client; a production impl holds only endpoint
  * config, so executor-side serialization is trivial there — here the
  * corpus rides along, which is fine at fixture scale). The corpus is
  * kept block-sorted with a binary-searched range index so the planner's
  * repeated estimateLogs calls are O(log n), not O(corpus) each. */
final class ReplayLogRpc(corpus: Array[RawLog]) extends LogRpc {
  private val sorted = corpus.sortBy(l => (l.block_number, l.log_index.toLong))
  private val blocks = sorted.map(_.block_number)

  /** First index with block_number >= x. */
  private def lowerBound(x: Long): Int = {
    var lo = 0
    var hi = blocks.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (blocks(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def getLogs(from: Long, to: Long,
                       address: Option[Array[Byte]]): Iterator[RawLog] = {
    val s = lowerBound(from)
    val e = if (to == Long.MaxValue) blocks.length else lowerBound(to + 1)
    sorted.iterator.slice(s, e)
      .filter(l => address.forall(a => java.util.Arrays.equals(a, l.address)))
  }

  override def estimateLogs(from: Long, to: Long,
                            address: Option[Array[Byte]]): Long = {
    val s = lowerBound(from)
    val e = if (to == Long.MaxValue) blocks.length else lowerBound(to + 1)
    if (address.isEmpty) (e - s).toLong
    else getLogs(from, to, address).size.toLong
  }
}

/** Hadoop `Configuration` is not Java-serializable; this wrapper ships
  * the SESSION configuration (non-default FS settings included) into
  * task-side readers via Hadoop's own Writable round-trip. */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** Executor-side replay RPC: holds only parquet file paths (listed once,
  * driver-side) and reads its own `[from, to]` block slice lazily inside
  * the task that calls [[getLogs]], using parquet-hadoop's record reader
  * with a `FilterApi` predicate on `block_number` (plus `address` when
  * pushed) — row groups outside the range are skipped on statistics and
  * surviving records are filtered at record level, so a task never
  * materializes more than its own slice. This is the scan-side analogue of
  * the reference's server-side `eth_getLogs` window (eth-contract.py:61-63):
  * the "server" is the parquet footer statistics instead of the RPC node.
  *
  * No SparkSession is needed (tasks have none); the session's Hadoop
  * configuration rides along ([[SerializableHadoopConf]]) so non-default
  * FS settings reach the task-side readers.
  */
final class ParquetLogRpc(files: Seq[String], sconf: SerializableHadoopConf)
  extends LogRpc {

  def this(files: Seq[String]) =
    this(files, new SerializableHadoopConf(
      new org.apache.hadoop.conf.Configuration()))
  import org.apache.parquet.filter2.compat.FilterCompat
  import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.io.api.Binary

  /** The returned iterator also implements AutoCloseable: a consumer that
    * stops early (limit, task kill, downstream exception) must close() it
    * or the in-flight ParquetReader's file handle leaks — the DSv2
    * PartitionReader.close() does exactly that. Fully-drained iterators
    * close every reader themselves. */
  override def getLogs(from: Long, to: Long,
                       address: Option[Array[Byte]]): Iterator[RawLog] =
    new SliceIterator(from, to, address)

  /** Per-row-group (min block, max block, rows) summaries from the files'
    * parquet FOOTERS — one metadata-only pass per instance, no records
    * read; a planner probing [[estimateLogs]] repeatedly (LogPlanning
    * re-splits over-budget chunks) then costs arithmetic per probe, not a
    * corpus drain. Driver-side only (planning); tasks never touch it. */
  @transient private lazy val rowGroupStats: Array[(Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    files.toArray.flatMap { file =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), sconf.value))
      try reader.getFooter.getBlocks.asScala.toSeq.flatMap { b =>
        if (b.getRowCount == 0L) None
        else {
          val stats = b.getColumns.asScala
            .find(_.getPath.toDotString == "block_number")
            .map(_.getStatistics).collect {
              case s: org.apache.parquet.column.statistics.LongStatistics
                if !s.isEmpty && s.hasNonNullValue =>
                (s.genericGetMin.longValue(), s.genericGetMax.longValue())
            }
          // stats unavailable → conservatively assume the group spans
          // everything (planner over-splits, which is the safe direction)
          val (lo, hi) = stats.getOrElse((Long.MinValue, Long.MaxValue))
          Some((lo, hi, b.getRowCount))
        }
      } finally reader.close()
    }
  }

  /** Planning estimate from footer metadata only: row-group counts scaled
    * by block-range overlap (uniform-density assumption inside a group).
    * The pushed address filter is ignored — an upper bound, which makes
    * the planner split finer than needed, never coarser; address-aware
    * planning uses [[BlockCountIndex]] built over the filtered scan. */
  override def estimateLogs(from: Long, to: Long,
                            address: Option[Array[Byte]]): Long = {
    var est = 0.0
    rowGroupStats.foreach { case (lo, hi, rows) =>
      if (hi >= from && lo <= to) {
        if (lo == Long.MinValue || hi == Long.MaxValue) est += rows.toDouble
        else {
          val span = (hi - lo + 1).toDouble
          val overlap = (math.min(hi, to) - math.max(lo, from) + 1).toDouble
          est += rows * (overlap / span)
        }
      }
    }
    math.round(est)
  }

  /** Lazily walks the files, keeping at most one ParquetReader open;
    * applies the defensive re-check of the pushed predicate inline (the
    * parquet record-level filter already applied it — this also covers
    * readers without record filtering). */
  private final class SliceIterator(from: Long, to: Long,
                                    address: Option[Array[Byte]])
    extends Iterator[RawLog] with AutoCloseable {

    private val remaining = files.iterator
    private var reader: ParquetReader[Group] = _
    private var nextLog: RawLog = advance()

    private def matches(l: RawLog): Boolean =
      l.block_number >= from &&
        (to == Long.MaxValue || l.block_number <= to) &&
        address.forall(a => java.util.Arrays.equals(a, l.address))

    private def open(file: String): ParquetReader[Group] = {
      val block = FilterApi.longColumn("block_number")
      var pred: FilterPredicate = FilterApi.gtEq(block, java.lang.Long.valueOf(from))
      if (to != Long.MaxValue)
        pred = FilterApi.and(pred, FilterApi.ltEq(block, java.lang.Long.valueOf(to)))
      address.foreach { a =>
        pred = FilterApi.and(pred, FilterApi.eq(
          FilterApi.binaryColumn("address"), Binary.fromConstantByteArray(a)))
      }
      ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(file))
        .withConf(sconf.value)
        .withFilter(FilterCompat.get(pred))
        .build()
    }

    @scala.annotation.tailrec
    private def advance(): RawLog = {
      if (reader == null) {
        if (!remaining.hasNext) null
        else { reader = open(remaining.next()); advance() }
      } else {
        val g = reader.read()
        if (g == null) { reader.close(); reader = null; advance() }
        else {
          val l = toRawLog(g)
          if (matches(l)) l else advance()
        }
      }
    }

    override def hasNext: Boolean = nextLog != null
    override def next(): RawLog = {
      val l = nextLog; nextLog = advance(); l
    }
    override def close(): Unit = {
      if (reader != null) { reader.close(); reader = null }
      nextLog = null
    }
  }

  private def bin(g: Group, field: String): Array[Byte] =
    if (g.getFieldRepetitionCount(field) == 0) null
    else g.getBinary(field, 0).getBytes

  private def topicsOf(g: Group): Seq[Array[Byte]] = {
    if (g.getFieldRepetitionCount("topics") == 0) return Seq.empty
    val lst = g.getGroup("topics", 0) // 3-level parquet LIST encoding
    (0 until lst.getFieldRepetitionCount("list")).map { i =>
      val el = lst.getGroup("list", i)
      if (el.getFieldRepetitionCount("element") == 0) null
      else el.getBinary("element", 0).getBytes
    }
  }

  private def toRawLog(g: Group): RawLog =
    RawLog(bin(g, "address"), topicsOf(g), bin(g, "data"),
      g.getLong("block_number", 0), bin(g, "block_hash"),
      g.getInteger("log_index", 0), g.getInteger("transaction_index", 0),
      bin(g, "transaction_hash"))
}

/** Driver-side density index for partition planning: per-bucket log counts
  * (buckets of [[BlockCountIndex.BucketBlocks]] consecutive blocks), built
  * by a distributed `groupBy(bucket).count()` — the driver holds counts
  * only, never rows, so the index stays a few KB per million blocks no
  * matter the corpus size. Estimates interpolate uniformly inside partial
  * edge buckets, which is exactly as precise as planning needs (the
  * adaptive planner re-splits over-estimated chunks anyway). When an
  * address was pushed, the index is built over the address-filtered scan,
  * so estimates are address-aware without an (address × block) blowup. */
final class BlockCountIndex(buckets: Array[Long], counts: Array[Long],
                            addrKey: String)
  extends LogCountEstimator {
  import BlockCountIndex.BucketBlocks
  // cum(i) = logs in buckets [0, i)
  private val cum: Array[Long] = counts.scanLeft(0L)(_ + _)

  /** First index with bucket id >= x. */
  private def lowerBound(x: Long): Int = {
    var lo = 0
    var hi = buckets.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buckets(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def estimateLogs(from: Long, to: Long,
                            address: Option[Array[Byte]]): Long = {
    // the address filter is baked in at build time (forPath) — estimating
    // for a different address with this index would silently mis-size
    // partitions, so fail loud on the mismatch instead
    require(BlockCountIndex.addrKeyOf(address) == addrKey,
      s"BlockCountIndex built for address=$addrKey asked to estimate " +
        s"address=${BlockCountIndex.addrKeyOf(address)} — build a new index" )
    if (to < from) return 0L
    val bLo = Math.floorDiv(from, BucketBlocks)
    val bHi = if (to == Long.MaxValue) Long.MaxValue
              else Math.floorDiv(to, BucketBlocks)
    val s = lowerBound(bLo)
    val e = if (bHi == Long.MaxValue) buckets.length else lowerBound(bHi + 1)
    if (s >= e) return 0L
    var est = (cum(e) - cum(s)).toDouble
    // shave the uncovered fractions of the edge buckets (uniform assumption)
    if (buckets(s) == bLo) {
      val uncovered = from - bLo * BucketBlocks
      est -= counts(s).toDouble * uncovered / BucketBlocks
    }
    if (bHi != Long.MaxValue && e > s && buckets(e - 1) == bHi) {
      val uncovered = (bHi + 1) * BucketBlocks - 1 - to
      est -= counts(e - 1).toDouble * uncovered / BucketBlocks
    }
    math.max(0L, math.round(est))
  }
}

object BlockCountIndex {
  /** Bucket width: coarse enough that a 20M-block chain is a ~5k-entry
    * index, fine enough that adaptive planning still tracks density. */
  val BucketBlocks: Long = 4096L

  // (path, content signature, pushed-address hex) → index; tiny entries,
  // so caching every address variant is safe
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, String), BlockCountIndex]()

  private[graft] def addrKeyOf(address: Option[Array[Byte]]): String =
    address.map(a => a.map("%02x".format(_)).mkString).getOrElse("*")

  def forPath(spark: SparkSession, path: String,
              address: Option[Array[Byte]]): BlockCountIndex = {
    import org.apache.spark.sql.functions._
    val sig = LogSource.contentSignature(spark, path)
    val addrKey = addrKeyOf(address)
    val key = (path, sig, addrKey)
    if (!cache.containsKey(key)) // drop stale versions of this path
      cache.keySet.removeIf(k => k._1 == path && k._2 != sig)
    cache.computeIfAbsent(key, { _ =>
      var df = spark.read.parquet(path)
      address.foreach(a => df = df.filter(col("address") === lit(a)))
      val rows = df
        .groupBy((col("block_number") / lit(BucketBlocks)).cast("long").as("bucket"))
        .count()
        .collect() // counts only — O(chain length / 4096) driver memory
      val sorted = rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      new BlockCountIndex(sorted.map(_._1), sorted.map(_._2), addrKey)
    })
  }

  private[graft] def cacheSize: Int = cache.size
}

object LogSource {

  // one driver-side collect per (path, content signature) — scan builds
  // and plan estimates reuse it instead of re-collecting the corpus,
  // and a path whose files changed (new logs landed) reloads instead of
  // replaying a stale corpus. NOTE: the DSv2 source no longer uses this —
  // it plans on BlockCountIndex and reads via ParquetLogRpc; this remains
  // for tests and the CLI's direct typed-Dataset path.
  private val corpusCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Array[RawLog]]()

  /** Test hook: number of driver-materialized replay corpora currently
    * cached. SourceV2Spec asserts this stays 0 across DSv2 scans. */
  private[graft] def replayCacheSize: Int = corpusCache.size
  private[graft] def clearReplayCache(): Unit = corpusCache.clear()

  /** All parquet data files under a path, driver-side (cheap listing; no
    * rows are read). Shipped into [[ParquetLogRpc]] so executors need no
    * file-system listing of their own. */
  def listParquetFiles(spark: SparkSession, path: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        out += f.getPath.toString
    }
    out.toSeq
  }

  private[graft] def contentSignature(spark: SparkSession, path: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    var sig = 17L
    while (it.hasNext) {
      val f = it.next()
      sig = sig * 31 + f.getPath.getName.hashCode
      sig = sig * 31 + f.getLen
      sig = sig * 31 + f.getModificationTime
    }
    sig
  }

  /** Load a raw-log parquet into a replay RPC (driver-side; fixture-sized,
    * cached per path until its files change). */
  def replayFromParquet(spark: SparkSession, path: String): ReplayLogRpc = {
    val sig = contentSignature(spark, path)
    val key = (path, sig)
    if (!corpusCache.containsKey(key)) // drop stale versions of this path
      corpusCache.keySet.removeIf(k => k._1 == path && k._2 != sig)
    val corpus = corpusCache.computeIfAbsent(key, { _ =>
      import spark.implicits._
      spark.read.parquet(path).as[RawLog].collect()
    })
    new ReplayLogRpc(corpus)
  }

  /** Logs for [from, to] fanned out over fixed-size block-range partitions
    * — the simple Dataset form of S2; the DataSourceV2 form with pushdown
    * and adaptive partition sizing is [[graft.sources.LogSourceV2]]. */
  def range(spark: SparkSession, rpc: LogRpc, from: Long, to: Long,
            address: Option[Array[Byte]] = None,
            blocksStep: Long = 10000L): Dataset[RawLog] = {
    import spark.implicits._
    val nChunks = math.max(1L, (to - from + blocksStep) / blocksStep).toInt
    spark.range(0L, nChunks.toLong, 1L, math.min(nChunks, 32))
      .flatMap { i =>
        val lo = from + i * blocksStep
        val hi = math.min(lo + blocksStep - 1, to)
        rpc.getLogs(lo, hi, address)
      }
  }

  /** Raw logs as a DataFrame in [[Demux.rawLogSchema]] column order, ready
    * for the demux/decode pipeline. */
  def rangeDF(spark: SparkSession, rpc: LogRpc, from: Long, to: Long,
              address: Option[Array[Byte]] = None): DataFrame =
    range(spark, rpc, from, to, address).toDF()
      .select(Demux.rawLogSchema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
}
