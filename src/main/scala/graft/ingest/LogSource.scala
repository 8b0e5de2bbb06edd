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

trait LogRpc extends Serializable {
  /** `eth_getLogs{fromBlock,toBlock,address}`; address=None → no filter. */
  def getLogs(from: Long, to: Long, address: Option[Array[Byte]]): Iterator[RawLog]

  /** Cheap log-count estimate for partition planning. A production RPC
    * would derive this from provider hints or sampled trial calls; the
    * reference instead adapts at runtime on over-limit errors
    * (eth-contract.py:132-143) — planning-time estimation is the
    * deterministic Spark-side equivalent. */
  def estimateLogs(from: Long, to: Long, address: Option[Array[Byte]]): Long
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

object LogSource {

  // one driver-side collect per (path, content signature) — scan builds
  // and plan estimates reuse it instead of re-collecting the corpus,
  // and a path whose files changed (new logs landed) reloads instead of
  // replaying a stale corpus
  private val corpusCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Array[RawLog]]()

  private def contentSignature(spark: SparkSession, path: String): Long = {
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
