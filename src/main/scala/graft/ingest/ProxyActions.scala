package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.abi.Keccak

/** Receipt-filtered source for the proxy_actions path (S3,
  * eth-contract.py:45-58): DSSProxyActions calls arrive wrapped in
  * DSProxy `execute()` transactions, so the reference (a) dedups logs by
  * transaction hash keeping the first log (`logs[0]`,
  * eth-contract.py:52-55), (b) fetches each tx receipt, and (c) keeps the
  * row only when the receipt data contains the DSSProxyActions address.
  *
  * Spark shape: the dedup is a per-tx-hash `row_number`=1 (one shuffle on
  * transaction_hash); the receipt fetch+filter is a partition-parallel
  * pass behind the pluggable [[ReceiptRpc]] — at scale each executor
  * fetches its partition's receipts concurrently, vs the reference's
  * serial per-tx loop.
  */
trait ReceiptRpc extends Serializable {
  /** Concatenated log data of the tx receipt (the haystack the reference
    * scans for the proxy address, eth-contract.py:55). */
  def getReceiptData(txHash: Array[Byte]): Array[Byte]
}

/** Deterministic receipt fake: data derives from keccak of the tx hash;
  * txs whose hash has an even first byte are "proxy-wrapped" — their
  * receipt embeds `proxyAddr`. The fixture generator uses the same parity
  * rule to write ground truth, so the gate checks the operator, not the
  * fake. */
final class FakeReceiptRpc(proxyAddr: Array[Byte]) extends ReceiptRpc {
  override def getReceiptData(txHash: Array[Byte]): Array[Byte] = {
    val a = Keccak.hash256(txHash)
    val b = Keccak.hash256(a)
    if (FakeReceiptRpc.isWrapped(txHash)) a ++ proxyAddr ++ b else a ++ b
  }
}

object FakeReceiptRpc {
  def isWrapped(txHash: Array[Byte]): Boolean = (txHash(0) & 1) == 0
}

object ProxyActions {

  /** First-occurrence index of `needle` in `haystack`, -1 if absent. */
  private[graft] def indexOf(haystack: Array[Byte], needle: Array[Byte]): Int = {
    if (needle.isEmpty) return 0
    var i = 0
    while (i + needle.length <= haystack.length) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** The composed S3 operator over raw logs: one row per transaction
    * (its lowest-log_index log) whose receipt contains `proxyAddr`. */
  def filter(logs: DataFrame, rpc: ReceiptRpc, proxyAddr: Array[Byte]): Dataset[RawLog] = {
    import logs.sparkSession.implicits._
    val w = Window.partitionBy("transaction_hash")
      .orderBy(col("log_index"), col("transaction_index"))
    logs
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1) // dedup: keep logs[0] per tx
      .drop("_rk")
      .select(Demux.rawLogSchema.fieldNames.map(col).toSeq: _*)
      .as[RawLog]
      .mapPartitions { it => // receipt fetch + contains-filter, partition-parallel
        it.filter(l => indexOf(rpc.getReceiptData(l.transaction_hash), proxyAddr) >= 0)
      }
  }
}
