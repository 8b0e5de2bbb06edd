package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.abi.Keccak

/** Block ingestion (EP2, eth-blocks.py:59-83): one row per block with the
  * reference's 10 fields (eth-blocks.py:42-46, README.md:44-48).
  *
  * The fetch layer is a pluggable [[BlockRpc]]: production would speak
  * JSON-RPC `eth_getBlockByNumber` to a provider; this environment is
  * zero-egress so tests/fixtures use the deterministic [[FakeBlockRpc]].
  * The Spark shape is the scalable part and is identical for both: a
  * partitioned `spark.range` fanned out with `mapPartitions`, so a
  * 1000-executor cluster fetches/derives blocks in parallel and the
  * result is a first-class Dataset[Block] (no driver-side loop — the
  * reference fetched one block at a time on one thread). */
final case class Block(block_number: Long, block_hash: Array[Byte],
                       miner: Array[Byte], nonce: Array[Byte],
                       gas_limit: Long, gas_used: Long, difficulty: Long,
                       extra_data: Array[Byte], time: Timestamp, size: Long)

trait BlockRpc extends Serializable {
  def getBlock(n: Long): Block
}

object FakeBlockRpc {
  /** Block-fetch counter — the observable the aggregate-pushdown spec
    * asserts on (a pushed COUNT/MIN/MAX must fetch ZERO blocks).
    * Meaningful in local mode only, where executors share the JVM. */
  val fetches = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** Deterministic block generator: every field derives from keccak of the
  * block number, so any partition/executor computes identical rows. */
final class FakeBlockRpc extends BlockRpc {
  private val GenesisTime = 1438269973L // public mainnet genesis timestamp

  override def getBlock(n: Long): Block = {
    FakeBlockRpc.fetches.incrementAndGet()
    val h = Keccak.hash256(BigInt(n).toByteArray)
    val h2 = Keccak.hash256(h)
    def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    val gasLimit = 8000000L + u32(h, 0) % 4000000L
    Block(
      block_number = n,
      block_hash = h,
      miner = h2.take(20),
      nonce = h.slice(8, 16),
      gas_limit = gasLimit,
      gas_used = u32(h, 4) % (gasLimit + 1),
      difficulty = 2000000000000L + u32(h, 8) * 1000L,
      extra_data = h2.slice(20, 28),
      time = new Timestamp((GenesisTime + n * 13L) * 1000L),
      size = 500L + u32(h, 12) % 80000L)
  }
}

object BlockSource {

  /** Blocks [from, to] as a typed Dataset, fetched with `parallelism`
    * concurrent partitions. */
  def range(spark: SparkSession, rpc: BlockRpc, from: Long, to: Long,
            parallelism: Int = 32): Dataset[Block] = {
    import spark.implicits._
    spark.range(from, to + 1, 1L, parallelism)
      .mapPartitions(_.map(n => rpc.getBlock(n.longValue())))
  }
}
