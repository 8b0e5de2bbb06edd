package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.ingest.{Block, BlockRpc, FakeBlockRpc}

/** DataSourceV2 block source (SURVEY S1: "a custom DataSourceV2
  * TableProvider with block_range pushdown is the idiomatic form").
  *
  * `spark.read.format("graft.sources.BlockSourceV2")
  *    .option("from", a).option("to", b).load()`
  * exposes the blocks table; block_number range predicates are pushed
  * into the scan (SupportsPushDownFilters) so `WHERE block_number
  * BETWEEN x AND y` narrows the fetched range instead of filtering
  * after the fetch — the DSv2 equivalent of the reference's
  * server-side fromBlock/toBlock windowing (eth-contract.py:62).
  *
  * The RPC is the deterministic [[FakeBlockRpc]] in this zero-egress
  * environment; a JSON-RPC implementation drops in behind [[BlockRpc]]
  * without touching the planning code.
  */
class BlockSourceV2 extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockSourceV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BlocksTable(
      properties.getOrDefault("from", "0").toLong,
      properties.getOrDefault("to", "0").toLong,
      properties.getOrDefault("parallelism", "32").toInt)
}

object BlockSourceV2 {
  val schema: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("block_hash", BinaryType),
    StructField("miner", BinaryType),
    StructField("nonce", BinaryType),
    StructField("gas_limit", LongType, nullable = false),
    StructField("gas_used", LongType, nullable = false),
    StructField("difficulty", LongType, nullable = false),
    StructField("extra_data", BinaryType),
    StructField("time", TimestampType),
    StructField("size", LongType, nullable = false)))
}

private class BlocksTable(from: Long, to: Long, parallelism: Int)
  extends Table with SupportsRead {
  override def name(): String = s"blocks[$from,$to]"
  override def schema(): StructType = BlockSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlocksScanBuilder(from, to, parallelism)
}

private class BlocksScanBuilder(from: Long, to: Long, parallelism: Int)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var lo = from
  private var hi = to
  private var pushed = Array.empty[Filter]
  private var agg: Option[Aggregation] = None

  /** COUNT(*)/MIN(block_number)/MAX(block_number) with no grouping are
    * pure range arithmetic — the source answers them from [lo, hi]
    * without fetching a single block (the DSv2 analogue of answering
    * `eth_blockNumber`-style metadata queries without block bodies).
    * Anything else stays in Spark. */
  private def answerable(a: Aggregation): Boolean = {
    def isBlockNumber(f: AggregateFunc): Boolean = f match {
      case m: Min => m.column match {
        case n: NamedReference => n.fieldNames.sameElements(Array("block_number"))
        case _ => false
      }
      case m: Max => m.column match {
        case n: NamedReference => n.fieldNames.sameElements(Array("block_number"))
        case _ => false
      }
      case _ => false
    }
    a.groupByExpressions.isEmpty && a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case f => isBlockNumber(f)
      }
  }

  override def supportCompletePushDown(a: Aggregation): Boolean = answerable(a)

  override def pushAggregation(a: Aggregation): Boolean =
    if (answerable(a)) { agg = Some(a); true } else false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("block_number", _: Long) => true
      case GreaterThan("block_number", _: Long) => true
      case LessThanOrEqual("block_number", _: Long) => true
      case LessThan("block_number", _: Long) => true
      case EqualTo("block_number", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("block_number", v: Long) => lo = math.max(lo, v)
      case GreaterThan("block_number", v: Long) => lo = math.max(lo, v + 1)
      case LessThanOrEqual("block_number", v: Long) => hi = math.min(hi, v)
      case LessThan("block_number", v: Long) => hi = math.min(hi, v - 1)
      case EqualTo("block_number", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies anything we didn't accept
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = agg match {
    case Some(a) => new BlocksAggScan(lo, hi, a)
    case None => new BlocksScan(lo, hi, parallelism)
  }
}

/** Completely-pushed aggregate over a block range: one partition, one
  * row, zero RPC fetches — count/min/max fall out of [lo, hi]. */
private class BlocksAggScan(lo: Long, hi: Long, agg: Aggregation)
  extends Scan with Batch {

  private val empty = hi < lo

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })

  override def description(): String =
    s"graft blocks AGG-PUSHDOWN range=[$lo,$hi] " +
      agg.aggregateExpressions.map(_.describe()).mkString(", ")

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(BlockRangePartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => if (empty) 0L else hi - lo + 1
      case _: Min => if (empty) null else lo
      case _: Max => if (empty) null else hi
      case other => throw new IllegalStateException(
        s"unanswerable pushed aggregate: ${other.describe()}")
    }
    new SingleRowReaderFactory(InternalRow.fromSeq(values.toSeq))
  }
}

private class SingleRowReaderFactory(row: InternalRow)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

private class BlocksScan(lo: Long, hi: Long, parallelism: Int) extends Scan with Batch {
  override def readSchema(): StructType = BlockSourceV2.schema
  override def description(): String = s"graft blocks range=[$lo,$hi]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi < lo) return Array.empty
    val total = hi - lo + 1
    val slices = math.min(parallelism.toLong, total).toInt
    (0 until slices).map { i =>
      val start = lo + i * total / slices
      val end = lo + (i + 1) * total / slices - 1
      BlockRangePartition(start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlocksReaderFactory(new FakeBlockRpc)
}

private case class BlockRangePartition(start: Long, end: Long) extends InputPartition

private class BlocksReaderFactory(rpc: BlockRpc)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[BlockRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = part.start - 1
      override def next(): Boolean = { cur += 1; cur <= part.end }
      override def get(): InternalRow = toRow(rpc.getBlock(cur))
      override def close(): Unit = ()
      private def toRow(b: Block): InternalRow =
        InternalRow(b.block_number, b.block_hash, b.miner, b.nonce,
          b.gas_limit, b.gas_used, b.difficulty, b.extra_data,
          b.time.getTime * 1000L, // micros since epoch
          b.size)
    }
  }
}
