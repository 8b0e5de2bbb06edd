package graft.fixtures

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.abi.{AbiJson, AbiSchema}
import graft.codec.AbiDecoder
import graft.ingest.Demux
import java.math.{BigDecimal => JBigDecimal, BigInteger}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Deterministic synthetic raw-log batches over the ENTIRE reference
  * config tree (412 tables across 28 ABIs) — shared by the
  * UniverseIngestSpec E2E and the bench's `universe_demux` throughput
  * section (round-14 agenda #5): one generator, so the spec's
  * correctness evidence and the bench's rows/s measure the same shape.
  *
  * Values are width-aware (they must survive the SCHEMA types: uint24..56
  * → LongType, wider → DECIMAL(38,0)); every encoded log round-trips
  * through [[AbiDecoder]]'s own encoder, so the batch exercises the real
  * decode path, not a mock. */
object UniverseFixture {

  /** Every TableDef derivable from the reference config tree; empty when
    * the tree is absent (callers skip/assume). The conf DIRECTORY name
    * is the warehouse schema (reference classes.py:56) and qualifies
    * each def: aave and aave_v2 share 18 table names (12 with different
    * ABI shapes) which must stay separate tables, not merge. */
  def defs(confDir: String = "/root/reference/conf"): Seq[AbiSchema.TableDef] = {
    val d = new java.io.File(confDir)
    if (!d.isDirectory) Nil
    else d.listFiles.filter(_.isDirectory).sortBy(_.getName)
      .flatMap(sd => sd.listFiles.sortBy(_.getName)
        .filter(_.getName.endsWith(".abi"))
        .flatMap(f => AbiSchema.tables(f.getName.stripSuffix(".abi"),
          AbiJson.parseFile(f.getPath), schemaName = sd.getName))).toSeq
  }

  /** One generated batch: raw rows (Demux.rawLogSchema), the generated
    * values per table (for decode-back assertions), and the block span. */
  case class Batch(rows: Seq[Row], truth: Map[String, Seq[Seq[Any]]],
                   firstBlock: Long, lastBlock: Long)

  /** `rowsPerDef` encoded logs per table def, strictly increasing block
    * numbers from `startBlock + 1`. Deterministic for a fixed seed. */
  def batch(defs: Seq[AbiSchema.TableDef], rowsPerDef: Int = 2,
            seed: Long = 42, startBlock: Long = 1_000_000L): Batch = {
    val rnd = new scala.util.Random(seed)
    def valueFor(t: String, indexed: Boolean): Any =
      if (indexed && (t == "string" || t == "bytes" || t.endsWith("[]")))
        Array.fill[Byte](32)(rnd.nextInt().toByte) // pre-hashed topic
      else t match {
        case "address" => Array.fill[Byte](20)(rnd.nextInt().toByte)
        case "bool" => rnd.nextBoolean()
        case "string" => rnd.alphanumeric.take(rnd.nextInt(24)).mkString
        case "bytes" => Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
        // arrays BEFORE the bytes-prefix case: a non-indexed `bytes32[]`
        // would otherwise hit the bytesN arm and "32[]".toInt would throw
        case a if a.endsWith("[]") =>
          Seq.fill(rnd.nextInt(3))(valueFor(a.dropRight(2), indexed = false))
        case b if b.startsWith("bytes") =>
          Array.fill[Byte](b.drop(5).toInt)(rnd.nextInt().toByte)
        case "uint8" => rnd.nextInt(256).toShort
        case "uint16" => rnd.nextInt(65536)
        case t if t.startsWith("uint") || t.startsWith("int") =>
          // width-aware magnitudes: these values pass through the SCHEMA
          // types (uint24..56 → LongType, wider → DECIMAL(38,0)), so
          // they must fit what they decode into
          val digits = t.dropWhile(_.isLetter)
          val bits = if (digits.isEmpty) 256 else digits.toInt
          val width = math.min(bits - 1, 120) // signed slots AND 38 digits
          new JBigDecimal(new BigInteger(width, rnd.self))
        case other => throw new IllegalArgumentException(
          s"no generator for ABI type $other")
      }
    val truth = scala.collection.mutable.Map[String, Seq[Seq[Any]]]()
    val rawRows = ArrayBuffer.empty[Row]
    var blockNo = startBlock
    var txIndex = 0
    def bytes(n: Int) = Array.fill[Byte](n)(rnd.nextInt().toByte)
    defs.foreach { d =>
      val rows = (0 until rowsPerDef).map { i =>
        blockNo += 1; txIndex += 1
        val values = d.entry.inputs.map(p => valueFor(p.abiType, p.indexed))
        val (topics, data) =
          if (d.isEvent) AbiDecoder.encodeEvent(d.entry, values)
          else (Seq(java.util.Arrays.copyOf(d.dispatchKey.toArray, 32)),
            AbiDecoder.encodeCall(d.entry, values))
        rawRows += Row.fromSeq(Seq[Any](bytes(20), topics, data,
          blockNo, bytes(32), i, txIndex, bytes(32)))
        values
      }
      truth(d.qualified) = rows
    }
    Batch(rawRows.toSeq, truth.toMap, startBlock + 1, blockNo)
  }

  /** A DISTRIBUTED ~`targetRows`-row raw batch: the deterministic base
    * batch replicated executor-side with span-shifted block numbers
    * (every replica's blocks stay distinct and increasing) — the bench's
    * 1M-log universe-demux input without a 1M-row driver loop. */
  def scaledRaw(spark: SparkSession, defs: Seq[AbiSchema.TableDef],
                targetRows: Long, seed: Long = 42): (DataFrame, Long) = {
    val b = batch(defs, rowsPerDef = 2, seed = seed)
    val base = spark.createDataFrame(b.rows.asJava, Demux.rawLogSchema)
    val span = b.lastBlock - b.firstBlock + 1
    val reps = math.max(1L, targetRows / b.rows.size)
    val df = base
      .crossJoin(spark.range(reps).select(col("id").as("_rep")))
      .withColumn("block_number", col("block_number") + col("_rep") * lit(span))
      .drop("_rep")
    (df, reps * b.rows.size)
  }
}
