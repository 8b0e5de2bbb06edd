package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are single parquet files under `dir`; at 100 TB these would be
  * partitioned directories — `spark.read.parquet` handles both transparently,
  * and every query in this engine goes through this single entry point so the
  * storage layout can change without touching query code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture vintages have shipped events.ts as parquet TIMESTAMP(NANOS)
    // (unreadable without nanosAsLong → a raw epoch-nanos long) and as
    // TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ). Tolerate both: the
    // legacy conf keeps the nanos vintage readable, and canonicalizeTs
    // presents ONE type downstream so no consumer branches on vintage.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // epoch<->field conversions during canonicalization (and every oracle
    // compare) assume UTC; pin it here so every entry point agrees.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.columns.contains("ts")) canonicalizeTs(df) else df
  }

  /** Canonical `ts`: TIMESTAMP_NTZ at micros, whatever the physical
    * parquet type was. Consumers needing epochs derive them with
    * [[tsEpochNs]]. */
  private def canonicalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case TimestampNTZType => df
      case LongType => // nanos-as-long vintage: ns → µs → NTZ (UTC session)
        // integral div: a double-typed `/` would lose precision on
        // ~2^60 epoch-nanos values
        df.withColumn("ts",
          expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType))
      case TimestampType => df.withColumn("ts", col("ts").cast(TimestampNTZType))
      case other =>
        throw new IllegalStateException(s"unsupported physical type for ts: $other")
    }

  /** Epoch nanoseconds of a canonical (NTZ, UTC-session) `ts` column —
    * matches DuckDB's `epoch_ns(ts)` over the same parquet. */
  def tsEpochNs(c: Column): Column =
    unix_micros(c.cast(TimestampType)) * 1000L

  /** Register every table as a temp view so `spark.sql` queries resolve the
    * same names the DuckDB oracle uses. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
