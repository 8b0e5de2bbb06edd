package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // events.ts is TIMESTAMP(NANOS) which Spark's parquet reader rejects;
    // read it as a nanos-since-epoch long (orders identically, and queries
    // that need an actual timestamp use timestamp_micros(ts div 1000)).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` queries resolve the
    * same names the DuckDB oracle uses. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
