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

  /** Memoized analyzed frames per (session, dir, table). `spark.read
    * .parquet` re-reads the file footer for schema inference on EVERY
    * call, and the SQL query families re-load all ten tables per gate
    * invocation (registerAll) — a pure fixed cost paid ~120 times per
    * bench pass. The memo holds only the LAZY analyzed plan: nothing is
    * computed or pinned, every action still scans the parquet, so this
    * is metadata reuse, not result caching. Keys hold the session by
    * REFERENCE (sessions never override equals), so a cloned session
    * (PageRank's conf-pinned newSession) gets its own entries; the
    * bounded clear stops test suites that create many sessions from
    * leaking them through the map. Correctness assumption (same as the
    * rest of the engine, see dedupIncremental's builtRoots note): a
    * fixture path's contents are immutable within one JVM. */
  private val loadCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), (Long, DataFrame)]()

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
    val path = s"$dir/$name.parquet"
    // in-place rewrites (a spec's mutable tmp corpus) change the file's —
    // or, for a directory table, the directory entry's — mtime, so one
    // stat per hit keeps the memo honest without re-paying the footer read
    val mtime = new java.io.File(path).lastModified()
    val key = (spark, dir, name)
    val hit = loadCache.get(key)
    if (hit != null && hit._1 == mtime) hit._2
    else {
      if (loadCache.size > 512) loadCache.clear()
      val df = spark.read.parquet(path)
      val out = if (df.columns.contains("ts")) canonicalizeTs(df) else df
      loadCache.put(key, (mtime, out))
      out
    }
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

  /** The dir whose tables are currently registered as this session's temp
    * views — lets a repeat [[registerAll]] with the same dir skip the ten
    * catalog writes (and their conf churn), which every SQL-family gate
    * pays per invocation otherwise. [[registerOne]] (the only other place
    * in the engine that binds one of these view NAMES) invalidates the
    * memo, so a partial re-point can never masquerade as a full
    * registration. */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table as a temp view so `spark.sql` queries resolve the
    * same names the DuckDB oracle uses. Idempotent; skips when this session
    * already has exactly this dir's views registered. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      // memo AFTER the loop: a concurrent caller that observes the memo
      // must be guaranteed every view is already bound
      registeredDir.put(spark, dir)
    }

  /** Bind ONE fixture table as a temp view (the events-only q17 entry
    * points) — and drop the session's registerAll memo, since the view set
    * no longer matches any single dir. */
  def registerOne(spark: SparkSession, dir: String, name: String): Unit = {
    load(spark, dir, name).createOrReplaceTempView(name)
    registeredDir.remove(spark)
  }
}
