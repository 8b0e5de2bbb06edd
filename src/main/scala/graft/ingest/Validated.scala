package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Constraint-validated ingest with a quarantine store — the CHECK
  * constraint + bad-records-path shape every warehouse ingest ships:
  * rows satisfying the constraint land in the main store, violators in
  * a sibling quarantine store WITH the violation reason, and both
  * commits carry the SAME idempotence key, so a replayed batch can
  * never split differently or double-land on either side.
  *
  * Scale shape: the split is two fused scan-filters over the batch (a
  * batch is read twice, not shuffled — appends are write-only
  * otherwise); validation itself is a pure column predicate, fused
  * behind the scan.
  */
object Validated {

  /** NULL-safe validity: a constraint evaluating to NULL is a
    * violation (Delta CHECK semantics). */
  private def validCol(constraint: Column): Column =
    coalesce(constraint, lit(false))

  /** Append `df` split by `constraint`: valid rows → `store`, violators
    * → `quarantine` (with a `reason` column). Returns (nGood, nBad).
    * Replay-safe: both sides key on `commitKey`. */
  def appendValidated(spark: SparkSession, df: DataFrame, constraint: Column,
                      store: ManifestStore, quarantine: ManifestStore,
                      reason: String,
                      commitKey: Option[String] = None,
                      rangeCol: Option[String] = None): (Long, Long) = {
    val good = df.filter(validCol(constraint))
    val bad = df.filter(!validCol(constraint))
      .withColumn("reason", lit(reason))
    val nGood = good.count()
    val nBad = bad.count()
    store.append(spark, good, commitKey = commitKey.map(_ + "#main"),
      rangeCol = rangeCol)
    quarantine.append(spark, bad, commitKey = commitKey.map(_ + "#quarantine"),
      rangeCol = rangeCol)
    (nGood, nBad)
  }

  // ----------------------------------------------------------- the gate

  private val builtRoots = scala.collection.mutable.Set[String]()

  private[graft] def gateRoots(dir: String): (String, String) = {
    val tag = new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir)
    val t = System.getProperty("java.io.tmpdir")
    (s"$t/graft_valid_main_$tag", s"$t/graft_valid_quar_$tag")
  }

  /** Gate: events deterministically corrupted (value NULLed on
    * event_id ≡ 0 mod 17), ingested through the validated path twice
    * with the same key (replay must be a no-op), then both stores read
    * back into one per-(store, type) rollup the oracle recomputes from
    * the fixture. */
  def validatedIngest(s: SparkSession, dir: String): DataFrame = {
    val (mainRoot, quarRoot) = gateRoots(dir)
    builtRoots.synchronized {
      if (!builtRoots.contains(mainRoot)) {
        for (r <- Seq(mainRoot, quarRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val main = new ManifestStore(mainRoot)
        val quar = new ManifestStore(quarRoot)
        val dirty = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            when(col("event_id") % 17 === 0, lit(null).cast("double"))
              .otherwise(col("value")).as("value"))
        val constraint = col("value").isNotNull
        def run() = appendValidated(s, dirty, constraint, main, quar,
          reason = "value_null", commitKey = Some("batch-1"),
          rangeCol = Some("event_id"))
        val (g1, b1) = run()
        val (g2, b2) = run() // replay: counts recompute, stores unchanged
        require(g1 == g2 && b1 == b2, "validated replay split differently")
        builtRoots.add(mainRoot)
      }
    }
    val main = new ManifestStore(mainRoot).read(s).get
      .withColumn("store", lit("main"))
    val quar = new ManifestStore(quarRoot).read(s).get
      .withColumn("store", lit("quarantine")).drop("reason")
    main.unionByName(quar)
      .groupBy("store", "event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .orderBy("store", "event_type")
  }

  /** Syntactically-broken JSONL lines planted in the [[ingestJsonl]]
    * gate — every one fails JSON parsing outright (no half-parsed
    * PERMISSIVE field nulling, whose engine-specific coercion rules
    * would muddy the oracle). */
  private[ingest] val CorruptLines = Seq(
    "{bad", "not json", "[1,2", "{\"a\":}", "}", "{{", "\"unterminated")

  /** Gate: JSONL corpus ingestion with corrupt-record quarantine — the
    * raw-crawl-dump entry path (documents arrive as JSON lines; some
    * are truncated/garbled). The documents table round-trips through
    * `to_json` → `from_json(PERMISSIVE, columnNameOfCorruptRecord)`
    * with [[CorruptLines]] planted: valid lines must reconstruct the
    * table exactly (per-lang count + id checksum against the direct
    * oracle), broken lines land in the corrupt column and are COUNTED,
    * never dropped silently. Scale shape: both serialization and
    * parsing are pure column expressions fused into the scan — no
    * shuffle beyond the final rollup. */
  def ingestJsonl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val docs = Tables.load(s, dir, "documents")
    val jsonl = docs.select(to_json(struct(col("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars"))).as("line"))
      .unionByName(CorruptLines.toDF("line"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType), StructField("_bad", StringType)))
    val parsed = jsonl.select(from_json(col("line"), schema, Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_bad")).as("r")).select("r.*")
    parsed.filter(col("_bad").isNull)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .unionByName(parsed.filter(col("_bad").isNotNull)
        .agg(count(lit(1)).as("n"))
        .select(lit("_corrupt").as("lang"), col("n"),
          lit(null).cast("long").as("id_sum")))
      .orderBy("lang")
  }

  private val tvfRoots = scala.collection.mutable.Map[String, Long]()

  /** Build (once per JVM) the TVF gate store: events in two appends
    * split at event_id 500, rangeCol event_id; returns (root, version
    * after the first append) for the time-travel query. */
  private def tvfStore(s: SparkSession, dir: String): (String, Long) = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_tvf_store_" +
      new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir)
    val v1 = tvfRoots.synchronized {
      tvfRoots.getOrElseUpdate(root, {
        val p = new Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val store = new ManifestStore(root)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        store.append(s, ev.filter(col("event_id") < 500),
          rangeCol = Some("event_id"))
        val v = store.currentVersion(s)
        store.append(s, ev.filter(col("event_id") >= 500),
          rangeCol = Some("event_id"))
        v
      })
    }
    (root, v1)
  }

  /** Gate: the store's stat-pruned range read through plain SQL — the
    * `graft_store_range` table function resolves to the SAME pruned
    * parquet plan `readRange` builds (see
    * [[graft.codec.GraftFunctions.registerStoreTvfs]]). */
  def storeSqlRange(s: SparkSession, dir: String): DataFrame = {
    val (root, _) = tvfStore(s, dir)
    graft.codec.GraftFunctions.register(s)
    s.sql(s"""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM graft_store_range('$root', 200, 700)
      GROUP BY event_type ORDER BY event_type""")
  }

  /** Gate: time travel through plain SQL — `graft_store_version`
    * pinned to the version after the FIRST append must see only that
    * commit's rows, whatever landed since. */
  def storeSqlVersion(s: SparkSession, dir: String): DataFrame = {
    val (root, v1) = tvfStore(s, dir)
    graft.codec.GraftFunctions.register(s)
    s.sql(s"""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM graft_store_version('$root', $v1)
      GROUP BY event_type ORDER BY event_type""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_validated_ingest" -> (validatedIngest _),
    "ingest_jsonl" -> (ingestJsonl _),
    "store_sql_range" -> (storeSqlRange _),
    "store_sql_version" -> (storeSqlVersion _))

  val oracle: Map[String, String] = Map(
    "store_sql_range" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events WHERE event_id BETWEEN 200 AND 700
      GROUP BY event_type ORDER BY event_type""",
    "store_sql_version" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events WHERE event_id < 500
      GROUP BY event_type ORDER BY event_type""",
    // valid lines reconstruct the table exactly; the corrupt row is the
    // planted-line count with a NULL checksum
    "ingest_jsonl" -> s"""
      SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM documents GROUP BY lang
      UNION ALL
      SELECT '_corrupt' AS lang, ${CorruptLines.size} AS n,
        CAST(NULL AS BIGINT) AS id_sum
      ORDER BY lang""",
    "store_validated_ingest" -> """
      SELECT CASE WHEN event_id % 17 = 0 THEN 'quarantine' ELSE 'main' END
          AS store,
        event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events
      GROUP BY 1, 2 ORDER BY store, event_type""")
}
