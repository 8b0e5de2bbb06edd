package graft.codec

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.Shim

/** Column-level API + SQL registration for the graft expressions.
  *
  * `register(spark)` makes `keccak256`, `bytes32_to_ascii`, `wad`, `ray`,
  * `rad` available to `spark.sql` text; the Column helpers serve the
  * DataFrame DSL. Register via config with
  * `spark.sql.extensions=graft.codec.GraftExtensions` or call
  * `GraftFunctions.register` explicitly.
  */
object GraftFunctions {

  def keccak256(c: Column): Column = Shim.column(Keccak256(Shim.expression(c)))

  def bytes32ToAscii(c: Column): Column = Shim.column(Bytes32ToAscii(Shim.expression(c)))

  /** EIP-55 mixed-case display form of a 20-byte address (S14). */
  def checksumAddress(c: Column): Column = Shim.column(ChecksumAddress(Shim.expression(c)))

  /** wad: token quantity at 10^-18 (SURVEY §1.2; assets_per_type.sql:44). */
  def wad(c: Column): Column = Shim.column(RescaleToDouble(Shim.expression(c), 18))

  /** ray: rate at 10^-27 (assets_per_type.sql:31,43). */
  def ray(c: Column): Column = Shim.column(RescaleToDouble(Shim.expression(c), 27))

  /** rad: debt at 10^-45. */
  def rad(c: Column): Column = Shim.column(RescaleToDouble(Shim.expression(c), 45))

  /** Signed wad: for int256 wide-int columns (dart/dink) carried as raw
    * two's-complement binary words (`wideIntsAsBinary = true`) — the
    * unsigned [[wad]] fails loudly on a set sign bit. */
  def wadSigned(c: Column): Column =
    Shim.column(RescaleToDouble(Shim.expression(c), 18, signed = true))

  /** Signed ray: the int256-binary counterpart of [[ray]] (rate deltas). */
  def raySigned(c: Column): Column =
    Shim.column(RescaleToDouble(Shim.expression(c), 27, signed = true))

  def decodeEvent(entryJson: String, topics: Column, data: Column,
                  wideIntsAsBinary: Boolean = false): Column =
    Shim.column(DecodeEvent(entryJson, Shim.expression(topics),
      Shim.expression(data), wideIntsAsBinary))

  def decodeCalldata(entryJson: String, data: Column,
                     wideIntsAsBinary: Boolean = false): Column =
    Shim.column(DecodeCalldata(entryJson, Shim.expression(data), wideIntsAsBinary))

  /** One-scan dispatch-decode predicate (see [[DecodeDispatchOk]]):
    * TRUE iff the row decodes under the entry `tableName` routes to. */
  def decodeDispatchOk(entries: Seq[(String, String, Boolean, Boolean)],
                       tableName: Column, topics: Column,
                       data: Column): Column =
    Shim.column(DecodeDispatchOk(entries, Shim.expression(tableName),
      Shim.expression(topics), Shim.expression(data)))

  /** Exact decimal digits of a wide int carried as binary (S5/S9 rad
    * path — see [[UintToDecimalString]]). */
  def uintToDecimalString(c: Column): Column =
    Shim.column(UintToDecimalString(Shim.expression(c)))

  /** Signed (two's-complement) counterpart of [[uintToDecimalString]]. */
  def intToDecimalString(c: Column): Column =
    Shim.column(IntToDecimalString(Shim.expression(c)))

  /** PG-dialect `generate_series(start, stop[, step])` as a table
    * function (SURVEY §4.2) — resolves to Generate(Explode(Sequence)))
    * so `SELECT * FROM generate_series(1, 10, 2)` and lateral uses run
    * without rewriting to explode(sequence(...)). */
  def registerGenerateSeries(spark: SparkSession): Unit =
    Shim.tableRegistry(spark).createOrReplaceTempFunction("generate_series",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Explode, Sequence}
        import org.apache.spark.sql.catalyst.plans.logical.{Generate, OneRowRelation}
        val step = if (exprs.size > 2) Some(exprs(2)) else None
        Generate(Explode(new Sequence(exprs(0), exprs(1), step)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Nil, child = OneRowRelation())
      }, "scala_udf")

  /** SQL access to the manifest store's pruned reads — table functions
    * resolving to the SAME optimized parquet plan the programmatic API
    * builds (stat-pruned file set, vectorized scan, pushdown — a DSv2
    * wrapper would forfeit the vectorized reader; a TVF keeps it):
    *
    *   SELECT … FROM graft_store_range('/store', lo, hi)   -- stat-pruned
    *   SELECT … FROM graft_store_version('/store', v)      -- time travel
    *
    * Arguments must be literals (they select the file set at analysis
    * time — exactly when a catalog would resolve a snapshot). */
  private def tvfStr(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other.toString
    }

  private def tvfLng(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case other => other.toString.toLong
    }

  /** The ONE pair of store-TVF builders, shared by per-session
    * registration (below) and the cluster-wide extensions — a fix to
    * argument handling or range semantics cannot diverge the two
    * registration paths. */
  private[codec] val storeRangeBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { es =>
    val s = SparkSession.active
    new graft.ingest.ManifestStore(tvfStr(es(0)))
      .readRange(s, tvfLng(es(1)), tvfLng(es(2)))
      .getOrElse(throw new IllegalArgumentException(
        s"graft_store_range: empty or missing store at ${tvfStr(es(0))}"))
      .queryExecution.analyzed
  }

  private[codec] val storeVersionBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { es =>
    val s = SparkSession.active
    new graft.ingest.ManifestStore(tvfStr(es(0)))
      .readVersion(s, tvfLng(es(1)))
      .getOrElse(throw new IllegalArgumentException(
        s"graft_store_version: no version ${tvfLng(es(1))} at ${tvfStr(es(0))}"))
      .queryExecution.analyzed
  }

  /** `graft_store_box('/store', 'c1', lo1, hi1 [, 'c2', lo2, hi2, …])`
    * — SQL access to multi-column data skipping over a Z-order-compacted
    * store ([[graft.ingest.ManifestStore.readBox]]): only files whose
    * per-column stat rectangles intersect the probe box are planned. */
  private[codec] val storeBoxBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { es =>
    val s = SparkSession.active
    require(es.size >= 4 && (es.size - 1) % 3 == 0,
      "graft_store_box(path, col, lo, hi [, col, lo, hi]...)")
    val bounds = es.drop(1).grouped(3)
      .map(g => (tvfStr(g(0)), tvfLng(g(1)), tvfLng(g(2)))).toSeq
    // readBoxOrEmpty, not readBox: a provably-empty box must plan as an
    // empty relation at the snapshot schema, matching graft_store_range's
    // posture that only a missing/empty STORE is an error — query success
    // cannot depend on whether stats happened to prove emptiness (r13
    // ADVICE #1)
    new graft.ingest.ManifestStore(tvfStr(es(0)))
      .readBoxOrEmpty(s, bounds)
      .getOrElse(throw new IllegalArgumentException(
        s"graft_store_box: empty or missing store at ${tvfStr(es(0))}"))
      .queryExecution.analyzed
  }

  def registerStoreTvfs(spark: SparkSession): Unit = {
    val treg = Shim.tableRegistry(spark)
    treg.createOrReplaceTempFunction("graft_store_range",
      storeRangeBuilder, "scala_udf")
    treg.createOrReplaceTempFunction("graft_store_version",
      storeVersionBuilder, "scala_udf")
    treg.createOrReplaceTempFunction("graft_store_box",
      storeBoxBuilder, "scala_udf")
  }

  /** Sessions already registered — weak keys so a discarded session (test
    * suites spin up many) can still be collected. `register` is called
    * from inside query functions for self-sufficiency; without this guard
    * every call re-registered ~15 session-global functions, spamming
    * "replaced a previously registered function" WARNs and, worse,
    * read-modify-writing the shared SimpleFunctionRegistry mid-query —
    * a real race once two queries run concurrently on one session. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Test hook: has this exact session instance been registered? */
  private[graft] def isRegistered(spark: SparkSession): Boolean =
    registered.containsKey(spark)

  def register(spark: SparkSession): Unit = synchronized {
    // the object-level lock (not just the map's) makes registration
    // ATOMIC, not merely idempotent: a second thread arriving mid-way
    // must wait until every function is in place before its query plans
    if (registered.containsKey(spark)) return
    doRegister(spark)
    registered.put(spark, java.lang.Boolean.TRUE)
  }

  private def doRegister(spark: SparkSession): Unit = {
    val reg = Shim.registry(spark)
    registerGenerateSeries(spark)
    registerStoreTvfs(spark)
    reg.createOrReplaceTempFunction("keccak256", es => Keccak256(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("bytes32_to_ascii", es => Bytes32ToAscii(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("checksum_address", es => ChecksumAddress(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("uint_to_decimal_string",
      es => UintToDecimalString(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("int_to_decimal_string",
      es => IntToDecimalString(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("wad", es => RescaleToDouble(es.head, 18), "scala_udf")
    reg.createOrReplaceTempFunction("ray", es => RescaleToDouble(es.head, 27), "scala_udf")
    reg.createOrReplaceTempFunction("rad", es => RescaleToDouble(es.head, 45), "scala_udf")
    reg.createOrReplaceTempFunction("wad_s",
      es => RescaleToDouble(es.head, 18, signed = true), "scala_udf")
    reg.createOrReplaceTempFunction("ray_s",
      es => RescaleToDouble(es.head, 27, signed = true), "scala_udf")
    // PG-dialect front-end runtime (graft.frontend.PgDialect rules 3+5)
    reg.createOrReplaceTempFunction("pg_div",
      es => PgDiv(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("pg_encode_escape",
      es => PgEncodeEscape(es.head), "scala_udf")
    // similarity/sketch surface (ops package): codegen'd dot product and
    // the map-side-combinable sketch aggregates
    reg.createOrReplaceTempFunction("dot_double",
      es => graft.ops.DotDouble(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_agg",
      es => graft.ops.MinHashAgg(es.head, 64, 1234).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_agg",
      es => graft.ops.SimHashAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("cms_agg",
      es => graft.ops.CmsAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("cms_merge_agg",
      es => graft.ops.CmsMergeAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("cms_estimate",
      es => graft.ops.CmsEstimate(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cms_total",
      es => graft.ops.CmsTotal(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hist_agg",
      es => graft.ops.HistAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("hist_merge_agg",
      es => graft.ops.HistMergeAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("hist_quantile",
      es => graft.ops.HistQuantile(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hist_oor",
      es => graft.ops.HistOutOfRange(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("mg_agg",
      es => graft.ops.MgAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("mg_estimate",
      es => graft.ops.MgEstimate(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("mg_keys",
      es => graft.ops.MgKeys(es.head), "scala_udf")
  }
}
