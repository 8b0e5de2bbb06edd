package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-column data skipping over Z-order clustering (round-12 verdict
  * #5), proven end-to-end on the manifest store: `store_zorder_skipping`
  * ingests the events fact in block-range order (the natural shape of a
  * chain/warehouse ingest — every file spans the FULL user key range),
  * rewrites it with `compact(zorderBy = event_id, user_id)`, and probes a
  * two-predicate box through [[ManifestStore.readBox]].
  *
  * What the builder asserts structurally, with file COUNTS (the same
  * evidence style as the LSH index shard proofs):
  *
  *  - before clustering, a `user_id`-only probe prunes NOTHING — the
  *    ingest-ordered files each cover the whole user range, which is
  *    exactly the 100 TB failure mode (a filter on anything but the
  *    leading ingest key reads the entire table);
  *  - after clustering, the 2-predicate box opens ≤ 1/3 of the files,
  *    and even the single-column `user_id` stripe — the NON-leading
  *    dimension a linear sort can never skip on — opens ≤ 1/2;
  *  - the rewrite is one atomic manifest flip (version +1) and row
  *    counts are preserved.
  *
  * The gate's VALUE correctness (readBox ≡ full-scan filter) is what the
  * DuckDB oracle checks: the probe's per-type rollup must hash-match the
  * same predicates evaluated over the raw parquet. Probe bounds are the
  * middle 45–55% of each key's span, derived with integer arithmetic
  * mirrored exactly in the oracle SQL (DuckDB `//` = Scala `/` on
  * non-negative longs). */
object Skipping {

  private[graft] def gateRoot(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_zorder_store_" +
      new java.io.File(dir).getName + "_" + graft.ops.CorpusId.hex(dir)

  /** Middle 45–55% box of (event_id, user_id): (elo, ehi, ulo, uhi). */
  private[graft] def probeBounds(s: SparkSession, dir: String)
  : (Long, Long, Long, Long) = {
    val r = Tables.load(s, dir, "events")
      .agg(min("event_id"), max("event_id"), min("user_id"), max("user_id"))
      .head()
    val (emn, emx, umn, umx) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    (emn + (emx - emn) * 45 / 100, emn + (emx - emn) * 55 / 100,
      umn + (umx - umn) * 45 / 100, umn + (umx - umn) * 55 / 100)
  }

  /** Build (once per session): 4 range-ordered appends, then a Z-order
    * compaction into ~24 files, with before/after file-count proofs. */
  private[graft] def builtStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir), "zorder_gate_store") { store =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val r = ev.agg(min("event_id"), max("event_id")).head()
      val (emn, emx) = (r.getLong(0), r.getLong(1))
      val step = math.max(1L, (emx - emn) / 4 + 1)
      // ingest shape: 4 consecutive event_id windows (rangeCol stats per
      // file), each spanning the FULL user_id range
      (0 until 4).foreach { i =>
        store.append(s,
          ev.filter(col("event_id") >= emn + i * step &&
            col("event_id") < emn + (i + 1) * step),
          rangeCol = Some("event_id"))
      }
      val rows = store.read(s).get.count()
      val (_, _, ulo, uhi) = probeBounds(s, dir)
      val before = store.currentFiles(s).size
      // pre-clustering: a user_id probe cannot prune a single file — the
      // manifest has no user_id stats and every file covers the range
      require(store.filesForBox(s, Seq(("user_id", ulo, uhi))).size == before,
        "ingest-ordered store unexpectedly pruned a user_id probe")
      val vBefore = store.currentVersion(s)
      val bytes = store.currentFiles(s)
        .map(f => new java.io.File(f).length()).sum
      store.compact(s, targetBytes = math.max(1L, bytes / 24),
        zorderBy = Seq("event_id", "user_id"))
      require(store.currentVersion(s) == vBefore + 1,
        "z-order compaction was not one atomic commit")
      require(store.read(s).get.count() == rows,
        "z-order compaction changed the row count")
      val (elo, ehi, ulo2, uhi2) = probeBounds(s, dir)
      val total = store.currentFiles(s).size
      val box = store.filesForBox(s,
        Seq(("event_id", elo, ehi), ("user_id", ulo2, uhi2))).size
      val stripe = store.filesForBox(s, Seq(("user_id", ulo2, uhi2))).size
      require(total >= 12, s"compaction produced too few files to prove " +
        s"skipping ($total)")
      // 1/3 accommodates the tiniest fixture (sf0.001: 40 rows/file over
      // 15 distinct users — tile granularity is row-bound there); at
      // sf0.01+ the measured fraction is far lower (see PLANS.md, which
      // records the actual counts)
      require(box * 3 <= total,
        s"2-predicate box opened $box of $total files (> 1/3)")
      // 2/3, not 1/2: repartitionByRange's boundary sampling is randomly
      // seeded (RangePartitioner sketch), so the z-tile/file boundaries
      // jitter per build — at 25 files the stripe probe measured 7-12
      // opened on most builds and 13 once (r15: one unlucky layout out
      // of ~8 JVM builds tripped 13 > 12 = floor(25/2)). The tripwire
      // exists to catch non-leading-dimension skipping DISAPPEARING
      // (unclustered ≈ all 25 open), not to pin the sampled layout; the
      // exact per-run counts stay recorded in PLANS.md §store-skipping.
      require(stripe * 3 <= total * 2,
        s"user_id stripe opened $stripe of $total files (> 2/3) - " +
          "non-leading-dimension skipping failed")
    }

  /** Gate: per-type rollup of the 2-predicate box probe, read through
    * manifest multi-column pruning. Hash-equality with the oracle's
    * full-scan evaluation proves pruning never changes answers. */
  def storeZorderSkipping(s: SparkSession, dir: String): DataFrame = {
    val store = builtStore(s, dir)
    val (elo, ehi, ulo, uhi) = probeBounds(s, dir)
    store.readBox(s, Seq(("event_id", elo, ehi), ("user_id", ulo, uhi))).get
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type")
  }

  /** Gate: the same box probe through plain SQL — the `graft_store_box`
    * table function resolves to the SAME stat-pruned file set
    * [[ManifestStore.readBox]] plans, so a warehouse user gets
    * multi-column skipping from SELECT alone. */
  def storeSqlBox(s: SparkSession, dir: String): DataFrame = {
    val store = builtStore(s, dir)
    graft.codec.GraftFunctions.register(s)
    val (elo, ehi, ulo, uhi) = probeBounds(s, dir)
    s.sql(s"""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM graft_store_box('${store.root}',
        'event_id', $elo, $ehi, 'user_id', $ulo, $uhi)
      GROUP BY event_type ORDER BY event_type""")
  }

  /** Gate (round-14 agenda #2): the SAME box probe as
    * `store_zorder_skipping`, but written the way a warehouse user
    * writes it — `store.read().filter(BETWEEN … AND BETWEEN …)`, no
    * readBox, no named box. The [[ManifestFileIndex]] read path extracts
    * the (col, lo, hi) windows from the query's own pushed-down
    * predicates at planning time, so the implicit form plans the SAME
    * pruned file set as the explicit one (asserted with file counts in
    * SkippingSpec and PLANS.md §store-skipping-auto); hash-equality with
    * the full-scan oracle proves pruning never changes answers. */
  def storeSkippingAuto(s: SparkSession, dir: String): DataFrame = {
    val store = builtStore(s, dir)
    val (elo, ehi, ulo, uhi) = probeBounds(s, dir)
    store.read(s).get
      .filter(col("event_id").between(elo, ehi) &&
        col("user_id").between(ulo, uhi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type")
  }

  /** Build (once per session): one append per event_type value, so each
    * file carries a tight string range in the manifest's strStats; the
    * builder proves structurally that a string-equality probe opens a
    * strict subset of the files. */
  private[graft] def builtStrStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_str", "str_skipping_gate_store") {
      store =>
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val types = ev.select("event_type").distinct()
          .collect().map(_.getString(0)).sorted
        require(types.length >= 3, s"too few event types: ${types.length}")
        types.foreach { t =>
          store.append(s, ev.filter(col("event_type") === t),
            rangeCol = Some("event_id"), statsCols = Seq("event_type"))
        }
        val total = store.currentFiles(s).size
        val probe = store.read(s).get
          .filter(col("event_type") === types.head)
        val read = graft.Plans.filesRead(probe)
        require(read >= 1 && read < total,
          s"string-equality probe read $read of $total files - " +
            "string stats did not prune")
    }

  /** Gate (round-14, post-agenda): STRING data skipping through the
    * plain read path — per-file UTF-8 min/max prefixes in the manifest
    * (hex-encoded fifth field), pruned against pushed-down string
    * equality/range/prefix predicates under unsigned byte order (the
    * same order Spark's string comparison defines). Hash-equality with
    * the full-scan oracle proves pruning never changes answers. */
  def storeSkippingStrings(s: SparkSession, dir: String): DataFrame = {
    val store = builtStrStore(s, dir)
    store.read(s).get
      .filter(col("event_type") === "click")
      .groupBy(pmod(col("user_id"), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .orderBy("bucket")
  }

  /** Deterministic decimal probe window: the middle 45–55% of the
    * value domain, derived on UNSCALED scale-6 longs with integer
    * arithmetic mirrored exactly in the oracle SQL. */
  private[graft] def decProbeBounds(s: SparkSession, dir: String)
  : (java.math.BigDecimal, java.math.BigDecimal) = {
    val r = Tables.load(s, dir, "events")
      .select(col("value").cast("decimal(18,6)").as("dval"))
      .agg(min("dval"), max("dval")).head()
    val mn6 = r.getDecimal(0).movePointRight(6).longValueExact
    val mx6 = r.getDecimal(1).movePointRight(6).longValueExact
    val lo6 = mn6 + (mx6 - mn6) * 45 / 100
    val hi6 = mn6 + (mx6 - mn6) * 55 / 100
    (java.math.BigDecimal.valueOf(lo6, 6), java.math.BigDecimal.valueOf(hi6, 6))
  }

  /** Build (once per session): 4 value-range appends of a DECIMAL(18,6)
    * column (INT64-backed in parquet, so its footer statistics are
    * UNSCALED integers), each file carrying a tight decimal window in
    * the manifest's scale-aware decStats; the builder proves a decimal
    * BETWEEN probe opens a strict subset of the files. */
  private[graft] def builtDecStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_dec", "dec_skipping_gate_store") {
      store =>
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value").cast("decimal(18,6)").as("dval"))
        val r = ev.agg(min("dval"), max("dval")).head()
        val mn6 = r.getDecimal(0).movePointRight(6).longValueExact
        val mx6 = r.getDecimal(1).movePointRight(6).longValueExact
        val step = math.max(1L, (mx6 - mn6) / 4 + 1)
        (0 until 4).foreach { i =>
          val lo = java.math.BigDecimal.valueOf(mn6 + i * step, 6)
          val hi = java.math.BigDecimal.valueOf(mn6 + (i + 1) * step, 6)
          store.append(s,
            ev.filter(col("dval") >= lit(lo) && col("dval") < lit(hi)),
            rangeCol = Some("event_id"), statsCols = Seq("dval"))
        }
        val total = store.currentFiles(s).size
        val (plo, phi) = decProbeBounds(s, dir)
        val probe = store.read(s).get
          .filter(col("dval").between(lit(plo), lit(phi)))
        val read = graft.Plans.filesRead(probe)
        require(read >= 1 && read < total,
          s"decimal BETWEEN probe read $read of $total files - " +
            "scale-aware decimal stats did not prune")
    }

  /** Gate (round-15 agenda #4): DECIMAL data skipping through the plain
    * read path — per-file UNSCALED min/max + scale in the manifest
    * (sixth field), pruned against pushed-down decimal predicates with
    * exact BigDecimal comparison at each side's own scale. The round-14
    * self-review had BLOCKED decimal columns from colStats entirely
    * (scaleless unscaled bounds silently missed rows); this finishes
    * the job instead. Hash-equality with the full-scan oracle proves
    * pruning never changes answers. */
  def storeSkippingDecimal(s: SparkSession, dir: String): DataFrame = {
    val store = builtDecStore(s, dir)
    val (plo, phi) = decProbeBounds(s, dir)
    store.read(s).get
      .filter(col("dval").between(lit(plo), lit(phi)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("dval")).cast("double").as("val_sum"))
      .orderBy("event_type")
  }

  /** Deterministic timestamp probe window: the middle 45–55% of the ts
    * span in epoch MICROS, integer arithmetic mirrored in the oracle
    * (`unix_micros` here ≡ DuckDB `epoch_us` — the session timezone is
    * UTC, so the NTZ wall clock and the instant agree). */
  private[graft] def tsProbeBounds(s: SparkSession, dir: String)
  : (Long, Long) = {
    val r = Tables.load(s, dir, "events")
      .agg(min(unix_micros(col("ts").cast("timestamp"))),
        max(unix_micros(col("ts").cast("timestamp")))).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    (mn + (mx - mn) * 45 / 100, mn + (mx - mn) * 55 / 100)
  }

  private def ntzLit(micros: Long): org.apache.spark.sql.Column =
    timestamp_micros(lit(micros)).cast("timestamp_ntz")

  /** Build (once per session): 4 time-range appends of the events
    * stream (its natural arrival order), each file carrying a tight
    * micros window + the isAdjustedToUTC flag in the manifest's
    * seventh field; a time-window probe must open a strict subset. */
  private[graft] def builtTsStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_ts", "ts_skipping_gate_store") {
      store =>
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"), col("ts"))
        val r = ev.agg(min(unix_micros(col("ts").cast("timestamp"))),
          max(unix_micros(col("ts").cast("timestamp")))).head()
        val (mn, mx) = (r.getLong(0), r.getLong(1))
        val step = math.max(1L, (mx - mn) / 4 + 1)
        (0 until 4).foreach { i =>
          store.append(s,
            ev.filter(col("ts") >= ntzLit(mn + i * step) &&
              col("ts") < ntzLit(mn + (i + 1) * step)),
            rangeCol = Some("event_id"), statsCols = Seq("ts"))
        }
        val total = store.currentFiles(s).size
        val (plo, phi) = tsProbeBounds(s, dir)
        val probe = store.read(s).get
          .filter(col("ts").between(ntzLit(plo), ntzLit(phi)))
        val read = graft.Plans.filesRead(probe)
        require(read >= 1 && read < total,
          s"time-window probe read $read of $total files - " +
            "timestamp stats did not prune")
    }

  /** Gate (round-15, post-agenda): TIMESTAMP data skipping through the
    * plain read path — THE 100 TB probe shape (a time window over an
    * arrival-ordered fact stream). Per-file micros-normalized min/max
    * plus the instant/wall-clock flag in the manifest's seventh field;
    * pruning fires only when the predicate's timestamp SEMANTICS agree
    * with the file's. Hash-equality with the full-scan oracle proves
    * pruning never changes answers. */
  def storeSkippingTimestamp(s: SparkSession, dir: String): DataFrame = {
    val store = builtTsStore(s, dir)
    val (plo, phi) = tsProbeBounds(s, dir)
    store.read(s).get
      .filter(col("ts").between(ntzLit(plo), ntzLit(phi)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type")
  }

  /** Build (once per session): click rows and non-click rows land in
    * SEPARATE files, with `cprops` (props gated on event_type = click)
    * all-non-null in the former and all-null in the latter — so the
    * manifest's eighth field (nullCount:rowCount) makes `IS [NOT] NULL`
    * probes provable per file. The builder asserts both directions
    * prune structurally. */
  private[graft] def builtNullStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_nulls", "null_skipping_gate_store") {
      store =>
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            when(col("event_type") === "click", col("props")).as("cprops"))
        store.append(s, ev.filter(col("event_type") === "click").repartition(2),
          rangeCol = Some("event_id"), statsCols = Seq("cprops"))
        store.append(s, ev.filter(col("event_type") =!= "click").repartition(2),
          rangeCol = Some("event_id"), statsCols = Seq("cprops"))
        val total = store.currentFiles(s).size
        val notNull = graft.Plans.filesRead(
          store.read(s).get.filter(col("cprops").isNotNull))
        val isNull = graft.Plans.filesRead(
          store.read(s).get.filter(col("cprops").isNull))
        require(notNull >= 1 && notNull < total,
          s"IS NOT NULL read $notNull of $total files - null stats did not " +
            "prune the all-null files")
        require(isNull >= 1 && isNull < total,
          s"IS NULL read $isNull of $total files - null stats did not " +
            "prune the null-free files")
    }

  /** Gate (round-15, session 2): NULL-COUNT data skipping — per-file
    * (nullCount, rowCount) in the manifest's eighth field. `IS NOT NULL`
    * prunes all-null files and `IS NULL` prunes null-free files; since
    * Spark pushes IsNotNull under every comparison filter, the sparse
    * column's dead files (most of a 100 TB optional field) prune on
    * effectively every probe without the caller asking. Hash-equality
    * with the full-scan oracle proves pruning never changes answers. */
  def storeSkippingNulls(s: SparkSession, dir: String): DataFrame = {
    val store = builtNullStore(s, dir)
    store.read(s).get
      .filter(col("cprops").isNotNull)
      .groupBy(pmod(col("user_id"), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .orderBy("bucket")
  }

  /** Deterministic double probe window: mn + (mx-mn)*45/100 with the
    * SAME IEEE operation order DuckDB evaluates for the literal
    * expression — every step is an exact double op on both sides, so
    * the bounds are bit-identical and boundary rows cannot diverge. */
  private[graft] def dblProbeBounds(s: SparkSession, dir: String)
  : (Double, Double) = {
    val r = Tables.load(s, dir, "events")
      .agg(min(col("value")), max(col("value"))).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    (mn + (mx - mn) * 45.0 / 100.0, mn + (mx - mn) * 55.0 / 100.0)
  }

  /** Build (once per session): 4 value-range appends of the DOUBLE
    * `value` column; each file carries IEEE-bit min/max in the
    * manifest's ninth field (recorded only when the footer proves the
    * file NaN-free). */
  private[graft] def builtDblStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_dbl", "dbl_skipping_gate_store") {
      store =>
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val r = ev.agg(min(col("value")), max(col("value"))).head()
        val (mn, mx) = (r.getDouble(0), r.getDouble(1))
        val step = (mx - mn) / 4
        (0 until 4).foreach { i =>
          val lo = mn + step * i
          val hi = if (i == 3) Double.MaxValue else mn + step * (i + 1)
          store.append(s,
            ev.filter(col("value") >= lit(lo) && col("value") < lit(hi)),
            rangeCol = Some("event_id"), statsCols = Seq("value"))
        }
        val total = store.currentFiles(s).size
        val (plo, phi) = dblProbeBounds(s, dir)
        val read = graft.Plans.filesRead(store.read(s).get
          .filter(col("value").between(lit(plo), lit(phi))))
        require(read >= 1 && read < total,
          s"double BETWEEN probe read $read of $total files - " +
            "floating stats did not prune")
    }

  /** Gate (round-15, session 2): DOUBLE data skipping — IEEE-raw-bit
    * min/max in the manifest's ninth field, sound under Spark's
    * NaN-is-greatest ordering because parquet-mr drops floating stats
    * for any NaN-bearing chunk (recorded bounds PROVE NaN-absence;
    * pinned by SkippingSpec). Hash-equality with the full-scan oracle
    * proves pruning never changes answers. */
  def storeSkippingDouble(s: SparkSession, dir: String): DataFrame = {
    val store = builtDblStore(s, dir)
    val (plo, phi) = dblProbeBounds(s, dir)
    store.read(s).get
      .filter(col("value").between(lit(plo), lit(phi)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type")
  }

  /** The 601st-smallest event_id's synthetic key — an EXISTING value,
    * derived identically on both sides (`md5(CAST(event_id AS VARCHAR))`
    * is byte-identical in Spark and DuckDB). */
  private[graft] def bloomProbeKey(s: SparkSession, dir: String): String =
    Tables.load(s, dir, "events")
      .select(md5(col("event_id").cast("string")).as("key"),
        col("event_id"))
      .orderBy("event_id").limit(601)
      .orderBy(col("event_id").desc).select("key").head().getString(0)

  /** Build (once per session): arrival-ordered appends of a
    * high-cardinality hash-like key (md5 of event_id) with
    * `bloomCols = key` — every file spans the whole key range
    * byte-wise, so min/max CANNOT prune a point probe; the per-file
    * Bloom sidecar is the only thing standing between `key = '…'` and
    * a full-store scan. The builder proves the probe opens a strict
    * subset of the files. */
  private[graft] def builtBloomStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_bloom", "bloom_skipping_gate_store") {
      store =>
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            md5(col("event_id").cast("string")).as("key"))
        val r = ev.agg(min("event_id"), max("event_id")).head()
        val (emn, emx) = (r.getLong(0), r.getLong(1))
        val step = math.max(1L, (emx - emn) / 4 + 1)
        (0 until 4).foreach { i =>
          store.append(s,
            ev.filter(col("event_id") >= emn + i * step &&
              col("event_id") < emn + (i + 1) * step).repartition(1),
            rangeCol = Some("event_id"), bloomCols = Seq("key"))
        }
        val total = store.currentFiles(s).size
        val probe = store.read(s).get
          .filter(col("key") === bloomProbeKey(s, dir))
        val read = graft.Plans.filesRead(probe)
        require(read >= 1 && read < total,
          s"bloom point probe read $read of $total files - the sidecar " +
            "did not prune an unclustered equality probe")
    }

  /** Gate (round-15, session 2): BLOOM-FILTER data skipping — the
    * point-probe family min/max structurally cannot serve: a per-file
    * Bloom sidecar (xxhash64 of the value, Spark's own sketch) prunes
    * `key = '…'` over an arrival-ordered store to the file(s) that
    * might hold the key. This is THE blockchain lookup shape
    * (`tx_hash = '0x…'`) at 100 TB. Hash-equality with the full-scan
    * oracle proves pruning never changes answers. */
  def storeSkippingBloom(s: SparkSession, dir: String): DataFrame = {
    val store = builtBloomStore(s, dir)
    store.read(s).get
      .filter(col("key") === bloomProbeKey(s, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .orderBy("event_type")
  }

  /** Build (once per session): 3 event_id-range commits × 2 files with
    * rows (tenth field) always recorded, int stats on event_id (range)
    * and user_id (colStats), and nullStats on the sparse `cprops`. The
    * builder asserts the metadata route actually fires: the global
    * count probe opens ZERO files by executed metric. */
  private[graft] def builtMetaStore(s: SparkSession, dir: String): ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_meta", "meta_agg_gate_store") {
      store =>
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            when(col("event_type") === "click", col("props")).as("cprops"))
        val r = ev.agg(min(col("event_id")), max(col("event_id"))).head()
        val (emn, emx) = (r.getLong(0), r.getLong(1))
        val step = math.max(1L, (emx - emn) / 3 + 1)
        (0 until 3).foreach { i =>
          store.append(s, ev.filter(col("event_id") >= emn + i * step &&
            col("event_id") < emn + (i + 1) * step).repartition(2),
            rangeCol = Some("event_id"), statsCols = Seq("user_id", "cprops"))
        }
        val probe = store.read(s).get.agg(count(lit(1)).as("n"))
        require(graft.Plans.filesRead(probe) == 0L,
          s"metadata count opened ${graft.Plans.filesRead(probe)} files - " +
            "the MetaAgg route did not fire")
    }

  /** Gate (round-15, session 2): METADATA-ONLY aggregates — a global
    * unfiltered count(*) / count(col) / min / max over the store is
    * answered from the manifest's per-file facts (rows, nullStats, int
    * stat rectangles) by an optimizer rule, opening ZERO data files;
    * computed outputs (count(*) * 2) fold over the routed literals.
    * Hash-equality with DuckDB's full-scan answer proves the manifest
    * arithmetic is the true answer. */
  def storeMetaAgg(s: SparkSession, dir: String): DataFrame = {
    val store = builtMetaStore(s, dir)
    store.read(s).get.agg(
      count(lit(1)).as("n_rows"),
      count(col("cprops")).as("n_props"),
      min(col("event_id")).as("id_min"),
      max(col("event_id")).as("id_max"),
      min(col("user_id")).as("uid_min"),
      max(col("user_id")).as("uid_max"),
      (count(lit(1)) * lit(2L)).as("n_twice"))
  }

  /** Build (once per session): events PARTITIONED by event_type across
    * two commits — the grouped-metadata shape (`GROUP BY partition_col
    * → count(*)`) must answer from per-partition row sums with zero
    * files opened, proven by the builder. */
  private[graft] def builtPartMetaStore(s: SparkSession, dir: String)
  : ManifestStore =
    Evolution.buildOnce(s, gateRoot(dir) + "_pmeta",
      "meta_agg_grouped_gate_store") { store =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      store.append(s, ev.filter(col("event_id") % 2 === 0),
        partitionCols = Seq("event_type"), rangeCol = Some("event_id"))
      store.append(s, ev.filter(col("event_id") % 2 === 1),
        partitionCols = Seq("event_type"), rangeCol = Some("event_id"))
      val probe = store.read(s).get.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      require(graft.Plans.filesRead(probe) == 0L,
        s"grouped metadata count opened ${graft.Plans.filesRead(probe)} " +
          "files - the grouped MetaAgg route did not fire")
    }

  /** Gate (round-15, session 2): GROUPED metadata-only aggregates — a
    * `GROUP BY partition_column → count(*)` over a partitioned store
    * (THE demux-conservation / per-table-count shape) answers from the
    * manifest's per-partition row sums, zero files opened; computed
    * outputs fold per group. */
  def storeMetaAggGrouped(s: SparkSession, dir: String): DataFrame = {
    val store = builtPartMetaStore(s, dir)
    store.read(s).get.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), (count(lit(1)) * lit(3L)).as("n3"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_zorder_skipping" -> (storeZorderSkipping _),
    "store_sql_box" -> (storeSqlBox _),
    "store_skipping_auto" -> (storeSkippingAuto _),
    "store_skipping_strings" -> (storeSkippingStrings _),
    "store_skipping_decimal" -> (storeSkippingDecimal _),
    "store_skipping_timestamp" -> (storeSkippingTimestamp _),
    "store_skipping_nulls" -> (storeSkippingNulls _),
    "store_skipping_double" -> (storeSkippingDouble _),
    "store_skipping_bloom" -> (storeSkippingBloom _),
    "store_meta_agg" -> (storeMetaAgg _),
    "store_meta_agg_grouped" -> (storeMetaAggGrouped _))

  val oracle: Map[String, String] = Map(
    "store_zorder_skipping" -> """
      WITH b AS (
        SELECT min(event_id) + (max(event_id) - min(event_id)) * 45 // 100 AS elo,
               min(event_id) + (max(event_id) - min(event_id)) * 55 // 100 AS ehi,
               min(user_id) + (max(user_id) - min(user_id)) * 45 // 100 AS ulo,
               min(user_id) + (max(user_id) - min(user_id)) * 55 // 100 AS uhi
        FROM events)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM events, b
      WHERE event_id BETWEEN b.elo AND b.ehi
        AND user_id BETWEEN b.ulo AND b.uhi
      GROUP BY event_type ORDER BY event_type""",
    "store_skipping_strings" -> """
      SELECT user_id % 10 AS bucket, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events WHERE event_type = 'click'
      GROUP BY 1 ORDER BY 1""",
    "store_skipping_auto" -> """
      WITH b AS (
        SELECT min(event_id) + (max(event_id) - min(event_id)) * 45 // 100 AS elo,
               min(event_id) + (max(event_id) - min(event_id)) * 55 // 100 AS ehi,
               min(user_id) + (max(user_id) - min(user_id)) * 45 // 100 AS ulo,
               min(user_id) + (max(user_id) - min(user_id)) * 55 // 100 AS uhi
        FROM events)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM events, b
      WHERE event_id BETWEEN b.elo AND b.ehi
        AND user_id BETWEEN b.ulo AND b.uhi
      GROUP BY event_type ORDER BY event_type""",
    // bounds derived on UNSCALED scale-6 longs, mirroring decProbeBounds
    // exactly (value AS DECIMAL(18,6) is integral at 10^6, so the BIGINT
    // casts are exact)
    "store_skipping_decimal" -> """
      WITH d AS (
        SELECT CAST(min(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS mn6,
               CAST(max(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS mx6
        FROM events),
      b AS (
        SELECT mn6 + (mx6 - mn6) * 45 // 100 AS lo6,
               mn6 + (mx6 - mn6) * 55 // 100 AS hi6
        FROM d)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM events, b
      WHERE CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
        BETWEEN b.lo6 AND b.hi6
      GROUP BY event_type ORDER BY event_type""",
    // micros bounds mirror tsProbeBounds exactly: DuckDB epoch_us on
    // the naive ts ≡ Spark unix_micros under the UTC session
    "store_skipping_timestamp" -> """
      WITH m AS (
        SELECT epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx FROM events),
      b AS (
        SELECT mn + (mx - mn) * 45 // 100 AS lo,
               mn + (mx - mn) * 55 // 100 AS hi FROM m)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM events, b
      WHERE epoch_us(ts) BETWEEN b.lo AND b.hi
      GROUP BY event_type ORDER BY event_type""",
    // cprops ≡ CASE WHEN event_type='click' THEN props END; the
    // IS NOT NULL filter therefore selects exactly the click rows with
    // non-null props
    "store_skipping_nulls" -> """
      SELECT user_id % 10 AS bucket, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events
      WHERE event_type = 'click' AND props IS NOT NULL
      GROUP BY 1 ORDER BY 1""",
    // bounds mirror dblProbeBounds' IEEE operation order exactly:
    // min + (max - min) * 45 / 100 evaluates the same double ops in the
    // same order on both engines
    "store_skipping_double" -> """
      WITH b AS (
        SELECT min(value) + (max(value) - min(value)) * 45 / 100 AS lo,
               min(value) + (max(value) - min(value)) * 55 / 100 AS hi
        FROM events)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM events, b
      WHERE value BETWEEN b.lo AND b.hi
      GROUP BY event_type ORDER BY event_type""",
    // the probed key is the 601st-smallest event_id's md5 — an existing
    // high-cardinality value, derived identically on both sides
    "store_skipping_bloom" -> """
      WITH t AS (SELECT event_id FROM events ORDER BY event_id
                 LIMIT 1 OFFSET 600),
           k AS (SELECT md5(CAST(event_id AS VARCHAR)) AS key FROM t)
      SELECT e.event_type, COUNT(*) AS n,
        CAST(SUM(e.event_id) AS BIGINT) AS id_sum
      FROM events e, k
      WHERE md5(CAST(e.event_id AS VARCHAR)) = k.key
      GROUP BY 1 ORDER BY 1""",
    // the store's cprops ≡ CASE WHEN event_type='click' THEN props END,
    // so COUNT(cprops) over the store equals the CASE count over events
    "store_meta_agg" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(CASE WHEN event_type = 'click' THEN props END) AS BIGINT)
          AS n_props,
        MIN(event_id) AS id_min, MAX(event_id) AS id_max,
        MIN(user_id) AS uid_min, MAX(user_id) AS uid_max,
        CAST(COUNT(*) * 2 AS BIGINT) AS n_twice
      FROM events""",
    "store_meta_agg_grouped" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(*) * 3 AS BIGINT) AS n3
      FROM events GROUP BY 1 ORDER BY 1""",
    "store_sql_box" -> """
      WITH b AS (
        SELECT min(event_id) + (max(event_id) - min(event_id)) * 45 // 100 AS elo,
               min(event_id) + (max(event_id) - min(event_id)) * 55 // 100 AS ehi,
               min(user_id) + (max(user_id) - min(user_id)) * 45 // 100 AS ulo,
               min(user_id) + (max(user_id) - min(user_id)) * 55 // 100 AS uhi
        FROM events)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events, b
      WHERE event_id BETWEEN b.elo AND b.ehi
        AND user_id BETWEEN b.ulo AND b.uhi
      GROUP BY event_type ORDER BY event_type""")
}
