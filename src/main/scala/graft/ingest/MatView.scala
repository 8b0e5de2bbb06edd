package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental materialized aggregate view over a [[ManifestStore]] —
  * classic incremental view maintenance on the manifest log:
  *
  *  - The view stores PARTIAL aggregates (row count + exact decimal sum
  *    per group) plus the source version they cover (`as_of`), in its
  *    own manifest store.
  *  - `refresh` reads ONLY the delta — the files the source's manifest
  *    diff says were added since `as_of` ([[ManifestStore.readAddedSince]];
  *    no change log, no timestamps) — aggregates them map-side, and
  *    merges partials with the stored ones: at 100 TB a refresh costs
  *    the new batch, not the corpus.
  *  - A REWRITING source commit (delete/merge/overwrite/compact) breaks
  *    the append-only delta contract; [[ManifestStore.removedSince]]
  *    detects it and the refresh falls back to a full recompute — stale
  *    results are structurally impossible, whatever the commit mix.
  *  - The refresh commit is keyed `refresh@<sourceVersion>`, so a
  *    crashed or replayed refresh can never double-count a delta, and
  *    refreshing an unchanged source short-circuits.
  */
final class MatView(val root: String, groupCols: Seq[String], valueCol: String,
                    distinctCol: Option[String] = None,
                    freqCol: Option[String] = None,
                    histCol: Option[String] = None) {

  private def store = new ManifestStore(root)

  /** Current view contents: (groupCols…, n, vsum DECIMAL(38,6)[, dsk
    * BINARY — a Datasketches HLL of `distinctCol`][, csk BINARY — a
    * count-min sketch of `freqCol`], as_of). */
  def state(spark: SparkSession): Option[DataFrame] = store.read(spark)

  private def aggOf(df: DataFrame): DataFrame =
    MatView.definingAgg(df, groupCols, valueCol, distinctCol, freqCol, histCol)

  /** Bring the view up to the source's current version; returns that
    * version. No-op when already current. */
  def refresh(spark: SparkSession, source: ManifestStore): Long = {
    val vNow = source.currentVersion(spark)
    val st = state(spark)
    val asOf: Long = st.map(_.agg(max(col("as_of"))).head.getLong(0)).getOrElse(0L)
    if (asOf == vNow) return vNow
    val rewritten = source.removedSince(spark, asOf)
    val delta = source.readAddedSince(spark, if (rewritten) 0L else asOf)
    val fresh: Option[DataFrame] = (delta, st) match {
      case (None, None) => None // empty source, nothing to store
      case (None, Some(prev)) =>
        // rewritten-to-empty source empties the view; otherwise versions
        // moved with no files added (empty append): carry partials
        // forward under the new as_of
        Some(if (rewritten) prev.drop("as_of").limit(0) else prev.drop("as_of"))
      case (Some(d), prevOpt) =>
        if (rewritten || prevOpt.isEmpty) Some(aggOf(d))
        else {
          val merge = Seq(sum(col("n")).as("n"),
            sum(col("vsum")).cast("decimal(38,6)").as("vsum")) ++
            distinctCol.map(_ => hll_union_agg(col("dsk"), lit(true)).as("dsk")) ++
            freqCol.map(_ => MatView.cmsMergeAgg(col("csk")).as("csk")) ++
            histCol.map(_ => MatView.histMergeAgg(col("hsk")).as("hsk"))
          Some(prevOpt.get.drop("as_of").unionByName(aggOf(d))
            .groupBy(groupCols.map(col): _*)
            .agg(merge.head, merge.tail: _*))
        }
    }
    fresh.foreach(f => store.replaceAll(spark,
      f.withColumn("as_of", lit(vNow)), commitKey = Some(s"refresh@$vNow")))
    vNow
  }
}

/** Gate: the view maintained across two appends (delta-path refreshes)
  * and a copy-on-write forget (rewrite-detected full recompute) equals
  * the direct aggregate over the surviving fixture rows. */
object MatView {

  private val builtRoots = scala.collection.mutable.Set[String]()

  /** lg(registers) for the distinct sketch — 2^12 registers ≈ 1.6%
    * relative standard error, 4 KiB per group: the standard
    * accuracy/state trade for warehouse distinct counts. */
  val LgK = 12

  /** The defining aggregate — ONE builder shared by the view's refresh
    * path and [[MatViewRouter]]'s registration/matching, so what the
    * view maintains and what the router recognizes can never drift.
    *
    * COUNT DISTINCT is the one classic aggregate with no finite exact
    * partial state — maintaining it incrementally at 100 TB means a
    * mergeable sketch. hll_sketch_agg's partials union losslessly
    * (sketch ∪ sketch = sketch of the union), so a refresh folds the
    * delta's sketch into the stored one exactly like n and vsum.
    * Point FREQUENCIES (heavy hitters) are the same story with a
    * count-min sketch ([[graft.ops.CmsAgg]]): counters add, so
    * sketch(old) ⊎ sketch(delta) = sketch(old ⊎ delta) exactly.
    * QUANTILES likewise: a fixed-domain equi-width histogram's bucket
    * counts add exactly ([[graft.ops.HistAgg]]), and a discrete
    * quantile reads off the merged counts with error ≤ the bin width —
    * the sketch triad (distinct / frequency / quantile) that makes a
    * warehouse summary view maintainable from deltas alone. */
  private[ingest] def definingAgg(df: DataFrame, groupCols: Seq[String],
                                  valueCol: String,
                                  distinctCol: Option[String],
                                  freqCol: Option[String],
                                  histCol: Option[String]): DataFrame = {
    val base = Seq(count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(18,6)")).as("vsum"))
    val aggs = base ++ distinctCol.map(c =>
      hll_sketch_agg(col(c), lit(LgK)).as("dsk")) ++
      freqCol.map(c => cmsAgg(col(c)).as("csk")) ++
      histCol.map(c => histAgg(col(c)).as("hsk"))
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("vsum", col("vsum").cast("decimal(38,6)"))
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Shim
  private[ingest] def cmsAgg(c: Column): Column =
    Shim.column(graft.ops.CmsAgg(Shim.expression(c)).toAggregateExpression())
  private[ingest] def cmsMergeAgg(c: Column): Column =
    Shim.column(graft.ops.CmsMergeAgg(Shim.expression(c)).toAggregateExpression())
  private[ingest] def cmsEstimate(sk: Column, v: Column): Column =
    Shim.column(graft.ops.CmsEstimate(Shim.expression(sk), Shim.expression(v)))
  private[ingest] def cmsTotal(sk: Column): Column =
    Shim.column(graft.ops.CmsTotal(Shim.expression(sk)))
  private[ingest] def histAgg(c: Column): Column =
    Shim.column(graft.ops.HistAgg(Shim.expression(c)).toAggregateExpression())
  private[ingest] def histMergeAgg(c: Column): Column =
    Shim.column(graft.ops.HistMergeAgg(Shim.expression(c)).toAggregateExpression())
  private[ingest] def histQuantile(sk: Column, p: Column): Column =
    Shim.column(graft.ops.HistQuantile(Shim.expression(sk), Shim.expression(p)))
  private[ingest] def histOor(sk: Column): Column =
    Shim.column(graft.ops.HistOutOfRange(Shim.expression(sk)))

  private[graft] def gateRoots(dir: String, kind: String = "source")
      : (String, String) = {
    val tag = new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir)
    val t = System.getProperty("java.io.tmpdir")
    (s"$t/graft_mv_${kind}_$tag", s"$t/graft_mv_view_${kind}_$tag")
  }

  def matviewGate(s: SparkSession, dir: String): DataFrame = {
    val (srcRoot, viewRoot) = gateRoots(dir)
    builtRoots.synchronized {
      if (!builtRoots.contains(srcRoot)) {
        for (r <- Seq(srcRoot, viewRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val src = new ManifestStore(srcRoot)
        val mv = new MatView(viewRoot, Seq("event_type"), "value")
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        src.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 1
        src.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 2 only
        src.delete(s, pmod(col("user_id"), lit(Forget.ForgetMod)) === 0,
          commitKey = Some("mv-forget-1"))
        mv.refresh(s, src) // rewrite detected -> full recompute
        builtRoots.add(srcRoot)
      }
    }
    new MatView(viewRoot, Seq("event_type"), "value").state(s).get
      .select(col("event_type"), col("n"),
        col("vsum").cast("double").as("value_sum"))
      .orderBy("event_type")
  }

  /** Gate (round-14 stretch #7): MATVIEW ROUTING. The user writes the
    * BASE-TABLE aggregate (`definingQuery` — groupBy event_type,
    * count + exact decimal sum over the source store); the registered
    * optimizer rule answers it from the view's store instead. The gate
    * asserts the rewrite STRUCTURALLY (the executed plan's input files
    * are the view's, and none are the source's) and the DuckDB oracle
    * asserts VALUES (the routed answer equals the direct aggregate over
    * the fixture rows — routing that changed an answer would
    * hash-mismatch). The stale-view and unrouted paths are MatViewSpec's
    * cases. */
  /** Two clean appends + two delta refreshes (no delete): view ≡ the
    * full aggregate and FRESH — the routable state. Shared by the
    * routed gates; `kind` selects the tmpdir family. */
  private def ensureRoutable(s: SparkSession, dir: String, kind: String,
                             distinctCol: Option[String] = None,
                             freqCol: Option[String] = None,
                             histCol: Option[String] = None)
  : (String, String) = {
    val (srcRoot, viewRoot) = gateRoots(dir, kind)
    builtRoots.synchronized {
      if (!builtRoots.contains(srcRoot)) {
        for (r <- Seq(srcRoot, viewRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val src = new ManifestStore(srcRoot)
        val mv = new MatView(viewRoot, Seq("event_type"), "value",
          distinctCol, freqCol, histCol)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        src.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta 1
        src.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta 2: view ≡ full aggregate, fresh
        builtRoots.add(srcRoot)
      }
    }
    (srcRoot, viewRoot)
  }

  /** Register + run a defining-aggregate form and PROVE the rewrite
    * fired: the executed plan's input files are the view's, none the
    * source's. `shape` post-processes the defining query (identity for
    * the exact form; filter/project for the subsumption gates). */
  private def routedFrame(s: SparkSession, dir: String, kind: String,
                          distinctCol: Option[String] = None,
                          freqCol: Option[String] = None,
                          histCol: Option[String] = None)
                         (shape: DataFrame => DataFrame): DataFrame = {
    val (srcRoot, viewRoot) =
      ensureRoutable(s, dir, kind, distinctCol, freqCol, histCol)
    val src = new ManifestStore(srcRoot)
    MatViewRouter.register(s, viewRoot, src, Seq("event_type"), "value",
      distinctCol, freqCol, histCol)
    val routed = shape(MatViewRouter.definingQuery(s, src,
      Seq("event_type"), "value", distinctCol, freqCol, histCol))
    // structural proof the rule fired: the plan reads the VIEW's files
    val inputs = routed.inputFiles
    require(inputs.nonEmpty &&
      inputs.forall(_.contains(s"graft_mv_view_${kind}_")),
      s"matview routing did not rewrite to the view store: " +
        inputs.take(3).mkString(","))
    routed
  }

  def matviewRoutedGate(s: SparkSession, dir: String): DataFrame =
    routedFrame(s, dir, "route")(identity)
      .select(col("event_type"), col("n"),
        col("vsum").cast("double").as("value_sum"))
      .orderBy("event_type")

  /** Gate (round-15): ROLLUP routing — the view groups by
    * (event_type, bucket); the user groups by event_type ALONE. The
    * router re-aggregates the view's summable partials
    * (n → sum(n), vsum → sum(vsum)): count and exact-decimal-sum
    * partials add exactly, so any rollup of the view's grouping
    * answers from the view — the single most common warehouse shape
    * (a daily summary serving monthly/yearly rollups). Proven
    * structurally (inputFiles are the view's) and by value (the oracle
    * aggregates the raw fixture by event_type directly). */
  def matviewRollupGate(s: SparkSession, dir: String): DataFrame = {
    val (srcRoot, viewRoot) = gateRoots(dir, "rollup")
    builtRoots.synchronized {
      if (!builtRoots.contains(srcRoot)) {
        for (r <- Seq(srcRoot, viewRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val src = new ManifestStore(srcRoot)
        val mv = new MatView(viewRoot, Seq("event_type", "bucket"), "value")
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"),
            pmod(col("user_id"), lit(10)).as("bucket"))
        src.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        mv.refresh(s, src)
        src.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        mv.refresh(s, src)
        builtRoots.add(srcRoot)
      }
    }
    val src = new ManifestStore(srcRoot)
    MatViewRouter.register(s, viewRoot, src, Seq("event_type", "bucket"),
      "value")
    val rolled = MatViewRouter
      .definingQuery(s, src, Seq("event_type"), "value")
    val inputs = rolled.inputFiles
    require(inputs.nonEmpty &&
      inputs.forall(_.contains("graft_mv_view_rollup_")),
      s"rollup routing did not rewrite to the view store: " +
        inputs.take(3).mkString(","))
    rolled
      .select(col("event_type"), col("n"),
        col("vsum").cast("double").as("value_sum"))
      .orderBy("event_type")
  }

  /** Gate (round-15 #2): SUBSUMPTION — a Filter on a GROUP column and a
    * Project of a SUBSET of the defining outputs, layered ABOVE the
    * defining aggregate. Catalyst pushes the filter below the Aggregate
    * and prunes `vsum` out of it, so plan-equality matching can never
    * fire; the structural matcher lifts the pushed filter, re-applies
    * it over the view (filtering a view row ≡ filtering its group), and
    * maps the surviving outputs. Routing is proven structurally
    * (inputFiles are the view's) and by value (DuckDB evaluates the
    * same filter over the raw fixture). */
  def matviewSubsumedGate(s: SparkSession, dir: String): DataFrame =
    routedFrame(s, dir, "route") { df =>
      df.filter(col("event_type").isin("click", "view"))
        .select("event_type", "n")
    }.orderBy("event_type")

  /** Gate (round-15 #2): the HLL-distinct family routes — the defining
    * aggregate INCLUDING the sketch column answers from the view store;
    * the estimate is then checked against the exact distinct count
    * computed directly from the source (the scan the sketch exists to
    * avoid), with the same 5% envelope as `store_matview_distinct`. */
  def matviewRoutedDistinctGate(s: SparkSession, dir: String): DataFrame = {
    val routed = routedFrame(s, dir, "rtdst",
      distinctCol = Some("user_id")) { df =>
      df.select(col("event_type"), col("n"),
        hll_sketch_estimate(col("dsk")).as("approx_users"))
    }
    val (srcRoot, _) = gateRoots(dir, "rtdst")
    val exact = new ManifestStore(srcRoot).read(s).get
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    routed.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(0.05) * col("exact_users")).cast("int").as("users_ok"))
      .orderBy("event_type")
  }

  /** Gate (round-15 #2): the count-min frequency family routes; per
    * event_type, the exact top-3 users' point estimates (read from the
    * ROUTED sketch) must sit in the CMS envelope — ≥ true always,
    * ≤ true + max(4, 8·N/width). */
  def matviewRoutedTopkGate(s: SparkSession, dir: String): DataFrame = {
    val routed = routedFrame(s, dir, "rthh",
      freqCol = Some("user_id"))(identity)
      .select(col("event_type"), col("csk"))
    val (srcRoot, _) = gateRoots(dir, "rthh")
    val exact = new ManifestStore(srcRoot).read(s).get
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
          .orderBy(col("exact_n").desc, col("user_id"))))
      .filter(col("rk") <= 3)
    exact.join(routed, Seq("event_type"))
      .withColumn("est", cmsEstimate(col("csk"), col("user_id")))
      .withColumn("bound", greatest(lit(4L),
        floor(cmsTotal(col("csk")) * 8L / lit(graft.ops.Cms.Width.toLong))
          .cast("long")))
      .select(col("event_type"), col("rk"), col("user_id"), col("exact_n"),
        (col("est") >= col("exact_n") &&
          col("est") <= col("exact_n") + col("bound")).cast("int").as("est_ok"))
      .orderBy("event_type", "rk")
  }

  /** Gate (round-15 #2): the histogram quantile family routes; p50/p95
    * read from the ROUTED sketch must land within one bin width of the
    * exact discrete quantiles, and the out-of-domain counter is zero. */
  def matviewRoutedQuantileGate(s: SparkSession, dir: String): DataFrame = {
    val routed = routedFrame(s, dir, "rtqt",
      histCol = Some("value"))(identity)
      .select(col("event_type"), col("hsk"))
    val (srcRoot, _) = gateRoots(dir, "rtqt")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"))
    val exact = new ManifestStore(srcRoot).read(s).get
      .select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      .groupBy("event_type")
      .agg(
        max(when(col("rn") === floor(lit(0.5) * (col("n") - 1)),
          col("value"))).as("p50_exact"),
        max(when(col("rn") === floor(lit(0.95) * (col("n") - 1)),
          col("value"))).as("p95_exact"))
    val bw = lit(graft.ops.Hist.width)
    exact.join(routed, Seq("event_type"))
      .select(col("event_type"), col("p50_exact"), col("p95_exact"),
        (abs(histQuantile(col("hsk"), lit(0.5)) - col("p50_exact")) <= bw)
          .cast("int").as("p50_ok"),
        (abs(histQuantile(col("hsk"), lit(0.95)) - col("p95_exact")) <= bw)
          .cast("int").as("p95_ok"),
        (histOor(col("hsk")) === 0L).cast("int").as("domain_ok"))
      .orderBy("event_type")
  }

  /** Gate: incremental COUNT DISTINCT. The view maintains a mergeable
    * HLL sketch of `user_id` per event_type across the same commit mix
    * as the flows gate (two delta refreshes + a rewrite-detected
    * recompute); the estimate must land within 5% of the exact count
    * (2^[[LgK]] registers put the RSE at ~1.6%). Exact truth comes from
    * one direct pass over the surviving store — affordable for a gate,
    * and exactly what the sketch exists to avoid doing per refresh at
    * 100 TB: the refresh path reads ONLY the delta, the sketch unions
    * in O(groups · 2^lgK) state, and no refresh ever re-touches old
    * rows to keep a distinct count current. */
  def matviewDistinctGate(s: SparkSession, dir: String): DataFrame = {
    val (srcRoot, viewRoot) = gateRoots(dir, "dst")
    builtRoots.synchronized {
      if (!builtRoots.contains(srcRoot)) {
        for (r <- Seq(srcRoot, viewRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val src = new ManifestStore(srcRoot)
        val mv = new MatView(viewRoot, Seq("event_type"), "value",
          distinctCol = Some("user_id"))
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        src.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 1
        src.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 2 only
        src.delete(s, pmod(col("user_id"), lit(Forget.ForgetMod)) === 0,
          commitKey = Some("mv-dst-forget-1"))
        mv.refresh(s, src) // rewrite detected -> full recompute
        builtRoots.add(srcRoot)
      }
    }
    val view = new MatView(viewRoot, Seq("event_type"), "value",
      distinctCol = Some("user_id")).state(s).get
      .select(col("event_type"), col("n"),
        hll_sketch_estimate(col("dsk")).as("approx_users"))
    val exact = new ManifestStore(srcRoot).read(s).get
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    view.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(0.05) * col("exact_users")).cast("int").as("users_ok"))
      .orderBy("event_type")
  }

  /** Gate: incremental HEAVY HITTERS. The view maintains a mergeable
    * count-min sketch of `user_id` per event_type across the same
    * commit mix as the other matview gates (two delta refreshes + a
    * rewrite-detected recompute). For each event_type's exact top-3
    * users (count desc, user_id tie-break — computed once from the
    * surviving store, the pass the sketch exists to avoid per refresh),
    * the sketch's point estimate must sit in the CMS envelope:
    * ≥ the true count ALWAYS (counters only add — a hard invariant,
    * not a tolerance), and ≤ true + max(4, 8·N/width) (ε·N-style
    * bound; deterministic here for the fixed seed). At 100 TB the
    * refresh path reads only the delta and folds O(depth·width) state
    * per group — no re-scan ever keeps the frequency table current. */
  def matviewTopkGate(s: SparkSession, dir: String): DataFrame = {
    val (srcRoot, viewRoot) = gateRoots(dir, "hh")
    builtRoots.synchronized {
      if (!builtRoots.contains(srcRoot)) {
        for (r <- Seq(srcRoot, viewRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val src = new ManifestStore(srcRoot)
        val mv = new MatView(viewRoot, Seq("event_type"), "value",
          freqCol = Some("user_id"))
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        src.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 1
        src.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 2 only
        src.delete(s, pmod(col("user_id"), lit(Forget.ForgetMod)) === 0,
          commitKey = Some("mv-hh-forget-1"))
        mv.refresh(s, src) // rewrite detected -> full recompute
        builtRoots.add(srcRoot)
      }
    }
    val view = new MatView(viewRoot, Seq("event_type"), "value",
      freqCol = Some("user_id")).state(s).get
      .select(col("event_type"), col("csk"))
    val exact = new ManifestStore(srcRoot).read(s).get
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
          .orderBy(col("exact_n").desc, col("user_id"))))
      .filter(col("rk") <= 3)
    exact.join(view, Seq("event_type"))
      .withColumn("est", cmsEstimate(col("csk"), col("user_id")))
      .withColumn("bound", greatest(lit(4L),
        floor(cmsTotal(col("csk")) * 8L / lit(graft.ops.Cms.Width.toLong))
          .cast("long")))
      .select(col("event_type"), col("rk"), col("user_id"), col("exact_n"),
        (col("est") >= col("exact_n") &&
          col("est") <= col("exact_n") + col("bound")).cast("int").as("est_ok"))
      .orderBy("event_type", "rk")
  }

  /** Gate: incremental QUANTILES. The view maintains a mergeable
    * fixed-domain histogram of `value` per event_type across the same
    * commit mix (two delta refreshes + a rewrite-detected recompute).
    * For p50 and p95 the histogram's bin-midpoint estimate must land
    * within the BIN WIDTH of the exact discrete quantile (the 0-indexed
    * rank ⌊p·(n−1)⌋ order statistic — both engines compute the rank in
    * IEEE double, so it is bit-agreed), and the out-of-domain counter
    * must be zero — a fixture outgrowing the declared [0, 1024) domain
    * fails loudly instead of silently skewing the estimate. */
  def matviewQuantileGate(s: SparkSession, dir: String): DataFrame = {
    val (srcRoot, viewRoot) = gateRoots(dir, "qt")
    builtRoots.synchronized {
      if (!builtRoots.contains(srcRoot)) {
        for (r <- Seq(srcRoot, viewRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val src = new ManifestStore(srcRoot)
        val mv = new MatView(viewRoot, Seq("event_type"), "value",
          histCol = Some("value"))
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        src.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 1
        src.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        mv.refresh(s, src) // delta = commit 2 only
        src.delete(s, pmod(col("user_id"), lit(Forget.ForgetMod)) === 0,
          commitKey = Some("mv-qt-forget-1"))
        mv.refresh(s, src) // rewrite detected -> full recompute
        builtRoots.add(srcRoot)
      }
    }
    val view = new MatView(viewRoot, Seq("event_type"), "value",
      histCol = Some("value")).state(s).get
      .select(col("event_type"), col("hsk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"))
    val exact = new ManifestStore(srcRoot).read(s).get
      .select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      .groupBy("event_type")
      .agg(
        max(when(col("rn") === floor(lit(0.5) * (col("n") - 1)),
          col("value"))).as("p50_exact"),
        max(when(col("rn") === floor(lit(0.95) * (col("n") - 1)),
          col("value"))).as("p95_exact"))
    val bw = lit(graft.ops.Hist.width)
    exact.join(view, Seq("event_type"))
      .select(col("event_type"), col("p50_exact"), col("p95_exact"),
        (abs(histQuantile(col("hsk"), lit(0.5)) - col("p50_exact")) <= bw)
          .cast("int").as("p50_ok"),
        (abs(histQuantile(col("hsk"), lit(0.95)) - col("p95_exact")) <= bw)
          .cast("int").as("p95_ok"),
        (histOor(col("hsk")) === 0L).cast("int").as("domain_ok"))
      .orderBy("event_type")
  }

  /** Gate: change-data capture from manifest arithmetic alone. Two
    * appends land in the store; `readAddedSince(v1)` must return
    * EXACTLY commit 2's rows — no change log, no timestamps, no diff
    * scan (the manifest names the added files, the read touches only
    * them). This is the feed the incremental views consume; here it is
    * gated directly: the delta aggregated by event_type hash-matches
    * the oracle's "odd event_ids" replica. */
  def cdcDiffGate(s: SparkSession, dir: String): DataFrame = {
    val (srcRoot, _) = gateRoots(dir, "cdc")
    val src = new ManifestStore(srcRoot)
    val v1 = builtRoots.synchronized {
      if (!builtRoots.contains(srcRoot)) {
        val p = new Path(srcRoot)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        src.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"), commitKey = Some("cdc-evens"))
        src.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"), commitKey = Some("cdc-odds"))
        builtRoots.add(srcRoot)
      }
      // the version AFTER commit 1 is the CDC cursor; commit keys make
      // the build replay-safe, so the cursor is stable across runs
      src.currentVersion(s) - 1
    }
    src.readAddedSince(s, v1).get
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .orderBy("event_type")
  }

  /** Build once: a dim store (distinct event_type → derived label), a
    * fact store appended in two halves, and a [[JoinMatView]] refreshed
    * after each append (build 1 = full, build 2 = fact-delta fold).
    * The view groups by (label, event_type) so the rollup gate can
    * group by the DIM attribute alone. */
  private def ensureJoinRoutable(s: SparkSession, dir: String)
  : (String, String, String) = {
    val tag = new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir)
    val t = System.getProperty("java.io.tmpdir")
    val factRoot = s"$t/graft_mv_jfact_$tag"
    val dimRoot = s"$t/graft_mv_jdim_$tag"
    val viewRoot = s"$t/graft_mv_view_join_$tag"
    builtRoots.synchronized {
      if (!builtRoots.contains(factRoot)) {
        for (r <- Seq(factRoot, dimRoot, viewRoot)) {
          val p = new Path(r)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val fact = new ManifestStore(factRoot)
        val dim = new ManifestStore(dimRoot)
        val jmv = new JoinMatView(viewRoot, Seq("label", "event_type"),
          "value", Seq("event_type"))
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        dim.append(s, ev.select("event_type").distinct()
          .withColumn("label",
            concat(lit("cat_"), substring(col("event_type"), 1, 2))))
        fact.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        jmv.refresh(s, fact, dim) // first build: full
        fact.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        jmv.refresh(s, fact, dim) // fact delta joins dim, partials fold
        builtRoots.add(factRoot)
      }
    }
    (factRoot, dimRoot, viewRoot)
  }

  /** Gate (round-15 session 2): STAR-JOIN matview routing — the user
    * writes `fact ⋈ dim → groupBy(label, event_type) → count/sum`; the
    * registered rule answers it from the [[JoinMatView]]'s store
    * without touching the fact store OR paying the join (inputFiles
    * proven to be the view's). The DuckDB oracle computes the same
    * label derivation over the raw fixture, so a routing or
    * maintenance error hash-mismatches. */
  def matviewJoinGate(s: SparkSession, dir: String): DataFrame = {
    val (factRoot, dimRoot, viewRoot) = ensureJoinRoutable(s, dir)
    val fact = new ManifestStore(factRoot)
    val dim = new ManifestStore(dimRoot)
    MatViewRouter.registerJoin(s, viewRoot, fact, dim,
      Seq("label", "event_type"), "value", Seq("event_type"))
    val routed = new JoinMatView(viewRoot, Seq("label", "event_type"),
      "value", Seq("event_type")).defining(s, fact, dim)
    val inputs = routed.inputFiles
    require(inputs.nonEmpty && inputs.forall(_.contains("graft_mv_view_join_")),
      s"join matview routing did not rewrite to the view store: " +
        inputs.take(3).mkString(","))
    routed
      .select(col("label"), col("event_type"), col("n"),
        col("vsum").cast("double").as("value_sum"))
      .orderBy("label", "event_type")
  }

  /** Gate (round-15 session 2): join-view ROLLUP — grouping by the DIM
    * attribute alone (a strict subset of the view's group) re-sums the
    * view's partials; the fact store, the join, AND the per-event_type
    * detail all stay untouched. */
  def matviewJoinRollupGate(s: SparkSession, dir: String): DataFrame = {
    val (factRoot, dimRoot, viewRoot) = ensureJoinRoutable(s, dir)
    val fact = new ManifestStore(factRoot)
    val dim = new ManifestStore(dimRoot)
    MatViewRouter.registerJoin(s, viewRoot, fact, dim,
      Seq("label", "event_type"), "value", Seq("event_type"))
    val rolled = definingAgg(
      fact.read(s).get.join(dim.read(s).get, Seq("event_type")),
      Seq("label"), "value", None, None, None)
    val inputs = rolled.inputFiles
    require(inputs.nonEmpty && inputs.forall(_.contains("graft_mv_view_join_")),
      s"join rollup routing did not rewrite to the view store: " +
        inputs.take(3).mkString(","))
    rolled
      .select(col("label"), col("n"),
        col("vsum").cast("double").as("value_sum"))
      .orderBy("label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_matview_flows" -> (matviewGate _),
    "store_matview_routed" -> (matviewRoutedGate _),
    "store_matview_rollup" -> (matviewRollupGate _),
    "store_matview_join" -> (matviewJoinGate _),
    "store_matview_join_rollup" -> (matviewJoinRollupGate _),
    "store_matview_subsumed" -> (matviewSubsumedGate _),
    "store_matview_routed_distinct" -> (matviewRoutedDistinctGate _),
    "store_matview_routed_topk" -> (matviewRoutedTopkGate _),
    "store_matview_routed_quantile" -> (matviewRoutedQuantileGate _),
    "store_matview_distinct" -> (matviewDistinctGate _),
    "store_matview_topk" -> (matviewTopkGate _),
    "store_matview_quantile" -> (matviewQuantileGate _),
    "store_cdc_diff" -> (cdcDiffGate _))

  val oracle: Map[String, String] = Map(
    // the routed answer must equal the direct aggregate over the whole
    // fixture (both halves appended, nothing deleted): routing that
    // changed an answer would hash-mismatch here
    "store_matview_routed" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
          AS DOUBLE) AS value_sum
      FROM events GROUP BY event_type ORDER BY event_type""",
    // join view: label is a DIM attribute (functionally derived from
    // the join key in the fixture dim), so the star-join aggregate
    // equals the same derivation computed directly over the raw rows
    "store_matview_join" -> """
      SELECT concat('cat_', substr(event_type, 1, 2)) AS label, event_type,
        COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
          AS DOUBLE) AS value_sum
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "store_matview_join_rollup" -> """
      SELECT concat('cat_', substr(event_type, 1, 2)) AS label,
        COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
          AS DOUBLE) AS value_sum
      FROM events GROUP BY 1 ORDER BY 1""",
    // per-event_type exact top-3 users (count desc, user_id tie-break)
    // over the post-forget survivors; est_ok is the CMS envelope, a
    // literal TRUE on the oracle side
    "store_matview_topk" -> s"""
      WITH surv AS (
        SELECT event_type, user_id FROM events
        WHERE user_id % ${Forget.ForgetMod} <> 0),
      cnt AS (
        SELECT event_type, user_id, COUNT(*) AS exact_n,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY COUNT(*) DESC, user_id) AS rk
        FROM surv GROUP BY event_type, user_id)
      SELECT event_type, CAST(rk AS INT) AS rk, user_id,
        CAST(exact_n AS BIGINT) AS exact_n, 1 AS est_ok
      FROM cnt WHERE rk <= 3
      ORDER BY event_type, rk""",
    // exact discrete quantiles (rank = floor(p·(n−1)), 0-indexed) over
    // the post-forget survivors; ok flags are the histogram envelope,
    // literal TRUE on the oracle side
    "store_matview_quantile" -> s"""
      WITH surv AS (
        SELECT event_type, value FROM events
        WHERE user_id % ${Forget.ForgetMod} <> 0),
      r AS (
        SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM surv)
      SELECT event_type,
        MAX(CASE WHEN rn = CAST(FLOOR(0.5*(n-1)) AS BIGINT)
          THEN value END) AS p50_exact,
        MAX(CASE WHEN rn = CAST(FLOOR(0.95*(n-1)) AS BIGINT)
          THEN value END) AS p95_exact,
        1 AS p50_ok, 1 AS p95_ok, 1 AS domain_ok
      FROM r GROUP BY event_type ORDER BY event_type""",
    // rollup: the event_type-only aggregate must equal the direct
    // aggregate over the raw fixture even though the plan reads the
    // (event_type, bucket) view and re-sums its partials
    "store_matview_rollup" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
          AS DOUBLE) AS value_sum
      FROM events GROUP BY event_type ORDER BY event_type""",
    // subsumption: the group-column filter over the view ≡ the same
    // WHERE over the raw fixture; only `n` survives the projection
    "store_matview_subsumed" -> """
      SELECT event_type, COUNT(*) AS n
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type ORDER BY event_type""",
    // the routed sketch families aggregate the FULL fixture (two clean
    // appends, no forget): exact truths carry no survivor filter
    "store_matview_routed_distinct" -> """
      SELECT event_type, COUNT(*) AS n,
        COUNT(DISTINCT user_id) AS exact_users, 1 AS users_ok
      FROM events GROUP BY event_type ORDER BY event_type""",
    "store_matview_routed_topk" -> """
      WITH cnt AS (
        SELECT event_type, user_id, COUNT(*) AS exact_n,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY COUNT(*) DESC, user_id) AS rk
        FROM events GROUP BY event_type, user_id)
      SELECT event_type, CAST(rk AS INT) AS rk, user_id,
        CAST(exact_n AS BIGINT) AS exact_n, 1 AS est_ok
      FROM cnt WHERE rk <= 3
      ORDER BY event_type, rk""",
    "store_matview_routed_quantile" -> """
      WITH r AS (
        SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type,
        MAX(CASE WHEN rn = CAST(FLOOR(0.5*(n-1)) AS BIGINT)
          THEN value END) AS p50_exact,
        MAX(CASE WHEN rn = CAST(FLOOR(0.95*(n-1)) AS BIGINT)
          THEN value END) AS p95_exact,
        1 AS p50_ok, 1 AS p95_ok, 1 AS domain_ok
      FROM r GROUP BY event_type ORDER BY event_type""",
    "store_cdc_diff" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      FROM events WHERE event_id % 2 = 1
      GROUP BY event_type ORDER BY event_type""",
    "store_matview_distinct" -> s"""
      SELECT event_type, COUNT(*) AS n,
        COUNT(DISTINCT user_id) AS exact_users, 1 AS users_ok
      FROM events
      WHERE user_id % ${Forget.ForgetMod} <> 0
      GROUP BY event_type ORDER BY event_type""",
    "store_matview_flows" -> s"""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      FROM events
      WHERE user_id % ${Forget.ForgetMod} <> 0
      GROUP BY event_type ORDER BY event_type""")
}
