package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{ManifestStore, MatView}

/** Incremental view maintenance: delta-only refresh, rewrite-triggered
  * recompute, replay idempotence, and the up-to-date short-circuit. */
class MatViewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): (ManifestStore, MatView) = {
    val t = Files.createTempDirectory("graft_mv_spec").toString
    (new ManifestStore(s"$t/src"),
      new MatView(s"$t/view", Seq("k"), "v"))
  }

  private def stateMap(mv: MatView): Map[String, (Long, BigDecimal)] =
    mv.state(spark).get.select("k", "n", "vsum").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap

  test("refresh consumes only the manifest delta and merges partials") {
    val (src, mv) = fresh()
    src.append(spark, Seq(("a", 1.5), ("b", 2.0)).toDF("k", "v"))
    mv.refresh(spark, src)
    assert(stateMap(mv) == Map("a" -> ((1L, BigDecimal("1.5"))),
      "b" -> ((1L, BigDecimal("2.0")))))
    src.append(spark, Seq(("a", 0.5), ("c", 3.0)).toDF("k", "v"))
    // the delta visible to the second refresh is exactly commit 2
    val v1 = 1L
    val delta = src.readAddedSince(spark, v1).get
    assert(delta.count() == 2L)
    assert(delta.select("k").as[String].collect().toSet == Set("a", "c"))
    mv.refresh(spark, src)
    assert(stateMap(mv) == Map("a" -> ((2L, BigDecimal("2.0"))),
      "b" -> ((1L, BigDecimal("2.0"))), "c" -> ((1L, BigDecimal("3.0")))))
    // up-to-date refresh short-circuits (same version, view unchanged)
    val filesBefore = mv.state(spark).get.inputFiles.toSet
    mv.refresh(spark, src)
    assert(mv.state(spark).get.inputFiles.toSet == filesBefore)
  }

  test("distinct sketch: partials union losslessly across delta refreshes") {
    val t = Files.createTempDirectory("graft_mv_dsk").toString
    val src = new ManifestStore(s"$t/src")
    val mv = new MatView(s"$t/view", Seq("k"), "v", distinctCol = Some("u"))
    // commit 1: users 1..50 under k=a; commit 2: users 26..75 (overlap
    // 26..50 must not double-count) plus k=b with users 1..10
    src.append(spark, (1 to 50).map(u => ("a", 1.0, u.toLong)).toDF("k", "v", "u"))
    mv.refresh(spark, src)
    src.append(spark,
      ((26 to 75).map(u => ("a", 1.0, u.toLong)) ++
        (1 to 10).map(u => ("b", 1.0, u.toLong))).toDF("k", "v", "u"))
    mv.refresh(spark, src)
    val est = mv.state(spark).get
      .select(col("k"), hll_sketch_estimate(col("dsk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // at these cardinalities a 2^12-register HLL is exact
    assert(est == Map("a" -> 75L, "b" -> 10L),
      s"sketch union must count the overlap once: $est")
    // a rewriting commit (delete) forces recompute; the sketch follows
    src.delete(spark, col("u") > 50L, commitKey = Some("dsk-del"))
    mv.refresh(spark, src)
    val est2 = mv.state(spark).get
      .select(col("k"), hll_sketch_estimate(col("dsk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est2 == Map("a" -> 50L, "b" -> 10L), s"post-delete: $est2")
  }

  test("count-min sketch: frequencies add exactly across delta refreshes; " +
      "estimates never undercount") {
    val t = Files.createTempDirectory("graft_mv_csk").toString
    val src = new ManifestStore(s"$t/src")
    val mv = new MatView(s"$t/view", Seq("k"), "v", freqCol = Some("u"))
    // commit 1: user 7 × 30, user 8 × 5; commit 2: user 7 × 20 more —
    // the merged sketch must see 7 → 50 (25 of them from each refresh
    // path: aggOf on the delta, cms_merge_agg on the stored sketch)
    src.append(spark, ((1 to 30).map(_ => ("a", 1.0, 7L)) ++
      (1 to 5).map(_ => ("a", 1.0, 8L))).toDF("k", "v", "u"))
    mv.refresh(spark, src)
    src.append(spark, (1 to 20).map(_ => ("a", 1.0, 7L)).toDF("k", "v", "u"))
    mv.refresh(spark, src)
    val sk = mv.state(spark).get.select(col("csk")).head().getAs[Array[Byte]](0)
    import graft.ops.Cms
    assert(Cms.total(sk) == 55L)
    val e7 = Cms.estimate(sk, 7L)
    val e8 = Cms.estimate(sk, 8L)
    // never undercount (hard CMS invariant); at 55 updates into a
    // 5×4096 sketch, collisions are also structurally impossible to
    // matter by more than the full stream
    assert(e7 >= 50L && e7 <= 55L, s"est(7)=$e7")
    assert(e8 >= 5L && e8 <= 10L, s"est(8)=$e8")
    // an unseen key estimates at most the collision mass, never negative
    val e9 = Cms.estimate(sk, 9L)
    assert(e9 >= 0L && e9 <= 5L, s"est(9)=$e9")
  }

  test("histogram sketch: quantiles within bin width across delta refreshes; " +
      "out-of-domain inputs count loudly") {
    val t = Files.createTempDirectory("graft_mv_hsk").toString
    val src = new ManifestStore(s"$t/src")
    val mv = new MatView(s"$t/view", Seq("k"), "v", histCol = Some("v"))
    // commit 1: 0..99; commit 2: 100..199 — the merged histogram must
    // see the full 0..199 stream (median ≈ 99.5, p95 ≈ 189)
    src.append(spark, (0 until 100).map(i => ("a", i.toDouble)).toDF("k", "v"))
    mv.refresh(spark, src)
    src.append(spark, (100 until 200).map(i => ("a", i.toDouble)).toDF("k", "v"))
    mv.refresh(spark, src)
    import graft.ops.Hist
    val sk = mv.state(spark).get.select(col("hsk")).head().getAs[Array[Byte]](0)
    assert(Hist.total(sk) == 200L && Hist.outOfRange(sk) == 0L)
    // exact discrete p50: rank floor(0.5*199)=99 → value 99.0
    assert(math.abs(Hist.quantile(sk, 0.5) - 99.0) <= Hist.width)
    // exact discrete p95: rank floor(0.95*199)=189 → value 189.0
    assert(math.abs(Hist.quantile(sk, 0.95) - 189.0) <= Hist.width)
    // a domain-busting append surfaces as the loud counter, not a skew
    src.append(spark, Seq(("a", 5000.0)).toDF("k", "v"))
    mv.refresh(spark, src)
    val sk2 = mv.state(spark).get.select(col("hsk")).head().getAs[Array[Byte]](0)
    assert(Hist.outOfRange(sk2) == 1L && Hist.total(sk2) == 201L)
  }

  test("sketches refuse a layout-mismatched binary instead of merging garbage") {
    import graft.ops.{Cms, Hist}
    val cms = Cms.serialize(new Array[Long](Cms.cells))
    val wrongCms = cms.clone()
    wrongCms(4) = (wrongCms(4) ^ 1).toByte // flip a width bit in the header
    intercept[IllegalArgumentException](Cms.estimate(wrongCms, 1L))
    intercept[IllegalArgumentException](Cms.deserialize(wrongCms))
    val hist = Hist.serialize(new Array[Long](Hist.cells))
    val wrongHist = hist.clone()
    wrongHist(0) = (wrongHist(0) ^ 1).toByte // flip a bins bit
    intercept[IllegalArgumentException](Hist.quantile(wrongHist, 0.5))
    intercept[IllegalArgumentException](Hist.deserialize(wrongHist))
    // well-formed sketches still round-trip
    assert(Cms.total(cms) == 0L && Hist.total(hist) == 0L)
  }

  test("sketch aggregates hold state across streaming micro-batches: stream == batch") {
    // the TypedImperativeAggregate buffers (CMS + histogram) must
    // serialize into streaming aggregation state and keep merging as
    // batches arrive — the property that makes the matview sketches
    // usable in a live pipeline, proven by final-state equality with
    // the one-shot batch aggregate over the same rows
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.codec.GraftFunctions.register(spark)
    val rows: Seq[(String, Long, Double)] =
      (0 until 400).map(i => ("a", (i % 37).toLong, (i % 97).toDouble)) ++
        (0 until 200).map(i => ("b", (i % 11).toLong, (i % 53).toDouble))
    val stream = MemoryStream[(String, Long, Double)]
    val q = stream.toDF().toDF("k", "u", "v")
      .groupBy("k")
      .agg(expr("cms_agg(u)").as("csk"), expr("hist_agg(v)").as("hsk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sketch_stream").start()
    rows.grouped(150).foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("sketch_stream")
      .select(col("k"),
        expr("cms_estimate(csk, 3L)").as("e3"),
        expr("cms_total(csk)").as("ct"),
        expr("hist_quantile(hsk, 0.5D)").as("p50"),
        expr("hist_oor(hsk)").as("oor"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val batch = rows.toDF("k", "u", "v")
      .groupBy("k")
      .agg(expr("cms_agg(u)").as("csk"), expr("hist_agg(v)").as("hsk"))
      .select(col("k"),
        expr("cms_estimate(csk, 3L)").as("e3"),
        expr("cms_total(csk)").as("ct"),
        expr("hist_quantile(hsk, 0.5D)").as("p50"),
        expr("hist_oor(hsk)").as("oor"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(streamed == batch,
      s"streamed sketch state diverged: $streamed vs $batch")
    assert(streamed("a")._2 == 400L && streamed("b")._2 == 200L)
  }

  test("streaming ingest keeps the view consistent; batch-id keys make replays no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = Files.createTempDirectory("graft_mv_stream").toString
    val src = new ManifestStore(s"$t/src")
    val mv = new MatView(s"$t/view", Seq("k"), "v")
    val stream = MemoryStream[(String, Double)]
    val q = stream.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$t/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // exactly-once: the append is keyed by the micro-batch id, the
        // refresh by the store version it covers
        src.append(spark, batch, commitKey = Some(s"mvstream@$id"))
        mv.refresh(spark, src)
        ()
      }.start()
    stream.addData(("a", 1.0), ("b", 2.0))
    q.processAllAvailable()
    stream.addData(("a", 3.0))
    q.processAllAvailable()
    q.stop()
    assert(stateMap(mv) == Map("a" -> ((2L, BigDecimal("4.0"))),
      "b" -> ((1L, BigDecimal("2.0")))))
    // a re-delivered micro-batch (same id) changes nothing
    import spark.implicits._
    src.append(spark, Seq(("a", 99.0)).toDF("k", "v"),
      commitKey = Some("mvstream@1"))
    mv.refresh(spark, src)
    assert(stateMap(mv) == Map("a" -> ((2L, BigDecimal("4.0"))),
      "b" -> ((1L, BigDecimal("2.0")))))
  }

  test("a rewriting source commit forces a full recompute, never stale state") {
    val (src, mv) = fresh()
    src.append(spark, Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("k", "v"))
    mv.refresh(spark, src)
    src.delete(spark, col("k") === "b")
    assert(src.removedSince(spark, 1L))
    mv.refresh(spark, src)
    assert(stateMap(mv) == Map("a" -> ((1L, BigDecimal("1.0")))))
    // append after the rewrite goes back to the delta path
    src.append(spark, Seq(("a", 2.5)).toDF("k", "v"))
    mv.refresh(spark, src)
    assert(stateMap(mv) == Map("a" -> ((2L, BigDecimal("3.5")))))
  }

  test("router: a fresh view answers the base-table aggregate; a stale one never does") {
    import graft.ingest.MatViewRouter
    val (src, mv) = fresh()
    src.append(spark, Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("k", "v"))
    mv.refresh(spark, src)
    def userQuery() = MatViewRouter.definingQuery(spark, src, Seq("k"), "v")
    // BEFORE registration: the same query reads the SOURCE
    val unrouted = userQuery()
    val direct = unrouted.collect().map(r =>
      (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet
    assert(unrouted.inputFiles.forall(_.contains("/src/")),
      "unregistered query must read the source store")
    try {
      assert(MatViewRouter.register(spark, mv.root, src, Seq("k"), "v"))
      // ROUTED: identical answer, but the plan reads the VIEW's store
      val routed = userQuery()
      assert(routed.inputFiles.nonEmpty &&
        routed.inputFiles.forall(_.contains("/view/")),
        s"routing did not rewrite: ${routed.inputFiles.take(3).mkString(",")}")
      val got = routed.collect().map(r =>
        (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet
      assert(got == direct, "routing changed the answer")
      // STALE: one more source commit disables routing until re-register
      src.append(spark, Seq(("c", 9.0)).toDF("k", "v"))
      val afterCommit = userQuery()
      assert(afterCommit.inputFiles.forall(_.contains("/src/")),
        "a stale view must never answer")
      assert(afterCommit.filter(col("k") === "c").count() == 1L)
      // refresh + re-register: routing resumes with the new contents
      mv.refresh(spark, src)
      assert(MatViewRouter.register(spark, mv.root, src, Seq("k"), "v"))
      val rerouted = userQuery()
      assert(rerouted.inputFiles.forall(_.contains("/view/")))
      assert(rerouted.filter(col("k") === "c").head().getLong(1) == 1L)
      // a DIFFERENT aggregate shape over the same source never routes —
      // a raw double sum is NOT the defining exact-decimal sum (the
      // count-only aggregate, by contrast, now routes legitimately as a
      // projection subsumption — see the dedicated r15 test)
      val other = src.read(spark).get.groupBy("k")
        .agg(sum(col("v")).as("s"))
      assert(other.inputFiles.forall(_.contains("/src/")),
        "a non-matching aggregate must not route")
      // RE-REGISTERING with a live fresh entry must not capture the
      // ROUTED plan as the target (the every-second-register alternation
      // the bench's pass 2 caught): routing keeps working across
      // repeated registrations
      (1 to 3).foreach { _ =>
        assert(MatViewRouter.register(spark, mv.root, src, Seq("k"), "v"))
        assert(userQuery().inputFiles.forall(_.contains("/view/")),
          "routing broke after a repeated register")
      }
      // the defining aggregate appearing TWICE in one query (a UNION of
      // itself — joins don't qualify: they infer isnotnull on the join
      // key into each branch, which exact-matching deliberately treats
      // as a different query): at most ONE occurrence routes, because
      // the stored replacement carries fixed ExprIds and splicing it
      // twice would duplicate attribute ids across branches. Answers
      // stay exact either way.
      val u = userQuery().union(userQuery())
      val grouped = u.groupBy("k").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(grouped.values.forall(_ == 2L) && grouped.nonEmpty,
        "union of the defining aggregate lost or duplicated groups")
      val ins = u.inputFiles
      assert(ins.exists(_.contains("/view/")),
        "duplicate-subtree union routed neither occurrence")
      assert(ins.exists(_.contains("/src/")),
        "duplicate-subtree union routed BOTH occurrences (fixed ExprIds " +
          "would collide across branches)")
    } finally MatViewRouter.unregister(mv.root)
  }

  test("router subsumption (r15 #2): group filters and output subsets " +
    "route; non-group filters and foreign shapes never do") {
    import graft.ingest.MatViewRouter
    val (src, mv) = fresh()
    src.append(spark,
      Seq(("a", 1.0), ("b", 2.0), ("b", 4.0), ("c", 8.0)).toDF("k", "v"))
    mv.refresh(spark, src)
    def defQ() = MatViewRouter.definingQuery(spark, src, Seq("k"), "v")
    try {
      assert(MatViewRouter.register(spark, mv.root, src, Seq("k"), "v"))

      // Filter on the GROUP column above the defining aggregate:
      // Catalyst pushes it below the Aggregate (plan equality can never
      // fire) — the structural matcher lifts it over the view
      val filtered = defQ().filter(col("k") =!= "a")
      assert(filtered.inputFiles.nonEmpty &&
        filtered.inputFiles.forall(_.contains("/view/")),
        s"group-filter subsumption did not route: " +
          filtered.inputFiles.take(3).mkString(","))
      assert(filtered.collect().map(r =>
        (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet ==
        Set(("b", 2L, BigDecimal("6.0")), ("c", 1L, BigDecimal("8.0"))))

      // Projection SUBSET (vsum pruned out of the Aggregate): routes,
      // mapped onto the view's n column
      val pruned = defQ().select("k", "n")
      assert(pruned.inputFiles.forall(_.contains("/view/")),
        "projection subsumption did not route")
      assert(pruned.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("a" -> 1L, "b" -> 2L, "c" -> 1L))

      // both at once, written as a fresh user aggregate (count only)
      val combo = src.read(spark).get.groupBy("k")
        .agg(count(lit(1)).as("n")).filter(col("k") === "b")
      assert(combo.inputFiles.forall(_.contains("/view/")),
        "count-only + group-filter subsumption did not route")
      assert(combo.head().getLong(1) == 2L)

      // HAVING-style filter on an AGGREGATE output stays above the
      // routed subtree (not pushed below the Aggregate) — still routed
      val having = defQ().filter(col("n") >= 2)
      assert(having.inputFiles.forall(_.contains("/view/")),
        "HAVING form did not route")
      assert(having.collect().map(_.getString(0)).toSeq == Seq("b"))

      // NON-GROUP column filter below the aggregate: the view's
      // partials already folded those rows — must NOT route
      val nonGroup = src.read(spark).get.filter(col("v") > 1.5)
        .groupBy("k").agg(count(lit(1)).as("n"))
      assert(nonGroup.inputFiles.forall(_.contains("/src/")),
        "a non-group filter below the aggregate must never route")
      assert(nonGroup.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap == Map("b" -> 2L, "c" -> 1L))

      // nondeterministic filter: references no columns (the name check
      // alone would lift it) but samples ROWS, not GROUPS — never routes
      val sampled = src.read(spark).get.filter(rand(7) < 0.99)
        .groupBy("k").agg(count(lit(1)).as("n"))
      assert(sampled.inputFiles.forall(_.contains("/src/")),
        "a nondeterministic filter must never route")

      // a DIFFERENT grouping never routes (v is not a group column)
      val regrouped = src.read(spark).get.groupBy("k", "v")
        .agg(count(lit(1)).as("n"))
      assert(regrouped.inputFiles.forall(_.contains("/src/")),
        "a different grouping must not route")
    } finally MatViewRouter.unregister(mv.root)
  }

  test("router rollup (r15): group-subset queries re-aggregate the " +
    "view; sketches and global aggregates never roll up") {
    import graft.ingest.MatViewRouter
    val t = Files.createTempDirectory("graft_mv_rollup").toString
    val src = new ManifestStore(s"$t/src")
    val mv = new MatView(s"$t/view", Seq("k", "k2"), "v")
    src.append(spark, Seq(("a", "x", 1.0), ("a", "y", 2.0),
      ("b", "x", 4.0), ("b", "x", 8.0)).toDF("k", "k2", "v"))
    mv.refresh(spark, src)
    try {
      assert(MatViewRouter.register(spark, mv.root, src, Seq("k", "k2"), "v"))
      // rollup to k: n → sum(view.n), vsum → sum(view.vsum), exact
      val rolled = MatViewRouter.definingQuery(spark, src, Seq("k"), "v")
      assert(rolled.inputFiles.nonEmpty &&
        rolled.inputFiles.forall(_.contains("/view/")),
        s"rollup did not route: ${rolled.inputFiles.take(2).mkString(",")}")
      assert(rolled.collect().map(r =>
        (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet ==
        Set(("a", 2L, BigDecimal("3.0")), ("b", 2L, BigDecimal("12.0"))))
      // rollup composes with a group filter and computed outputs
      val combo = MatViewRouter.definingQuery(spark, src, Seq("k"), "v")
        .filter(col("k") === "b")
        .select(col("k"), (col("n") * 2).as("n2"),
          col("vsum").cast("double").as("vs"))
      assert(combo.inputFiles.forall(_.contains("/view/")),
        "filtered+computed rollup did not route")
      val row = combo.head()
      assert(row.getLong(1) == 4L && row.getDouble(2) == 12.0)
      // GLOBAL rollup (empty grouping) never routes: over an empty
      // source the answers would differ (count 0 vs sum-of-nothing null)
      val global = src.read(spark).get
        .agg(count(lit(1)).as("n"))
      assert(global.inputFiles.forall(_.contains("/src/")),
        "a global aggregate must not route")
    } finally MatViewRouter.unregister(mv.root)

    // sketch-family rollup: the distinct sketch has no byte-proven
    // merge-equals-direct guarantee — the rollup must stay on the source
    val t2 = Files.createTempDirectory("graft_mv_rollup_sk").toString
    val src2 = new ManifestStore(s"$t2/src")
    val mv2 = new MatView(s"$t2/view", Seq("k", "k2"), "v",
      distinctCol = Some("u"))
    src2.append(spark, Seq(("a", "x", 1.0, 7L), ("a", "y", 2.0, 8L))
      .toDF("k", "k2", "v", "u"))
    mv2.refresh(spark, src2)
    try {
      assert(MatViewRouter.register(spark, mv2.root, src2, Seq("k", "k2"),
        "v", distinctCol = Some("u")))
      // the EXACT shape still routes (all group cols, sketch included)
      val exact = MatViewRouter.definingQuery(spark, src2, Seq("k", "k2"),
        "v", distinctCol = Some("u"))
      assert(exact.inputFiles.forall(_.contains("/view/")))
      // …but its k-only ROLLUP does not (dsk has no rollup form)
      val skRoll = MatViewRouter.definingQuery(spark, src2, Seq("k"),
        "v", distinctCol = Some("u"))
      assert(skRoll.inputFiles.forall(_.contains("/src/")),
        "a sketch rollup must never route")
      // a rollup that PRUNES the sketch away routes fine
      val noSk = MatViewRouter.definingQuery(spark, src2, Seq("k"),
        "v", distinctCol = Some("u")).select("k", "n")
      assert(noSk.inputFiles.forall(_.contains("/view/")),
        "a sketch-free rollup projection should route")
      assert(noSk.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == Map("a" -> 2L))
    } finally MatViewRouter.unregister(mv2.root)
  }

  test("auto-refresh binding: streaming micro-batches keep routed " +
    "answers fresh (r15 stretch #9)") {
    import graft.ingest.{MatViewAutoRefresh, MatViewRouter}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (src, mv) = fresh()
    // empty-view bootstrap: bind BEFORE any data — the first micro-batch
    // must both create the view and start routing
    MatViewAutoRefresh.bind(spark, mv, src, Seq("k"), "v")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val ckpt = Files.createTempDirectory("graft_mv_stream_ck").toString
    val q = mem.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        src.append(b.sparkSession, b, commitKey = Some(s"mv-stream-$id"))
        ()
      }
      .start()
    def runBatch(rows: (String, Double)*): Unit = {
      mem.addData(rows: _*)
      q.processAllAvailable()
    }
    try {
      runBatch(("a", 1.0), ("b", 2.0))
      def routedState(): Map[String, (Long, BigDecimal)] = {
        val df = MatViewRouter.definingQuery(spark, src, Seq("k"), "v")
        assert(df.inputFiles.nonEmpty &&
          df.inputFiles.forall(_.contains("/view/")),
          s"query did not route after a micro-batch: " +
            df.inputFiles.take(2).mkString(","))
        df.collect().map(r => r.getString(0) ->
          ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
      }
      assert(routedState() == Map("a" -> ((1L, BigDecimal("1.0"))),
        "b" -> ((1L, BigDecimal("2.0")))))
      // batch 2: the commit hook refreshes (delta-only) + re-registers —
      // the routed answer reflects the new rows with NO caller action
      runBatch(("a", 0.5), ("c", 3.0))
      assert(routedState() == Map("a" -> ((2L, BigDecimal("1.5"))),
        "b" -> ((1L, BigDecimal("2.0"))), "c" -> ((1L, BigDecimal("3.0")))))
      // batch 3, same again — staleness can never accumulate
      runBatch(("b", 4.0))
      assert(routedState()("b") == ((2L, BigDecimal("6.0"))))
    } finally {
      q.stop()
      MatViewAutoRefresh.unbind(src.root, mv.root)
      MatViewRouter.unregister(mv.root)
    }
  }

  test("manifest version cache: in-process commits invalidate; TTL " +
    "bounds external staleness (r15 #6)") {
    import graft.ingest.ManifestVersionCache
    val t = Files.createTempDirectory("graft_mvc_spec").toString
    val store = new ManifestStore(s"$t/s")
    store.append(spark, Seq(("a", 1.0)).toDF("k", "v"))
    val v1 = ManifestVersionCache.version(spark, store.root)
    assert(v1 == store.currentVersion(spark))
    val probesBefore = ManifestVersionCache.listings
    // cached: a second probe inside the TTL pays no listing
    assert(ManifestVersionCache.version(spark, store.root) == v1)
    assert(ManifestVersionCache.listings == probesBefore,
      "a warm probe paid a directory listing")
    // an in-process commit invalidates IMMEDIATELY (no TTL wait)
    store.append(spark, Seq(("b", 2.0)).toDF("k", "v"))
    assert(ManifestVersionCache.version(spark, store.root) == v1 + 1,
      "an in-process commit was invisible to the next probe")
    // TTL: with the window forced to zero, every probe re-lists (the
    // external-writer bound); restore afterwards
    val saved = ManifestVersionCache.ttlMs
    try {
      ManifestVersionCache.ttlMs = 0L
      val l0 = ManifestVersionCache.listings
      ManifestVersionCache.version(spark, store.root)
      ManifestVersionCache.version(spark, store.root)
      assert(ManifestVersionCache.listings >= l0 + 2,
        "ttl=0 probes did not re-list")
    } finally ManifestVersionCache.ttlMs = saved
  }
}
