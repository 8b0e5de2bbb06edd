package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{JoinMatView, ManifestStore, MatViewRouter}

/** Star-join matview: delta maintenance on the fact side, full
  * recompute on dim change, and routing with BOTH stores' freshness
  * enforced. */
class JoinMatViewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_jmv_$tag").toString

  private def factBatch(lo: Long, hi: Long) = (lo until hi)
    .map(i => (i, s"k${i % 5}", (i % 97).toDouble / 4))
    .toDF("id", "k", "value")

  private def dimRows(n: Int) = (0 until n)
    .map(i => (s"k$i", s"grp${i % 2}")).toDF("k", "label")

  private def direct(fact: ManifestStore, dim: ManifestStore) =
    fact.read(spark).get.join(dim.read(spark).get, Seq("k"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("vsum"))

  private def viewRows(v: JoinMatView) =
    v.state(spark).get.select("label", "n", "vsum")
      .orderBy("label").collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getDecimal(2)))

  private def directRows(fact: ManifestStore, dim: ManifestStore) =
    direct(fact, dim).orderBy("label").collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getDecimal(2)))

  test("refresh folds fact deltas against the current dim; a dim " +
    "change forces a full recompute; both watermarks tracked") {
    val root = fresh("maint")
    val fact = new ManifestStore(s"$root/fact")
    val dim = new ManifestStore(s"$root/dim")
    val jmv = new JoinMatView(s"$root/view", Seq("label"), "value",
      Seq("k"))
    dim.append(spark, dimRows(5))
    fact.append(spark, factBatch(0, 200), rangeCol = Some("id"))
    jmv.refresh(spark, fact, dim)
    assert(viewRows(jmv) == directRows(fact, dim))
    // fact delta only: partials fold (values equal the re-join)
    fact.append(spark, factBatch(200, 350), rangeCol = Some("id"))
    jmv.refresh(spark, fact, dim)
    assert(viewRows(jmv) == directRows(fact, dim))
    // unchanged stores: refresh is a no-op (same version, same rows)
    val before = jmv.state(spark).get.agg(max(col("as_of"))).head().getLong(0)
    jmv.refresh(spark, fact, dim)
    assert(jmv.state(spark).get.agg(max(col("as_of"))).head().getLong(0)
      == before)
    // DIM change relabels existing fact rows — delta maintenance is
    // impossible; refresh must fully recompute and still be exact
    dim.merge(spark, Seq(("k3", "grp-moved")).toDF("k", "label"),
      keyCols = Seq("k"))
    jmv.refresh(spark, fact, dim)
    assert(viewRows(jmv) == directRows(fact, dim))
    assert(viewRows(jmv).exists(_._1 == "grp-moved"))
    // fact rewrite (delete) → full recompute
    assert(fact.delete(spark, col("id") < 50L) == 50L)
    jmv.refresh(spark, fact, dim)
    assert(viewRows(jmv) == directRows(fact, dim))
  }

  test("routing: the join aggregate answers from the view; a commit to " +
    "EITHER store past registration disables it") {
    val root = fresh("route")
    val fact = new ManifestStore(s"$root/fact")
    val dim = new ManifestStore(s"$root/dim")
    val viewRoot = s"$root/view"
    val jmv = new JoinMatView(viewRoot, Seq("label"), "value", Seq("k"))
    dim.append(spark, dimRows(5))
    fact.append(spark, factBatch(0, 300), rangeCol = Some("id"))
    jmv.refresh(spark, fact, dim)
    assert(MatViewRouter.registerJoin(spark, viewRoot, fact, dim,
      Seq("label"), "value", Seq("k")))
    try {
      val routed = jmv.defining(spark, fact, dim)
      assert(routed.inputFiles.nonEmpty &&
        routed.inputFiles.forall(_.contains("/view/")),
        routed.inputFiles.take(3).mkString(","))
      // routed values == direct computation on a fresh (unrouted) pair
      assert(routed.orderBy("label").collect().map(_.toString).toSeq ==
        direct(fact, dim).orderBy("label").collect().map(_.toString).toSeq)
      // a FACT commit past registration → stale → scans the sources
      fact.append(spark, factBatch(300, 320), rangeCol = Some("id"))
      val afterFact = jmv.defining(spark, fact, dim)
      assert(afterFact.inputFiles.exists(_.contains("/fact/")),
        "stale-on-fact view kept routing")
      // re-align, re-register, then a DIM commit alone must also
      // disable routing (the round-15 multi-source freshness)
      jmv.refresh(spark, fact, dim)
      assert(MatViewRouter.registerJoin(spark, viewRoot, fact, dim,
        Seq("label"), "value", Seq("k")))
      assert(jmv.defining(spark, fact, dim).inputFiles
        .forall(_.contains("/view/")))
      dim.merge(spark, Seq(("k0", "grp-x")).toDF("k", "label"),
        keyCols = Seq("k"))
      val afterDim = jmv.defining(spark, fact, dim)
      assert(afterDim.inputFiles.exists(_.contains("/fact/")),
        "stale-on-dim view kept routing")
      // and the unrouted answer reflects the new dim immediately
      assert(afterDim.orderBy("label").collect().map(_.toString).toSeq ==
        direct(fact, dim).orderBy("label").collect().map(_.toString).toSeq)
    } finally MatViewRouter.unregister(viewRoot)
  }

  test("rollup on the dim attribute routes; a group filter declines " +
    "(pushdown moves it inside the join) and answers correctly unrouted") {
    val root = fresh("rollup")
    val fact = new ManifestStore(s"$root/fact")
    val dim = new ManifestStore(s"$root/dim")
    val viewRoot = s"$root/view"
    // view groups by (label, k): label-only is a strict subset
    val jmv = new JoinMatView(viewRoot, Seq("label", "k"), "value",
      Seq("k"))
    dim.append(spark, dimRows(5))
    fact.append(spark, factBatch(0, 300), rangeCol = Some("id"))
    jmv.refresh(spark, fact, dim)
    assert(MatViewRouter.registerJoin(spark, viewRoot, fact, dim,
      Seq("label", "k"), "value", Seq("k")))
    try {
      val rolled = fact.read(spark).get.join(dim.read(spark).get, Seq("k"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
            .as("vsum"))
      assert(rolled.inputFiles.nonEmpty &&
        rolled.inputFiles.forall(_.contains("/view/")),
        rolled.inputFiles.take(3).mkString(","))
      assert(rolled.orderBy("label").collect().map(_.toString).toSeq ==
        direct(fact, dim).orderBy("label").collect().map(_.toString).toSeq)
      // a filter on the group column lands inside the join after
      // pushdown — the candidate core no longer matches; the query
      // scans and stays correct (decline, never a wrong answer)
      val filtered = fact.read(spark).get.join(dim.read(spark).get, Seq("k"))
        .filter(col("label") === "grp0")
        .groupBy("label")
        .agg(count(lit(1)).as("n"))
      assert(filtered.inputFiles.exists(_.contains("/fact/")),
        "group-filtered join query must decline routing")
      assert(filtered.head().getLong(1) ==
        direct(fact, dim).filter(col("label") === "grp0").head()
          .getLong(1))
    } finally MatViewRouter.unregister(viewRoot)
  }
}
