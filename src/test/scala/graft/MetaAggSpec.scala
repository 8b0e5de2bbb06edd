package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{ManifestStore, MetaAgg}

/** Metadata-only aggregates: count(*)/count(col)/min/max over an
  * unfiltered store answered from the manifest (zero files opened),
  * with every conservative decline pinned. */
class MetaAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_meta_$tag").toString +
      "/store"

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long =
    Plans.filesRead(df)

  private def build(tag: String): ManifestStore = {
    val store = new ManifestStore(fresh(tag))
    def batch(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, i * 3 + 7, if (i % 4 == 0) None else Some(s"t$i")))
      .toDF("id", "uid", "tag")
    store.append(spark, batch(0, 100).repartition(2),
      rangeCol = Some("id"), statsCols = Seq("uid", "tag"))
    store.append(spark, batch(100, 250).repartition(2),
      rangeCol = Some("id"), statsCols = Seq("uid", "tag"))
    store
  }

  test("count(*), count(col), min, max answer from the manifest with " +
    "ZERO files opened; values equal the full scan") {
    val store = build("basic")
    val q = store.read(spark).get.agg(
      count(lit(1)).as("n"), count(col("tag")).as("nt"),
      min(col("id")).as("lo"), max(col("id")).as("hi"),
      min(col("uid")).as("ulo"), max(col("uid")).as("uhi"),
      (count(lit(1)) + lit(5L)).as("n5"))
    assert(filesRead(q) == 0L,
      s"metadata aggregate opened ${filesRead(q)} files")
    val r = q.head()
    assert(r.getLong(0) == 250L && r.getLong(1) == 250L - 63L) // 63 i%4==0
    assert(r.getLong(2) == 0L && r.getLong(3) == 249L)
    assert(r.getLong(4) == 7L && r.getLong(5) == 249L * 3 + 7)
    assert(r.getLong(6) == 255L)
    // the optimized plan really has no file relation left underneath —
    // every leaf is the one-row relation the rule spliced in
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    assert(q.queryExecution.optimizedPlan
      .collect { case l: LogicalRelation => l }.isEmpty,
      q.queryExecution.optimizedPlan.toString)
  }

  test("declines conservatively: filters, grouping, distinct, " +
    "agg-FILTER, non-integral min, and statless columns all scan") {
    val store = build("decline")
    val rd = store.read(spark).get
    val total = store.currentFiles(spark).size.toLong
    // a Filter between the aggregate and the leaves kills the route
    // (even though this particular filter keeps every row)
    assert(filesRead(rd.filter(col("id") >= 0L)
      .agg(count(lit(1)).as("n"))) > 0L)
    // grouped aggregates never route
    assert(filesRead(rd.groupBy(col("uid") % 2).agg(count(lit(1)).as("n")))
      == total)
    // DISTINCT never routes
    assert(filesRead(rd.agg(countDistinct(col("uid")).as("n"))) == total)
    // min over a STRING column has no integral stats — scan (and the
    // mixed query's count must NOT be answered separately: one output
    // declining declines the whole aggregate)
    assert(filesRead(rd.agg(min(col("tag")).as("m"),
      count(lit(1)).as("n"))) == total)
    // sum is not a metadata aggregate
    assert(filesRead(rd.agg(sum(col("uid")).as("s"))) == total)
  }

  test("a statless commit disables exactly the missing fact: rows-only " +
    "append keeps count(*) routed but min/max scan") {
    val store = new ManifestStore(fresh("partial"))
    store.append(spark, (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1), rangeCol = Some("id"))
    // second commit WITHOUT a range column: no int stats for id
    store.append(spark, (50L until 80L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1))
    val rd = new ManifestStore(store.root.toString).read(spark).get
    val cnt = rd.agg(count(lit(1)).as("n"))
    assert(filesRead(cnt) == 0L, "rows are recorded on every append — " +
      "count(*) must still route")
    assert(cnt.head().getLong(0) == 80L)
    val mx = rd.agg(max(col("id")).as("m"))
    assert(filesRead(mx) > 0L, "id stats are missing in commit 2 — " +
      "max must scan")
    assert(mx.head().getLong(0) == 79L)
  }

  test("rewrites stay correct: delete and merge recompute rows; the " +
    "routed count tracks the store's true cardinality") {
    val store = build("rewrite")
    assert(store.delete(spark, col("id") === 10L || col("id") === 200L) == 2L)
    store.merge(spark, Seq((999L, 0L, Some("new")), (5L, 15L, Some("upd")))
      .toDF("id", "uid", "tag"), keyCols = Seq("id"))
    val rd = new ManifestStore(store.root.toString).read(spark).get
    val q = rd.agg(count(lit(1)).as("n"), max(col("id")).as("hi"))
    assert(filesRead(q) == 0L,
      "rows/stats must survive delete+merge rewrites")
    val r = q.head()
    assert(r.getLong(0) == 249L) // 250 - 2 deleted + 1 inserted
    assert(r.getLong(1) == 999L)
  }

  test("decimal and double min/max route from their stat families; " +
    "a NaN-bearing double column declines") {
    val store = new ManifestStore(fresh("typed"))
    // decimal(10,2) is INT64-backed in parquet (decStats qualify);
    // 7i/4 is exact at scale 2; d starts at 1/8 so no ±0.0 extreme
    val df = (0 until 120).map(i => (i.toLong, i * 7, (i + 1) / 8.0))
      .toDF("id", "raw", "d")
      .withColumn("dec",
        (col("raw").cast("decimal(10,2)") / lit(4)).cast("decimal(10,2)"))
      .select("id", "dec", "d")
    store.append(spark, df.repartition(2), rangeCol = Some("id"),
      statsCols = Seq("dec", "d"))
    val rd = new ManifestStore(store.root.toString).read(spark).get
    val q = rd.agg(min(col("dec")).as("dlo"), max(col("dec")).as("dhi"),
      min(col("d")).as("flo"), max(col("d")).as("fhi"))
    assert(filesRead(q) == 0L, "decimal/double extremes must route")
    val r = q.head()
    assert(r.getDecimal(0).compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(r.getDecimal(1).compareTo(
      new java.math.BigDecimal("208.25")) == 0) // 119*7/4
    assert(r.getDouble(2) == 0.125)
    assert(r.getDouble(3) == 15.0)
    // a ±0.0 extreme declines (sign provenance): min over values
    // including 0.0 scans instead of answering
    val zStore = new ManifestStore(fresh("typedzero"))
    zStore.append(spark, Seq((0L, 0.0), (1L, 2.5)).toDF("id", "v")
      .repartition(1), rangeCol = Some("id"), statsCols = Seq("v"))
    val zrd = new ManifestStore(zStore.root.toString).read(spark).get
    val zq = zrd.agg(min(col("v")).as("m"))
    assert(filesRead(zq) > 0L, "a 0.0 extreme must decline to a scan")
    assert(zq.head().getDouble(0) == 0.0)
    // NaN decline:
    val nanStore = new ManifestStore(fresh("typednan"))
    nanStore.append(spark, Seq((0L, 1.5), (1L, Double.NaN)).toDF("id", "v")
      .repartition(1), rangeCol = Some("id"), statsCols = Seq("v"))
    val nrd = new ManifestStore(nanStore.root.toString).read(spark).get
    val nq = nrd.agg(max(col("v")).as("m"))
    assert(filesRead(nq) > 0L, "NaN file has no stats — max must scan")
    assert(nq.head().getDouble(0).isNaN)
  }

  test("grouped metadata counts: GROUP BY partition column answers " +
    "from per-partition row sums; data-column grouping declines") {
    val store = new ManifestStore(fresh("grouped"))
    def batch(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, s"p${i % 3}", s"q${i % 2}", i * 2))
      .toDF("id", "pk", "qk", "v")
    store.append(spark, batch(0, 90), partitionCols = Seq("pk", "qk"),
      rangeCol = Some("id"))
    store.append(spark, batch(90, 200), partitionCols = Seq("pk", "qk"),
      rangeCol = Some("id"))
    val rd = new ManifestStore(store.root.toString).read(spark).get
    // full partition grouping
    val q = rd.groupBy(col("pk"), col("qk"))
      .agg(count(lit(1)).as("n"), (count(lit(1)) + lit(1L)).as("n1"))
    assert(filesRead(q) == 0L, "grouped count must route")
    val got = q.collect().map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getLong(3)))).toMap
    val want = (0L until 200L).groupBy(i => (s"p${i % 3}", s"q${i % 2}"))
      .view.mapValues(s => (s.size.toLong, s.size + 1L)).toMap
    assert(got == want)
    // SUBSET grouping merges partitions
    val sub = rd.groupBy(col("qk")).agg(count(lit(1)).as("n"))
    assert(filesRead(sub) == 0L, "subset grouping must route")
    assert(sub.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("q0" -> 100L, "q1" -> 100L))
    // grouping by a DATA column scans
    val data = rd.groupBy(col("v") % 5).agg(count(lit(1)).as("n"))
    assert(filesRead(data) > 0L)
    // a data-column aggregate inside a partition grouping scans too
    val mixed = rd.groupBy(col("pk")).agg(count(col("v")).as("n"))
    assert(filesRead(mixed) > 0L)
    // and values stay exact when it declines
    assert(mixed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .values.sum == 200L)
  }

  test("date columns route min/max at DateType") {
    val store = new ManifestStore(fresh("date"))
    val df = (0 until 60).map(i => (i.toLong, java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))))
      .toDF("id", "d")
    store.append(spark, df.repartition(2), rangeCol = Some("id"),
      statsCols = Seq("d"))
    val rd = new ManifestStore(store.root.toString).read(spark).get
    val q = rd.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    assert(filesRead(q) == 0L, "date min/max must route from int stats")
    val r = q.head()
    assert(r.getDate(0).toString == "2024-01-01")
    assert(r.getDate(1).toString == "2024-02-29")
  }
}
