package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{ManifestFileIndex, ManifestStore, Skipping}

/** Multi-column data skipping (round-12 verdict #5): per-file colStats
  * in the manifest, [[ManifestStore.readBox]] pruning, and the
  * `store_zorder_skipping` gate's structural guarantees. */
class SkippingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def grid(n: Int) =
    (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong * n + y, x.toLong, y.toLong)).toDF("id", "x", "y")

  private def fresh(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_skip_$tag").toString + "/store"

  test("colStats survive the manifest round-trip and prune readBox") {
    val store = new ManifestStore(fresh("roundtrip"))
    store.append(spark, grid(40), rangeCol = Some("id"),
      statsCols = Seq("x", "y"))
    // a SECOND ManifestStore instance re-parses the manifest from disk —
    // serialization, not in-memory state, is what's being proven
    val reread = new ManifestStore(store.root.toString)
    val stats = reread.currentColStats(spark)
    assert(stats.nonEmpty)
    assert(stats.forall { case (_, m) =>
      m.contains("x") && m.contains("y") },
      s"colStats missing columns: $stats")
    // range stats coexist with colStats on the same entries
    assert(reread.currentStatEntries(spark).forall(e =>
      e._2.isDefined && e._3.isDefined))
    // readBox through the re-parsed manifest equals a full-scan filter
    val box = reread.readBox(spark,
      Seq(("x", 10L, 14L), ("y", 20L, 24L))).get
    val expect = reread.read(spark).get
      .filter(col("x").between(10, 14) && col("y").between(20, 24))
    assert(box.orderBy("id").collect().toSeq ==
      expect.orderBy("id").collect().toSeq)
  }

  test("z-order compaction records colStats; box probe opens a fraction of files") {
    val store = new ManifestStore(fresh("zbox"))
    store.append(spark, grid(100), rangeCol = Some("id"))
    // pre-compaction: no colStats → a (x, y) box prunes nothing
    val all = store.currentFiles(spark).size
    assert(store.filesForBox(spark,
      Seq(("x", 40L, 49L), ("y", 40L, 49L))).size == all)
    val bytes = store.currentFiles(spark)
      .map(f => new java.io.File(f).length()).sum
    store.compact(spark, targetBytes = math.max(1L, bytes / 16),
      zorderBy = Seq("x", "y"))
    val total = store.currentFiles(spark).size
    assert(total >= 8, s"expected >=8 files, got $total")
    assert(store.currentColStats(spark).forall { case (_, m) =>
      m.contains("x") && m.contains("y") })
    val hit = store.filesForBox(spark, Seq(("x", 40L, 49L), ("y", 40L, 49L)))
    assert(hit.size * 2 <= total,
      s"10%x10% box opened ${hit.size} of $total files")
    // pruned read ≡ unpruned filter, value for value
    val got = store.readBox(spark, Seq(("x", 40L, 49L), ("y", 40L, 49L)))
      .get.agg(count(lit(1)), sum("id").cast("long")).head()
    val want = store.read(spark).get
      .filter(col("x").between(40, 49) && col("y").between(40, 49))
      .agg(count(lit(1)), sum("id").cast("long")).head()
    assert(got == want)
    assert(got.getLong(0) == 100L) // 10x10 box of the 100x100 grid
  }

  test("z-order clustering is deterministic and balanced (opt r1: exact cuts)") {
    // repartitionByRange's randomly-seeded boundary sampling jittered the
    // written layout per build (the store_skipping_auto tripwire moved
    // 7→13 of 25 files across identical builds) and carried the
    // guide-§2.5 retry hazard; partitionByZ cuts the bounded z domain on
    // an exact histogram instead — layout is a pure function of the data
    def layout() = graft.ops.ZOrder.cluster(grid(100), Seq("x", "y"), 16)
      .withColumn("_p", spark_partition_id())
      .groupBy("_p")
      .agg(count(lit(1)).as("n"), sum("id").as("ids"),
        min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val a = layout()
    val b = layout()
    assert(a.toSeq == b.toSeq, "two identical builds produced different layouts")
    // equi-depth cuts: no partition holds more than 2× the mean mass
    val counts = a.map(_(1).asInstanceOf[Long])
    assert(counts.sum == 100L * 100L)
    assert(counts.nonEmpty && counts.max * counts.length <= 2 * counts.sum,
      s"unbalanced z partitions: ${counts.mkString(",")}")
    // rank-bucket path is deterministic too
    def rankLayout() = graft.ops.ZOrder
      .cluster(grid(50), Seq("x", "y"), 8, rankBuckets = true)
      .withColumn("_p", spark_partition_id())
      .groupBy("_p").agg(count(lit(1)).as("n"), sum("id").as("ids"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rankLayout().toSeq == rankLayout().toSeq)
  }

  test("readBox is conservative: unknown column or statless files read fully") {
    val store = new ManifestStore(fresh("conservative"))
    store.append(spark, grid(20), rangeCol = Some("id"))
    // bound on a column with NO stats anywhere: zero pruning, right answer
    val got = store.readBox(spark, Seq(("x", 5L, 6L))).get.count()
    assert(got == 2 * 20)
    // a box that provably intersects nothing on the RANGE column → None
    assert(store.readBox(spark, Seq(("id", 100000L, 200000L))).isEmpty)
    // mixed store: one z-compacted commit (stats) + one raw append (none)
    store.compact(spark,
      targetBytes = math.max(1L, store.currentFiles(spark)
        .map(f => new java.io.File(f).length()).sum / 8),
      zorderBy = Seq("x", "y"))
    store.append(spark, grid(20).withColumn("id", col("id") + 1000L),
      rangeCol = Some("id"))
    val expect = store.read(spark).get
      .filter(col("x").between(3, 7) && col("y").between(3, 7)).count()
    assert(store.readBox(spark,
      Seq(("x", 3L, 7L), ("y", 3L, 7L))).get.count() == expect)
    // the statless commit's files are all kept (conservative), the
    // z-compacted commit's files prune
    val statless = store.currentColStats(spark).count(_._2.isEmpty)
    val hit = store.filesForBox(spark, Seq(("x", 3L, 7L), ("y", 3L, 7L))).size
    assert(hit >= statless, "conservative read dropped a statless file")
    assert(hit < store.currentFiles(spark).size,
      "mixed store pruned nothing at all")
  }

  test("delimiter-hostile column names degrade to no stats, never corrupt") {
    val df = (0L until 100L).map(i => (i, i % 10, i % 7))
      .toDF("id", "a=b", "c:d")
    val store = new ManifestStore(fresh("hostile"))
    store.append(spark, df, rangeCol = Some("id"),
      statsCols = Seq("a=b", "c:d"))
    // nothing recorded for unencodable names; manifest still parses
    val reread = new ManifestStore(store.root.toString)
    assert(reread.currentColStats(spark).forall(_._2.isEmpty))
    assert(reread.read(spark).get.count() == 100)
    // bounds on those columns are answered correctly (just unpruned)
    assert(reread.readBox(spark, Seq(("a=b", 3L, 4L))).get.count() == 20)
  }

  test("graft_store_box TVF: SQL probe plans exactly the pruned file set") {
    val store = new ManifestStore(fresh("tvfbox"))
    store.append(spark, grid(100), rangeCol = Some("id"))
    val bytes = store.currentFiles(spark)
      .map(f => new java.io.File(f).length()).sum
    store.compact(spark, targetBytes = math.max(1L, bytes / 16),
      zorderBy = Seq("x", "y"))
    graft.codec.GraftFunctions.register(spark)
    val sql = spark.sql(s"SELECT * FROM graft_store_box('${store.root}', " +
      "'x', 40, 49, 'y', 40, 49)")
    // same rows as the API, and the plan holds only the pruned files
    val api = store.readBox(spark, Seq(("x", 40L, 49L), ("y", 40L, 49L))).get
    assert(sql.orderBy("id").collect().toSeq ==
      api.orderBy("id").collect().toSeq)
    val pruned = store.filesForBox(spark,
      Seq(("x", 40L, 49L), ("y", 40L, 49L))).size
    assert(sql.inputFiles.length == pruned &&
      pruned < store.currentFiles(spark).size)
    // malformed arity rejects loudly
    intercept[Exception](spark.sql(
      s"SELECT * FROM graft_store_box('${store.root}', 'x', 1)").collect())
  }

  test("store_zorder_skipping gate matches a direct computation at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = Skipping.storeZorderSkipping(spark, dir).collect().toSeq
    val (elo, ehi, ulo, uhi) = Skipping.probeBounds(spark, dir)
    val want = Tables.load(spark, dir, "events")
      .filter(col("event_id").between(elo, ehi) &&
        col("user_id").between(ulo, uhi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("a provably-empty box is an empty result at the store schema, not an error") {
    // r13 ADVICE #1: the same valid SQL must not error or succeed
    // depending on whether file stats happened to prove emptiness
    val store = new ManifestStore(fresh("emptybox"))
    store.append(spark, grid(20), rangeCol = Some("id"),
      statsCols = Seq("x", "y"))
    // the probe box lies entirely outside every file's stat rectangle
    assert(store.readBox(spark, Seq(("x", 1000L, 2000L))).isEmpty,
      "readBox keeps its provably-empty → None contract")
    val empty = store.readBoxOrEmpty(spark, Seq(("x", 1000L, 2000L))).get
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "x", "y"),
      "empty-box result must carry the snapshot schema")
    graft.codec.GraftFunctions.register(spark)
    // SQL surface: zero rows, aggregates still answer
    val n = spark.sql("SELECT count(*) AS n FROM graft_store_box(" +
      s"'${store.root}', 'x', 1000, 2000)").head().getLong(0)
    assert(n == 0L)
    // an overlapping box still answers through the same refactored path
    val n2 = spark.sql("SELECT count(*) AS n FROM graft_store_box(" +
      s"'${store.root}', 'x', 5, 5)").head().getLong(0)
    assert(n2 == 20L)
    // only a missing/empty STORE is an error
    intercept[Exception](spark.sql(
      s"SELECT * FROM graft_store_box('${fresh("absent")}', 'x', 1, 2)")
      .collect())
  }

  // the ONE shared traversal (graft.Plans) — a wrapper node handled in
  // one copy but not another would silently measure different counts
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long =
    Plans.filesRead(df)

  test("AUTOMATIC pruning: a plain BETWEEN filter opens the explicit box's file set") {
    // round-14 agenda #2: no readBox, no named box — the ordinary read
    // path must consult the manifest stats through the query's own
    // pushed-down predicates
    val store = new ManifestStore(fresh("autoprune"))
    store.append(spark, grid(100), rangeCol = Some("id"))
    val bytes = store.currentFiles(spark)
      .map(f => new java.io.File(f).length()).sum
    store.compact(spark, targetBytes = math.max(1L, bytes / 16),
      zorderBy = Seq("x", "y"))
    val total = store.currentFiles(spark).size
    val explicit = store.filesForBox(spark,
      Seq(("x", 40L, 49L), ("y", 40L, 49L))).size
    val implicitBox = store.read(spark).get
      .filter(col("x").between(40, 49) && col("y").between(40, 49))
    val read = filesRead(implicitBox)
    assert(read == explicit && read < total,
      s"implicit filter read $read files; explicit box opens $explicit of $total")
    // answers are EXACTLY the full-scan filter's (pruning is invisible)
    val viaBox = store.readBox(spark,
      Seq(("x", 40L, 49L), ("y", 40L, 49L))).get
    assert(implicitBox.orderBy("id").collect().toSeq ==
      viaBox.orderBy("id").collect().toSeq)
    // the RANGE column's stats prune automatically too (strict > / <
    // strengthen to closed integer bounds)
    val idMax = store.read(spark).get.agg(max("id")).head().getLong(0)
    val rangeFiles = store.filesForBox(spark, Seq(("id", 0L, idMax / 10))).size
    val viaFilter = store.read(spark).get
      .filter(col("id") < idMax / 10 + 1 && col("id") >= 0)
    assert(filesRead(viaFilter) == rangeFiles,
      "range-column stats must prune the plain read path")
    // an UNPRUNABLE predicate (OR at top level) conservatively reads all
    val orRead = filesRead(store.read(spark).get
      .filter(col("x") === 5 || col("y") === 7))
    assert(orRead == total, s"OR must not prune (read $orRead of $total)")
    // contradictory bounds prune everything, zero rows, no error
    val none = store.read(spark).get.filter(col("x") > 10 && col("x") < 5)
    assert(none.count() == 0L)
  }

  test("partitioned groups prune by partition AND stats in one manifest listing") {
    // the 100 TB fact-table probe shape: partition key + range window.
    // Through r13 partitioned groups fell back to the basePath read
    // (partition pruning only, every footer in the partition listed);
    // the partition-aware ManifestFileIndex composes both prunings.
    val store = new ManifestStore(fresh("partidx"))
    val df = (0L until 400L)
      .map(i => (i, s"p_${('a' + (i % 4).toInt).toChar}")).toDF("id", "k")
    store.append(spark, df.repartitionByRange(8, col("id")),
      partitionCols = Seq("k"), rangeCol = Some("id"))
    val total = store.currentFiles(spark).size
    assert(total >= 16, s"fixture too coarse: $total files")
    val expected = store.currentStatEntries(spark).count { case (rel, mn, mx) =>
      rel.contains("k=p_a") &&
        mn.forall(_ <= 99L) && mx.forall(_ >= 0L)
    }
    val probe = store.read(spark).get
      .filter(col("k") === "p_a" && col("id").between(0, 99))
    val read = filesRead(probe)
    assert(read == expected && read < total,
      s"partition+stats probe read $read files, expected $expected of $total")
    assert(probe.queryExecution.executedPlan.toString
      .contains("ManifestFileIndex"), "partitioned group did not take the index path")
    // answers are exactly the direct filter's
    assert(probe.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 100L).filter(_ % 4 == 0))
    // AMBIGUOUS partition values (digits-only would type non-string
    // under Spark's inference) fall back conservatively — same answers
    val store2 = new ManifestStore(fresh("partidx_num"))
    store2.append(spark, (0L until 40L).map(i => (i, (i % 3).toString))
      .toDF("id", "k"), partitionCols = Seq("k"), rangeCol = Some("id"))
    val p2 = store2.read(spark).get.filter(col("k") === 1 && col("id") < 10)
    assert(!p2.queryExecution.executedPlan.toString.contains("ManifestFileIndex"),
      "digits-valued partitions must fall back (type inference differs)")
    assert(p2.count() == (0L until 10L).count(_ % 3 == 1))
  }

  test("STRING stats: equality, range, and LIKE-prefix probes prune; manifest round-trips") {
    val store = new ManifestStore(fresh("strstats"))
    // four appends with disjoint sorted string ranges — plus delimiter-
    // hostile and non-ASCII values, which the hex encoding must carry
    val groups = Seq(
      Seq("alpha", "apple", "axe"),
      Seq("banana", "bridge", "butter"),
      Seq("cat", "cave", "crow"),
      Seq("d\tee;p=q:r", "door", "héllo"))
    groups.zipWithIndex.foreach { case (vals, g) =>
      store.append(spark,
        vals.zipWithIndex.map { case (v, i) => (g * 10L + i, v) }
          .toDF("id", "s"),
        rangeCol = Some("id"), statsCols = Seq("s"))
    }
    // a SECOND instance re-parses the manifest: serialization evidence
    val reread = new ManifestStore(store.root)
    val total = reread.currentFiles(spark).size
    assert(total >= 4)
    // equality prunes to the owning group's files
    val eq = reread.read(spark).get.filter(col("s") === "cave")
    assert(Plans.filesRead(eq) < total, "string equality did not prune")
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(21L))
    // LIKE 'b%' pushes down as StartsWith: prefix window prunes
    val pre = reread.read(spark).get.filter(col("s").like("b%"))
    assert(Plans.filesRead(pre) < total, "LIKE-prefix did not prune")
    assert(pre.count() == 3)
    // BETWEEN strings prunes
    val rng = reread.read(spark).get.filter(col("s") >= "car" && col("s") <= "d")
    assert(Plans.filesRead(rng) < total, "string range did not prune")
    assert(rng.count() == 3)
    // delimiter-hostile + non-ASCII values answer exactly through the
    // hex round-trip
    assert(reread.read(spark).get.filter(col("s") === "d\tee;p=q:r")
      .count() == 1)
    assert(reread.read(spark).get.filter(col("s") === "héllo").count() == 1)
    // IN-list of strings prunes via its envelope
    val inq = reread.read(spark).get.filter(col("s").isin("axe", "apple"))
    assert(Plans.filesRead(inq) < total, "string IN did not prune")
    assert(inq.count() == 2)
  }

  test("string-stat truncation stays conservative; byte helpers are exact") {
    import graft.ingest.{ManifestFileIndex => MFI}
    import graft.ingest.{ManifestStore => MS}
    assert(MS.byteCompare(Seq[Byte](1, 2), Seq[Byte](1, 2)) == 0)
    assert(MS.byteCompare(Seq[Byte](-1), Seq[Byte](1)) > 0,
      "comparison must be UNSIGNED (0xff > 0x01)")
    assert(MS.byteCompare(Seq[Byte](1), Seq[Byte](1, 0)) < 0)
    // truncUpper rounds the last non-0xFF byte up; all-0xFF → unbounded
    val cap = MS.StrStatPrefix
    val long = Array.fill[Byte](cap + 8)('a'.toByte)
    assert(MS.truncUpper(long).get.last == ('a' + 1).toByte)
    assert(MS.truncUpper(Array.fill[Byte](cap + 1)(-1)).isEmpty)
    assert(MS.truncUpper("short".getBytes("UTF-8")).get.toSeq ==
      "short".getBytes("UTF-8").toSeq, "untruncated max passes exactly")
    assert(MS.truncLower(long).length == cap)
    assert(MFI.prefixUpper(Seq[Byte]('a', -1)).get == Seq[Byte]('b'),
      "prefix successor must round the last non-0xFF byte")
    assert(MFI.prefixUpper(Seq[Byte](-1, -1)).isEmpty)
    // END-TO-END truncation: values sharing a >cap-byte prefix differ
    // only past the cap; the stat window degenerates but stays correct
    val store = new ManifestStore(fresh("strtrunc"))
    val base = "p" * (cap + 4)
    store.append(spark, Seq((1L, base + "aaa"), (2L, base + "zzz"))
      .toDF("id", "s"), rangeCol = Some("id"), statsCols = Seq("s"))
    store.append(spark, Seq((3L, "zz_other")).toDF("id", "s"),
      rangeCol = Some("id"), statsCols = Seq("s"))
    val hit = store.read(spark).get.filter(col("s") === (base + "zzz"))
    assert(hit.count() == 1, "truncated stats dropped a matching row")
    assert(store.read(spark).get.filter(col("s") === (base + "mmm"))
      .count() == 0)
  }

  test("boundsOf: only provable AND-ed integral comparisons contribute") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    val x = AttributeReference("x", LongType)()
    val y = AttributeReference("y", LongType)()
    def L(v: Long) = Literal(v, LongType)
    val b = ManifestFileIndex.boundsOf(Seq(
      And(GreaterThan(x, L(5)), LessThan(x, L(10))),
      GreaterThanOrEqual(y, L(0)), LessThanOrEqual(L(7), y)))
    assert(b("x") == (6L, 9L), s"strict bounds must strengthen: $b")
    assert(b("y") == (7L, Long.MaxValue), s"literal-first <= must flip: $b")
    // OR contributes nothing
    assert(ManifestFileIndex.boundsOf(Seq(
      Or(EqualTo(x, L(1)), EqualTo(x, L(2))))).isEmpty)
    // non-integral literals contribute nothing
    assert(ManifestFileIndex.boundsOf(Seq(
      GreaterThan(x, Literal(1.5)))).isEmpty)
    // IN-lists bound to their [min, max] envelope; InSet (the
    // optimizer's large-list form) likewise
    assert(ManifestFileIndex.boundsOf(Seq(
      In(x, Seq(L(7), L(3), L(11))))) == Map("x" -> (3L, 11L)))
    assert(ManifestFileIndex.boundsOf(Seq(
      InSet(x, Set[Any](9L, 2L, 5L)))) == Map("x" -> (2L, 9L)))
    // a non-integral member disables the whole list (conservative)
    assert(ManifestFileIndex.boundsOf(Seq(
      In(x, Seq(L(1), Literal("a"))))).isEmpty)
    // DateType literals compare in epoch days — same integers as the
    // footer's INT32 date statistics
    import org.apache.spark.sql.types.DateType
    val d = AttributeReference("d", DateType)()
    assert(ManifestFileIndex.boundsOf(Seq(
      GreaterThanOrEqual(d, Literal(19000, DateType)))) ==
      Map("d" -> (19000L, Long.MaxValue)))
  }

  test("INT32 stats (int/date columns) record and prune like long ones") {
    val store = new ManifestStore(fresh("int32"))
    val df = (0 until 400).map(i =>
      (i.toLong, i / 100, java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(19000L + i / 50))))
      .toDF("id", "bucket", "day")
    store.append(spark, df.repartitionByRange(8, col("id")),
      rangeCol = Some("id"), statsCols = Seq("bucket", "day"))
    val stats = store.currentColStats(spark)
    assert(stats.nonEmpty && stats.forall { case (_, m) =>
      m.contains("bucket") && m.contains("day") },
      s"INT32 columns missing from colStats: $stats")
    val total = store.currentFiles(spark).size
    // int-column probe prunes
    val bucketProbe = store.read(spark).get.filter(col("bucket") === 0)
    assert(filesRead(bucketProbe) < total, "int-column stats did not prune")
    assert(bucketProbe.count() == 100)
    // date-column probe prunes (epoch-day arithmetic on both sides)
    val dayProbe = store.read(spark).get
      .filter(col("day") < java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(19002L)))
    assert(filesRead(dayProbe) < total, "date-column stats did not prune")
    assert(dayProbe.count() == 100)
    // IN-list probe prunes via its [min, max] envelope
    val inProbe = store.read(spark).get.filter(col("id").isin(3L, 7L, 11L))
    assert(filesRead(inProbe) < total, "IN-list did not prune")
    assert(inProbe.count() == 3)
  }

  test("DECIMAL stats: scale-aware pruning; the 12.34-as-1234 regression " +
    "keeps its file (r15 #4)") {
    val store = new ManifestStore(fresh("decstats"))
    def dec(s: String) = new java.math.BigDecimal(s)
    // file 1 holds values ~12.34 (unscaled 12340000 at scale 6): a
    // [10, 20] VALUE probe must KEEP it — unscaled-vs-value confusion
    // (the r14 self-review class) would prune it and silently lose rows
    store.append(spark, Seq((1L, dec("12.34")), (2L, dec("15.00")))
      .toDF("id", "d").select(col("id"), col("d").cast("decimal(18,6)").as("d")),
      rangeCol = Some("id"), statsCols = Seq("d"))
    store.append(spark, Seq((3L, dec("2000.50")), (4L, dec("3000.25")))
      .toDF("id", "d").select(col("id"), col("d").cast("decimal(18,6)").as("d")),
      rangeCol = Some("id"), statsCols = Seq("d"))
    val total = store.currentFiles(spark).size
    assert(total >= 2)
    // a SECOND instance re-parses the manifest — the sixth field
    // (unscaled lo:hi@scale) survives the round-trip
    val reread = new ManifestStore(store.root.toString)
    val probeLow = reread.read(spark).get
      .filter(col("d").between(lit(dec("10")), lit(dec("20"))))
    assert(probeLow.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L), "scale-aware pruning LOST the 12.34 rows")
    val readLow = filesRead(probeLow)
    assert(readLow < total,
      s"low probe read $readLow of $total files - decimal stats did not prune")
    // the disjoint window prunes the low file and finds the high rows
    val probeHigh = reread.read(spark).get
      .filter(col("d") >= lit(dec("2000")))
    assert(probeHigh.count() == 2L)
    assert(filesRead(probeHigh) < total)
    // equality probe outside every file's window reads nothing
    val probeMiss = reread.read(spark).get
      .filter(col("d") === lit(dec("500.5")))
    assert(probeMiss.count() == 0L)
    assert(filesRead(probeMiss) == 0L,
      "a provably-dead decimal equality probe still opened files")
  }

  test("decBoundsOf: only provable decimal comparisons contribute; " +
    "widening casts qualify") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val d186 = DecimalType(18, 6)
    val a = AttributeReference("d", d186)()
    def decLit(s: String) = Literal.create(Decimal(s), DecimalType(12, 6))
    val b1 = ManifestFileIndex.decBoundsOf(Seq(
      GreaterThanOrEqual(a, decLit("10.5")), LessThan(a, decLit("20.25"))))
    assert(b1("d")._1.contains(BigDecimal("10.5")))
    assert(b1("d")._2.contains(BigDecimal("20.25"))) // strict widens: safe
    // a lossless widening cast of the attribute still contributes
    val b2 = ManifestFileIndex.decBoundsOf(Seq(
      GreaterThanOrEqual(Cast(a, DecimalType(19, 6)), decLit("7.25"))))
    assert(b2("d")._1.contains(BigDecimal("7.25")))
    // a NARROWING cast can change values — contributes nothing
    val b3 = ManifestFileIndex.decBoundsOf(Seq(
      GreaterThanOrEqual(Cast(a, DecimalType(8, 2)), decLit("7.25"))))
    assert(b3.isEmpty)
    // OR never contributes
    val b4 = ManifestFileIndex.decBoundsOf(Seq(
      Or(GreaterThan(a, decLit("5")), LessThan(a, decLit("1")))))
    assert(b4.isEmpty)
  }

  test("TIMESTAMP stats: micros-normalized pruning; the semantics flag " +
    "guards instant vs wall-clock (r15)") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // end-to-end: an arrival-ordered NTZ stream, two time windows, a
    // window probe opens a strict subset and answers exactly
    val store = new ManifestStore(fresh("tsstats"))
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    val rows = Seq(
      (1L, ts("2024-01-01T00:00:00")), (2L, ts("2024-01-01T06:00:00")),
      (3L, ts("2024-02-01T00:00:00")), (4L, ts("2024-02-01T06:00:00")))
    val df = rows.toDF("id", "ts")
    store.append(spark, df.filter(col("id") <= 2), rangeCol = Some("id"),
      statsCols = Seq("ts"))
    store.append(spark, df.filter(col("id") > 2), rangeCol = Some("id"),
      statsCols = Seq("ts"))
    val total = store.currentFiles(spark).size
    // second instance re-parses the manifest: seventh field round-trips
    val reread = new ManifestStore(store.root.toString)
    val probe = reread.read(spark).get
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
    assert(probe.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L))
    assert(filesRead(probe) < total,
      "timestamp window probe did not prune the early file")
    val probeMiss = reread.read(spark).get
      .filter(col("ts") >= lit("2030-01-01 00:00:00").cast("timestamp_ntz"))
    assert(probeMiss.count() == 0L && filesRead(probeMiss) == 0L)

    // the semantics flag: a window that excludes the file prunes ONLY
    // when the predicate's timestamp type agrees with the file's
    // isAdjustedToUTC flag — an instant predicate over wall-clock stats
    // (or vice versa) keeps the file
    val st = new org.apache.hadoop.fs.FileStatus(10, false, 1, 1, 0,
      new org.apache.hadoop.fs.Path("/tmp/ts_fake.parquet"))
    def idxWith(utcFlag: Boolean) = new ManifestFileIndex(
      new org.apache.hadoop.fs.Path("/tmp"),
      Seq(graft.ingest.PrunableFile(st, Map.empty, Nil, Map.empty,
        Map.empty, Map("ts" -> ((1000L, 2000L, utcFlag))))))
    def kept(idx: ManifestFileIndex, pred: Expression) =
      idx.listFiles(Nil, Seq(pred)).map(_.files.length).sum
    val ntz = AttributeReference("ts", TimestampNTZType)()
    val utc = AttributeReference("ts", TimestampType)()
    // disjoint window, agreeing semantics → pruned
    assert(kept(idxWith(false),
      GreaterThanOrEqual(ntz, Literal(5000L, TimestampNTZType))) == 0)
    assert(kept(idxWith(true),
      GreaterThanOrEqual(utc, Literal(5000L, TimestampType))) == 0)
    // disjoint window, MISMATCHED semantics → kept (never compare
    // micros across instant/wall-clock)
    assert(kept(idxWith(true),
      GreaterThanOrEqual(ntz, Literal(5000L, TimestampNTZType))) == 1)
    assert(kept(idxWith(false),
      GreaterThanOrEqual(utc, Literal(5000L, TimestampType))) == 1)
    // overlapping window stays regardless
    assert(kept(idxWith(false),
      GreaterThanOrEqual(ntz, Literal(1500L, TimestampNTZType))) == 1)
  }

  test("compaction carries EVERY stat family forward: skipping survives " +
    "maintenance (r15 self-review)") {
    val store = new ManifestStore(fresh("carry"))
    def dec(s: String) = new java.math.BigDecimal(s)
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    val df = Seq(
      (1L, dec("12.34"), ts("2024-01-01T00:00:00"), "alpha"),
      (2L, dec("15.00"), ts("2024-01-02T00:00:00"), "bravo"),
      (3L, dec("2000.50"), ts("2024-06-01T00:00:00"), "mike"),
      (4L, dec("3000.25"), ts("2024-06-02T00:00:00"), "zulu"))
      .toDF("id", "d", "t", "s")
      .select(col("id"), col("d").cast("decimal(18,6)").as("d"),
        col("t"), col("s"))
    store.append(spark, df.filter(col("id") <= 2), rangeCol = Some("id"),
      statsCols = Seq("d", "t", "s"))
    store.append(spark, df.filter(col("id") > 2), rangeCol = Some("id"),
      statsCols = Seq("d", "t", "s"))
    store.compact(spark) // maintenance rewrite — no zorderBy
    val total = store.currentFiles(spark).size
    // behavior proof, independent of post-compact locality: a probe
    // OUTSIDE every file's window opens zero files for each family —
    // impossible if the rewrite dropped that family's stats
    val reread = new ManifestStore(store.root.toString)
    def reads(p: org.apache.spark.sql.DataFrame) = filesRead(p)
    assert(reads(reread.read(spark).get
      .filter(col("d") === lit(dec("99999.5")))) == 0L,
      s"decimal stats lost by compaction ($total files all read)")
    assert(reads(reread.read(spark).get
      .filter(col("t") >= lit("2030-01-01 00:00:00").cast("timestamp_ntz")))
      == 0L, "timestamp stats lost by compaction")
    assert(reads(reread.read(spark).get
      .filter(col("s") === "zzzz")) == 0L,
      "string stats lost by compaction")
    assert(reads(reread.read(spark).get
      .filter(col("id") > 100L)) == 0L,
      "int range stats lost by compaction")
    // contents intact and in-range probes still answer exactly
    assert(reread.read(spark).get.count() == 4L)
    assert(reread.read(spark).get
      .filter(col("d").between(lit(dec("10")), lit(dec("20"))))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("partitioned store: partition pruning AND string-prefix stats " +
    "compose in one listing (r15 #5)") {
    val store = new ManifestStore(fresh("partstr"))
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("event_type"), col("props"))
    // two props-range slices, each partitioned by event_type and
    // repartition(1) so every partition dir gets ONE file per slice —
    // file counts are then exact arithmetic
    val cut = "{\"k\": 5"
    store.append(spark, ev.filter(col("props") < cut).repartition(1),
      partitionCols = Seq("event_type"), rangeCol = Some("event_id"),
      statsCols = Seq("props"))
    store.append(spark, ev.filter(col("props") >= cut).repartition(1),
      partitionCols = Seq("event_type"), rangeCol = Some("event_id"),
      statsCols = Seq("props"))
    val types = ev.select("event_type").distinct().count()
    val total = store.currentFiles(spark).size
    assert(total == 2 * types, s"expected ${2 * types} files, got $total")
    // partition-only probe: both slices of one type
    val partOnly = store.read(spark).get.filter(col("event_type") === "click")
    assert(filesRead(partOnly) == 2L, "partition pruning alone broke")
    // string-only probe: one slice of every type
    val strOnly = store.read(spark).get.filter(col("props") >= "{\"k\": 7")
    assert(filesRead(strOnly) == types,
      s"string stats alone read ${filesRead(strOnly)}, expected $types")
    // composed: ONE file — both prunings in the same listing
    val both = store.read(spark).get
      .filter(col("event_type") === "click" && col("props") >= "{\"k\": 7")
    assert(filesRead(both) == 1L,
      s"composed probe read ${filesRead(both)} files, expected 1")
    assert(both.queryExecution.executedPlan.toString
      .contains("ManifestFileIndex"),
      "partitioned group did not take the index path")
    // value correctness: the composed probe equals the full-scan filter
    val expectRows = ev
      .filter(col("event_type") === "click" && col("props") >= "{\"k\": 7")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(both.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      expectRows)
  }

  test("NULL-COUNT stats: IS NOT NULL prunes all-null files, IS NULL " +
    "prunes null-free files; mixed files always kept") {
    val store = new ManifestStore(fresh("nulls"))
    val dense = (0L until 100L).map(i => (i, Some(s"v$i"))).toDF("id", "tag")
    val sparse = (100L until 200L)
      .map(i => (i, None: Option[String])).toDF("id", "tag")
    val mixed = (200L until 300L)
      .map(i => (i, if (i % 2 == 0) Some(s"v$i") else None)).toDF("id", "tag")
    store.append(spark, dense.repartition(1), rangeCol = Some("id"),
      statsCols = Seq("tag"))
    store.append(spark, sparse.repartition(1), rangeCol = Some("id"),
      statsCols = Seq("tag"))
    store.append(spark, mixed.repartition(1), rangeCol = Some("id"),
      statsCols = Seq("tag"))
    val total = store.currentFiles(spark).size
    assert(total == 3)
    // a SECOND instance re-parses the manifest — the eighth field
    // (nullCount:rowCount) survives the round-trip
    val reread = new ManifestStore(store.root.toString)
    val notNull = reread.read(spark).get.filter(col("tag").isNotNull)
    assert(filesRead(notNull) == 2L,
      s"IS NOT NULL read ${filesRead(notNull)} files, expected 2 " +
        "(the all-null file must prune)")
    assert(notNull.count() == 150L)
    val isNull = reread.read(spark).get.filter(col("tag").isNull)
    assert(filesRead(isNull) == 2L,
      s"IS NULL read ${filesRead(isNull)} files, expected 2 " +
        "(the null-free file must prune)")
    assert(isNull.count() == 150L)
    // the not-null side composes with ordinary predicates for free:
    // Spark pushes IsNotNull under any comparison filter
    val probe = reread.read(spark).get.filter(col("tag") >= "v")
    assert(filesRead(probe) <= 2L,
      "pushed IsNotNull did not prune the all-null file")
    // compaction carries the family (keys come from nullStats)
    store.compact(spark)
    val afterTotal = store.currentFiles(spark).size
    val after = new ManifestStore(store.root.toString).read(spark).get
    assert(after.count() == 300L)
    if (afterTotal == 1) {
      // single-file rewrite: nothing left to prune, values must hold
      assert(after.filter(col("tag").isNull).count() == 150L)
    }
  }

  test("DOUBLE stats: range probes prune; a NaN-bearing file degrades " +
    "statless and NaN rows are never lost (parquet-mr pin)") {
    val store = new ManifestStore(fresh("dbl"))
    val low = (0 until 100).map(i => (i.toLong, i / 100.0)).toDF("id", "v")
    val high = (100 until 200).map(i => (i.toLong, 1000.0 + i))
      .toDF("id", "v")
    // NaN file: parquet-mr 1.16 drops floating min/max entirely when a
    // NaN was written (hasNonNullValue=false) — the pin this whole
    // family's soundness rests on (a writer that recorded NaN-ignoring
    // finite bounds would make upper-bound pruning lose NaN rows,
    // because Spark orders NaN above every value)
    val withNan = Seq((200L, 5.5), (201L, Double.NaN), (202L, 7.25))
      .toDF("id", "v")
    store.append(spark, low.repartition(1), rangeCol = Some("id"),
      statsCols = Seq("v"))
    store.append(spark, high.repartition(1), rangeCol = Some("id"),
      statsCols = Seq("v"))
    store.append(spark, withNan.repartition(1), rangeCol = Some("id"),
      statsCols = Seq("v"))
    val total = store.currentFiles(spark).size
    assert(total == 3)
    val reread = new ManifestStore(store.root.toString)
    // the low window prunes the high file; the NaN file is statless so
    // it is KEPT (conservative) even though its finite values miss
    val lowProbe = reread.read(spark).get.filter(col("v") < lit(0.5))
    assert(filesRead(lowProbe) == 2L,
      s"double range probe read ${filesRead(lowProbe)} files, expected 2")
    assert(lowProbe.count() == 50L)
    // Spark's NaN-is-greatest ordering: x > 1e300 MATCHES the NaN row,
    // and the statless NaN file is exactly why no row is lost
    val hugeProbe = reread.read(spark).get.filter(col("v") > lit(1.0e300))
    assert(hugeProbe.count() == 1L, "the NaN row must satisfy x > 1e300")
    assert(filesRead(hugeProbe) < total.toLong,
      "clean files' finite maxima must prune the huge-bound probe")
    // equality with NaN: clean files prune, the NaN file answers
    val nanProbe = reread.read(spark).get
      .filter(col("v") === lit(Double.NaN))
    assert(nanProbe.count() == 1L)
    assert(filesRead(nanProbe) == 1L,
      s"= NaN read ${filesRead(nanProbe)} files, expected only the NaN file")
    // a dead window opens nothing among the stat-carrying files (the
    // statless NaN file is always kept)
    val deadProbe = reread.read(spark).get
      .filter(col("v").between(lit(400.0), lit(500.0)))
    assert(deadProbe.count() == 0L)
    assert(filesRead(deadProbe) == 1L,
      "a dead double window should keep only the statless NaN file")
  }

  test("dblBoundsOf: zero signs canonicalize, float widens exactly, " +
    "only provable shapes contribute") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val d = AttributeReference("v", DoubleType)()
    val fl = AttributeReference("f", FloatType)()
    // -0.0 probes canonicalize to +0.0 (Spark: -0.0 == 0.0) — a
    // +0.0-only file must NOT prune against an `= -0.0` probe
    val b0 = ManifestFileIndex.dblBoundsOf(Seq(
      EqualTo(d, Literal(-0.0, DoubleType))))
    assert(java.lang.Double.compare(b0("v")._1.get, 0.0) == 0 &&
      java.lang.Double.compare(b0("v")._2.get, 0.0) == 0,
      s"-0.0 probe did not canonicalize: $b0")
    // float attribute under the exact widening cast to double
    val b1 = ManifestFileIndex.dblBoundsOf(Seq(
      GreaterThanOrEqual(Cast(fl, DoubleType), Literal(2.5, DoubleType))))
    assert(b1("f")._1.contains(2.5))
    // strict comparisons widen to inclusive (conservative)
    val b2 = ManifestFileIndex.dblBoundsOf(Seq(
      LessThan(d, Literal(9.75, DoubleType))))
    assert(b2("v")._2.contains(9.75))
    // OR and non-floating comparisons contribute nothing
    assert(ManifestFileIndex.dblBoundsOf(Seq(Or(
      GreaterThan(d, Literal(5.0, DoubleType)),
      LessThan(d, Literal(1.0, DoubleType))))).isEmpty)
    // NaN literal bounds sort above every finite file max (Spark's
    // ordering) — both sides pin to NaN under Double.compare
    val bn = ManifestFileIndex.dblBoundsOf(Seq(
      EqualTo(d, Literal(Double.NaN, DoubleType))))
    assert(bn("v")._1.get.isNaN && bn("v")._2.get.isNaN)
  }

  test("BLOOM sidecar: point probes on an unclustered high-cardinality " +
    "column prune to the owning file; compaction re-indexes") {
    val store = new ManifestStore(fresh("bloom"))
    // arrival-ordered ingest: every file spans the whole key range
    // byte-wise (keys are hash-like), so min/max prefixes CANNOT prune —
    // exactly the tx_hash point-lookup shape
    def batch(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, f"k${(i * 2654435761L) % 100000}%05d-$i"))
      .toDF("id", "key")
    store.append(spark, batch(0, 250).repartition(1),
      rangeCol = Some("id"), bloomCols = Seq("key"))
    store.append(spark, batch(250, 500).repartition(1),
      rangeCol = Some("id"), bloomCols = Seq("key"))
    store.append(spark, batch(500, 750).repartition(1),
      rangeCol = Some("id"), bloomCols = Seq("key"))
    store.append(spark, batch(750, 1000).repartition(1),
      rangeCol = Some("id"), bloomCols = Seq("key"))
    val total = store.currentFiles(spark).size
    assert(total == 4)
    val reread = new ManifestStore(store.root.toString)
    // the key of row 600 lives only in file 3
    val target = f"k${(600L * 2654435761L) % 100000}%05d-600"
    val hit = reread.read(spark).get.filter(col("key") === target)
    assert(hit.count() == 1L)
    assert(filesRead(hit) < total.toLong,
      s"bloom point probe read ${filesRead(hit)} of $total files")
    // an absent key prunes everywhere (modulo deterministic FPs)
    val miss = reread.read(spark).get.filter(col("key") === "absent-key")
    assert(miss.count() == 0L)
    assert(filesRead(miss) < total.toLong,
      "an absent key should prune at least the non-FP files")
    // IN-list: keeps exactly the files holding any listed key
    val t2 = f"k${(20L * 2654435761L) % 100000}%05d-20"
    val inProbe = reread.read(spark).get.filter(col("key").isin(target, t2))
    assert(inProbe.count() == 2L)
    assert(filesRead(inProbe) < total.toLong)
    // long-typed point probes work through the same sidecar
    val storeL = new ManifestStore(fresh("bloomlong"))
    storeL.append(spark, (0L until 500L).map(i => (i, i * 7919L))
      .toDF("id", "h").repartition(2), bloomCols = Seq("h"))
    val lp = storeL.read(spark).get.filter(col("h") === lit(3L * 7919L))
    assert(lp.count() == 1L)
    assert(filesRead(lp) < storeL.currentFiles(spark).size.toLong)
    // compaction re-indexes the carried bloom columns
    store.compact(spark, targetBytes = 1L) // force multiple output files
    val total2 = store.currentFiles(spark).size
    val after = new ManifestStore(store.root.toString)
    val hit2 = after.read(spark).get.filter(col("key") === target)
    assert(hit2.count() == 1L)
    if (total2 >= 2)
      assert(filesRead(hit2) < total2.toLong,
        s"post-compaction probe read ${filesRead(hit2)} of $total2 files — " +
          "blooms were not re-indexed")
  }

  test("EVERY rewrite path carries stat families and blooms: " +
    "merge, delete, expire, overwriteRange (compaction-fix generalized)") {
    val store = new ManifestStore(fresh("rewrites"))
    def batch(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, f"s$i%03d", i / 10.0,
        f"h${(i * 2654435761L) % 100000}%05d"))
      .toDF("id", "s", "d", "key")
    store.append(spark, batch(0, 100).repartition(1), rangeCol = Some("id"),
      statsCols = Seq("s", "d"), bloomCols = Seq("key"))
    store.append(spark, batch(100, 200).repartition(1), rangeCol = Some("id"),
      statsCols = Seq("s", "d"), bloomCols = Seq("key"))

    // after each rewrite, dead-window probes on every family must open
    // ZERO files and a live bloom point probe must still prune —
    // impossible if the rewrite published statless/bloomless entries
    def assertFamiliesAlive(tag: String): Unit = {
      val rd = new ManifestStore(store.root.toString)
      def reads(p: org.apache.spark.sql.DataFrame) = filesRead(p)
      assert(reads(rd.read(spark).get.filter(col("s") === "zzzz")) == 0L,
        s"$tag: string stats lost by the rewrite")
      assert(reads(rd.read(spark).get.filter(col("d") > lit(1.0e9))) == 0L,
        s"$tag: double stats lost by the rewrite")
      assert(reads(rd.read(spark).get.filter(col("id") > lit(100000L))) == 0L,
        s"$tag: int range stats lost by the rewrite")
      // an ABSENT key must open ZERO files: a rewritten file that lost
      // its bloom would be conservatively kept and break this exactly
      // (a live-key probe could still prune via the other files' blooms
      // and mask the loss)
      assert(reads(rd.read(spark).get
        .filter(col("key") === "no-such-key-anywhere")) == 0L,
        s"$tag: bloom sidecar lost by the rewrite")
    }

    // MERGE rewrites the hit file (id 77 survives the later expire(20))
    store.merge(spark, Seq((77L, "s077", 7.7, "updated-key"))
      .toDF("id", "s", "d", "key"), keyCols = Seq("id"))
    assertFamiliesAlive("merge")
    // DELETE rewrites the hit file
    assert(store.delete(spark, col("id") === 150L) == 1L)
    assertFamiliesAlive("delete")
    // OVERWRITE-RANGE rewrites the overlapped window
    store.overwriteRange(spark, batch(40, 60), 40L, 59L, rangeCol = "id")
    assertFamiliesAlive("overwriteRange")
    // EXPIRE rewrites the straddling file (cutoff inside file 1's range)
    val (_, rewritten) = store.expire(spark, 20L)
    assert(rewritten >= 1, "expire did not rewrite a straddler")
    assertFamiliesAlive("expire")
    // contents stay exact through the whole sequence
    val fin = new ManifestStore(store.root.toString).read(spark).get
    assert(fin.count() == 179L) // 200 - 20 expired - 1 deleted
    assert(fin.filter(col("id") === 77L).select("key").head.getString(0)
      == "updated-key")
  }

  test("bloomProbesOf: only same-type literal equality/IN shapes " +
    "contribute; conjuncts are independent requirements") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val s = AttributeReference("k", StringType)()
    def slit(v: String) = Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(v), StringType)
    val p1 = ManifestFileIndex.bloomProbesOf(Seq(EqualTo(s, slit("a"))))
    assert(p1("k").size == 1 && p1("k").head.size == 1)
    // the probe hash matches functions.xxhash64's seed-42 value
    val expected = XxHash64(Seq(slit("a")), 42L).eval(null)
    assert(p1("k").head.contains(expected.asInstanceOf[Long]))
    // two conjuncts → two independent requirement sets
    val p2 = ManifestFileIndex.bloomProbesOf(Seq(
      And(EqualTo(s, slit("a")), In(s, Seq(slit("b"), slit("c"))))))
    assert(p2("k").size == 2)
    // a cross-type comparison or OR contributes nothing
    assert(ManifestFileIndex.bloomProbesOf(Seq(
      Or(EqualTo(s, slit("a")), EqualTo(s, slit("b"))))).isEmpty)
    // range comparisons are not point probes
    assert(ManifestFileIndex.bloomProbesOf(Seq(
      GreaterThan(s, slit("a")))).isEmpty)
  }
}
