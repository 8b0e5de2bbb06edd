package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench's loud-failure contract: a throwing query gets NO wall
  * time (None, landing in the JSON's `failed` list and rc≠0), while
  * healthy queries are timed normally — a broken query can never post
  * a benchmark number again (the r7 lesson). */
class BenchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("a throwing query is recorded as failed, never as a time") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }),
      "broken_analysis" -> ((s, d) =>
        Tables.load(s, d, "events").selectExpr("no_such_column + 1")),
      "broken_runtime" -> ((s, _) => {
        import s.implicits._
        Seq("x").toDF("v").selectExpr("CAST(assert_true(v = 'y') AS STRING)")
      }))
    val timed = Bench.timedPass(spark, "/root/testdata/sf0.001", qs)
    assert(timed("ok_query").exists(_.wall >= 0.0))
    assert(timed("broken_analysis").isEmpty,
      "an analysis-broken query must not post a wall time")
    assert(timed("broken_runtime").isEmpty,
      "a runtime-failing query must not post a wall time")
    val failed = timed.collect { case (k, None) => k }.toSeq.sorted
    assert(failed == Seq("broken_analysis", "broken_runtime"))
  }

  private def qt(wall: Double, contended: Boolean = false, gc: Double = 0.0,
                 ioMs: Double = 1.0) = Some(Bench.QTime(wall, contended, gc, ioMs))

  test("per-pass JSON carries only succeeded queries, sorted, 3 dp") {
    val json = Bench.passJson(Map(
      "b_ok" -> qt(1.23456), "a_ok" -> qt(0.5, contended = true),
      "broken" -> None))
    assert(json == """{"a_ok":0.500,"b_ok":1.235}""",
      s"per-pass map malformed: $json")
  }

  test("contended markers surface per query, sorted") {
    val json = Bench.contendedJson(Map(
      "b_cont" -> qt(1.0, contended = true), "a_ok" -> qt(0.5),
      "a_cont" -> qt(2.0, contended = true), "broken" -> None))
    assert(json == """["a_cont","b_cont"]""", s"contended list malformed: $json")
  }

  test("interference channels: cpu/gc/io fire on their own evidence only") {
    assert(Bench.QTime(10.0, contended = false, gc = 0.1, ioMs = 5.0)
      .interference.isEmpty)
    assert(Bench.QTime(10.0, contended = true, gc = 0.1, ioMs = 5.0)
      .interference == Seq("cpu"))
    // gc fires above max(0.5s, 20% of wall): 3s of GC in a 10s window
    assert(Bench.QTime(10.0, contended = false, gc = 3.0, ioMs = 5.0)
      .interference == Seq("gc"))
    // a short window with trivial absolute GC does NOT fire (0.3s > 20%
    // of 1s but below the 0.5s floor)
    assert(Bench.QTime(1.0, contended = false, gc = 0.3, ioMs = 5.0)
      .interference.isEmpty)
    assert(Bench.QTime(10.0, contended = false, gc = 0.1, ioMs = 500.0)
      .interference == Seq("io"))
    val json = Bench.interferenceJson(Map(
      "slow_gc" -> qt(10.0, gc = 9.0), "clean" -> qt(1.0), "broken" -> None))
    assert(json == """{"slow_gc":["gc"]}""", s"interference map malformed: $json")
  }

  test("sf1 subset names are all declared gates (typo guard)") {
    val unknown = Bench.Sf1Queries -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"sf1 subset names not in SparkEntry: $unknown")
  }

  test("rerun rule: >2x uncontended pass swings are suspects; median-of-3") {
    val p1 = Map("swing" -> qt(13.4), "steady" -> qt(1.0),
      "contended_swing" -> qt(20.0, contended = true), "broken" -> None)
    val p2 = Map("swing" -> qt(58.9), "steady" -> qt(1.1),
      "contended_swing" -> qt(2.0), "broken" -> qt(1.0))
    // swing: 58.9/13.4 > 2x, both clean -> suspect. steady: 1.1x -> no.
    // contended_swing: the slow pass WAS cpu-contended -> already
    // explained, no rerun. broken: no p1 time -> not arbitrable.
    assert(Bench.suspectsOf(p1, p2) == Seq("swing"))
    assert(Bench.median3(13.4, 58.9, 13.6) == 13.6)
    assert(Bench.median3(58.9, 13.4, 13.6) == 13.6)
  }

  test("mergePasses: median-of-3 for suspects, conservative max on rerun failure, min otherwise") {
    val p1 = Map("swing" -> qt(13.4), "steady" -> qt(2.0),
      "lost" -> qt(30.0), "broken" -> (None: Option[Bench.QTime]))
    val p2 = Map("swing" -> qt(58.9), "steady" -> qt(1.0),
      "lost" -> qt(3.0), "broken" -> None)
    val p3 = Map("swing" -> qt(13.6), "lost" -> None) // lost's p3 FAILED
    val (merged, rerunFailed) = Bench.mergePasses(
      p1, Some(p2), Some(p3), suspects = Seq("swing", "lost"))
    assert(merged("swing").contains(13.6), "suspect must take the median")
    assert(merged("steady").contains(1.0), "non-suspect must take the min")
    assert(merged("lost").contains(30.0),
      "a suspect whose p3 failed must report the conservative MAX")
    assert(merged("broken").isEmpty)
    assert(rerunFailed == Seq("lost"))
    // single-pass degenerate form (the p1Total>900 skip path)
    val (solo, noFails) = Bench.mergePasses(p1, None, None, Nil)
    assert(solo("swing").contains(13.4) && noFails.isEmpty)
  }

  test("BuildLog: per-name sums, cost-descending, drain empties, records on failure") {
    import graft.ops.BuildLog
    BuildLog.drain() // isolate from builds other suites triggered
    BuildLog.record("idx_a", 2.0)
    BuildLog.record("idx_a", 1.0)
    BuildLog.record("idx_b", 0.5)
    val r = BuildLog.timed("timed_c") { 42 }
    assert(r == 42)
    intercept[RuntimeException] {
      BuildLog.timed("crashed_d") { throw new RuntimeException("boom") }
    }
    val drained = BuildLog.drain()
    val byName = drained.toMap
    assert(byName("idx_a") == 3.0, "same-name builds must sum")
    assert(byName("idx_b") == 0.5)
    assert(byName.contains("timed_c") && byName("timed_c") >= 0.0)
    assert(byName.contains("crashed_d"),
      "a crashed build burned real pass-1 wall and must still be attributed")
    assert(drained.head._1 == "idx_a", "must sort cost-descending")
    assert(BuildLog.drain().isEmpty, "drain must empty the registry")
  }
}
