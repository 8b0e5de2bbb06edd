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
    assert(timed("ok_query").exists(_._1 >= 0.0))
    assert(timed("broken_analysis").isEmpty,
      "an analysis-broken query must not post a wall time")
    assert(timed("broken_runtime").isEmpty,
      "a runtime-failing query must not post a wall time")
    val failed = timed.collect { case (k, None) => k }.toSeq.sorted
    assert(failed == Seq("broken_analysis", "broken_runtime"))
  }

  test("per-pass JSON carries only succeeded queries, sorted, 3 dp") {
    val json = Bench.passJson(Map(
      "b_ok" -> Some((1.23456, false)), "a_ok" -> Some((0.5, true)),
      "broken" -> None))
    assert(json == """{"a_ok":0.500,"b_ok":1.235}""",
      s"per-pass map malformed: $json")
  }

  test("contended markers surface per query, sorted") {
    val json = Bench.contendedJson(Map(
      "b_cont" -> Some((1.0, true)), "a_ok" -> Some((0.5, false)),
      "a_cont" -> Some((2.0, true)), "broken" -> None))
    assert(json == """["a_cont","b_cont"]""", s"contended list malformed: $json")
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
