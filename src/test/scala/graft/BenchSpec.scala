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
}
