package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("picks the latest right row at or before each left time, per key") {
    val left = Seq(("a", 5L, "l1"), ("a", 10L, "l2"), ("a", 20L, "l3"),
      ("b", 7L, "l4"), ("c", 9L, "l5"))
      .toDF("k", "t", "payload")
    val right = Seq(("a", 5L, 50), ("a", 10L, 100), ("a", 15L, 150),
      ("b", 8L, 800))
      .toDF("k", "t", "v")
    val out = AsofJoin.leftAsof(left, right, "k", "t", Seq("v"))
      .select(col("payload"), col("asof.v"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    assert(out == Map(
      "l1" -> 50,   // equal time is visible (<= semantics)
      "l2" -> 100,  // latest of 50/100
      "l3" -> 150,  // right updates after left's previous row applied
      "l4" -> -1,   // right row exists but only after left time
      "l5" -> -1))  // key never seen on the right
  }

  test("plan is a windowed union — no nested-loop or range join") {
    val left = Seq(("a", 5L, 1)).toDF("k", "t", "x")
    val right = Seq(("a", 4L, 2)).toDF("k", "t", "v")
    val plan = AsofJoin.leftAsof(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") && plan.contains("Window"))
  }
}

/** Banded range join (ops/RangeJoin). */
class RangeJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("banded point-in-interval equals the naive inequality join") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 23L), (5L, 9999L))
      .toDF("pid", "t")
    val iv = Seq((100L, 0L, 10L), (200L, 8L, 20L), (300L, 21L, 22L))
      .toDF("iv_id", "lo", "hi")
    val banded = graft.ops.RangeJoin.pointInInterval(pts, "t", iv, "lo", "hi", 4L)
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(iv, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive && naive ==
      Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L)))
  }

  test("plan is an equi-join on the band key — no nested loop") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val iv = Seq((100L, 0L, 10L)).toDF("iv_id", "lo", "hi")
    val plan = graft.ops.RangeJoin.pointInInterval(pts, "t", iv, "lo", "hi", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in:\n$plan")
  }
}
