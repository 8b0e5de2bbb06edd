package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Events

/** Behavioral analytics over events: sessionization against a by-hand
  * union-by-gap truth, funnel monotonicity + window honesty, retention
  * triangle invariants, hopping-window double coverage. */
class EventsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val raw: Seq[(Long, Long, Long, Double)] =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts").cast("timestamp")), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("sessionize matches a by-hand gap walk over every user") {
    val got = Events.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val truth = raw.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var sess = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue ||
          e._3 - prev > Events.SessionGapSec * 1000) sess += 1
        prev = e._3
        (sess, e)
      }
      tagged.groupBy(_._1).map { case (sno, g) =>
        (u, sno) -> ((g.size.toLong, g.map(_._2._3).min, g.map(_._2._3).max))
      }
    }
    assert(got == truth)
    // multi-event sessions AND singletons both occur
    assert(got.values.exists(_._1 > 1) && got.values.exists(_._1 == 1))
  }

  test("funnel: counts decrease down the steps; window honest") {
    val r = Events.funnel(spark, dir).head()
    val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(a >= b && b >= c, s"funnel must be monotone: $a, $b, $c")
    assert(a > 0 && c >= 0)
    // the 12h conversion window must actually cut someone (a dense
    // fixture converts everyone without it)
    assert(b < a, "conversion window produced no drop-off")
  }

  test("retention: offset-0 counts every cohort member exactly once") {
    val rows = Events.retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = raw.map(_._1).distinct.size.toLong
    // offset 0 is every user's first-seen week: summed over cohorts it
    // counts each user exactly once
    assert(rows.filter(_._2 == 0L).map(_._3).sum == users)
    // no offset exceeds its cohort's size
    val c0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (cms, _, n) => assert(n <= c0(cms)) }
  }

  test("hopping window: every event counted twice; totals reconcile") {
    val rows = Events.hoppingWindow(spark, dir).collect()
    val nTotal = rows.map(_.getLong(1)).sum
    assert(nTotal == 2L * raw.size, "6h/3h hop => each event in 2 windows")
    // consecutive window starts differ by the 3h hop
    val starts = rows.map(_.getLong(0)).sorted
    starts.sliding(2).foreach { case Array(x, y) =>
      assert((y - x) % 10800000L == 0L)
    }
  }
}
