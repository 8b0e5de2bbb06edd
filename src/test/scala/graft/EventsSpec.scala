package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Events

/** Behavioral analytics over events: sessionization against a by-hand
  * union-by-gap truth, funnel monotonicity + window honesty, retention
  * triangle invariants, hopping-window double coverage, rolling RANGE
  * frame vs a trailing walk, SCD2 interval tiling, interpolation
  * neighbor bounds. */
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

  test("rolling range frame matches a by-hand 24h trailing walk") {
    val got = Events.rollingRange(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    raw.groupBy(_._1).foreach { case (_, evs) =>
      evs.foreach { e =>
        val n = evs.count(o => o._3 <= e._3 && o._3 >= e._3 - 86400000L)
        assert(got((e._1, e._2)) == n.toLong,
          s"user ${e._1} event ${e._2}: 24h count")
      }
    }
    // the frame must discriminate (not all 1, not all full-history)
    assert(got.values.exists(_ > 1) && got.values.exists(_ == 1))
  }

  test("scd2: intervals tile each user's timeline, one current row") {
    val rows = Events.scd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (u, g0) =>
      val g = g0.sortBy(_._3)
      // exactly one open (current) interval per user, and it is the last
      assert(g.count(_._4.isEmpty) == 1)
      assert(g.last._4.isEmpty && g.last._5)
      // each interval closes exactly where the next opens
      g.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a._4.contains(b._3), s"user $u: gap in SCD2")
        // consecutive states differ (that is what made them intervals)
        assert(a._2 != b._2, s"user $u: non-change row")
      }
    }
  }

  test("interpolation: bounded by neighbors, exact at observations, null outside") {
    val got = Events.interpolate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val byUser = raw.groupBy(_._1)
    got.foreach { case ((u, g), v) =>
      val evs = byUser(u).sortBy(e => (e._3, e._2))
      val before = evs.filter(_._3 <= g)
      val after = evs.filter(_._3 > g)
      (before.lastOption, after.headOption) match {
        case (Some(a), _) if a._3 == g =>
          // exact hit: the last obs at that ms wins
          assert(v.contains(BigDecimal(a._4)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        case (Some(a), Some(b)) =>
          val x = v.get
          val (lo, hi) = (math.min(a._4, b._4), math.max(a._4, b._4))
          assert(x >= lo - 1e-6 && x <= hi + 1e-6,
            s"user $u grid $g: $x outside [$lo, $hi]")
        case _ => assert(v.isEmpty, s"user $u grid $g: expected NULL")
      }
    }
    assert(got.values.exists(_.isEmpty) || got.nonEmpty)
  }

  test("native session_window agrees with the SQL-window sessionization") {
    // same gap, two formulations: the native operator and the LAG +
    // running-sum chain must carve identical sessions (start, size)
    val native = Events.sessionWindow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val sqlform = Events.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(2))).toSet
    assert(native == sqlform)
    // and the native window end is last event + gap
    Events.sessionWindow(spark, dir).collect().foreach { r =>
      assert(r.getLong(2) > r.getLong(1))
    }
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
