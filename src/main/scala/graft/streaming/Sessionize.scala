package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: gap-based
  * sessionization of the events stream (SURVEY build-plan streaming item;
  * the stateful complement to ChainStream's stateless decode).
  *
  * A session closes when the next event for the user arrives more than
  * `gapMinutes` after the previous one (emitted immediately), or when the
  * event-time watermark passes last+gap (emitted on timeout). State per
  * key is one open session — bounded, watermark-evicted.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  def sessions(events: Dataset[Ev], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.last, s.n))
          } else {
            val sorted = evs.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch reference: same sessionization via gaps-and-islands SQL
    * (lag + running sum), for equivalence testing. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = gapMinutes * 60000L
    val w = Window.partitionBy("user_id").orderBy("ts_ms")
    events
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("prev", lag("ts_ms", 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_ms") - col("prev") > gapMs, 1).otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(w))
      .groupBy("user_id", "sess_id")
      .agg(min("ts_ms").as("start_ms"), max("ts_ms").as("end_ms"),
        count(lit(1)).cast("int").as("n_events"))
      .select("user_id", "start_ms", "end_ms", "n_events")
  }
}
