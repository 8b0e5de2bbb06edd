package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Behavioral analytics over the events stream — the warehouse staples a
  * product team runs on an event table (sessionization, funnels,
  * retention cohorts, hopping windows). Engine completeness beyond the
  * reference's DeFi query (SURVEY §7.5): the reference's warehouse shape
  * (append-only event rows + SQL analytics on top) is exactly this
  * workload with different event names.
  *
  * All four are declarative SQL through Catalyst — windows partitioned
  * by user (150 at the fixture scale, millions in production: the
  * exchange keys on user_id and AQE coalesces), aggregates with
  * map-side partials, DECIMAL sums for cross-engine exactness,
  * timestamps exported as epoch millis (the Relational2 convention —
  * raw timestamps in outputs are a cross-engine hash hazard).
  */
object Events {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  /** Session gap: two events of one user more than this many seconds
    * apart start a new session. 8 h sits between the fixture's p25
    * (~3 h) and median (~7.4 h) per-user gap, so sessions mix
    * multi-event runs with singletons. */
  val SessionGapSec = 28800L

  /** Gap-based sessionization in batch — the classic two-window chain:
    * a LAG marks every gap > [[SessionGapSec]] as a session break, a
    * running SUM of breaks numbers the sessions, one aggregate rolls
    * each session up. Both windows and the final aggregate share the
    * user_id partitioning — ONE exchange end-to-end (the streaming
    * sibling is `Sessionize`/`flatMapGroupsWithState`, CorpusStreamSpec;
    * this is the same semantics replayable over the warehouse). */
  def sessionize(s: SparkSession, dir: String): DataFrame = sql(s, dir, s"""
    WITH brk AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN unix_millis(CAST(ts AS TIMESTAMP))
               - unix_millis(CAST(LAG(ts) OVER w AS TIMESTAMP))
             > ${SessionGapSec * 1000}
          OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, event_id, ts, value,
        SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS session_no
      FROM brk)
    SELECT user_id, session_no, COUNT(*) AS n_events,
      unix_millis(CAST(MIN(ts) AS TIMESTAMP)) AS start_ms,
      unix_millis(CAST(MAX(ts) AS TIMESTAMP)) AS end_ms,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no""")

  /** Conversion window for each funnel step ([[funnel]]): the next step
    * must land within 12 h of the previous one — without it the dense
    * fixture converts every user and the funnel stops discriminating
    * (12 h ⇒ 150 → 37 → 7 at sf0.01). */
  val FunnelWindowMs = 43200000L

  /** Ordered-funnel analysis: view → click → purchase, each step's
    * timestamp the MIN inside (prev, prev + [[FunnelWindowMs]]] —
    * min_if aggregates per user, no self-join, no window function:
    * per-step converted-user counts. The per-user pivot is one hash
    * aggregate; the step ordering is plain scalar logic on the three
    * firsts, and every join keys on user_id. */
  def funnel(s: SparkSession, dir: String): DataFrame = sql(s, dir, s"""
    WITH t AS (
      SELECT user_id, event_type,
        unix_millis(CAST(ts AS TIMESTAMP)) AS ms
      FROM events WHERE event_type IN ('view', 'click', 'purchase')),
    u AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ms END) AS t1
      FROM t GROUP BY user_id),
    u2 AS (
      SELECT t.user_id, u.t1,
        MIN(CASE WHEN t.event_type = 'click' AND t.ms > u.t1
          AND t.ms <= u.t1 + $FunnelWindowMs THEN t.ms END) AS t2
      FROM t JOIN u ON t.user_id = u.user_id
      GROUP BY t.user_id, u.t1),
    u3 AS (
      SELECT t.user_id, u2.t1, u2.t2,
        MIN(CASE WHEN t.event_type = 'purchase' AND t.ms > u2.t2
          AND t.ms <= u2.t2 + $FunnelWindowMs THEN t.ms END) AS t3
      FROM t JOIN u2 ON t.user_id = u2.user_id
      GROUP BY t.user_id, u2.t1, u2.t2)
    SELECT
      COUNT(t1) AS n_view,
      COUNT(t2) AS n_view_click,
      COUNT(t3) AS n_view_click_purchase
    FROM u3""")

  /** Weekly retention cohorts: users grouped by first-seen week, counted
    * once per (cohort, week-offset) they were active in — the classic
    * triangle. Two aggregates (first-seen, distinct activity) joined on
    * user_id, then one rollup keyed (cohort, offset); at scale both
    * aggregates pre-combine map-side and the join keys on user_id. */
  def retention(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH act AS (
      SELECT DISTINCT user_id,
        unix_millis(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS wk_ms
      FROM events),
    first AS (
      SELECT user_id, MIN(wk_ms) AS cohort_ms FROM act GROUP BY user_id)
    SELECT f.cohort_ms,
      CAST((a.wk_ms - f.cohort_ms) DIV 604800000 AS BIGINT) AS week_offset,
      COUNT(*) AS n_users
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY f.cohort_ms, week_offset
    ORDER BY f.cohort_ms, week_offset""")

  /** Hopping (sliding) time window: 6-hour windows advancing every
    * 3 hours — every event lands in exactly two. Spark's native
    * `window(ts, width, hop)` generates the per-row window instances
    * (map-side expand, no join); the aggregate is a plain hash agg on
    * the window start. */
  def hoppingWindow(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT unix_millis(CAST(window.start AS TIMESTAMP)) AS win_start,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (SELECT ts AS t, value FROM events)
    GROUP BY window(t, '6 hours', '3 hours')
    ORDER BY win_start""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sessionize" -> (sessionize _),
    "events_funnel" -> (funnel _),
    "events_retention" -> (retention _),
    "events_hopping_window" -> (hoppingWindow _))

  val oracle: Map[String, String] = Map(
    "events_sessionize" -> s"""
      WITH brk AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w)
               > ${SessionGapSec * 1000}
            OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, event_id, ts, value,
          SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_no
        FROM brk)
      SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        COUNT(*) AS n_events,
        epoch_ms(MIN(ts)) AS start_ms,
        epoch_ms(MAX(ts)) AS end_ms,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM sess
      GROUP BY user_id, session_no
      ORDER BY user_id, session_no""",
    "events_funnel" -> s"""
      WITH t AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ms
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      u AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ms END) AS t1
        FROM t GROUP BY user_id),
      u2 AS (
        SELECT t.user_id, u.t1,
          MIN(CASE WHEN t.event_type = 'click' AND t.ms > u.t1
            AND t.ms <= u.t1 + $FunnelWindowMs THEN t.ms END) AS t2
        FROM t JOIN u ON t.user_id = u.user_id
        GROUP BY t.user_id, u.t1),
      u3 AS (
        SELECT t.user_id, u2.t1, u2.t2,
          MIN(CASE WHEN t.event_type = 'purchase' AND t.ms > u2.t2
            AND t.ms <= u2.t2 + $FunnelWindowMs THEN t.ms END) AS t3
        FROM t JOIN u2 ON t.user_id = u2.user_id
        GROUP BY t.user_id, u2.t1, u2.t2)
      SELECT
        COUNT(t1) AS n_view,
        COUNT(t2) AS n_view_click,
        COUNT(t3) AS n_view_click_purchase
      FROM u3""",
    "events_retention" -> """
      WITH act AS (
        SELECT DISTINCT user_id,
          epoch_ms(date_trunc('week', ts)) AS wk_ms
        FROM events),
      first AS (
        SELECT user_id, MIN(wk_ms) AS cohort_ms FROM act GROUP BY user_id)
      SELECT f.cohort_ms,
        (a.wk_ms - f.cohort_ms) // 604800000 AS week_offset,
        COUNT(*) AS n_users
      FROM act a JOIN first f ON a.user_id = f.user_id
      GROUP BY f.cohort_ms, week_offset
      ORDER BY f.cohort_ms, week_offset""",
    "events_hopping_window" -> """
      WITH inst AS (
        SELECT epoch_ms(time_bucket(INTERVAL '3 hours', ts))
            - k * 10800000 AS win_start,
          epoch_ms(ts) AS ms, value
        FROM events, unnest([0, 1]) u(k))
      SELECT win_start, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM inst
      WHERE ms >= win_start AND ms < win_start + 21600000
      GROUP BY win_start ORDER BY win_start""")
}
