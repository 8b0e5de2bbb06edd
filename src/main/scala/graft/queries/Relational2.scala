package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Relational operators beyond the reference's single query (SURVEY §2.3
  * "categories NOT present" — provided for engine completeness): rollup,
  * INTERSECT/EXCEPT, outer joins, scalar/IN subqueries with HAVING.
  * SQL-first via Catalyst; same determinism rules as Relational. */
object Relational2 {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  def q20Rollup(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")

  def q21SetOps(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT o_custkey AS k FROM orders
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    UNION
    (SELECT c_custkey FROM customer WHERE c_acctbal > 9000
     EXCEPT
     SELECT o_custkey FROM orders)
    ORDER BY k""")

  def q22OuterJoin(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey""")

  def q23ScalarSubquery(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.8 * (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM orders)
    ORDER BY o_orderkey""")

  def q24InSubqueryHaving(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3)
    ORDER BY c_custkey""")

  def q25LagLead(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT user_id, event_id,
      LAG(event_id) OVER w AS prev_id,
      LEAD(event_id) OVER w AS next_id,
      FIRST_VALUE(event_id) OVER w AS first_id,
      event_id - COALESCE(LAG(event_id) OVER w, event_id) AS gap
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id""")

  /** Sketch aggregates (HLL distinct, quantile) — approximate, so
    * rows-only in the driver gate (no cross-engine oracle); accuracy vs
    * exact is asserted in RelationalSpec. */
  def q26Sketches(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT l_returnflag,
      approx_count_distinct(l_orderkey) AS approx_orders,
      approx_percentile(l_quantity, 0.5) AS median_qty,
      element_at(approx_percentile(l_extendedprice, array(0.25, 0.75)), 1) AS price_p25,
      element_at(approx_percentile(l_extendedprice, array(0.25, 0.75)), 2) AS price_p75
    FROM lineitem GROUP BY 1 ORDER BY 1""")

  /** Tumbling time-window aggregation (the streaming-shaped groupBy in
    * batch). events.ts is a nanos long (Tables.load note) → converted to
    * a timestamp; window starts leave as epoch millis (timestamps in
    * outputs are a cross-engine hash hazard). */
  def q27TumblingWindow(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT unix_millis(window.start) AS win_start,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (SELECT timestamp_micros(ts div 1000) AS t, value FROM events)
    GROUP BY window(t, '6 hours')
    ORDER BY win_start""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_tumbling_window" -> (q27TumblingWindow _),
    "q25_lag_lead" -> (q25LagLead _),
    "q26_sketches" -> (q26Sketches _),
    "q20_rollup" -> (q20Rollup _),
    "q21_set_ops" -> (q21SetOps _),
    "q22_outer_join" -> (q22OuterJoin _),
    "q23_scalar_subquery" -> (q23ScalarSubquery _),
    "q24_in_subquery_having" -> (q24InSubqueryHaving _))

  val oracle: Map[String, String] = Map(
    "q27_tumbling_window" -> """
      SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS win_start,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1 ORDER BY 1""",
    "q25_lag_lead" -> """
      SELECT user_id, event_id,
        LAG(event_id) OVER w AS prev_id,
        LEAD(event_id) OVER w AS next_id,
        FIRST_VALUE(event_id) OVER w AS first_id,
        event_id - COALESCE(LAG(event_id) OVER w, event_id) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",
    "q20_rollup" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q21_set_ops" -> """
      SELECT o_custkey AS k FROM orders
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
      UNION
      (SELECT c_custkey FROM customer WHERE c_acctbal > 9000
       EXCEPT
       SELECT o_custkey FROM orders)
      ORDER BY k""",
    "q22_outer_join" -> """
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "q23_scalar_subquery" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.8 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM orders)
      ORDER BY o_orderkey""",
    "q24_in_subquery_having" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (
        SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3)
      ORDER BY c_custkey""")
}
