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

  /** Sketch aggregates (HLL distinct, quantile). Sketch values can't
    * hash-match another engine, so the gate asserts deterministic
    * error-bound flags instead: the exact values come along, and each
    * approximation must land within its bound (HLL ±15% = 3× its default
    * 5% rsd, percentiles within the exact p20–p30 / p70–p80 envelope).
    * The oracle computes the same exact values and expects every
    * flag = 1. */
  def q26Sketches(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH approx AS (
      SELECT l_returnflag,
        approx_count_distinct(l_orderkey) AS approx_orders,
        approx_percentile(l_extendedprice, 0.25) AS p25,
        approx_percentile(l_extendedprice, 0.75) AS p75
      FROM lineitem GROUP BY 1),
    exact AS (
      SELECT l_returnflag,
        COUNT(DISTINCT l_orderkey) AS exact_orders,
        percentile_cont(0.20) WITHIN GROUP (ORDER BY l_extendedprice) AS p20,
        percentile_cont(0.30) WITHIN GROUP (ORDER BY l_extendedprice) AS p30,
        percentile_cont(0.70) WITHIN GROUP (ORDER BY l_extendedprice) AS p70,
        percentile_cont(0.80) WITHIN GROUP (ORDER BY l_extendedprice) AS p80
      FROM lineitem GROUP BY 1)
    SELECT a.l_returnflag, e.exact_orders,
      CAST(ABS(a.approx_orders - e.exact_orders) <= 0.15 * e.exact_orders AS INT) AS hll_ok,
      CAST(a.p25 BETWEEN e.p20 AND e.p30 AS INT) AS p25_ok,
      CAST(a.p75 BETWEEN e.p70 AND e.p80 AS INT) AS p75_ok
    FROM approx a JOIN exact e ON a.l_returnflag = e.l_returnflag
    ORDER BY a.l_returnflag""")

  /** Tumbling time-window aggregation (the streaming-shaped groupBy in
    * batch). events.ts is the canonical NTZ timestamp (Tables.load);
    * window starts leave as epoch millis (timestamps in outputs are a
    * cross-engine hash hazard). The LTZ cast is identity under the UTC
    * session Tables.load pins, and unix_millis needs LTZ. */
  def q27TumblingWindow(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT unix_millis(CAST(window.start AS TIMESTAMP)) AS win_start,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (SELECT ts AS t, value FROM events)
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
    "q26_sketches" -> """
      SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        1 AS hll_ok, 1 AS p25_ok, 1 AS p75_ok
      FROM lineitem GROUP BY 1 ORDER BY 1""",
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
