package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Further engine-completeness operators (SURVEY §2.3 "categories NOT
  * present" continued): grouping sets, exact interpolated percentiles,
  * ordered string aggregation, pivot, correlated EXISTS, frame-bounded
  * windows, and the rank family. Same determinism rules as Relational:
  * decimal-cast sums, total ORDER BY, explicit casts to match DuckDB. */
object Relational3 {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  def q29GroupingSets(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT o_orderstatus, o_orderpriority,
      CAST(grouping(o_orderstatus) AS INT) AS g_status,
      CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
    ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
             o_orderpriority NULLS FIRST""")

  /** Exact linear-interpolated percentiles (vs q26's approximate sketch).
    * Inputs go through DECIMAL(18,2) so both engines interpolate over
    * identical doubles; result rounded to 6 dp. */
  def q30PercentileCont(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT o_orderstatus,
      ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)), 6) AS p50,
      ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)), 6) AS p90
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")

  /** Deterministic string aggregation: distinct values, sorted, joined. */
  def q31StringAgg(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT o_orderstatus,
      array_join(sort_array(collect_set(o_orderpriority)), '|') AS prios,
      COUNT(DISTINCT o_orderpriority) AS n_prios
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")

  /** Pivot: order counts per customer-key bucket × status. DataFrame
    * `pivot()` with explicit values → stable column names. */
  def q32Pivot(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.registerAll(s, dir)
    s.table("orders")
      .groupBy(expr("CAST(o_custkey div 100 AS INT)").as("bucket"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("bucket"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy(col("bucket"))
  }

  def q33ExistsSubquery(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    ORDER BY c_custkey""")

  /** Frame-bounded sliding window (ROWS BETWEEN): decimal-cast sum so
    * DuckDB's segment-tree accumulation matches Spark's sequential one. */
  def q34SlidingFrame(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT user_id, event_id,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w3 AS DOUBLE) AS sliding_sum,
      COUNT(*) OVER w3 AS frame_n
    FROM events
    WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id""")

  def q35RankFamily(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT o_orderkey,
      RANK() OVER w AS rnk,
      DENSE_RANK() OVER w AS drnk,
      NTILE(4) OVER w AS quartile,
      ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
    ORDER BY o_orderkey""")

  /** Pure range join (no equi-key): 200 deterministic overlapping time
    * intervals derived from the events span, each counting/summing the
    * events it contains, via the banded equi-join rewrite
    * (ops/RangeJoin — never a nested loop). Oracle: DuckDB BETWEEN join
    * over the identically-derived intervals. Both sides band on epoch
    * nanos — [[Tables.tsEpochNs]] here, `epoch_ns(ts)` in DuckDB — which
    * is vintage-proof: correct over both the nanos-long and the
    * timestamp[us] fixture generations. */
  def q36RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.registerAll(s, dir)
    val ev = s.table("events").select(col("event_id"),
      Tables.tsEpochNs(col("ts")).as("ts_ns"), col("value"))
    val bounds = ev.agg(min("ts_ns").as("t0"), max("ts_ns").as("t1")).head()
    val (t0, t1) = (bounds.getLong(0), bounds.getLong(1))
    val span = (t1 - t0) / 200
    val iv = s.range(0, 200).select(col("id").as("iv_id"),
      (lit(t0) + col("id") * span).as("lo"),
      (lit(t0) + col("id") * span + (col("id") % 7 + 1) * (span / 2)).as("hi"))
    graft.ops.RangeJoin.pointInInterval(ev, "ts_ns", iv, "lo", "hi",
      bandWidth = math.max(span / 2, 1))
      .groupBy("iv_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
      .orderBy("iv_id")
  }

  /** Salted skew join (SURVEY "salting for skew", proven in a plan): the
    * derived key puts ~90% of lineitem rows on one HOT key — the single
    * hot key that swamps one task when a shuffle join co-locates on it.
    * [[graft.ops.Skew.saltedJoin]] spreads the hot key over 16
    * (key, salt) shuffle partitions and replicates the 2-row dimension
    * 16×; the result is provably identical to the plain join (the DuckDB
    * oracle). The merge hint forces the shuffle-join shape salting
    * targets — at warehouse scale the dimension side is often
    * broadcast-ineligible, which is exactly when AQE cannot help a
    * hash-partitioned hot key. */
  def q37SkewJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import s.implicits._
    Tables.registerAll(s, dir)
    val large = s.table("lineitem").select(
      when(pmod(col("l_orderkey"), lit(10)) < 9, lit("HOT"))
        .otherwise(lit("k9")).as("k"),
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val dim = Seq(("HOT", 3), ("k9", 9)).toDF("k", "w")
    graft.ops.Skew.saltedJoin(large, dim.hint("merge"), "k",
      col("l_orderkey") * lit(8) + col("l_linenumber"), 16)
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2)) * col("w"))
          .cast("double").as("weighted"))
      .orderBy("k")
  }

  /** Recursive CTE (Spark 4 native `WITH RECURSIVE`): bounded-depth
    * reachability over the customer↔supplier trade graph — per source
    * node the minimum hop count within 2 steps of node 3. The engine
    * iterates the recursive UNION exactly like DuckDB, so results
    * hash-match; the damped full-graph analogue is `graph_pagerank`. */
  def q39RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    // materialize the edge table ONCE: a CTE referenced inside the
    // recursion would re-run the join+distinct on every iteration.
    // The reverse direction is the SAME distinct pair set swapped, so
    // one join+distinct materializes and the union reads the checkpoint
    // twice — the previous form ran the orders⨝lineitem join+distinct
    // TWICE to build the two directions (2 exchanges+scans → 1).
    graft.Tables.registerAll(s, dir)
    s.sql("""
      SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey""")
      .localCheckpoint().createOrReplaceTempView("graft_trade_pairs")
    s.sql("""
      SELECT src, dst FROM graft_trade_pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM graft_trade_pairs""")
      .createOrReplaceTempView("graft_trade_edges")
    s.sql("""
      WITH RECURSIVE reach(node, dist) AS (
        SELECT CAST(3 AS BIGINT) AS node, 0 AS dist
        UNION ALL
        SELECT e.dst, r.dist + 1
        FROM reach r JOIN graft_trade_edges e ON r.node = e.src
        WHERE r.dist < 2)
      SELECT node, CAST(MIN(dist) AS BIGINT) AS d, COUNT(*) AS n_paths
      FROM reach GROUP BY node ORDER BY node""")
  }

  /** VARIANT (Spark 4's semi-structured type): `props` parsed once into
    * a variant, typed path extraction, grouped rollup — the
    * schema-on-read path for telemetry payloads (q19 is the legacy
    * string-path twin). */
  def q40Variant(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH v AS (
      SELECT event_id, event_type,
        variant_get(parse_json(props), '$.k', 'int') AS k
      FROM events)
    SELECT event_type, CAST(k % 10 AS INT) AS k_mod,
      COUNT(*) AS n, CAST(MIN(k) AS INT) AS min_k, CAST(MAX(k) AS INT) AS max_k
    FROM v GROUP BY event_type, k_mod
    ORDER BY event_type, k_mod""")

  /** RUNTIME BLOOM-FILTER JOIN PRUNING (`q46_runtime_bloom`) — the
    * 100 TB mechanism for shuffle joins with a selective build side:
    * Catalyst's InjectRuntimeFilter plants a bloom_filter_agg over the
    * filtered orders keys and a might_contain() predicate ON THE FACT
    * SCAN SIDE, so lineitem rows whose orderkey cannot match are
    * dropped BEFORE the join exchange — the shuffle carries survivors
    * only. At the test scale the planner's size thresholds would never
    * fire (creation side must be small, application side huge), so the
    * gate pins them on a PRIVATE session clone (the PageRank conf
    * discipline — global conf untouched) with broadcast disabled to
    * force the shuffle-join shape the filter exists for. The filter is
    * semantics-transparent: the result hash-matches the plain DuckDB
    * join; the PLANS.md section asserts the might_contain predicate
    * actually lands in the executed plan. */
  /** The bloom gate's conf-pinned session clone, memoized per parent
    * session: a FRESH clone per invocation defeated every session-keyed
    * metadata memo (table loads, view registration), re-paying the full
    * ten-table registration on each call. The pinned confs are constants,
    * set once at creation, so concurrent invocations sharing the clone
    * can never observe a conf mutation. */
  private val bloomSess = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, SparkSession]()

  def q46RuntimeBloom(s: SparkSession, dir: String): DataFrame = {
    val sess = bloomSess.computeIfAbsent(s, parent => {
      val c = parent.newSession()
      c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      c.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c
    })
    sql(sess, dir, """
      SELECT o_orderpriority,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'P'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_recursive_cte" -> (q39RecursiveCte _),
    "q40_variant" -> (q40Variant _),
    "q46_runtime_bloom" -> (q46RuntimeBloom _),
    "q37_skew_join" -> (q37SkewJoin _),
    "q36_range_join" -> (q36RangeJoin _),
    "q29_grouping_sets" -> (q29GroupingSets _),
    "q30_percentile_cont" -> (q30PercentileCont _),
    "q31_string_agg" -> (q31StringAgg _),
    "q32_pivot" -> (q32Pivot _),
    "q33_exists_subquery" -> (q33ExistsSubquery _),
    "q34_sliding_frame" -> (q34SlidingFrame _),
    "q35_rank_family" -> (q35RankFamily _))

  val oracle: Map[String, String] = Map(
    "q46_runtime_bloom" -> """
      SELECT o_orderpriority,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'P'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q39_recursive_cte" -> """
      WITH RECURSIVE ed AS (
        SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        UNION ALL
        SELECT DISTINCT 100000 + l_suppkey AS src, o_custkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      reach(node, dist) AS (
        SELECT CAST(3 AS BIGINT) AS node, 0 AS dist
        UNION ALL
        SELECT e.dst, r.dist + 1
        FROM reach r JOIN ed e ON r.node = e.src
        WHERE r.dist < 2)
      SELECT node, CAST(MIN(dist) AS BIGINT) AS d, COUNT(*) AS n_paths
      FROM reach GROUP BY node ORDER BY node""",
    "q40_variant" -> """
      WITH v AS (
        SELECT event_id, event_type,
          CAST(props->>'$.k' AS INT) AS k
        FROM events)
      SELECT event_type, CAST(k % 10 AS INT) AS k_mod,
        COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
      FROM v GROUP BY event_type, k_mod
      ORDER BY event_type, k_mod""",
    "q37_skew_join" -> """
      WITH large AS (
        SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'HOT' ELSE 'k9' END AS k,
               l_quantity
        FROM lineitem),
      dim AS (SELECT 'HOT' AS k, 3 AS w UNION ALL SELECT 'k9', 9)
      SELECT k, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * w) AS DOUBLE) AS weighted
      FROM large JOIN dim USING (k)
      GROUP BY k ORDER BY k""",
    "q36_range_join" -> """
      WITH bounds AS (
        SELECT MIN(epoch_ns(ts)) AS t0, MAX(epoch_ns(ts)) AS t1 FROM events),
      params AS (SELECT t0, (t1 - t0) // 200 AS span FROM bounds),
      iv AS (
        SELECT id AS iv_id, t0 + id*span AS lo,
               t0 + id*span + ((id % 7) + 1)*(span // 2) AS hi
        FROM params, (SELECT unnest(generate_series(0, 199)) AS id))
      SELECT iv_id, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM iv JOIN events e ON epoch_ns(e.ts) BETWEEN iv.lo AND iv.hi
      GROUP BY 1 ORDER BY 1""",
    "q29_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                              (o_orderstatus, o_orderpriority), ())
      ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
               o_orderpriority NULLS FIRST""",
    "q30_percentile_cont" -> """
      SELECT o_orderstatus,
        ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 0.5), 6) AS p50,
        ROUND(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 0.9), 6) AS p90
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q31_string_agg" -> """
      SELECT o_orderstatus,
        string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS prios,
        COUNT(DISTINCT o_orderpriority) AS n_prios
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q32_pivot" -> """
      SELECT CAST(o_custkey // 100 AS INT) AS bucket,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
      FROM orders GROUP BY 1 ORDER BY 1""",
    "q33_exists_subquery" -> """
      SELECT c_custkey, c_mktsegment FROM customer c
      WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      ORDER BY c_custkey""",
    "q34_sliding_frame" -> """
      SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w3 AS DOUBLE) AS sliding_sum,
        CAST(COUNT(*) OVER w3 AS BIGINT) AS frame_n
      FROM events
      WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",
    "q35_rank_family" -> """
      SELECT o_orderkey,
        CAST(RANK() OVER w AS BIGINT) AS rnk,
        CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        CAST(NTILE(4) OVER w AS INT) AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        ROUND(CUME_DIST() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
      ORDER BY o_orderkey""")
}
