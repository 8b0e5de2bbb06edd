package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Relational operator suite covering SURVEY.md §2.3 (Q1–Q19): scans,
  * filters, unions, hash aggregates, window functions (running / global /
  * ranking / LOCF), series generation, scalar math, classification, joins,
  * set ops, top-k, dates, strings, JSON.
  *
  * Each query has a DuckDB oracle (`oracle`) producing identical column
  * names, types and values. Determinism rules used throughout:
  *  - double sums are computed as exact DECIMAL sums and cast back to
  *    DOUBLE (summation order then cannot change the result);
  *  - every result has a total ORDER BY;
  *  - DuckDB wide integer results (HUGEINT sums, BIGINT year/length) are
  *    cast to match Spark's types.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- queries

  /** Q5/Q18: hash aggregate with exact decimal sums (TPC-H Q1 shape). */
  def q01Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast(DecimalType(22, 6)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q2/Q3: filter + projection; predicate and column pruning reach the
    * parquet scan (verified via explain: PushedFilters + 4-col ReadSchema). */
  def q02Filter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" < lit("1995-06-01").cast("timestamp") && $"l_discount" > 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Q4/Q16: positional UNION ALL with typed-null padding. */
  def q03UnionAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders").select(
      lit("order").as("src"), $"o_orderkey".as("k"),
      $"o_totalprice".as("v"), lit(null).cast("double").as("extra"))
    val l = t(s, dir, "lineitem").select(
      lit("line").as("src"), $"l_orderkey".as("k"),
      $"l_extendedprice".as("v"), $"l_discount".as("extra"))
    o.unionAll(l).orderBy($"src", $"k", $"v", asc_nulls_first("extra"))
  }

  /** Q9/Q10/Q11: per-key running sums (default RANGE frame) + conditional
    * aggregation + coalesce. */
  def q04WindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events").select(
      $"user_id", $"event_id",
      sum($"value".cast(DecimalType(18, 6))).over(w).cast("double").as("running_value"),
      sum(when($"event_type" === "click", 1).otherwise(0)).over(w).as("clicks_so_far"),
      coalesce(when($"event_type" === "purchase", $"value"), lit(0.0)).as("purchase_or_zero"))
      .orderBy($"user_id", $"event_id")
  }

  /** Q6: global (empty OVER) window aggregate — single-partition exchange. */
  def q05WindowGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy()
    t(s, dir, "nation").select(
      $"n_nationkey", $"n_name",
      max($"n_nationkey").over(w).as("max_key"),
      count(lit(1)).over(w).as("n_total"))
      .orderBy($"n_nationkey")
  }

  /** Q7: series generation (PG generate_series ≡ explode(sequence)). */
  def q06SeriesFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id")
      .agg(min($"event_id").as("first_id"), max($"event_id").as("last_id"))
      .select($"user_id", explode(sequence($"first_id", $"last_id", lit(100L))).as("d"))
      .orderBy($"user_id", $"d")
  }

  /** Q8: scalar math — power, sqrt, floor, modulo, affine. pow results are
    * rounded to 6 dp (libm vs java.lang.Math differ in the last ulp). */
  def q07ScalarMath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").select(
      $"event_id",
      round(pow(lit(1.0) + $"value" / 10000, 24) - 1, 6).as("apr"),
      sqrt($"value").as("root"),
      ($"value" * 2 + 1).as("affine"),
      ($"event_id" % 7).as("mod7"),
      floor($"value" / 10).cast("long").as("bucket"))
      .orderBy($"event_id")
  }

  /** Q13/Q14: integer bucketing (truncating div) + row_number desc, rk=1 —
    * the last-row-per-bucket pattern. */
  def q08BucketTop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", expr("event_id div 100"))
      .orderBy($"event_id".desc)
    t(s, dir, "events")
      .withColumn("dt", expr("CAST(event_id div 100 AS INT)"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"user_id", $"dt", $"event_id", $"value")
      .orderBy($"user_id", $"dt")
  }

  /** Q17/Q18/Q19: CASE/LIKE/IN classification + aggregate-of-aggregates. */
  def q09CaseClassify(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .withColumn("cat",
        when($"p_type".like("PROMO%"), "promo")
          .when($"p_type".isin("ECONOMY", "MEDIUM"), "cheap")
          .when($"p_brand".like("Brand#1%"), "brand1x")
          .otherwise("other"))
      .groupBy($"cat")
      .agg(
        count(lit(1)).as("n"),
        sum($"p_retailprice".cast(DecimalType(18, 2))).cast("double").as("total_price"),
        min($"p_size").as("min_size"),
        max($"p_size").as("max_size"))
      .orderBy($"cat")
  }

  /** 4-way star join; nation/region/customer are broadcast by Catalyst
    * (dimension-sized), lineitem⋈orders shuffles on the fact key. */
  def q10JoinStar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    val n = broadcast(t(s, dir, "nation"))
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(n, $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast(DecimalType(22, 6)))
          .cast("double").as("revenue"))
      .orderBy($"n_name")
  }

  /** Anti join: customers with no orders. */
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Top-k: total order + limit (Spark TakeOrderedAndProject). */
  def q12TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** DISTINCT (hash aggregate w/o agg functions). */
  def q13Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderstatus", $"o_orderpriority")
      .distinct()
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  /** Q12 + gaps-and-islands LOCF: carry the last purchase value forward. */
  def q14Locf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wRun = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sparse = t(s, dir, "events").select(
      $"user_id", $"event_id", $"ts",
      when($"event_type" === "purchase", $"value").as("v"),
      sum(when($"event_type" === "purchase", 1).otherwise(0)).over(wRun).as("grp"))
    sparse.select(
      $"user_id", $"event_id",
      max($"v").over(Window.partitionBy($"user_id", $"grp")).as("locf_v"))
      .orderBy($"user_id", $"event_id")
  }

  /** Aggregate stats: count distinct, min/max, exact decimal mean. */
  def q15AggStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        countDistinct($"l_orderkey").as("n_orders"),
        (sum($"l_quantity".cast(DecimalType(18, 2))).cast("double") / count(lit(1)))
          .as("avg_qty"))
      .orderBy($"l_returnflag")
  }

  /** Date functions: year/month extraction + monthly rollup. */
  def q16Dates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"))
      .agg(
        count(lit(1)).as("n"),
        sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy($"y", $"m")
  }

  /** String functions: upper, substring, length, concat, regexp_replace. */
  def q18Strings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select(
      $"c_custkey",
      upper($"c_name").as("uname"),
      substring($"c_mktsegment", 1, 3).as("seg3"),
      length($"c_name").cast("int").as("name_len"),
      concat($"c_mktsegment", lit("-"), $"c_name").as("tagged"),
      regexp_replace($"c_name", "[0-9]+", "#").as("depersonalized"))
      .orderBy($"c_custkey")
  }

  /** JSON extraction from the events.props payload column. */
  def q19Json(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").select(
      $"event_id",
      get_json_object($"props", "$.k").cast("int").as("k"))
      .orderBy($"event_id")
  }

  /** Q1..Q19 composed: the full assets_per_type.sql operator chain
    * (reference: queries/makerdao/assets_per_type.sql:1-79) transplanted
    * onto the events table — 8 chained CTEs: filtered 3-way UNION ALL,
    * group min/max, global window, series fill, per-key running sums,
    * gaps-and-islands LOCF, bucket + row_number desc + rk=1, CASE
    * classification, final aggregate-of-aggregates.
    * x^4 is computed by an explicit multiplication chain so the float
    * result is bit-identical across engines (pow() is libm-dependent). */
  def q17AssetsShape(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(assetsShapeSql)
  }

  /** The same flagship chain with ONLY the events table registered —
    * for fixture dirs that ship just events (the sf1 LINEAR scale tier,
    * which holds the ilk set fixed while the block span grows 10×: the
    * reference's production scaling axis, where the series fill grows
    * linearly instead of ilks × span). */
  def q17AssetsShapeEventsOnly(s: SparkSession, dir: String): DataFrame = {
    Tables.registerOne(s, dir, "events")
    s.sql(assetsShapeSql)
  }

  /** The flagship chain with the per-row 3 dp rounding expressed as an
    * ENGINE-NEUTRAL bridge — `FLOOR(x*1000 + 0.5)` over integral
    * thousandths — instead of `ROUND(double, 3)`. Every double upstream
    * is bit-identical across engines (the chain is pure IEEE arithmetic
    * over the same inputs); the ONLY cross-engine divergence q17 has is
    * the round-to-3dp IMPLEMENTATION (Spark rounds the shortest decimal
    * representation HALF_UP, DuckDB rounds the binary value), which puts
    * values landing exactly on the .0005 grid — common here, because
    * dart/rate are exact 3/4 dp decimals so debt is an exact 7 dp
    * decimal — on a knife edge (measured at the sf1 linear tier: 379 of
    * 49 964 rows off by exactly ±0.001, both directions). FLOOR, `*`,
    * and `+` are all single IEEE ops both engines evaluate identically,
    * so the bridge makes the gate hash-exact AT ANY SCALE while keeping
    * the identical plan shape (one scalar expression swapped). Reads
    * only `events`, so it runs unchanged on the events-only linear
    * fixture. */
  def q17AssetsLinear(s: SparkSession, dir: String): DataFrame = {
    Tables.registerOne(s, dir, "events")
    s.sql(assetsLinearSql)
  }

  /** Final rollup with per-row ROUND(x, 3) — the literal reference
    * shape; dialect-shared (the text is valid Spark AND DuckDB SQL). */
  private val assetsFinalRound = """
      SELECT dt, collateral,
        CAST(SUM(CAST(ROUND(asset, 3) AS DECIMAL(30,3))) AS DOUBLE) AS asset,
        CAST(SUM(CAST(ROUND(annual_revenues, 3) AS DECIMAL(30,3))) AS DOUBLE) AS annual_revenues,
        CAST(SUM(CAST(ROUND(annual_revenues, 3) AS DECIMAL(30,3))) AS DOUBLE)
          / CAST(SUM(CAST(ROUND(asset, 3) AS DECIMAL(30,3))) AS DOUBLE) AS blended_rate
      FROM group_by_cat
      GROUP BY 1, 2
      ORDER BY 1 DESC, 2"""

  /** Final rollup with the engine-neutral rounding bridge (see
    * [[q17AssetsLinear]]): integral thousandths via FLOOR(x*1000+0.5)
    * (pure IEEE ops), summed exactly in DECIMAL(30,0); blended_rate is
    * the ratio of the thousandths sums (the /1000 cancels), so every
    * output value is derived from engine-identical integers. Dialect-
    * shared text. */
  private val assetsFinalBridge = """
      SELECT dt, collateral,
        CAST(SUM(CAST(FLOOR(asset * 1000 + 0.5) AS DECIMAL(30,0))) AS DOUBLE) / 1000 AS asset,
        CAST(SUM(CAST(FLOOR(annual_revenues * 1000 + 0.5) AS DECIMAL(30,0))) AS DOUBLE) / 1000 AS annual_revenues,
        CAST(SUM(CAST(FLOOR(annual_revenues * 1000 + 0.5) AS DECIMAL(30,0))) AS DOUBLE)
          / CAST(SUM(CAST(FLOOR(asset * 1000 + 0.5) AS DECIMAL(30,0))) AS DOUBLE) AS blended_rate
      FROM group_by_cat
      GROUP BY 1, 2
      ORDER BY 1 DESC, 2"""

  private[graft] lazy val assetsShapeSql = assetsShapeCtes + assetsFinalRound
  private[graft] lazy val assetsLinearSql = assetsShapeCtes + assetsFinalBridge

  private val assetsShapeCtes = """
      WITH lending_assets_1 AS (
        SELECT user_id AS ilk, event_id AS block_number, value AS dart,
               CAST(NULL AS DOUBLE) AS rate
        FROM events WHERE event_type = 'purchase' AND value <> 0.0
        UNION ALL
        SELECT user_id, event_id, value, 0.0 FROM events
        WHERE event_type = 'click' AND value <> 0.0
        UNION ALL
        SELECT user_id, event_id, CAST(NULL AS DOUBLE), value FROM events
        WHERE event_type = 'view' AND value <> 0.0
      ),
      ilks AS (
        SELECT ilk, MIN(block_number) AS starting_use, MAX(block_number) AS end_use
        FROM lending_assets_1 GROUP BY ilk
      ),
      ilks_2 AS (
        SELECT ilk, starting_use, MAX(end_use) OVER () AS end_use FROM ilks
      ),
      noop_filling AS (
        SELECT ilk, d AS block_number, CAST(NULL AS DOUBLE) AS dart,
               CAST(NULL AS DOUBLE) AS rate, CAST(NULL AS DOUBLE) AS sf
        FROM ilks_2
        LATERAL VIEW explode(sequence(starting_use, end_use, 100)) ser AS d
      ),
      rates_x AS (
        SELECT event_id AS block_number, user_id AS ilk, 1 + value/1e6 AS x
        FROM events WHERE event_type = 'signup'
      ),
      rates_x2 AS (SELECT block_number, ilk, x*x AS x2 FROM rates_x),
      rates AS (SELECT block_number, ilk, x2*x2 - 1 AS sf FROM rates_x2),
      with_filling AS (
        SELECT ilk, block_number, dart, rate, CAST(NULL AS DOUBLE) AS sf
        FROM lending_assets_1
        UNION ALL
        SELECT ilk, block_number, dart, rate, sf FROM noop_filling
        UNION ALL
        SELECT ilk, block_number, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), sf
        FROM rates
      ),
      lending_assets_2 AS (
        SELECT ilk, block_number,
          COALESCE(1 + CAST(SUM(CAST(rate AS DECIMAL(18,6))) OVER w AS DOUBLE)/100, 1) AS rate,
          CAST(SUM(CAST(dart AS DECIMAL(18,6))) OVER w AS DOUBLE)/10 AS dart,
          SUM(CASE WHEN sf IS NOT NULL THEN 1 ELSE 0 END) OVER w AS sf_grp,
          sf
        FROM with_filling
        WINDOW w AS (PARTITION BY ilk ORDER BY block_number ASC)
      ),
      with_rk AS (
        SELECT CAST(block_number div 100 AS INT) AS dt,
          CONCAT('ILK-', CAST(ilk AS STRING)) AS collateral,
          dart*rate AS debt,
          MAX(sf) OVER (PARTITION BY ilk, sf_grp) AS sf,
          ROW_NUMBER() OVER (PARTITION BY ilk, block_number div 100
                             ORDER BY block_number DESC) AS rk
        FROM lending_assets_2
      ),
      group_by AS (
        SELECT dt, collateral, debt, sf, debt*sf AS annual_revenues
        FROM with_rk WHERE rk = 1 AND debt <> 0.0
      ),
      group_by_cat AS (
        SELECT dt,
          CASE WHEN collateral LIKE 'ILK-1%' AND collateral <> 'ILK-1' THEN 'RWA'
               WHEN collateral IN ('ILK-0','ILK-1','ILK-2') THEN 'Stablecoins'
               WHEN collateral IN ('ILK-3','ILK-4','ILK-5') THEN 'ETH'
               WHEN collateral IN ('ILK-6','ILK-7') THEN 'WBTC'
               ELSE 'Others' END AS collateral,
          debt AS asset, annual_revenues
        FROM group_by
      )"""

  // ----------------------------------------------------------------- maps

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q01Agg _),
    "q02_filter_pushdown" -> (q02Filter _),
    "q03_union_all" -> (q03UnionAll _),
    "q04_window_running" -> (q04WindowRunning _),
    "q05_window_global" -> (q05WindowGlobal _),
    "q06_series_fill" -> (q06SeriesFill _),
    "q07_scalar_math" -> (q07ScalarMath _),
    "q08_bucket_top" -> (q08BucketTop _),
    "q09_case_classify" -> (q09CaseClassify _),
    "q10_join_star" -> (q10JoinStar _),
    "q11_anti_join" -> (q11AntiJoin _),
    "q12_topk" -> (q12TopK _),
    "q13_distinct" -> (q13Distinct _),
    "q14_locf" -> (q14Locf _),
    "q15_agg_stats" -> (q15AggStats _),
    "q16_dates" -> (q16Dates _),
    "q17_assets_shape" -> (q17AssetsShape _),
    "q17_assets_linear" -> (q17AssetsLinear _),
    "q18_strings" -> (q18Strings _),
    "q19_json" -> (q19Json _))

  // lazy: composes private vals declared later in the file (the q17
  // CTE/final-select split) — eager init would read them as null
  lazy val oracle: Map[String, String] = Map(
    "q01_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_filter_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00' AND l_discount > 0.05
      ORDER BY l_orderkey, l_linenumber""",
    "q03_union_all" -> """
      SELECT 'order' AS src, o_orderkey AS k, o_totalprice AS v, CAST(NULL AS DOUBLE) AS extra FROM orders
      UNION ALL
      SELECT 'line', l_orderkey, l_extendedprice, l_discount FROM lineitem
      ORDER BY src, k, v, extra NULLS FIRST""",
    "q04_window_running" -> """
      SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS clicks_so_far,
        COALESCE(CASE WHEN event_type = 'purchase' THEN value END, 0.0) AS purchase_or_zero
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",
    "q05_window_global" -> """
      SELECT n_nationkey, n_name,
        MAX(n_nationkey) OVER () AS max_key,
        COUNT(*) OVER () AS n_total
      FROM nation ORDER BY n_nationkey""",
    "q06_series_fill" -> """
      SELECT user_id, unnest(generate_series(first_id, last_id, 100)) AS d
      FROM (SELECT user_id, MIN(event_id) AS first_id, MAX(event_id) AS last_id
            FROM events GROUP BY 1)
      ORDER BY user_id, d""",
    "q07_scalar_math" -> """
      SELECT event_id,
        ROUND(POWER(1.0 + value/10000, 24) - 1, 6) AS apr,
        SQRT(value) AS root,
        value*2 + 1 AS affine,
        event_id % 7 AS mod7,
        CAST(FLOOR(value/10) AS BIGINT) AS bucket
      FROM events ORDER BY event_id""",
    "q08_bucket_top" -> """
      SELECT user_id, dt, event_id, value FROM (
        SELECT user_id, CAST(event_id // 100 AS INT) AS dt, event_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_id // 100
                             ORDER BY event_id DESC) AS rk
        FROM events)
      WHERE rk = 1 ORDER BY user_id, dt""",
    "q09_case_classify" -> """
      SELECT CASE WHEN p_type LIKE 'PROMO%' THEN 'promo'
                  WHEN p_type IN ('ECONOMY','MEDIUM') THEN 'cheap'
                  WHEN p_brand LIKE 'Brand#1%' THEN 'brand1x'
                  ELSE 'other' END AS cat,
        COUNT(*) AS n,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        MIN(p_size) AS min_size,
        MAX(p_size) AS max_size
      FROM part GROUP BY 1 ORDER BY 1""",
    "q10_join_star" -> """
      SELECT n_name, COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1""",
    "q11_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",
    "q12_topk" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q13_distinct" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY 1, 2""",
    "q14_locf" -> """
      SELECT user_id, event_id,
        MAX(v) OVER (PARTITION BY user_id, grp) AS locf_v
      FROM (
        SELECT user_id, event_id,
          CASE WHEN event_type = 'purchase' THEN value END AS v,
          SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
        FROM events)
      ORDER BY user_id, event_id""",
    "q15_agg_stats" -> """
      SELECT l_returnflag,
        MIN(l_quantity) AS min_qty,
        MAX(l_quantity) AS max_qty,
        COUNT(DISTINCT l_orderkey) AS n_orders,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q16_dates" -> """
      SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    "q17_assets_shape" -> (assetsShapeOracleCtes + assetsFinalRound),
    "q17_assets_linear" -> (assetsShapeOracleCtes + assetsFinalBridge),
  ) ++ oracle2

  /** DuckDB-dialect form of [[assetsShapeCtes]] (unnest/generate_series,
    * `//` integer division, VARCHAR). The two FINAL selects are
    * dialect-shared and appended per gate. */
  private val assetsShapeOracleCtes = """
      WITH lending_assets_1 AS (
        SELECT user_id AS ilk, event_id AS block_number, value AS dart,
               CAST(NULL AS DOUBLE) AS rate
        FROM events WHERE event_type = 'purchase' AND value <> 0.0
        UNION ALL
        SELECT user_id, event_id, value, 0.0 FROM events
        WHERE event_type = 'click' AND value <> 0.0
        UNION ALL
        SELECT user_id, event_id, CAST(NULL AS DOUBLE), value FROM events
        WHERE event_type = 'view' AND value <> 0.0
      ),
      ilks AS (
        SELECT ilk, MIN(block_number) AS starting_use, MAX(block_number) AS end_use
        FROM lending_assets_1 GROUP BY ilk
      ),
      ilks_2 AS (
        SELECT ilk, starting_use, MAX(end_use) OVER () AS end_use FROM ilks
      ),
      noop_filling AS (
        SELECT ilk, unnest(generate_series(starting_use, end_use, 100)) AS block_number,
               CAST(NULL AS DOUBLE) AS dart, CAST(NULL AS DOUBLE) AS rate,
               CAST(NULL AS DOUBLE) AS sf
        FROM ilks_2
      ),
      rates_x AS (
        SELECT event_id AS block_number, user_id AS ilk, 1 + value/1e6 AS x
        FROM events WHERE event_type = 'signup'
      ),
      rates_x2 AS (SELECT block_number, ilk, x*x AS x2 FROM rates_x),
      rates AS (SELECT block_number, ilk, x2*x2 - 1 AS sf FROM rates_x2),
      with_filling AS (
        SELECT ilk, block_number, dart, rate, CAST(NULL AS DOUBLE) AS sf
        FROM lending_assets_1
        UNION ALL
        SELECT ilk, block_number, dart, rate, sf FROM noop_filling
        UNION ALL
        SELECT ilk, block_number, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), sf
        FROM rates
      ),
      lending_assets_2 AS (
        SELECT ilk, block_number,
          COALESCE(1 + CAST(SUM(CAST(rate AS DECIMAL(18,6))) OVER w AS DOUBLE)/100, 1) AS rate,
          CAST(SUM(CAST(dart AS DECIMAL(18,6))) OVER w AS DOUBLE)/10 AS dart,
          SUM(CASE WHEN sf IS NOT NULL THEN 1 ELSE 0 END) OVER w AS sf_grp,
          sf
        FROM with_filling
        WINDOW w AS (PARTITION BY ilk ORDER BY block_number ASC)
      ),
      with_rk AS (
        SELECT CAST(block_number // 100 AS INT) AS dt,
          CONCAT('ILK-', CAST(ilk AS VARCHAR)) AS collateral,
          dart*rate AS debt,
          MAX(sf) OVER (PARTITION BY ilk, sf_grp) AS sf,
          ROW_NUMBER() OVER (PARTITION BY ilk, block_number // 100
                             ORDER BY block_number DESC) AS rk
        FROM lending_assets_2
      ),
      group_by AS (
        SELECT dt, collateral, debt, sf, debt*sf AS annual_revenues
        FROM with_rk WHERE rk = 1 AND debt <> 0.0
      ),
      group_by_cat AS (
        SELECT dt,
          CASE WHEN collateral LIKE 'ILK-1%' AND collateral <> 'ILK-1' THEN 'RWA'
               WHEN collateral IN ('ILK-0','ILK-1','ILK-2') THEN 'Stablecoins'
               WHEN collateral IN ('ILK-3','ILK-4','ILK-5') THEN 'ETH'
               WHEN collateral IN ('ILK-6','ILK-7') THEN 'WBTC'
               ELSE 'Others' END AS collateral,
          debt AS asset, annual_revenues
        FROM group_by
      )"""

  private val oracle2: Map[String, String] = Map(
    "q18_strings" -> """
      SELECT c_custkey,
        UPPER(c_name) AS uname,
        SUBSTRING(c_mktsegment, 1, 3) AS seg3,
        CAST(LENGTH(c_name) AS INT) AS name_len,
        CONCAT(c_mktsegment, '-', c_name) AS tagged,
        REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS depersonalized
      FROM customer ORDER BY c_custkey""",
    "q19_json" -> """
      SELECT event_id, CAST(props->>'$.k' AS INT) AS k
      FROM events ORDER BY event_id""")
}
