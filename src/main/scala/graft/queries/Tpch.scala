package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Canonical warehouse anchors over the TPC-H-shaped fixture tables:
  * the two classic multi-join pricing queries (Q3/Q5 adapted to the
  * fixture's columns), RFM customer segmentation, and a referential-
  * integrity audit. All declarative SQL through Catalyst — dimension
  * joins broadcast, revenue sums ride exact DECIMAL partials, date
  * filters push to the scans.
  */
object Tpch {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  /** TPC-H Q3 (shipping-priority) adapted: BUILDING-segment orders
    * placed before and shipped after 1998-03-15, top-10 order revenue.
    * customer is the broadcast side; the top-10 rides
    * TakeOrderedAndProject. */
  def q41TpchQ3(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        AS DOUBLE) AS revenue,
      unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_ms,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate_ms, l_orderkey LIMIT 10""")

  /** TPC-H Q5 (local-supplier volume): ASIA-region 1997 revenue where
    * the supplier sits in the customer's nation — the 6-way star with
    * region/nation broadcast down the join tree. */
  def q42TpchQ5(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name""")

  /** TPC-H Q18 (large-volume customer): orders whose total quantity
    * exceeds 300, with their customer and exact quantity rollup — the
    * aggregate-then-semi-join shape (a HAVING subquery feeding a
    * large IN) that Q3/Q5's plain star joins never exercise. The IN
    * subquery plans as a left-semi join of orders against the
    * pre-aggregated qualifying keyset; quantity sums ride exact
    * DECIMAL partials; the top-100 is TakeOrderedAndProject. */
  def q43TpchQ18(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT c_name, c_custkey, o_orderkey,
      unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS orderdate_ms,
      o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, orderdate_ms, o_orderkey LIMIT 100""")

  /** TPC-H Q21 (suppliers who kept waiting) adapted to the fixture's
    * columns: there is no l_commitdate/l_receiptdate, so a line is LATE
    * iff l_shipdate > o_orderdate + 60 days. The classic correlated
    * EXISTS / NOT EXISTS anchor — for 'F' orders, count a supplier's
    * late lines on multi-supplier orders where it was the ONLY late
    * supplier. Catalyst decorrelates the EXISTS into a left-semi and
    * the NOT EXISTS into a left-anti join on l_orderkey (the l3
    * subquery re-joins orders on its own key rather than referencing
    * the outer o_orderdate in a non-equality predicate — same order,
    * same date, and the correlation stays equality-only, which both
    * engines decorrelate cleanly). Scan budget (documented, asserted
    * in PLANS.md): THREE lineitem scans — l1 + one per subquery
    * instance. [[q45TpchQ21OneScan]] is the single-scan reformulation
    * a 100 TB deployment runs instead. */
  def q44TpchQ21(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND n_name LIKE 'NATION_1%'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100""")

  /** Q21 re-expressed with ONE lineitem scan — the 100 TB plan: per
    * (order, supplier) flags from a single fact pass, then the
    * order-level "other suppliers / other late suppliers" tests as
    * WINDOW aggregates over the SAME grouped rows (a join-back through
    * a second CTE reference would re-scan the fact table: Catalyst
    * inlines multiply-referenced CTEs). The semi/anti pair of the
    * literal form becomes two window sums — no second fact scan, no
    * self-join; at scale that replaces two extra fact-table scans and
    * their shuffles with one narrow window over the already-grouped
    * (order, supplier) rows. Hash-matches the same oracle as
    * [[q44TpchQ21]]. */
  def q45TpchQ21OneScan(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH fl AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    per_supp AS (
      SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late,
             CAST(SUM(late) AS BIGINT) AS late_lines
      FROM fl GROUP BY l_orderkey, l_suppkey),
    flagged AS (
      SELECT l_suppkey, supp_late, late_lines,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             SUM(supp_late) OVER (PARTITION BY l_orderkey) AS n_late_supp
      FROM per_supp)
    SELECT s_name, CAST(SUM(late_lines) AS BIGINT) AS numwait
    FROM flagged
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE supp_late = 1 AND n_supp > 1 AND n_late_supp = 1
      AND n_name LIKE 'NATION_1%'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100""")

  /** TPC-H Q4 (order-priority checking) adapted: the fixture has no
    * l_commitdate/l_receiptdate, so a "late" line is l_shipdate more
    * than 30 days after its order date — the same re-join-orders trick
    * as [[q44TpchQ21]] keeps the correlation equality-only (on
    * l_orderkey), which both engines decorrelate to a clean left-semi
    * join. One quarter of orders, priority distribution of those with
    * at least one late line. */
  private val q47Sql = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l JOIN orders o2 ON o2.o_orderkey = l.l_orderkey
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o2.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  def q47TpchQ4(s: SparkSession, dir: String): DataFrame = sql(s, dir, q47Sql)

  /** TPC-H Q13 (customer order-count distribution): the LEFT OUTER join
    * with a predicate in the JOIN CONDITION (not a WHERE — that would
    * turn it inner), then the classic double aggregation. Zero-order
    * customers survive as c_count=0 — the shape that catches an
    * outer-join-to-inner rewrite bug immediately. The join shuffles on
    * the customer key; both rollups pre-aggregate map-side. */
  private val q48Sql = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  def q48TpchQ13(s: SparkSession, dir: String): DataFrame = sql(s, dir, q48Sql)

  /** TPC-H Q17 (small-quantity-order revenue): the correlated SCALAR
    * AVG subquery — Catalyst decorrelates it to a per-part aggregate
    * joined back on p_partkey. The threshold is computed identically in
    * both engines: an exact DECIMAL sum cast to DOUBLE, divided by the
    * exact count (one IEEE division, bit-deterministic), then one IEEE
    * multiply by 0.2 — never a float sum, whose order-dependence would
    * let a boundary-riding l_quantity flip between engines. Scan
    * budget: TWO lineitem scans (outer + the decorrelated aggregate),
    * asserted in PLANS.md. */
  private val q49Sql = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
      AND l_quantity < 0.2 * (
        SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  def q49TpchQ17(s: SparkSession, dir: String): DataFrame = sql(s, dir, q49Sql)

  /** TPC-H Q20 (part-promotion suppliers) adapted: no partsupp table,
    * so "supplier holds excess stock" becomes "supplier shipped more
    * than half the 1997 volume of a small-part" — and because BOTH
    * sides of that comparison derive from the same fact rows, the
    * per-part total is a WINDOW sum over the per-(supplier,part) groups
    * instead of a correlated re-scan: the IN-subquery reads lineitem
    * exactly ONCE (plan-asserted). The qualifying supplier keyset
    * reaches supplier as a left-semi join. */
  private val q50Sql = """
    SELECT s_name, s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name LIKE 'NATION_1%'
      AND s_suppkey IN (
        SELECT l_suppkey FROM (
          SELECT l_suppkey, l_partkey,
            SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty,
            SUM(SUM(CAST(l_quantity AS DECIMAL(18,2))))
              OVER (PARTITION BY l_partkey) AS part_qty
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey) t
        WHERE supp_qty * 2 > part_qty)
    ORDER BY s_name, s_suppkey"""

  def q50TpchQ20(s: SparkSession, dir: String): DataFrame = sql(s, dir, q50Sql)

  /** TPC-H Q22 (global sales opportunity) adapted: country code is
    * n_nationkey mod 7 (no phone column), and — because every customer
    * has orders at these scale factors — the anti-join target is
    * "never placed an URGENT order" so survivors exist. The
    * above-average-balance test cross-multiplies (bal×n > Σbal) in
    * exact DECIMAL instead of comparing against a float average; the
    * two scalar subqueries broadcast as 1-row plans (Catalyst merges
    * them into one customer aggregate). */
  private val q51Sql = """
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 7 AS INT) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey % 7 IN (1,2,3,5,6)
        AND CAST(c_acctbal AS DECIMAL(18,2)) *
            (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
             WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    ) t
    GROUP BY cntrycode
    ORDER BY cntrycode"""

  def q51TpchQ22(s: SparkSession, dir: String): DataFrame = sql(s, dir, q51Sql)

  /** TPC-H Q12 (shipping-mode priority) adapted: no l_shipmode, so the
    * classification axis is l_returnflag and a "late" line ships more
    * than 30 days after its order date. The classic conditional-
    * aggregation-over-a-join shape: one fact⋈orders join, both CASE
    * counts ride the same map-side partial aggregate. */
  private val q52Sql = """
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  def q52TpchQ12(s: SparkSession, dir: String): DataFrame = sql(s, dir, q52Sql)

  /** TPC-H Q14 (promotion effect): conditional revenue share over one
    * month — numerator and denominator from the SAME decimal partials
    * in one aggregate (never two scans), the final ratio one IEEE
    * division of two exactly-summed doubles. The month filter pushes to
    * the lineitem scan; the part side broadcasts. */
  private val q53Sql = """
    SELECT CAST(100.00 *
        CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
          ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS DOUBLE)
      AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'"""

  def q53TpchQ14(s: SparkSession, dir: String): DataFrame = sql(s, dir, q53Sql)

  /** TPC-H Q16 (parts/supplier relationship) adapted: supplier variety
    * per (brand, type, size) bucket from the fact table (no partsupp),
    * excluding blacklisted suppliers via NOT IN — the null-aware anti
    * join shape (s_suppkey is non-null, so it plans as a plain
    * left-anti against the broadcast keyset). COUNT(DISTINCT) rides
    * Spark's two-phase distinct aggregate; the size IN-list pushes to
    * the part scan. Total ORDER BY makes the LIMIT deterministic. */
  private val q54Sql = """
    SELECT p_brand, p_type, p_size,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'STANDARD'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50"""

  def q54TpchQ16(s: SparkSession, dir: String): DataFrame = sql(s, dir, q54Sql)

  /** TPC-H Q19 (discounted revenue, disjunctive predicate): the OR of
    * per-(brand, size, quantity) conjunction groups spans BOTH join
    * sides, so Catalyst cannot split it below the join on its own —
    * the classic Q19 authoring move is the redundant per-table
    * ENVELOPE conjuncts (brand IN-list, size and quantity bounds),
    * semantically implied by the disjunction, which DO push to each
    * scan (plan-asserted on both sides). At 100 TB that is the
    * difference between scanning three brands' parts and scanning
    * every part. */
  private val q55Sql = """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        AS DECIMAL(22,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 1 AND l_quantity <= 15)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
            AND l_quantity >= 5 AND l_quantity <= 25)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
            AND l_quantity >= 15 AND l_quantity <= 40))
      AND p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
      AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 1 AND 40"""

  def q55TpchQ19(s: SparkSession, dir: String): DataFrame = sql(s, dir, q55Sql)

  /** TPC-H Q6 (forecasting revenue change): the purest scan shape —
    * every predicate (date range, discount band, quantity cap) pushes
    * to the parquet scan and the revenue sum is one exact decimal
    * aggregate over the survivors. No join, no shuffle beyond the
    * 1-row gather. */
  private val q56Sql = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  def q56TpchQ6(s: SparkSession, dir: String): DataFrame = sql(s, dir, q56Sql)

  /** TPC-H Q6 WRITTEN IN POSTGRES DIALECT and executed through the PG
    * front-end ([[graft.frontend.PgDialect]]) — evidence the dialect
    * layer generalizes past the reference's one shipped artifact:
    * `::numeric(p,s)` casts with precision args, `::timestamp` on
    * string literals, a parenthesized `::float8` over an aggregate, and
    * BETWEEN all translate, and the result must hash-match the SAME
    * DuckDB oracle as [[q56TpchQ6]] (identical semantics, two syntaxes,
    * one truth). */
  private val q69PgSql = """
    select (sum(l_extendedprice::numeric(18,2) * l_discount::numeric(5,2)))::float8 as revenue
    from lineitem
    where l_shipdate >= '1997-01-01 00:00:00'::timestamp
      and l_shipdate <  '1998-01-01 00:00:00'::timestamp
      and l_discount between 0.05 and 0.07 and l_quantity < 24"""

  def q69PgTpchQ6(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.frontend.PgDialect.run(s, q69PgSql)
  }

  /** TPC-H Q7 (volume shipping): revenue between two nations in both
    * directions — the 6-way join where the OR over the two nation-dim
    * combinations must NOT break the equi-join (each nation table joins
    * on its own key; the OR is a post-join filter over two broadcast
    * dims, never a cartesian). */
  private val q57Sql = """
    SELECT supp_nation, cust_nation, l_year,
      CAST(SUM(CAST(volume AS DECIMAL(22,6))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS INT) AS l_year,
        l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  def q57TpchQ7(s: SparkSession, dir: String): DataFrame = sql(s, dir, q57Sql)

  /** TPC-H Q8 (national market share): the widest classic join tree —
    * 8 tables — feeding a conditional share per order year. Share =
    * ratio of two exactly-summed decimals from the SAME aggregate
    * (one fact pass), the division one IEEE op. Every dimension
    * broadcasts; lineitem is scanned exactly once (plan-asserted). */
  private val q58Sql = """
    SELECT o_year,
      CAST(CAST(SUM(CASE WHEN nation = 'NATION_3'
          THEN CAST(volume AS DECIMAL(22,6))
          ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
        / CAST(SUM(CAST(volume AS DECIMAL(22,6))) AS DOUBLE)
        AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        l_extendedprice * (1 - l_discount) AS volume,
        n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'LARGE'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year"""

  def q58TpchQ8(s: SparkSession, dir: String): DataFrame = sql(s, dir, q58Sql)

  /** TPC-H Q9 (product-type profit) adapted: no partsupp supply cost,
    * so profit = revenue − 0.6 × retail price × quantity (a fixed
    * 60 % cost ratio against the part's list price). The profit rollup
    * by (nation, year) over a name-substring part filter — the shape
    * where the selective part side must broadcast into the fact scan
    * rather than shuffling lineitem. */
  private val q59Sql = """
    SELECT nation, o_year,
      CAST(SUM(CAST(amount AS DECIMAL(22,6))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        l_extendedprice * (1 - l_discount)
          - 0.6 * p_retailprice * l_quantity AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC"""

  def q59TpchQ9(s: SparkSession, dir: String): DataFrame = sql(s, dir, q59Sql)

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    * lost to returns in one quarter — the classic top-k over a
    * fact⋈orders⋈customer join with the returnflag filter pushed to the
    * fact scan and the top-20 riding TakeOrderedAndProject. */
  private val q60Sql = """
    SELECT c_custkey, c_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        AS DOUBLE) AS revenue,
      CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  def q60TpchQ10(s: SparkSession, dir: String): DataFrame = sql(s, dir, q60Sql)

  /** TPC-H Q15 (top supplier): the view-plus-global-max shape — the
    * quarterly revenue CTE is consumed twice (once joined, once under
    * MAX), and because the sums are exact DECIMAL the equality against
    * the max is exact in both engines. Catalyst inlines the
    * twice-referenced CTE, so the documented scan budget is TWO
    * lineitem scans (the price of the literal form; a 100 TB run
    * would checkpoint revenue0 — `ManifestStore`-materialize it —
    * first). */
  private val q61Sql = """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
        SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey"""

  def q61TpchQ15(s: SparkSession, dir: String): DataFrame = sql(s, dir, q61Sql)

  /** TPC-H Q2 (minimum-cost supplier) adapted: no partsupp, so a
    * supplier's unit cost for a part is its lifetime average unit
    * price from the fact table (exact decimal sums, one IEEE
    * division — bit-identical across engines, so the equality against
    * the correlated MIN is exact). The classic correlated-MIN
    * decorrelates to a per-part aggregate joined back; region
    * restricts both the outer row and the MIN's candidate set. */
  private val q62Sql = """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s_name, n_name, p_partkey, p_name
    FROM part JOIN cost ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_size = 15 AND p_type = 'SMALL'
      AND unit_cost = (
        SELECT MIN(c2.unit_cost) FROM cost c2
        JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE c2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
    ORDER BY s_name, p_partkey LIMIT 100"""

  def q62TpchQ2(s: SparkSession, dir: String): DataFrame = sql(s, dir, q62Sql)

  /** TPC-H Q11 (important stock) adapted: a part's "value" is the
    * lineitem-derived extended-price mass from two nations' suppliers;
    * keep parts holding more than 0.1 % of the total. The
    * group-share-vs-global-scalar shape: the threshold is one 1-row
    * scalar subquery over the same CTE (inlined → documented 2-scan
    * budget), the comparison cross-multiplied in exact DECIMAL
    * (value × 1000 > Σ) — no float division anywhere. */
  private val q63Sql = """
    WITH pv AS (
      SELECT l_partkey,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS pvalue
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey)
    SELECT l_partkey, CAST(pvalue AS DOUBLE) AS pvalue
    FROM pv
    WHERE pvalue * 1000 > (SELECT SUM(pvalue) FROM pv)
    ORDER BY pvalue DESC, l_partkey"""

  def q63TpchQ11(s: SparkSession, dir: String): DataFrame = sql(s, dir, q63Sql)

  /** Q15 re-expressed with ONE lineitem scan — the 100 TB plan: the
    * global max rides a window over the ~|suppliers| post-aggregate
    * rows instead of a second consumption of the revenue CTE (which
    * Catalyst inlines into a second fact scan). The window is global
    * but over the GROUPED rows — cardinality |suppliers|, never the
    * corpus. Hash-matches the same oracle as [[q61TpchQ15]]. */
  def q64TpchQ15OneScan(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
        SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey),
    ranked AS (
      SELECT supplier_no, total_revenue,
        MAX(total_revenue) OVER () AS max_rev
      FROM revenue0)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN ranked ON s_suppkey = supplier_no
    WHERE total_revenue = max_rev
    ORDER BY s_suppkey""")

  /** Q11 re-expressed with ONE lineitem scan: the share-of-total
    * threshold is a window SUM over the ~|parts| post-aggregate rows
    * instead of a scalar subquery re-consuming the CTE. Same exact
    * DECIMAL cross-multiplication; hash-matches the same oracle as
    * [[q63TpchQ11]]. */
  def q65TpchQ11OneScan(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH pv AS (
      SELECT l_partkey,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS pvalue
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey),
    shared AS (
      SELECT l_partkey, pvalue, SUM(pvalue) OVER () AS total FROM pv)
    SELECT l_partkey, CAST(pvalue AS DOUBLE) AS pvalue
    FROM shared
    WHERE pvalue * 1000 > total
    ORDER BY pvalue DESC, l_partkey""")

  /** Q2 re-expressed for scale, ONE lineitem scan: the literal form
    * aggregates unit costs for EVERY (part, supplier) pair — the full
    * fact table — and Catalyst inlines the twice-consumed cost CTE into
    * a second fact scan. Here the part predicate joins BELOW the
    * aggregate (only qualifying parts' lines are ever aggregated — at
    * 100 TB the difference between aggregating a few parts and the
    * whole fact) and the per-part minimum is a window over the
    * post-aggregate (part, supplier) rows. p_size/p_type are constant
    * per part key, so pre-filtering cannot change any qualifying
    * pair's aggregate. Spec'd row-equal to [[q62TpchQ2]]; hash-matches
    * the same oracle. */
  def q66TpchQ2OneScan(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, p_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          AS unit_cost
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_size = 15 AND p_type = 'SMALL'
      GROUP BY l_partkey, l_suppkey, p_name),
    asia AS (
      SELECT c.l_partkey, c.p_name, s_name, n_name, c.unit_cost,
        MIN(c.unit_cost) OVER (PARTITION BY c.l_partkey) AS min_cost
      FROM cost c JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    SELECT s_name, n_name, l_partkey AS p_partkey, p_name
    FROM asia
    WHERE unit_cost = min_cost
    ORDER BY s_name, p_partkey LIMIT 100""")

  /** Q18 as a typed DataFrame-DSL pipeline — the API-parity twin of the
    * SQL form [[q43TpchQ18]] (the engine's flagship query ships SQL,
    * DSL and catalog ports; the hardest semi-join anchor deserves the
    * same). Catalyst converges both to the same physical shapes
    * (left-semi qualifying keyset, decimal partials, heap top-100 —
    * plan-asserted), and the spec pins row-for-row equality. */
  def q67TpchQ18Dsl(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.registerAll(s, dir)
    val li = s.table("lineitem")
    val qualifying = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .where(col("qty") > 300)
      .select(col("l_orderkey").as("qual_orderkey"))
    s.table("orders")
      .join(qualifying, col("o_orderkey") === col("qual_orderkey"),
        "left_semi")
      .join(s.table("customer"), col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("sum_qty"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp"))
          .as("orderdate_ms"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("orderdate_ms"),
        col("o_orderkey"))
      .limit(100)
  }

  private val q15MatRoots = scala.collection.mutable.Set[String]()

  private def q15MatRoot(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_q15mat_store_" +
      new java.io.File(dir).getName + "_" + graft.ops.CorpusId.hex(dir)

  /** Q15 with the shared CTE MATERIALIZED through the manifest store —
    * the documented 100 TB plan of [[q61TpchQ15]]'s scan-budget note
    * ("a 100 TB run would checkpoint revenue0 first") as running code
    * (round-11 agenda #6). The builder pays ONE lineitem scan to
    * persist the quarterly revenue aggregate (~|suppliers| rows); the
    * query itself then consumes the store TWICE (the global max and the
    * join back) and touches the fact table ZERO times — plan-asserted
    * in PLANS.md §q68: no lineitem scan, two store reads. Same rows,
    * same oracle as the literal two-scan form. The materialization is
    * BuildLog-named, so its one-time cost shows up as a named build in
    * the bench's cold section, not as unattributed noise. */
  def q68TpchQ15Mat(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = q15MatRoot(dir)
    q15MatRoots.synchronized {
      if (!q15MatRoots.contains(root)) {
        graft.ops.BuildLog.timed("q15_mat_revenue0") {
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
          val revenue0 = sql(s, dir, """
            SELECT l_suppkey AS supplier_no,
              SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
                AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey""")
          new graft.ingest.ManifestStore(root).append(s, revenue0,
            commitKey = Some("q15-revenue0"))
        }
        q15MatRoots.add(root)
      }
    }
    q68Consumers(s, dir, root)
  }

  /** The post-materialization dataflow, shared with the PLANS.md §q68
    * scan-budget assertion: both CTE consumers read the STORE. */
  private[graft] def q68Consumers(s: SparkSession, dir: String,
                                  root: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.registerAll(s, dir)
    val store = new graft.ingest.ManifestStore(root)
    val rev = store.read(s).get
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    s.table("supplier")
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** RFM customer segmentation — recency/frequency/monetary quintile
    * scores. NTILE would be a single-task global window (the
    * vocab_build lesson); instead the quintile THRESHOLDS come from one
    * percentile_cont aggregate (a 1-row broadcast) and every score is a
    * map-side comparison — scale-clean at any customer count. */
  def customersRfm(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    WITH m AS (
      SELECT o_custkey AS c_custkey,
        MAX(unix_millis(CAST(o_orderdate AS TIMESTAMP))) AS last_ms,
        COUNT(*) AS freq,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey),
    q AS (
      SELECT
        percentile(last_ms, array(0.2, 0.4, 0.6, 0.8)) AS qr,
        percentile(freq, array(0.2, 0.4, 0.6, 0.8)) AS qf,
        percentile(monetary, array(0.2, 0.4, 0.6, 0.8)) AS qm
      FROM m)
    SELECT m.c_custkey, m.freq, m.monetary,
      CAST(1 + CAST(m.last_ms > qr[0] AS INT) + CAST(m.last_ms > qr[1] AS INT)
        + CAST(m.last_ms > qr[2] AS INT) + CAST(m.last_ms > qr[3] AS INT)
        AS INT) AS r_score,
      CAST(1 + CAST(m.freq > qf[0] AS INT) + CAST(m.freq > qf[1] AS INT)
        + CAST(m.freq > qf[2] AS INT) + CAST(m.freq > qf[3] AS INT)
        AS INT) AS f_score,
      CAST(1 + CAST(m.monetary > qm[0] AS INT) + CAST(m.monetary > qm[1] AS INT)
        + CAST(m.monetary > qm[2] AS INT) + CAST(m.monetary > qm[3] AS INT)
        AS INT) AS m_score
    FROM m CROSS JOIN q
    ORDER BY m.c_custkey""")

  /** Referential-integrity audit across the star: orphan counts per
    * relationship (NOT EXISTS anti-joins) plus primary-key duplicate
    * counts — the data-quality report a warehouse runs after every
    * load. Each check is one anti-join or one distinct aggregate. */
  def auditRefIntegrity(s: SparkSession, dir: String): DataFrame = sql(s, dir, """
    SELECT 'lineitem_orphan_order' AS chk, COUNT(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_orphan_supplier', COUNT(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'lineitem_orphan_part', COUNT(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'order_orphan_customer', COUNT(*) FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer_bad_nation', COUNT(*) FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'orders_dup_pk', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'customer_dup_pk', COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
    ORDER BY chk""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_tpch_q3" -> (q41TpchQ3 _),
    "q42_tpch_q5" -> (q42TpchQ5 _),
    "q43_tpch_q18" -> (q43TpchQ18 _),
    "q44_tpch_q21" -> (q44TpchQ21 _),
    "q45_tpch_q21_onescan" -> (q45TpchQ21OneScan _),
    "q47_tpch_q4" -> (q47TpchQ4 _),
    "q48_tpch_q13" -> (q48TpchQ13 _),
    "q49_tpch_q17" -> (q49TpchQ17 _),
    "q50_tpch_q20" -> (q50TpchQ20 _),
    "q51_tpch_q22" -> (q51TpchQ22 _),
    "q52_tpch_q12" -> (q52TpchQ12 _),
    "q53_tpch_q14" -> (q53TpchQ14 _),
    "q54_tpch_q16" -> (q54TpchQ16 _),
    "q55_tpch_q19" -> (q55TpchQ19 _),
    "q56_tpch_q6" -> (q56TpchQ6 _),
    "q69_pg_tpch_q6" -> (q69PgTpchQ6 _),
    "q57_tpch_q7" -> (q57TpchQ7 _),
    "q58_tpch_q8" -> (q58TpchQ8 _),
    "q59_tpch_q9" -> (q59TpchQ9 _),
    "q60_tpch_q10" -> (q60TpchQ10 _),
    "q61_tpch_q15" -> (q61TpchQ15 _),
    "q62_tpch_q2" -> (q62TpchQ2 _),
    "q63_tpch_q11" -> (q63TpchQ11 _),
    "q64_tpch_q15_onescan" -> (q64TpchQ15OneScan _),
    "q65_tpch_q11_onescan" -> (q65TpchQ11OneScan _),
    "q66_tpch_q2_onescan" -> (q66TpchQ2OneScan _),
    "q67_tpch_q18_dsl" -> (q67TpchQ18Dsl _),
    "q68_tpch_q15_mat" -> (q68TpchQ15Mat _),
    "customers_rfm" -> (customersRfm _),
    "audit_ref_integrity" -> (auditRefIntegrity _))

  /** Q18's DuckDB-dialect oracle (epoch_ms for the timestamp), shared
    * by the SQL form and its DSL twin. */
  private val q43OracleSql = """
      SELECT c_name, c_custkey, o_orderkey,
        epoch_ms(o_orderdate) AS orderdate_ms,
        o_totalprice,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, orderdate_ms, o_orderkey LIMIT 100"""

  val oracle: Map[String, String] = Map(
    "q41_tpch_q3" -> """
      SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS DOUBLE) AS revenue,
        epoch_ms(o_orderdate) AS orderdate_ms,
        o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, orderdate_ms, l_orderkey LIMIT 10""",
    "q42_tpch_q5" -> """
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",
    "q44_tpch_q21" -> """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND n_name LIKE 'NATION_1%'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100""",
    "q45_tpch_q21_onescan" -> """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND n_name LIKE 'NATION_1%'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100""",
    "q43_tpch_q18" -> q43OracleSql,
    "q67_tpch_q18_dsl" -> q43OracleSql,
    "q47_tpch_q4" -> q47Sql,
    "q48_tpch_q13" -> q48Sql,
    "q49_tpch_q17" -> q49Sql,
    "q50_tpch_q20" -> q50Sql,
    "q51_tpch_q22" -> q51Sql,
    "q52_tpch_q12" -> q52Sql,
    "q53_tpch_q14" -> q53Sql,
    "q54_tpch_q16" -> q54Sql,
    "q55_tpch_q19" -> q55Sql,
    "q56_tpch_q6" -> q56Sql,
    "q69_pg_tpch_q6" -> q56Sql,
    "q57_tpch_q7" -> q57Sql,
    "q58_tpch_q8" -> q58Sql,
    "q59_tpch_q9" -> q59Sql,
    "q60_tpch_q10" -> q60Sql,
    "q61_tpch_q15" -> q61Sql,
    "q62_tpch_q2" -> q62Sql,
    "q63_tpch_q11" -> q63Sql,
    "q64_tpch_q15_onescan" -> q61Sql,
    "q68_tpch_q15_mat" -> q61Sql,
    "q65_tpch_q11_onescan" -> q63Sql,
    "q66_tpch_q2_onescan" -> q62Sql,
    "customers_rfm" -> """
      WITH m AS (
        SELECT o_custkey AS c_custkey,
          MAX(epoch_ms(o_orderdate)) AS last_ms,
          COUNT(*) AS freq,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey),
      q AS (
        SELECT
          quantile_cont(last_ms, [0.2, 0.4, 0.6, 0.8]) AS qr,
          quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS qf,
          quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS qm
        FROM m)
      SELECT m.c_custkey, m.freq, m.monetary,
        CAST(1 + CAST(m.last_ms > qr[1] AS INT) + CAST(m.last_ms > qr[2] AS INT)
          + CAST(m.last_ms > qr[3] AS INT) + CAST(m.last_ms > qr[4] AS INT)
          AS INT) AS r_score,
        CAST(1 + CAST(m.freq > qf[1] AS INT) + CAST(m.freq > qf[2] AS INT)
          + CAST(m.freq > qf[3] AS INT) + CAST(m.freq > qf[4] AS INT)
          AS INT) AS f_score,
        CAST(1 + CAST(m.monetary > qm[1] AS INT) + CAST(m.monetary > qm[2] AS INT)
          + CAST(m.monetary > qm[3] AS INT) + CAST(m.monetary > qm[4] AS INT)
          AS INT) AS m_score
      FROM m CROSS JOIN q
      ORDER BY m.c_custkey""",
    "audit_ref_integrity" -> """
      SELECT 'lineitem_orphan_order' AS chk, COUNT(*) AS n FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'lineitem_orphan_supplier', COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      UNION ALL
      SELECT 'lineitem_orphan_part', COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      UNION ALL
      SELECT 'order_orphan_customer', COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'customer_bad_nation', COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
      UNION ALL
      SELECT 'orders_dup_pk', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
      UNION ALL
      SELECT 'customer_dup_pk', COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
      ORDER BY chk""")
}
