package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the round-10 TPC-H anchor extensions (Q4, Q13, Q17,
  * Q20, Q22 adapted to the fixture schema). Expectations are pinned
  * from an independent DuckDB run at sf0.001; the sf0.01 oracle gate is
  * the authoritative hash check — these specs exist so a regression
  * names the query instead of surfacing as a mystery Verify diff, and
  * so the semantic invariants (outer-join preservation, anti-join
  * discipline) are asserted in-process. */
class TpchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q47 (Q4): priority distribution of orders with a late line") {
    val rows = queries.Tpch.q47TpchQ4(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(
      ("1-URGENT", 8L), ("2-HIGH", 9L), ("3-MEDIUM", 10L),
      ("4-NOT SPECIFIED", 12L), ("5-LOW", 8L)))
  }

  test("q48 (Q13): outer join preserves every customer; counts balance") {
    val rows = queries.Tpch.q48TpchQ13(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the distribution's mass is the full customer table — an
    // outer-to-inner rewrite that drops only-urgent customers breaks
    // this the moment the fixture grows one
    val customers = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(rows.map(_._2).sum == customers,
      "sum(custdist) must equal the customer count (outer join preserved)")
    // and the weighted mass is exactly the non-urgent order count
    val nonUrgent = spark.read.parquet(s"$dir/orders.parquet")
      .where("o_orderpriority <> '1-URGENT'").count()
    assert(rows.map(t => t._1 * t._2).sum == nonUrgent,
      "sum(c_count*custdist) must equal the non-urgent order count")
    assert(rows.head == ((7L, 26L)), "top bucket pinned from DuckDB")
  }

  test("q49 (Q17): small-quantity revenue matches the decimal-exact truth") {
    val v = queries.Tpch.q49TpchQ17(spark, dir).head().getDouble(0)
    // exact by construction: DECIMAL sums on both sides of the
    // threshold, one IEEE division + multiply — pinned from DuckDB
    assert(math.abs(v - 58907.27428571428) < 1e-8, s"got $v")
  }

  test("q50 (Q20): dominant small-part suppliers in NATION_1x") {
    val rows = queries.Tpch.q50TpchQ20(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 5, s"got ${rows.mkString(", ")}")
    assert(rows.take(3).toSeq == Seq(
      ("Supplier#000000000", 0L), ("Supplier#000000001", 1L),
      ("Supplier#000000002", 2L)))
  }

  test("q52 (Q12): late-line priority split per returnflag") {
    val rows = queries.Tpch.q52TpchQ12(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("A", 47L, 63L), ("N", 44L, 60L),
      ("R", 45L, 52L)))
  }

  test("q53 (Q14): promo revenue share, one-pass numerator/denominator") {
    val v = queries.Tpch.q53TpchQ14(spark, dir).head().getDouble(0)
    assert(math.abs(v - 28.456812045184485) < 1e-10, s"got $v")
  }

  test("q54 (Q16): blacklist anti-join + distinct supplier counts") {
    val rows = queries.Tpch.q54TpchQ16(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows.length == 33, s"got ${rows.length}")
    assert(rows.take(3).toSeq == Seq(
      ("Brand#11", "SMALL", 16, 9L), ("Brand#14", "PROMO", 1, 9L),
      ("Brand#15", "SMALL", 4, 9L)))
    // anti-join discipline: no surviving count may include a
    // blacklisted supplier — the whole keyset is excluded, so every
    // count is bounded by the non-blacklisted supplier population
    val ok = spark.read.parquet(s"$dir/supplier.parquet")
      .where("s_name NOT LIKE '%7'").count()
    assert(rows.forall(_._4 <= ok), "a count exceeds the eligible pool")
  }

  test("q55 (Q19): disjunctive bands match the decimal-exact truth") {
    val v = queries.Tpch.q55TpchQ19(spark, dir).head().getDouble(0)
    assert(math.abs(v - 2309600.4557) < 1e-6, s"got $v")
  }

  test("q56 (Q6): pure-scan revenue forecast") {
    val v = queries.Tpch.q56TpchQ6(spark, dir).head().getDouble(0)
    assert(math.abs(v - 365888.5609) < 1e-6, s"got $v")
  }

  test("q57 (Q7): two-nation volume, both directions") {
    val rows = queries.Tpch.q57TpchQ7(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(rows.length == 2)
    assert(rows(0)._1 == "NATION_3" && rows(0)._3 == 1996 &&
      math.abs(rows(0)._4 - 137444.2596) < 1e-6)
    assert(rows(1)._3 == 1997 && math.abs(rows(1)._4 - 114305.5872) < 1e-6)
  }

  test("q58 (Q8): market share per year from one fact pass") {
    val rows = queries.Tpch.q58TpchQ8(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(rows.length == 2)
    assert(rows(0)._1 == 1996 &&
      math.abs(rows(0)._2 - 0.028327670275518056) < 1e-12)
    assert(rows(1)._1 == 1997 &&
      math.abs(rows(1)._2 - 0.2219520123339681) < 1e-12)
    // a share is a ratio of a conditional subtotal to its total
    assert(rows.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
  }

  test("q59 (Q9): profit rollup by nation and year") {
    val rows = queries.Tpch.q59TpchQ9(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(rows.length == 70, s"got ${rows.length}")
    assert(rows(0)._1 == "NATION_12" && rows(0)._2 == 2001 &&
      math.abs(rows(0)._3 - 129167.1782) < 1e-6)
    assert(rows(1)._2 == 2000 && math.abs(rows(1)._3 - 573811.0162) < 1e-6)
  }

  test("q60 (Q10): top returned-revenue customers, one quarter") {
    val rows = queries.Tpch.q60TpchQ10(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length == 20)
    assert(rows.take(3).map(_._1).toSeq == Seq(13L, 148L, 111L))
    assert(math.abs(rows(0)._2 - 363940.1659) < 1e-6)
    // top-k discipline: revenue non-increasing
    assert(rows.sliding(2).forall(p => p(0)._2 >= p(1)._2))
  }

  test("q61 (Q15): exact-decimal equality against the global max") {
    val rows = queries.Tpch.q61TpchQ15(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.toSeq.map(_._1) == Seq(1L))
    assert(math.abs(rows(0)._2 - 1366928.0925) < 1e-6)
  }

  test("q62 (Q2): minimum-unit-cost supplier per qualifying part") {
    val rows = queries.Tpch.q62TpchQ2(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSeq == Seq(("Supplier#000000007", 20L)),
      s"got ${rows.mkString(", ")}")
  }

  test("q63 (Q11): parts above the 0.1% share threshold") {
    val rows = queries.Tpch.q63TpchQ11(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 186, s"got ${rows.length}")
    assert(math.abs(rows.map(_._2).max - 537749.38) < 1e-9)
    // share discipline: every survivor exceeds 0.1% of the grand total
    // it was tested against — recompute the total independently
    Tables.registerAll(spark, dir)
    val total = spark.sql("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')""").head().getDouble(0)
    assert(rows.forall(_._2 * 1000 > total - 1e-6))
  }

  test("q64/q65: one-scan forms equal their literal twins row-for-row") {
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rowsOf(queries.Tpch.q64TpchQ15OneScan(spark, dir)) ==
      rowsOf(queries.Tpch.q61TpchQ15(spark, dir)),
      "Q15 one-scan diverges from the literal CTE+max form")
    assert(rowsOf(queries.Tpch.q65TpchQ11OneScan(spark, dir)) ==
      rowsOf(queries.Tpch.q63TpchQ11(spark, dir)),
      "Q11 one-scan diverges from the literal scalar-subquery form")
    assert(rowsOf(queries.Tpch.q66TpchQ2OneScan(spark, dir)) ==
      rowsOf(queries.Tpch.q62TpchQ2(spark, dir)),
      "Q2 one-scan diverges from the literal correlated-MIN form")
    assert(rowsOf(queries.Tpch.q67TpchQ18Dsl(spark, dir)) ==
      rowsOf(queries.Tpch.q43TpchQ18(spark, dir)),
      "Q18 DSL twin diverges from the SQL form")
  }

  test("q51 (Q22): survivors are above-average AND urgent-free") {
    val rows = queries.Tpch.q51TpchQ22(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq.map(t => (t._1, t._2)) == Seq((3, 2L), (5, 1L)))
    assert(math.abs(rows(0)._3 - 13122.94) < 1e-9)
    // anti-join discipline: recompute the whole distribution through a
    // STRUCTURALLY DIFFERENT plan (LEFT JOIN … IS NULL instead of the
    // production NOT EXISTS) and require identical counts — a semi-join
    // rewrite or null-semantics regression in the production anti join
    // diverges from this formulation immediately. (An earlier version
    // re-included the NOT EXISTS in the check, which made it
    // tautologically zero.)
    Tables.registerAll(spark, dir)
    val independent = spark.sql("""
      SELECT CAST(c_nationkey % 7 AS INT) AS cntrycode,
        CAST(COUNT(*) AS BIGINT) AS numcust
      FROM customer c
      LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderpriority = '1-URGENT') u
        ON u.o_custkey = c.c_custkey
      WHERE u.o_custkey IS NULL
        AND c_nationkey % 7 IN (1, 2, 3, 5, 6)
        AND CAST(c_acctbal AS DECIMAL(18,2)) *
            (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
             WHERE c_acctbal > 0)
      GROUP BY 1 ORDER BY 1""").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows.toSeq.map(t => (t._1, t._2)) == independent,
      "production NOT EXISTS diverges from the LEFT JOIN ... IS NULL recompute")
  }
}
