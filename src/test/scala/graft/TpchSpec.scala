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

  test("q51 (Q22): survivors are above-average AND urgent-free") {
    val rows = queries.Tpch.q51TpchQ22(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq.map(t => (t._1, t._2)) == Seq((3, 2L), (5, 1L)))
    assert(math.abs(rows(0)._3 - 13122.94) < 1e-9)
    // anti-join discipline: recompute the urgent-customer keyset and
    // prove zero overlap with the survivors' codes' source rows
    Tables.registerAll(spark, dir)
    val leak = spark.sql("""
      SELECT COUNT(*) FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
      WHERE c.c_nationkey % 7 IN (3, 5)
        AND CAST(c.c_acctbal AS DECIMAL(18,2)) *
            (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
             WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderpriority = '1-URGENT')""")
      .head().getLong(0)
    assert(leak == 0L, "a survivor has an URGENT order — anti join leaked")
  }
}
