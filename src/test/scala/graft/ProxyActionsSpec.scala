package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.MakerFixtures
import graft.ingest.{FakeReceiptRpc, ProxyActions}

/** S3 — receipt-filtered proxy_actions source (eth-contract.py:45-58). */
class ProxyActionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("byte-subsequence search") {
    val hay = Array[Byte](1, 2, 3, 4, 5)
    assert(ProxyActions.indexOf(hay, Array[Byte](3, 4)) == 2)
    assert(ProxyActions.indexOf(hay, Array[Byte](5)) == 4)
    assert(ProxyActions.indexOf(hay, Array[Byte](4, 3)) == -1)
    assert(ProxyActions.indexOf(hay, Array.emptyByteArray) == 0)
  }

  test("keeps exactly the first log of each wrapped transaction") {
    MakerFixtures.ensure(spark)
    val logs = spark.read.parquet(MakerFixtures.proxyRawLogsPath)
    val out = ProxyActions.filter(logs,
      new FakeReceiptRpc(MakerFixtures.ProxyActionsAddr),
      MakerFixtures.ProxyActionsAddr).toDF()
    val truth = spark.read.parquet(MakerFixtures.truthPath("proxy_actions"))
    assert(truth.count() > 0)

    def key(df: org.apache.spark.sql.DataFrame) = df.select(
      col("block_number"), lower(hex(col("transaction_hash"))),
      col("log_index"), lower(hex(col("data"))))
      .collect().map(_.toSeq).toSet

    assert(key(out) == key(truth))
    // dedup: one row per tx, and it is logs[0]
    assert(out.select("transaction_hash").distinct().count() == out.count())
    assert(out.filter(col("log_index") =!= 0).count() == 0)
  }
}
