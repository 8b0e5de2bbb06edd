package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.IvfModel

/** The persisted IVF/PQ model store: load-or-train semantics, the
  * fingerprint staleness guard, and bit-exact roundtrips. */
class IvfModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(ids: Range) = ids.map { i =>
    (i.toLong, Seq.tabulate(8)(j => (i * 8 + j).toDouble), 1.0)
  }.toDF("vec_id", "e", "nrm")

  private def fakeModel(seed: Int) = (
    Array.tabulate(2)(c => Array.tabulate(8)(j => (seed + c * 10 + j).toDouble)),
    Array.tabulate(2)(s => Array.tabulate(2)(code =>
      Array.tabulate(4)(j => (seed + s * 100 + code * 10 + j).toDouble))))

  test("second call loads the stored model — the trainer runs once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfm1").toString
    val v = vecs(0 until 50)
    var trained = 0
    def train() = { trained += 1; fakeModel(1) }
    val m1 = IvfModel.trainedOrLoad(v, dir, "t1", train _)
    IvfModel.clearMemo() // force the next call through the DISK store
    val m2 = IvfModel.trainedOrLoad(v, dir, "t1", train _)
    assert(trained == 1)
    // bit-exact roundtrip through the store/memo
    assert(m1.cents.map(_.toSeq).toSeq == m2.cents.map(_.toSeq).toSeq)
    assert(m1.cb.map(_.map(_.toSeq).toSeq).toSeq == m2.cb.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("a changed vector set misses the fingerprint and retrains") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfm2").toString
    var trained = 0
    def train(seed: Int)() = { trained += 1; fakeModel(seed) }
    IvfModel.trainedOrLoad(vecs(0 until 50), dir, "t2", train(1) _)
    val m2 = IvfModel.trainedOrLoad(vecs(0 until 51), dir, "t2", train(2) _)
    assert(trained == 2, "append should invalidate the stored model")
    assert(m2.cents(0)(0) == 2.0 + 0) // the retrained model, not the stale one
  }

  test("distinct hyperparameter tags never alias") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfm3").toString
    val v = vecs(0 until 50)
    val a = IvfModel.trainedOrLoad(v, dir, "k8", () => fakeModel(1))
    val b = IvfModel.trainedOrLoad(v, dir, "k16", () => fakeModel(2))
    assert(a.cents(0)(0) == 1.0 && b.cents(0)(0) == 2.0)
  }
}
