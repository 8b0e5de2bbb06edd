package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** IVF (inverted-file) ANN: k-means coarse quantizer + cluster-probed
  * search (SURVEY §7.5 "IVF partition pruning" — the second scale path
  * next to hyperplane LSH).
  *
  * Training is deterministic Lloyd's on a bounded, ordered sample
  * (driver-side — coarse quantizers are tiny and trained out-of-band at
  * any scale); assignment and search are distributed. A query probes its
  * `nProbe` nearest centroids and ranks only those clusters' vectors —
  * the shuffle key is the cluster id, and candidate volume scales with
  * nProbe/k instead of the corpus. */
object Ivf {

  /** Deterministic k-means centroids from a bounded sample. Sampling is
    * a value-hash filter (`hash(vec_id) % every == 0`) — distribution-
    * independent (no dense-id assumption), narrow, and never a global
    * sort; the tiny collected set is ordered driver-side for
    * reproducibility. Tiny corpora fall back to the full set. */
  def centroids(v: DataFrame, k: Int, iters: Int = 10,
                sampleCap: Int = 10000): Array[Array[Double]] = {
    val n = v.count()
    val every = math.max(1L, n / sampleCap)
    var rows = v.filter(pmod(hash(col("vec_id")), lit(every)) === 0)
      .select("vec_id", "e").collect()
    if (rows.length < k) rows = v.select("vec_id", "e").collect()
    val sample = rows
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    require(sample.length >= k)
    val dim = sample.head.length
    var cents = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    (1 to iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { x =>
        val c = nearest(cents, x)
        var j = 0
        while (j < dim) { sums(c)(j) += x(j); j += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  private def nearest(cents: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearestN(cents: Array[Array[Double]], x: Array[Double], n: Int): Seq[Int] =
    cents.indices.sortBy { c =>
      var d = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
      d
    }.take(n)

  /** Assign each vector to its nearest centroid (compiled map). */
  def assign(v: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    import v.sparkSession.implicits._
    v.select("vec_id", "e", "nrm").as[(Long, Seq[Double], Double)]
      .map { case (id, e, nrm) => (id, e, nrm, nearest(cents, e.toArray)) }
      .toDF("vec_id", "e", "nrm", "cluster")
  }

  /** IVF top-k: queries (vec_id < 10) probe nProbe clusters. Rows-only
    * gate (probabilistic recall); recall vs brute asserted in OpsSpec. */
  def topKIvf(s: SparkSession, dir: String, k: Int = 8, nProbe: Int = 4): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftshim.Shim
    val v = Similarity.vecs(Tables.load(s, dir, "embeddings")).persist()
    val cents = centroids(v, k)
    val assigned = assign(v, cents)
    val probes = v.filter(col("vec_id") < 10)
      .select("vec_id", "e", "nrm").as[(Long, Seq[Double], Double)]
      .flatMap { case (id, e, nrm) =>
        nearestN(cents, e.toArray, nProbe).map(c => (id, e, nrm, c)) }
      .toDF("qid", "ea", "na", "cluster")
    val cands = probes.join(
      assigned.select(col("vec_id").as("nid"), col("e").as("eb"),
        col("nrm").as("nb"), col("cluster")), Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
    val dot = Shim.column(DotDouble(Shim.expression(col("ea")), Shim.expression(col("eb"))))
    cands
      .withColumn("cosine", round(dot / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  /** ann_topk_ivf gates on deterministic recall-vs-brute (see
    * [[Similarity.recallGate]]); the listing itself is cross-checked in
    * OpsSpec. */
  def ivfRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.recallGate(s, dir, "ivf", topKIvf(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_ivf" -> (ivfRecall _))

  val oracle: Map[String, String] = Map(
    "ann_topk_ivf" -> """
      SELECT 'ivf' AS method,
        CAST(10*COUNT(*) AS BIGINT) AS n_expected,
        CAST((10*COUNT(*)*7 + 9)//10 AS BIGINT) AS min_hits,
        TRUE AS recall_ok
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 10)""")
}
