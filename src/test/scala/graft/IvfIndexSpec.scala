package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, IvfIndex}

/** The appendable IVF index: frozen-quantizer ingest, O(batch)
  * assignment, exactly-once keyed appends, partition-pruned search, and
  * search results identical to a driver-side recomputation under the
  * same frozen centroids. */
class IvfIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 8

  /** Deterministic unit-ish vectors in `nClusters` well-separated cones
    * so assignments are unambiguous. */
  private def vecRows(ids: Range, nClusters: Int): Seq[(Long, Seq[Double], Double)] =
    ids.map { i =>
      val rnd = new scala.util.Random(i)
      val base = Array.fill(Dim)(rnd.nextGaussian() * 0.05)
      base(i % nClusters) += 10.0
      val nrm = math.sqrt(base.map(x => x * x).sum)
      (i.toLong, base.toSeq, nrm)
    }

  private def df(rows: Seq[(Long, Seq[Double], Double)]) =
    rows.toDF("vec_id", "e", "nrm")

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_ivfidx").toString + "/idx"

  test("append assigns only its batch; keyed replay commits nothing twice") {
    val root = freshRoot()
    val seed = vecRows(0 until 120, 4)
    val batch = vecRows(120 until 180, 4)
    IvfIndex.build(df(seed), root, k = 4, commitKey = Some("b0"))
    val ctr = spark.sparkContext.longAccumulator("assigns")
    IvfIndex.append(df(batch), root, commitKey = Some("b1"),
      assignCounter = Some(ctr))
    assert(ctr.value == batch.size,
      s"append must assign exactly the batch, assigned ${ctr.value}")
    // replayed batch (same commit key): nothing lands twice
    IvfIndex.append(df(batch), root, commitKey = Some("b1"))
    val n = IvfIndex.search(df(vecRows(0 until 1, 4)), root,
      nProbe = 4, topN = 1000).count()
    assert(n == 179, s"179 non-query neighbors expected once, got $n")
    // replayed build (same commit key): quantizer guard lets it through,
    // commit keys make it a no-op
    IvfIndex.build(df(seed), root, k = 4, commitKey = Some("b0"))
    assert(IvfIndex.search(df(vecRows(0 until 1, 4)), root,
      nProbe = 4, topN = 1000).count() == 179)
    // an UNKEYED re-train attempt on a live index must refuse
    intercept[IllegalArgumentException] {
      IvfIndex.build(df(seed), root, k = 4)
    }
  }

  test("CoW delete removes exactly the victims; keyed replay is a no-op") {
    val root = freshRoot()
    val all = vecRows(0 until 120, 4)
    IvfIndex.build(df(all), root, k = 4, commitKey = Some("b0"))
    val deleted = IvfIndex.delete(spark, root,
      pmod(col("vec_id"), lit(2)) === 1, commitKey = Some("forget-1"))
    assert(deleted == 60L, s"expected 60 odd victims, deleted $deleted")
    // exhaustive search (all clusters probed) sees only survivors
    val got = IvfIndex.search(df(vecRows(0 until 1, 4)), root,
      nProbe = 4, topN = 1000).collect()
    assert(got.length == 59, s"59 surviving non-query neighbors, got ${got.length}")
    assert(got.forall(_.getLong(2) % 2 == 0),
      "a deleted (odd) vector surfaced in search results")
    // a re-delivered forget request (same commit key) deletes nothing
    assert(IvfIndex.delete(spark, root,
      pmod(col("vec_id"), lit(2)) === 1, commitKey = Some("forget-1")) == 0L)
  }

  test("search equals a driver-side recomputation under the frozen quantizer") {
    val root = freshRoot()
    val all = vecRows(0 until 200, 4)
    val (seed, rest) = all.partition(_._1 % 2 == 0)
    IvfIndex.build(df(seed), root, k = 4, commitKey = Some("s"))
    IvfIndex.append(df(rest), root, commitKey = Some("r"))
    val queries = all.filter(_._1 < 3)
    val got = IvfIndex.search(df(queries), root, nProbe = 2, topN = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // driver-side truth under the same frozen centroids
    val cents = IvfIndex.centroids(spark, root)
    val assignOf = all.map { case (id, e, _) =>
      id -> Ivf.nearest(cents, e.toArray) }.toMap
    val expected = queries.sortBy(_._1).flatMap { case (qid, qe, qn) =>
      val probed = Ivf.nearestN(cents, qe.toArray, 2).toSet
      all.filter(c => c._1 != qid && probed.contains(assignOf(c._1)))
        .map { case (nid, ne, nn) =>
          val dotv = qe.zip(ne).map { case (a, b) => a * b }
            .foldLeft(0.0)(_ + _)
          (nid, BigDecimal(dotv / (qn * nn))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (nid, c) => (-c, nid) }.take(5).zipWithIndex
        .map { case ((nid, c), i) => (qid, (i + 1).toLong, nid, c) }
    }
    assert(got == expected)
  }

  test("search partition-prunes the lists read to the probed clusters") {
    val root = freshRoot()
    IvfIndex.build(df(vecRows(0 until 160, 8)), root, k = 8, commitKey = Some("s"))
    val res = IvfIndex.search(df(vecRows(0 until 1, 8)), root, nProbe = 2)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("cluster")), plan)
    // 8 well-separated clusters, 2 probed: the scan reads a strict subset
    // the shared traversal (graft.Plans.parquetScans) — one copy to sync
    val found = Plans.parquetScans(res.queryExecution.executedPlan)
    assert(found.nonEmpty, "no parquet scan in plan")
    val read = found.map(_.metrics("numFiles").value).sum
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk) else Iterator(f)
    val allFiles = walk(new java.io.File(s"$root/lists/data"))
      .count(_.getName.endsWith(".parquet"))
    assert(read > 0 && read < allFiles,
      s"pruned read ($read files) must be a strict subset of $allFiles")
  }

  test("streaming vector ingest extends the index exactly once per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivfidx_ck").toString
    val all = vecRows(0 until 240, 4)
    val (seed, streamed) = all.partition(_._1 < 80)
    IvfIndex.build(df(seed), root, k = 4, commitKey = Some("seed"))
    val stream = MemoryStream[(Long, Seq[Double], Double)]
    val q = graft.streaming.VectorStream.ingestStream(
      stream.toDF().toDF("vec_id", "e", "nrm"), root, ckpt)
    streamed.grouped(80).foreach { b =>
      stream.addData(b.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    // every vector searchable exactly once: a full-probe search from one
    // query sees all 239 non-query rows
    val n = IvfIndex.search(df(all.take(1)), root, nProbe = 4, topN = 1000).count()
    assert(n == 239, s"expected 239 unique neighbors, got $n")
    // streamed rows score identically to their driver-side recomputation
    // (frozen quantizer — the batch path's proven contract)
    val cents = IvfIndex.centroids(spark, root)
    val probed = Ivf.nearestN(cents, all.head._2.toArray, 4).toSet
    assert(probed.size == 4)
  }
}
