package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.ops.AnnIndex

/** Persisted ANN inverted lists: build-once semantics, fingerprint-keyed
  * paths, and — the load-bearing property — partition-PRUNED probes that
  * physically read fewer files than the artifact holds. */
class AnnIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def countParquetFiles(path: String): Int = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk) else Iterator(f)
    walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no parquet scan in plan"))
  }

  test("ensure builds once; a second ensure is a no-op even across clearReady") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx1").toString
    var builds = 0
    val path = AnnIndex.path(dir, "t1", (42L, 7L))
    def build() = {
      builds += 1
      (0L until 40L).map(i => (i, i % 4)).toDF("vec_id", "cluster")
    }
    AnnIndex.ensure(spark, path, "cluster", build _)
    AnnIndex.ensure(spark, path, "cluster", build _) // ready-set hit
    AnnIndex.clearReady()
    AnnIndex.ensure(spark, path, "cluster", build _) // disk hit
    assert(builds == 1)
    assert(spark.read.parquet(path).count() == 40)
  }

  test("a probe reads ONLY the probed partitions' files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx2").toString
    val path = AnnIndex.path(dir, "t2", (1L, 2L))
    AnnIndex.ensure(spark, path, "cluster", () =>
      (0L until 80L).map(i => (i, i % 8)).toDF("vec_id", "cluster"))
    val total = countParquetFiles(path)
    assert(total >= 8, s"expected >=1 file per partition, saw $total")
    val pruned = AnnIndex.readPruned(spark, path, "cluster", Seq(2L, 5L))
    assert(pruned.collect().map(_.getAs[Long]("vec_id")).forall(i => i % 8 == 2 || i % 8 == 5))
    val scan = scanOf(pruned)
    assert(scan.toString.contains("PartitionFilters"), scan.toString)
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < total,
      s"probe read $filesRead of $total files — partition pruning is not happening")
  }

  test("fingerprint and corpus path are part of the artifact identity") {
    val a = AnnIndex.path("/tmp/x/corpus", "t", (1L, 1L))
    val b = AnnIndex.path("/tmp/x/corpus", "t", (1L, 2L)) // changed corpus
    val c = AnnIndex.path("/tmp/y/corpus", "t", (1L, 1L)) // same basename, other dir
    assert(a != b && a != c && b != c)
  }

  test("IVF search plan probes the persisted lists partition-pruned, never the corpus") {
    val sf = "/root/testdata/sf0.001"
    val ann = graft.ops.Ivf.topKIvf(spark, sf)
    ann.collect()
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("graft_ann_ivfflat"), plan)
    // the search plan itself must not rescan the embeddings table — the
    // corpus appears only at index-build/query-collect time
    assert(!plan.contains("embeddings.parquet"), plan)
  }

  test("LSH search plan probes the persisted buckets partition-pruned, never the corpus") {
    val sf = "/root/testdata/sf0.001"
    val ann = graft.ops.Similarity.topKLsh(spark, sf)
    ann.collect()
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("graft_ann_lshbkt"), plan)
    assert(!plan.contains("embeddings.parquet"), plan)
  }
}
