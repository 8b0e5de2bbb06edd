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

  test("slim LSH (ids + locator) returns exactly the inline index's listing") {
    val sf = "/root/testdata/sf0.001"
    val inline = graft.ops.Similarity.topKLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val slim = graft.ops.Similarity.topKLshSlim(spark, sf)
    val slimRows = slim.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(slimRows == inline,
      "identical planes/buckets must give the identical ranked listing")
    val plan = slim.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ann_lshslim"), plan)
    assert(plan.contains("graft_ann_ivfflat"), plan) // the one vector copy
    assert(!plan.contains("graft_ann_lshbkt"), plan) // no inline-vector read
    assert(!plan.contains("embeddings.parquet"), plan)
  }

  test("caller-supplied corpus version replaces the fingerprint and owns staleness") {
    import graft.ops.{Ivf, Similarity}
    val tmp = java.nio.file.Files.createTempDirectory("graft_annidx_ver").toString
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(64)(rnd.nextFloat())
    val base = (0L until 200L).map(i => (i, vec(), 0))
    def write(rows: Seq[(Long, Seq[Float], Int)]): Unit =
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    def search(version: (Long, Long)) = {
      spark.catalog.refreshByPath(s"$tmp/embeddings.parquet")
      val v = Similarity.rawVecs(Tables.load(spark, tmp, "embeddings"))
      Ivf.searchIvf(v, tmp, "embeddings", col("vec_id") < 3,
        version = Some(version))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    write(base)
    val r1 = search((1L, 99L))
    // rewrite every NON-query vector; plant query 0's vector at id 150
    val changed = base.map {
      case (150L, _, l) => (150L, base(0)._2, l)
      case (i, e, l) if i >= 3L => (i, vec(), l)
      case row => row
    }
    write(changed)
    // same version token → the stale index is served BY DESIGN: the
    // planted exact duplicate is invisible
    val r2 = search((1L, 99L))
    assert(r2 == r1, "unchanged version must serve the stale artifacts")
    // bumped version → rebuild sees the new corpus: the planted twin of
    // query 0 surfaces at rank 1 with cosine 1
    val r3 = search((2L, 100L))
    assert(r3 != r1)
    assert(r3.contains((0L, 1L, 150L)),
      s"planted exact duplicate must lead query 0's listing, got ${r3.take(5)}")
  }

  test("filtered search: every neighbor carries the target label; plan stays " +
      "pruned off the metadata-enriched lists, corpus untouched") {
    val sf = "/root/testdata/sf0.001"
    val ann = graft.ops.Ivf.topKIvfFiltered(spark, sf)
    val rows = ann.collect()
    assert(rows.nonEmpty)
    // the pre-filter is semantic, not just a plan shape: cross-check
    // every returned neighbor id against the fixture's label column
    val target = graft.ops.Ivf.FilterLabel
    val labels = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val nid = r.getLong(2)
      assert(labels(nid) == target, s"neighbor $nid has label ${labels(nid)}")
    }
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("graft_ann_ivfmeta"), plan)
    assert(!plan.contains("embeddings.parquet"), plan)
  }

  test("filtered search holds the gate's recall bound vs the exact filtered truth") {
    val sf = "/root/testdata/sf0.001"
    val row = graft.ops.Ivf.ivfFilteredRecall(spark, sf).head()
    assert(row.getBoolean(3),
      s"filtered recall below bound: expected=${row.getLong(1)} min_hits=${row.getLong(2)}")
  }
}
