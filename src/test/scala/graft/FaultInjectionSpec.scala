package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import graft.ingest.{Demux, ManifestStore}
import graft.fixtures.MakerFixtures

/** Fault-injection exactly-once ingest (round-12 agenda #5): a task that
  * DIES mid-write on attempt 0 and succeeds on the retry — the failure
  * mode a 1000-executor cluster hits hourly — must leave the store
  * byte-identical to the no-failure run: no duplicate rows from the dead
  * attempt's partial file, no lost rows, no orphan visible to any
  * reader. TestSpark runs `local[4, 2]` so Spark actually retries
  * (local[N] defaults to maxFailures=1, which aborts the job instead —
  * hiding the entire failure mode from the suite). */
class FaultInjectionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** id-dataset whose partition 2 throws MID-ITERATION on attempt 0 —
    * after emitting some rows, so the dying attempt has really started
    * writing its part file — and streams clean on the retry. */
  private def flakyIds(n: Long) =
    spark.range(0, n).repartition(4).mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 2 && tc.attemptNumber() == 0)
        it.zipWithIndex.map { case (x, i) =>
          if (i == 40) throw new RuntimeException("injected attempt-0 failure")
          x
        }
      else it
    }

  test("append under a mid-write task failure is exactly-once") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fault_append").toString + "/store"
    val store = new ManifestStore(root)
    store.append(spark, flakyIds(1000).toDF("id"), rangeCol = Some("id"))
    // contents identical to the no-failure run: every id exactly once
    val got = store.read(spark).get.select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 1000L),
      s"retry broke exactly-once: ${got.length} rows, " +
        s"dups=${got.length - got.distinct.length}")
    // the dead attempt's partial file is invisible: every .parquet on
    // disk under data/ is listed in the manifest (the committer confined
    // attempt output to _temporary and the manifest only blessed
    // committed files)
    val manifested = store.currentFiles(spark).map(
      p => new java.io.File(p).getCanonicalPath).toSet
    def walk(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
    }
    val onDisk = walk(new java.io.File(s"$root/data"))
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getCanonicalPath).toSet
    assert(onDisk == manifested,
      s"orphan attempt files on disk: ${(onDisk -- manifested).take(3)}; " +
        s"manifest-only: ${(manifested -- onDisk).take(3)}")
  }

  test("demux pipeline under a task failure: tagged counts match the clean run") {
    val logs = MakerFixtures.rawLogs(spark)
    val clean = Demux.tagged(logs, MakerFixtures.fixtureDefs)
      .filter(col("table_name").isNotNull)
      .groupBy("table_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // inject a one-attempt failure INTO the log stream feeding demux
    val flakyLogs = logs.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        it.zipWithIndex.map { case (r, i) =>
          if (i == 25) throw new RuntimeException("injected demux failure")
          r
        }
      else it
    }(logs.encoder)
    val retried = Demux.tagged(flakyLogs, MakerFixtures.fixtureDefs)
      .filter(col("table_name").isNotNull)
      .groupBy("table_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(retried == clean && clean.nonEmpty,
      s"demux under retry diverged: $retried vs $clean")
  }

  test("a writer that crashed between data-write and manifest-commit leaves an invisible orphan; vacuum reclaims it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fault_orphan").toString + "/store"
    val store = new ManifestStore(root)
    store.append(spark, spark.range(0, 100).toDF("id"), rangeCol = Some("id"))
    // simulate the crash window: a full data directory exists but no
    // manifest ever blessed it (the writer died pre-commit)
    val orphanDir = s"$root/data/${java.util.UUID.randomUUID()}"
    spark.range(500, 600).toDF("id").write.parquet(orphanDir)
    // invisible to every reader
    assert(store.read(spark).get.count() == 100)
    // ...and reclaimed by vacuum once past the age floor (0 here)
    store.vacuum(spark, keepVersions = 1, minDataAgeMs = 0L)
    assert(!new java.io.File(orphanDir).exists(),
      "vacuum left the crashed writer's orphan directory")
    assert(store.read(spark).get.count() == 100,
      "vacuum touched committed data")
  }

  test("a NESTED dead commit dir (partitioned orphan) is reclaimed by ONE vacuum") {
    // dead files live in partition SUBDIRS: deleting them bumps the
    // subdir mtimes, so a naive post-delete youth re-listing would keep
    // the dir alive for an extra age window — the pre-delete snapshot
    // must not mistake the vacuum's own deletions for writer activity
    val root = java.nio.file.Files
      .createTempDirectory("graft_fault_nested").toString + "/store"
    val store = new ManifestStore(root)
    store.append(spark, spark.range(0, 50).toDF("id"), rangeCol = Some("id"))
    val orphanDir = s"$root/data/${java.util.UUID.randomUUID()}"
    spark.range(0, 40).toDF("id").withColumn("k", col("id") % 4)
      .write.partitionBy("k").parquet(orphanDir)
    store.vacuum(spark, keepVersions = 1, minDataAgeMs = 0L)
    assert(!new java.io.File(orphanDir).exists(),
      "nested orphan dir survived the vacuum that emptied it")
    assert(store.read(spark).get.count() == 50)
  }
}
