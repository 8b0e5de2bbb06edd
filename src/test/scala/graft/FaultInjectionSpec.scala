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

  /** Round-12 verdict #4: the OTHER exactly-once race — two attempts of
    * the same logical write BOTH running to completion (speculation /
    * zombie executors). Local mode cannot enable real speculation on the
    * shared TestSpark scheduler, so the test injects the zombie's
    * observable effect directly: part files FLUSHED into the commit
    * directory outside the committed output set, while the write is in
    * flight. Three layers kill a duplicate, and each is pinned here or
    * in the test below:
    *
    *  1. racing attempts of one TASK — Spark's OutputCommitCoordinator
    *     grants commit rights to one attempt; the committer's cleanupJob
    *     removes the loser's `_temporary` workspace (zombie z1);
    *  2. a zombie flush that OUTLIVES the committer (late write after
    *     cleanup, or a custom-committer staging dir) — writeData's
    *     manifest listing refuses any path with a hidden segment, so
    *     the duplicate is never blessed (zombie z2), and vacuum reclaims
    *     its bytes;
    *  3. racing WRITERS of one logical COMMIT — the manifest's
    *     exclusive-create plus the per-attempt commit-key re-check (next
    *     test). */
  test("zombie attempt files flushed into the commit dir are never manifested; vacuum reclaims them") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fault_zombie").toString + "/store"
    val store = new ManifestStore(root)
    // pre-built duplicate payload the zombie "flushes" (plain file copy
    // in the watcher thread — no concurrent Spark job needed)
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_zombie_src").toString
    spark.range(0, 100).toDF("id").coalesce(1).write
      .mode("overwrite").parquet(srcDir)
    val srcPart = new java.io.File(srcDir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    // watcher: the instant the append's commit dir appears, drop two
    // zombie part files — one inside the committer's workspace (z1), one
    // in a staging dir the committer does not own (z2)
    @volatile var zombiePaths: Seq[java.io.File] = Nil
    val dataDir = new java.io.File(s"$root/data")
    val watcher = new Thread(() => {
      var commit: Option[java.io.File] = None
      val deadline = System.currentTimeMillis() + 10000
      while (commit.isEmpty && System.currentTimeMillis() < deadline) {
        commit = Option(dataDir.listFiles()).flatMap(_.find(_.isDirectory))
        if (commit.isEmpty) Thread.sleep(10)
      }
      commit.foreach { c =>
        val z1 = new java.io.File(c,
          "_temporary/0/_temporary/attempt_zombie_m_000002_9/part-00002-zombie.parquet")
        val z2 = new java.io.File(c, "_zombie_staging/part-00002-zombie.parquet")
        Seq(z1, z2).foreach { z =>
          z.getParentFile.mkdirs()
          java.nio.file.Files.copy(srcPart, z.toPath)
        }
        zombiePaths = Seq(z1, z2)
      }
    })
    watcher.start()
    // the slow partition keeps the job in flight long enough for the
    // watcher to land its zombies before the committer finishes
    val slow = spark.range(0, 1000).repartition(4).mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 3) Thread.sleep(2000)
      it
    }
    store.append(spark, slow.toDF("id"), rangeCol = Some("id"))
    watcher.join(12000)
    assert(zombiePaths.nonEmpty, "watcher never saw the commit dir")
    val Seq(z1, z2) = zombiePaths
    // layer 1: the committer's cleanupJob removed its own workspace —
    // and the in-workspace zombie with it
    assert(!z1.exists(), "committer left its _temporary workspace behind")
    // layer 2: the out-of-workspace zombie survived on disk but was NOT
    // manifested — no duplicate rows, exact content
    assert(z2.exists(), "test setup: staging zombie should survive the committer")
    val got = store.read(spark).get.select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 1000L),
      s"zombie flush broke exactly-once: ${got.length} rows, " +
        s"dups=${got.length - got.distinct.length}")
    assert(!store.currentFiles(spark).exists(_.contains("_zombie_staging")),
      "manifest blessed a zombie staging file")
    // ...and vacuum reclaims the zombie's bytes without touching live data
    store.vacuum(spark, keepVersions = 1, minDataAgeMs = 0L)
    assert(!z2.exists(), "vacuum left the zombie staging file")
    assert(store.read(spark).get.count() == 1000)
  }

  test("two complete writers racing the SAME commit key publish exactly one copy") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fault_dupkey").toString + "/store"
    // two INDEPENDENT store instances (per-instance locks — the race is
    // real), same root, same logical commit: the speculative-job shape,
    // where both runs complete and both try to publish
    val a = new ManifestStore(root)
    val b = new ManifestStore(root)
    val df = spark.range(0, 500).toDF("id")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(a, b).map { st =>
      new Thread(() => {
        try st.append(spark, df, rangeCol = Some("id"),
          commitKey = Some("batch-42"))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    assert(errs.isEmpty, s"racing writer threw: ${errs.peek()}")
    // exactly one copy of the batch is visible — the loser's complete,
    // fully-written attempt was disarmed by the commit-key re-check
    // inside the manifest's exclusive-create retry loop
    val got = a.read(spark).get.select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 500L),
      s"duplicate-commit race broke exactly-once: ${got.length} rows")
    // a replay AFTER the race is still a no-op
    a.append(spark, df, rangeCol = Some("id"), commitKey = Some("batch-42"))
    assert(a.read(spark).get.count() == 500)
    // the loser's data directory is an invisible orphan; one vacuum
    // reclaims it and data/ converges to the single winning commit
    a.vacuum(spark, keepVersions = 1, minDataAgeMs = 0L)
    val commitDirs = Option(new java.io.File(s"$root/data").listFiles())
      .map(_.count(_.isDirectory)).getOrElse(0)
    assert(commitDirs == 1,
      s"expected 1 surviving commit dir after vacuum, found $commitDirs")
    assert(a.read(spark).get.count() == 500)
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

  test("a '_'-prefixed partition COLUMN keeps its committed files (partition dirs are not committer workspace)") {
    // r13 ADVICE #2: the zombie-attempt filter rejects hidden-prefixed
    // path SEGMENTS, but `_c0=value` is legitimate partitionBy output —
    // a partition column named with Spark's auto-generated `_c0` (or any
    // user `_name`) must not make its committed data silently vanish
    val root = java.nio.file.Files
      .createTempDirectory("graft_fault_hidden_part").toString + "/store"
    val store = new ManifestStore(root)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "_c0")
    store.append(spark, df, partitionCols = Seq("_c0"))
    val got = store.read(spark).get
    assert(got.count() == 3, "files under _c0=... vanished from the manifest")
    assert(got.select("_c0").distinct().count() == 2)
    // while genuinely hidden COMMITTER segments still never manifest
    assert(store.currentFiles(spark).forall(f =>
      !f.contains("/_temporary/") && !f.contains("/.staging/")))
  }
}
