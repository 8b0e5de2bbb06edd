package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Concurrent-execution smoke gates (round-10 agenda #1 and #6).
  *
  * A real cluster — and the driver's 100 TB story — runs queries
  * concurrently by default, yet until this spec every gate and the bench
  * were sequential. Two classes of global state are exercised here:
  *
  *  1. SESSION-GLOBAL state under concurrent QUERIES on one
  *     SparkSession: the shared function registry
  *     ([[graft.codec.GraftFunctions.register]] is called from inside
  *     query functions), the TruthCache / AnnIndex artifact memos
  *     (double-checked builds with atomic publication), and the
  *     PageRank loops' private session clones. The gate: a
  *     representative mix run from N threads must produce hashes
  *     IDENTICAL to the sequential run of the same mix.
  *
  *  2. STORE-GLOBAL state under concurrent WRITERS: two independent
  *     ManifestStore instances on one root committing at once
  *     (append+append, append+delete). The exclusive-create commit
  *     protocol (ManifestStore.commitWith) must serialize them with
  *     ZERO lost updates — the failure mode at 100 TB is a streaming
  *     ingester and a compactor silently dropping each other's files.
  */
class ConcurrencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Order-insensitive deterministic value hash of a result. */
  private def hashOf(df: DataFrame): String = {
    val rows = df.collect().map(_.toString).sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The representative mix: a TruthCache consumer (graph_triangles), a
    * register-inside-the-query SQL gate (events_heavy_discover), a
    * multi-round loop on a private session clone (graph_pagerank), a
    * sketch-registry SQL gate (events_histogram), and a plain relational
    * query — five distinct global-state profiles. */
  private val mix = Seq("graph_triangles", "events_heavy_discover",
    "graph_pagerank", "events_histogram", "q01_agg")

  test("N threads on one session: hashes identical to sequential") {
    val queries = SparkEntry.queries
    // concurrent pass FIRST: on a fresh build the TruthCache/artifact
    // stores are cold, so the 4 threads race the double-checked builds —
    // the exact race a warm sequential pass would mask
    val threads = 4
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          // each thread runs the whole mix, rotated so different queries
          // overlap across threads at any instant
          val rotated = mix.drop(t % mix.size) ++ mix.take(t % mix.size)
          rotated.foreach { n =>
            try results.add(n -> hashOf(queries(n)(spark, dir)))
            catch { case e: Throwable => errors.add(e) }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "mix timed out")
    assert(errors.isEmpty,
      s"concurrent failures: ${errors.toArray.toSeq.map(_.toString).take(3)}")
    import scala.jdk.CollectionConverters._
    val byName = results.asScala.toSeq.groupBy(_._1)
    assert(byName.keySet == mix.toSet)
    // sequential truth, computed after — determinism makes order moot
    val expected = mix.map(n => n -> hashOf(queries(n)(spark, dir))).toMap
    byName.foreach { case (n, rs) =>
      assert(rs.size == threads)
      rs.foreach { case (_, h) =>
        assert(h == expected(n), s"$n diverged under concurrency")
      }
    }
    // the sequential "truth" above reads the same caches the racing pass
    // built — a deterministically CORRUPTED artifact would agree with
    // itself. Recompute the cache-consuming queries under a never-seen
    // version key (fresh cache path, full rebuild from the corpus) and
    // require agreement with what the raced caches served.
    // unique per RUN: a constant key would resolve to a prior run's
    // persisted cache on an unchanged build and silently skip the
    // rebuild this check exists for
    val freshVer = Some((System.nanoTime(), 0x73570001L))
    assert(hashOf(graft.ops.PageRank.triangles(spark, dir, freshVer)) ==
      expected("graph_triangles"),
      "raced triangle caches diverge from an independent rebuild")
    assert(hashOf(graft.ops.PageRank.pagerank(spark, dir, freshVer)) ==
      expected("graph_pagerank"),
      "raced edge caches diverge from an independent rebuild")
  }

  test("function registration is once-per-session and race-free") {
    assert(graft.codec.GraftFunctions.isRegistered(spark))
    // a fresh session instance is unregistered until first register;
    // concurrent registration on it must leave a usable registry
    val s2 = spark.newSession()
    assert(!graft.codec.GraftFunctions.isRegistered(s2))
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until 8).foreach { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            graft.codec.GraftFunctions.register(s2)
            // immediately plan a query through every registration family:
            // scalar (rad), aggregate (cms), TVF (generate_series)
            val r = s2.sql(
              "SELECT cms_estimate(cms_agg(h), 3) AS e" +
                " FROM VALUES (CAST(1 AS BIGINT)), (CAST(3 AS BIGINT)) AS t(h)").head()
            assert(r.getLong(0) == 1L)
            assert(s2.sql("SELECT count(*) AS n FROM generate_series(1, 10)")
              .head().getLong(0) == 10L)
          } catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"registration race: ${errs.toArray.toSeq.take(3)}")
    assert(graft.codec.GraftFunctions.isRegistered(s2))
  }

  test("concurrent writers on one store root: no lost update (append+append)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_conc_store").toString
    import spark.implicits._
    // two INDEPENDENT store instances (the instance-level `synchronized`
    // on append covers one JVM object only — separate instances exercise
    // the cross-process exclusive-create protocol)
    val a = new graft.ingest.ManifestStore(root)
    val b = new graft.ingest.ManifestStore(root)
    new graft.ingest.ManifestStore(root).append(spark,
      Seq((0L, "seed")).toDF("id", "src"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(st: graft.ingest.ManifestStore, tag: String, base: Long) =
      new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until 5).foreach { i =>
            st.append(spark, Seq((base + i, tag)).toDF("id", "src"))
          } catch { case e: Throwable => errs.add(e) }
        }
      }
    pool.submit(writer(a, "a", 100L))
    pool.submit(writer(b, "b", 200L))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"concurrent append failed: ${errs.toArray.toSeq.take(2)}")
    // every commit serialized into its own version, zero lost updates
    val fresh = new graft.ingest.ManifestStore(root)
    assert(fresh.currentVersion(spark) == 11L,
      "11 commits (1 seed + 2×5 appends) must yield 11 versions")
    val ids = fresh.read(spark).get.select("id").as[Long].collect().sorted
    assert(ids.toSeq == (Seq(0L) ++ (100L to 104L) ++ (200L to 204L)),
      s"lost update: ${ids.mkString(",")}")
  }

  test("concurrent refreshes of one matview: one delta fold, never a double-count") {
    // two refreshers racing the same source version: the refresh commit
    // is keyed refresh@<version>, so exactly one folds the delta and the
    // loser replays into a no-op — a double-fold would double-count n
    import graft.ingest.{ManifestStore, MatView}
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_conc_mv")
    val src = new ManifestStore(s"$tmp/src")
    src.append(spark, (0L until 500L).map(i => (i, i % 7)).toDF("id", "grp"))
    val view = new MatView(s"$tmp/view", Seq("grp"), "id")
    view.refresh(spark, src)
    src.append(spark, (500L until 900L).map(i => (i, i % 7)).toDF("id", "grp"))
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until 4).foreach { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try view.refresh(spark, src)
          catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"concurrent refresh failed: ${errs.toArray.toSeq.take(2)}")
    val n = view.state(spark).get
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(n == 900L, s"delta folded more than once: total n = $n")
  }

  test("concurrent append+delete on one root: both land, neither drops the other") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_conc_store_ad").toString
    import spark.implicits._
    val seedStore = new graft.ingest.ManifestStore(root)
    seedStore.append(spark,
      (0L until 100L).map(i => (i, "seed")).toDF("id", "src"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new graft.ingest.ManifestStore(root)
    val deleter = new graft.ingest.ManifestStore(root)
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        try appender.append(spark,
          (1000L until 1020L).map(i => (i, "late")).toDF("id", "src"))
        catch { case e: Throwable => errs.add(e) }
      }
    })
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        try deleter.delete(spark, col("id") < 50L)
        catch { case e: Throwable => errs.add(e) }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"append+delete race failed: ${errs.toArray.toSeq.take(2)}")
    val fresh = new graft.ingest.ManifestStore(root)
    val ids = fresh.read(spark).get.select("id").as[Long].collect().sorted
    // whichever order the commits serialized in, the final snapshot has
    // the survivors of the delete AND the appended batch — a dropped
    // append (or resurrected deleted rows) is the lost-update bug.
    // Caveat stated in ManifestStore's own docs: delete's rewrite targets
    // the files of the snapshot it read; the concurrent append's files
    // were not in it, so appended rows are never scanned for deletion —
    // which is exactly the isolation we assert.
    assert(ids.toSeq == ((50L until 100L) ++ (1000L until 1020L)),
      s"append+delete lost an update: n=${ids.length}")
  }
}
