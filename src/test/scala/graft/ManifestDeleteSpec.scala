package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.ManifestStore

/** Copy-on-write DELETE: atomicity, file-level pruning (untouched files
  * are not rewritten), keyed replay, and the audit/time-travel contract. */
class ManifestDeleteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): ManifestStore =
    new ManifestStore(
      Files.createTempDirectory("graft_delete_spec").toString)

  test("delete rewrites only files containing matches; others stay byte-identical entries") {
    val store = freshStore()
    // commit 1: no victims; commit 2: contains the victim user
    store.append(spark, Seq((1L, 10L, "a"), (2L, 11L, "b"))
      .toDF("event_id", "user_id", "payload"), rangeCol = Some("event_id"))
    store.append(spark, Seq((3L, 66L, "c"), (4L, 12L, "d"))
      .toDF("event_id", "user_id", "payload"), rangeCol = Some("event_id"))
    val before = store.currentFiles(spark).toSet
    val vBefore = store.currentVersion(spark)

    val n = store.delete(spark, col("user_id") === 66L,
      commitKey = Some("req-1"))
    assert(n == 1L)
    val after = store.currentFiles(spark).toSet
    // commit-1 files (the no-victim commit) must survive UNREWRITTEN
    val kept = before.intersect(after)
    assert(kept.nonEmpty, "no untouched file survived — delete rewrote everything")
    assert(before.diff(after).nonEmpty, "no file was replaced")
    // surviving rows are exactly the non-matching ones
    val rows = store.read(spark).get.select("event_id", "user_id")
      .as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 10L), (2L, 11L), (4L, 12L)))
    // audit: the pre-delete snapshot is still time-travelable
    val old = store.readVersion(spark, vBefore).get
      .select("event_id").as[Long].collect().toSet
    assert(old == Set(1L, 2L, 3L, 4L))
    // keyed replay is a no-op (same request id)
    assert(store.delete(spark, col("user_id") === 66L,
      commitKey = Some("req-1")) == 0L)
    assert(store.currentFiles(spark).toSet == after)
  }

  test("no-match delete leaves the manifest file set unchanged") {
    val store = freshStore()
    store.append(spark, Seq((1L, 10L, "a")).toDF("event_id", "user_id", "payload"),
      rangeCol = Some("event_id"))
    val before = store.currentFiles(spark).toSet
    val vBefore = store.currentVersion(spark)
    assert(store.delete(spark, col("user_id") === 999L) == 0L)
    assert(store.currentFiles(spark).toSet == before)
    // a no-change commit publishes NOTHING: victimless deletes (and
    // empty catch-ups, straddle-free expiries) must not churn versions —
    // every consumer keyed on currentVersion would refresh for nothing
    assert(store.currentVersion(spark) == vBefore,
      "victimless delete must not bump the version")
    store.append(spark, spark.emptyDataFrame.selectExpr(
      "CAST(1 AS BIGINT) AS event_id", "CAST(1 AS BIGINT) AS user_id",
      "'x' AS payload").limit(0), rangeCol = Some("event_id"))
    assert(store.currentVersion(spark) == vBefore,
      "an empty append must not bump the version")
    // KEYED empty appends skip too (noopSkippableWithKey): replaying an
    // unrecorded empty batch re-appends nothing, so an empty streaming
    // micro-batch with a batch-id key must not churn versions either
    store.append(spark, spark.emptyDataFrame.selectExpr(
      "CAST(1 AS BIGINT) AS event_id", "CAST(1 AS BIGINT) AS user_id",
      "'x' AS payload").limit(0), rangeCol = Some("event_id"),
      commitKey = Some("empty-batch-1"))
    assert(store.currentVersion(spark) == vBefore,
      "a keyed empty append must not bump the version")
    // ...but a keyed VICTIMLESS DELETE must still record its key (the
    // replay-after-backfill hazard), which requires a commit
    assert(store.delete(spark, col("user_id") === 999L,
      commitKey = Some("forget-999")) == 0L)
    assert(store.currentVersion(spark) == vBefore + 1,
      "a keyed victimless delete must commit to record its key")
    assert(store.currentFiles(spark).toSet == before)
  }

  test("merge upserts by key: matched rows replaced, new rows inserted, untouched files kept") {
    val store = freshStore()
    store.append(spark, Seq((1L, 10L, "a"), (2L, 11L, "b"))
      .toDF("event_id", "user_id", "payload"), rangeCol = Some("event_id"))
    store.append(spark, Seq((3L, 12L, "c"))
      .toDF("event_id", "user_id", "payload"), rangeCol = Some("event_id"))
    val before = store.currentFiles(spark).toSet
    // update key 3, insert key 9 — commit-1's file holds no matched key
    store.merge(spark, Seq((3L, 99L, "C2"), (9L, 13L, "new"))
      .toDF("event_id", "user_id", "payload"), Seq("event_id"),
      commitKey = Some("merge-1"))
    val after = store.currentFiles(spark).toSet
    assert(before.intersect(after).nonEmpty, "untouched commit was rewritten")
    val rows = store.read(spark).get
      .select("event_id", "user_id", "payload")
      .as[(Long, Long, String)].collect().toSet
    assert(rows == Set((1L, 10L, "a"), (2L, 11L, "b"),
      (3L, 99L, "C2"), (9L, 13L, "new")))
    // keyed replay is a no-op
    store.merge(spark, Seq((3L, 0L, "x")).toDF("event_id", "user_id", "payload"),
      Seq("event_id"), commitKey = Some("merge-1"))
    assert(store.read(spark).get.filter(col("event_id") === 3L)
      .select("payload").as[String].head() == "C2")
    // no-match merge degrades to a pure append (zero rewrites)
    val pre = store.currentFiles(spark).toSet
    store.merge(spark, Seq((50L, 1L, "z")).toDF("event_id", "user_id", "payload"),
      Seq("event_id"))
    assert(pre.subsetOf(store.currentFiles(spark).toSet))
  }

  test("expire drops wholly-old files from stats alone and rewrites only straddlers") {
    val store = freshStore()
    def batch(from: Long, to: Long) =
      (from to to).map(i => (i, s"p$i")).toDF("event_id", "payload")
        .repartition(1)
    store.append(spark, batch(1, 10), rangeCol = Some("event_id"))
    store.append(spark, batch(11, 20), rangeCol = Some("event_id"))
    store.append(spark, batch(21, 30), rangeCol = Some("event_id"))
    val before = store.currentFiles(spark)
    val newest = before.last // commit 3's file
    val (dropped, rewritten) = store.expire(spark, 15L,
      commitKey = Some("ttl-1"))
    assert((dropped, rewritten) == ((1, 1)), s"got ($dropped, $rewritten)")
    val after = store.currentFiles(spark)
    // the wholly-retained file keeps its entry byte-identical; the
    // wholly-expired file is gone; the straddler was replaced
    assert(after.contains(newest))
    assert(!after.exists(before.take(1).contains), "commit-1 file survived")
    val rows = store.read(spark).get.select("event_id")
      .as[Long].collect().toSet
    assert(rows == (15L to 30L).toSet)
    // keyed replay is a no-op
    assert(store.expire(spark, 15L, commitKey = Some("ttl-1")) == ((0, 0)))
    assert(store.currentFiles(spark).toSet == after.toSet)
    // stats pruning still works on the survivor set
    assert(store.statsMax(spark).contains(30L))
  }

  test("delete preserves the recorded range column (stats pruning survives)") {
    val store = freshStore()
    store.append(spark, (1L to 40L).map(i => (i, i % 7, s"p$i"))
      .toDF("event_id", "user_id", "payload"), rangeCol = Some("event_id"))
    store.delete(spark, col("user_id") === 3L)
    // resume watermark still computable from stats after the rewrite
    assert(store.statsMax(spark).contains(40L))
    val got = store.readRange(spark, 10L, 20L).get
      .select("event_id").as[Long].collect().toSet
    assert(got == (10L to 20L).filter(_ % 7 != 3).toSet)
  }

  test("store_merge_upsert gate equals a direct Spark reconstruction of the merged table") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.ingest.Forget.storeMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val expected = ev.filter(col("event_id") % 10 =!= 0)
      .unionByName(ev.filter(col("event_id") % 10 === 0)
        .withColumn("event_type", lit("updated"))
        .withColumn("value", col("value") + 1000.0))
      .unionByName(ev.filter(col("event_id") % 17 === 0)
        .select((col("event_id") + 1000000L).as("event_id"), col("user_id"),
          lit("inserted").as("event_type"), col("value")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }
}
