package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Right-to-be-forgotten pipeline over the manifest store: ingest →
  * copy-on-write [[ManifestStore.delete]] keyed by the forget-request id
  * → read back. The gate proves the whole loop end-to-end against the
  * DuckDB oracle: the surviving store contents equal the fixture minus
  * the forgotten users, the replayed request is a no-op, and untouched
  * files are not rewritten (asserted structurally in the spec).
  */
object Forget {

  /** Users to forget in the gate: user_id ≡ 0 (mod 13). */
  val ForgetMod = 13L

  private val builtRoots = scala.collection.mutable.Set[String]()

  /** Absolute-path-hashed per-dir store root (the
    * [[graft.ops.ExactIndex.gateRoot]] rule — alike-named dirs never
    * alias). */
  private[graft] def gateRoot(dir: String): String = {
    s"${System.getProperty("java.io.tmpdir")}/graft_forget_store_" +
      new java.io.File(dir).getName + "_" +
      graft.ops.CorpusId.hex(dir)
  }

  /** Build (once per session) the gate store: ingest events in two
    * appends (so the delete provably leaves untouched FILES alone, not
    * just untouched rows), run the keyed delete, replay it. */
  private[graft] def builtStore(s: SparkSession, dir: String): ManifestStore = {
    val root = gateRoot(dir)
    builtRoots.synchronized {
      // BuildLog-named (causal cold-cost attribution): gate-side store
      // builds must show up as named builds, not unattributed noise
      if (!builtRoots.contains(root)) graft.ops.BuildLog.timed("forget_gate_store") {
        val p = new Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val store = new ManifestStore(root)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        store.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        store.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        val n = store.delete(s, pmod(col("user_id"), lit(ForgetMod)) === 0,
          commitKey = Some("forget-req-1"))
        // replaying the same forget-request id must change nothing
        val replay = store.delete(s, pmod(col("user_id"), lit(ForgetMod)) === 0,
          commitKey = Some("forget-req-1"))
        require(replay == 0L, s"forget replay deleted $replay rows")
        require(n > 0L, "forget gate deleted nothing — inert predicate")
        builtRoots.add(root)
      }
    }
    new ManifestStore(root)
  }

  /** Gate: per-type counts + id checksum of the store AFTER the forget —
    * equality with the oracle proves the surviving row set exactly. */
  def storeDelete(s: SparkSession, dir: String): DataFrame =
    builtStore(s, dir).read(s).get
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("user_id")).as("user_sum"))
      .orderBy("event_type")

  /** TTL cutoff for [[storeExpire]] (event_id units). */
  val TtlCutoff = 500L

  private val expireRoots = scala.collection.mutable.Set[String]()

  /** Gate: retention expiry end-to-end — two appends split at
    * event_id 300 so the first commit lies WHOLLY below the cutoff and
    * must be dropped from stats alone (asserted structurally: the
    * expire returns ≥1 dropped file), then the surviving store equals
    * the fixture above the cutoff. */
  def storeExpire(s: SparkSession, dir: String): DataFrame = {
    val root = gateRoot(dir) + "_ttl"
    expireRoots.synchronized {
      if (!expireRoots.contains(root)) graft.ops.BuildLog.timed("ttl_gate_store") {
        val p = new Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val store = new ManifestStore(root)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        store.append(s, ev.filter(col("event_id") < 300),
          rangeCol = Some("event_id"))
        store.append(s, ev.filter(col("event_id") >= 300),
          rangeCol = Some("event_id"))
        val (dropped, rewritten) = store.expire(s, TtlCutoff,
          commitKey = Some("ttl-req-1"))
        require(dropped >= 1, s"no file dropped from stats alone ($dropped)")
        require(rewritten >= 1, s"no straddler rewritten ($rewritten)")
        require(store.expire(s, TtlCutoff, commitKey = Some("ttl-req-1")) ==
          ((0, 0)), "ttl replay was not a no-op")
        expireRoots.add(root)
      }
    }
    new ManifestStore(root).read(s).get
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"))
      .orderBy("event_type")
  }

  private val mergeRoots = scala.collection.mutable.Set[String]()

  /** Gate: copy-on-write MERGE (upsert) end-to-end — ingest events in
    * two appends (parity split, so matched keys span both commits'
    * files), then merge one batch that UPDATES every event_id ≡ 0
    * (mod 10) row (value + 1000, event_type → 'updated') and INSERTS a
    * shifted copy of every event_id ≡ 0 (mod 17) row. Structural
    * assertions: untouched files survive the flip by reference (no
    * full-table rewrite), and replaying the same commit key is a
    * no-op. The surviving row set is proven exactly by the rollup
    * against the oracle's UNION-reconstruction of the merged table. */
  def storeMerge(s: SparkSession, dir: String): DataFrame = {
    val root = gateRoot(dir) + "_merge"
    mergeRoots.synchronized {
      if (!mergeRoots.contains(root)) graft.ops.BuildLog.timed("merge_gate_store") {
        val p = new Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val store = new ManifestStore(root)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        store.append(s, ev.filter(col("event_id") % 2 === 0),
          rangeCol = Some("event_id"))
        store.append(s, ev.filter(col("event_id") % 2 === 1),
          rangeCol = Some("event_id"))
        val updates = ev.filter(col("event_id") % 10 === 0)
          .withColumn("event_type", lit("updated"))
          .withColumn("value", col("value") + 1000.0)
          .unionByName(ev.filter(col("event_id") % 17 === 0)
            .select((col("event_id") + 1000000L).as("event_id"),
              col("user_id"), lit("inserted").as("event_type"), col("value")))
        val before = store.currentFiles(s).toSet
        store.merge(s, updates, Seq("event_id"),
          commitKey = Some("merge-req-1"))
        val after = store.currentFiles(s).toSet
        require((before & after).nonEmpty,
          "merge rewrote every file — copy-on-write pruning is inert")
        require((after -- before).nonEmpty, "merge committed no fresh file")
        // replaying the same merge-request id must change nothing
        store.merge(s, updates, Seq("event_id"),
          commitKey = Some("merge-req-1"))
        require(store.currentFiles(s).toSet == after,
          "merge replay was not a no-op")
        mergeRoots.add(root)
      }
    }
    new ManifestStore(root).read(s).get
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_delete_forget" -> (storeDelete _),
    "store_expire_ttl" -> (storeExpire _),
    "store_merge_upsert" -> (storeMerge _))

  val oracle: Map[String, String] = Map(
    "store_merge_upsert" -> """
      WITH merged AS (
        SELECT event_id, user_id, event_type, value
        FROM events WHERE event_id % 10 <> 0
        UNION ALL
        SELECT event_id, user_id, 'updated' AS event_type,
          value + 1000 AS value
        FROM events WHERE event_id % 10 = 0
        UNION ALL
        SELECT event_id + 1000000 AS event_id, user_id,
          'inserted' AS event_type, value
        FROM events WHERE event_id % 17 = 0)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM merged
      GROUP BY event_type ORDER BY event_type""",
    "store_expire_ttl" -> s"""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events
      WHERE event_id >= $TtlCutoff
      GROUP BY event_type ORDER BY event_type""",
    "store_delete_forget" -> s"""
      SELECT event_type,
        COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum,
        CAST(SUM(user_id) AS BIGINT) AS user_sum
      FROM events
      WHERE user_id % $ForgetMod <> 0
      GROUP BY event_type ORDER BY event_type""")
}
