package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Schema evolution end-to-end over the manifest store (round-11 agenda
  * #3): the 100 TB warehouse operations of ADDING and DROPPING a column
  * without rewriting history. `store_schema_evolution` ingests events
  * under the v1 schema, appends an evolved batch carrying a new `source`
  * column, proves a TYPE-CONFLICTING append is rejected loudly
  * (structurally, in the builder), and reads the store back across both
  * schema generations — old rows surface the new column as null
  * (merge-on-read union-by-name, [[ManifestStore.readFiles]]).
  * `store_drop_column` exercises [[ManifestStore.dropColumns]]:
  * metadata-only (zero data files touched), tombstoned re-add, pre-drop
  * time travel, replay no-op. Both rollups are proven exactly against
  * the DuckDB oracle's reconstruction. MERGE/matview behavior on evolved
  * schemas and the drop → compact → re-add lifecycle are spec'd in
  * SchemaEvolutionSpec. */
object Evolution {

  private val builtRoots = scala.collection.mutable.Set[String]()

  private[graft] def gateRoot(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_evolve_store_" +
      new java.io.File(dir).getName + "_" + graft.ops.CorpusId.hex(dir)

  /** The 4-column events projection both gate stores ingest. */
  private def events4(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** Shared build-once scaffolding: per-session memo, fresh-root wipe,
    * BuildLog naming (the causal cold-cost gate counts NAMED builds
    * only — an un-named store build would book as host noise and escape
    * the ceiling), then the gate-specific `build`. */
  private[ingest] def buildOnce(s: SparkSession, root: String, buildName: String)
                       (build: ManifestStore => Unit): ManifestStore = {
    builtRoots.synchronized {
      if (!builtRoots.contains(root)) graft.ops.BuildLog.timed(buildName) {
        val p = new Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        build(new ManifestStore(root))
        builtRoots.add(root)
      }
    }
    new ManifestStore(root)
  }

  /** Build (once per session): v1 append (even event_ids, 4 columns),
    * evolved append (odd event_ids, + `source`), conflict rejection. */
  private[graft] def builtStore(s: SparkSession, dir: String): ManifestStore =
    buildOnce(s, gateRoot(dir), "evolution_gate_store") { store =>
      val ev = events4(s, dir)
      store.append(s, ev.filter(col("event_id") % 2 === 0),
        rangeCol = Some("event_id"))
      val filesBefore = store.currentFiles(s).toSet
      // the evolved batch: same four columns plus a new `source`
      store.append(s, ev.filter(col("event_id") % 2 === 1)
          .withColumn("source",
            concat(lit("s"), (col("user_id") % 3).cast("string"))),
        rangeCol = Some("event_id"))
      // old files survive the evolution by reference — adding a column
      // must never rewrite history
      require(filesBefore.subsetOf(store.currentFiles(s).toSet),
        "schema evolution rewrote v1 files")
      // the recorded schema is the union, new column appended last
      require(store.currentSchema(s).exists(_.fieldNames.toSeq ==
        Seq("event_id", "user_id", "event_type", "value", "source")),
        s"evolved schema not recorded: ${store.currentSchema(s)}")
      // a TYPE CONFLICT is rejected loudly at commit time, not at some
      // future read: `value` arrives as string instead of double
      val conflict = scala.util.Try(store.append(s,
        ev.filter(col("event_id") === 0)
          .withColumn("value", col("value").cast("string"))))
      require(conflict.isFailure &&
        conflict.failed.get.getMessage.contains("type conflict"),
        s"type-conflicting append was not rejected: $conflict")
    }

  /** Gate: rollup by the EVOLVED column across both schema generations —
    * null for every v1 row (read as 'legacy'), populated for the evolved
    * batch. Equality with the oracle proves the merged read exactly. */
  def storeSchemaEvolution(s: SparkSession, dir: String): DataFrame =
    builtStore(s, dir).read(s).get
      .groupBy(coalesce(col("source"), lit("legacy")).as("src"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("src")

  /** Build (once per session) the column-drop gate store: two stats-
    * bearing appends of the 4-column events projection, then a
    * METADATA-ONLY drop of `user_id` — structurally asserted: zero data
    * files touched, the recorded schema loses the column, time travel
    * to the pre-drop version still shows it, a replayed drop is a
    * no-op, and re-adding the dropped name is tombstone-rejected. */
  private[graft] def builtDropStore(s: SparkSession, dir: String): ManifestStore =
    buildOnce(s, gateRoot(dir) + "_drop", "drop_gate_store") { store =>
      val ev = events4(s, dir)
      store.append(s, ev.filter(col("event_id") % 2 === 0),
        rangeCol = Some("event_id"))
      store.append(s, ev.filter(col("event_id") % 2 === 1),
        rangeCol = Some("event_id"))
      val filesBefore = store.currentFiles(s).toSet
      val vBefore = store.currentVersion(s)
      store.dropColumns(s, Seq("user_id"), commitKey = Some("drop-user-id-1"))
      // METADATA-ONLY: the drop touched zero data files
      require(store.currentFiles(s).toSet == filesBefore,
        "dropColumns rewrote data files - not metadata-only")
      require(store.currentSchema(s).exists(_.fieldNames.toSeq ==
        Seq("event_id", "event_type", "value")),
        s"dropped schema wrong: ${store.currentSchema(s)}")
      // replay of the same drop request is a no-op
      store.dropColumns(s, Seq("user_id"), commitKey = Some("drop-user-id-1"))
      require(store.currentVersion(s) == vBefore + 1, "drop replay committed")
      // time travel to the pre-drop snapshot still shows the column
      require(store.readVersion(s, vBefore).get.columns.contains("user_id"),
        "pre-drop time travel lost the dropped column")
      // re-adding the tombstoned name before a compaction is rejected
      val readd = scala.util.Try(store.append(s,
        ev.filter(col("event_id") === 0), rangeCol = Some("event_id")))
      require(readd.isFailure &&
        readd.failed.get.getMessage.contains("dropped"),
        s"tombstoned column re-add was not rejected: $readd")
    }

  /** Gate: the post-drop read — `user_id` unreachable, everything else
    * intact. The oracle reconstructs the same rollup from the fixture
    * WITHOUT user_id; the driver's column compare proves the projection
    * (a surviving user_id column would change the schema hash). */
  def storeDropColumn(s: SparkSession, dir: String): DataFrame =
    builtDropStore(s, dir).read(s).get
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("val_sum"))
      .orderBy("event_type")

  /** Build (once per session) the TYPE-WIDENING gate store (round-12
    * agenda #4): v1 appends `cnt` as INT and `amt` as DECIMAL(12,4);
    * the widened batch appends `cnt` as LONG with values past
    * Int.MaxValue — the counter-outgrows-int moment every production
    * ingest eventually hits — and `amt` as DECIMAL(24,4). Structurally
    * asserted: v1 files survive by reference (widening rewrites
    * nothing), the recorded schema takes the WIDER types, and the
    * NON-widening changes stay loudly rejected (decimal scale change,
    * numeric→string). A post-widening narrow append (upcast-on-read,
    * record unchanged) is spec'd in SchemaEvolutionSpec, where its
    * extra rows don't complicate this gate's oracle. */
  private[graft] def builtWideningStore(s: SparkSession, dir: String): ManifestStore =
    buildOnce(s, gateRoot(dir) + "_widen", "widening_gate_store") { store =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"))
      store.append(s, ev.filter(col("event_id") % 2 === 0)
          .withColumn("cnt", col("event_id").cast("int"))
          .withColumn("amt", (col("event_id") * lit(0.0625)).cast("decimal(12,4)")),
        rangeCol = Some("event_id"))
      val filesBefore = store.currentFiles(s).toSet
      store.append(s, ev.filter(col("event_id") % 2 === 1)
          .withColumn("cnt", col("event_id") + lit(3000000000L))
          .withColumn("amt", (col("event_id") * lit(0.0625) + lit(1.0e10))
            .cast("decimal(24,4)")),
        rangeCol = Some("event_id"))
      // widening is metadata-only: every narrow file survives by reference
      require(filesBefore.subsetOf(store.currentFiles(s).toSet),
        "type widening rewrote v1 files")
      val sc = store.currentSchema(s).get
      require(sc("cnt").dataType == org.apache.spark.sql.types.LongType &&
        sc("amt").dataType == org.apache.spark.sql.types.DecimalType(24, 4),
        s"widened schema not recorded: $sc")
      // NON-widening changes stay loud: a decimal SCALE change...
      val scaled = scala.util.Try(store.append(s,
        ev.filter(col("event_id") === 0)
          .withColumn("cnt", col("event_id").cast("int"))
          .withColumn("amt", (col("event_id") * lit(0.0625)).cast("decimal(24,2)"))))
      require(scaled.isFailure &&
        scaled.failed.get.getMessage.contains("type conflict"),
        s"decimal scale change was not rejected: $scaled")
      // ...and a numeric→string flip
      val flipped = scala.util.Try(store.append(s,
        ev.filter(col("event_id") === 0)
          .withColumn("cnt", col("event_id").cast("string"))
          .withColumn("amt", (col("event_id") * lit(0.0625)).cast("decimal(24,4)"))))
      require(flipped.isFailure &&
        flipped.failed.get.getMessage.contains("type conflict"),
        s"numeric->string change was not rejected: $flipped")
    }

  /** Gate: rollup across the widening boundary — old int/narrow-decimal
    * files and new long/wide-decimal files read back as ONE table at
    * the widened types; equality with the oracle's reconstruction
    * proves the upcast read exactly (a single value read at the wrong
    * width breaks the hash; cnt_max > Int.MaxValue proves the fixture
    * actually exercises the overflow regime). */
  def storeTypeWidening(s: SparkSession, dir: String): DataFrame =
    builtWideningStore(s, dir).read(s).get
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("cnt")).as("cnt_sum"),
        max(col("cnt")).as("cnt_max"),
        sum(col("amt")).cast("double").as("amt_sum"))
      .orderBy("event_type")

  /** Build (once per session) the RENAME gate store (round-12 agenda
    * #6): two appends under the v1 name, a METADATA-ONLY
    * `user_id`→`uid` rename, then a post-rename append already carrying
    * `uid` — so the gate's read spans files with BOTH physical names.
    * Structurally asserted: zero data files touched by the rename, the
    * recorded schema shows the new name in the old position, pre-rename
    * time travel shows the old name, a replayed rename is a no-op, and
    * re-adding the retired name is alias-rejected until compact(). */
  private[graft] def builtRenameStore(s: SparkSession, dir: String): ManifestStore =
    buildOnce(s, gateRoot(dir) + "_rename", "rename_gate_store") { store =>
      val ev = events4(s, dir)
      store.append(s, ev.filter(col("event_id") % 3 === 0),
        rangeCol = Some("event_id"))
      store.append(s, ev.filter(col("event_id") % 3 === 1),
        rangeCol = Some("event_id"))
      val filesBefore = store.currentFiles(s).toSet
      val vBefore = store.currentVersion(s)
      store.renameColumn(s, "user_id", "uid", commitKey = Some("ren-uid-1"))
      // METADATA-ONLY: the rename touched zero data files
      require(store.currentFiles(s).toSet == filesBefore,
        "renameColumn rewrote data files - not metadata-only")
      require(store.currentSchema(s).exists(_.fieldNames.toSeq ==
        Seq("event_id", "uid", "event_type", "value")),
        s"renamed schema wrong: ${store.currentSchema(s)}")
      // replay of the same rename request is a no-op
      store.renameColumn(s, "user_id", "uid", commitKey = Some("ren-uid-1"))
      require(store.currentVersion(s) == vBefore + 1, "rename replay committed")
      // pre-rename time travel shows the OLD name
      require(store.readVersion(s, vBefore).get.columns.contains("user_id"),
        "pre-rename time travel lost the old name")
      // the post-rename generation writes the NEW physical name
      store.append(s, ev.filter(col("event_id") % 3 === 2)
        .withColumnRenamed("user_id", "uid"), rangeCol = Some("event_id"))
      // re-adding the retired physical name pre-compact is rejected:
      // a new `user_id` would merge with pre-rename bytes in the union
      val readd = scala.util.Try(store.append(s,
        ev.filter(col("event_id") === 0)
          .withColumnRenamed("user_id", "uid")
          .withColumn("user_id", lit(-1L))))
      require(readd.isFailure &&
        readd.failed.get.getMessage.contains("retired"),
        s"retired-name re-add was not rejected: $readd")
    }

  /** Gate: rollup by the RENAMED column across all three generations —
    * pre-rename files (physical `user_id`) and post-rename files
    * (physical `uid`) must read back as ONE `uid` column, value-exact
    * against the oracle's reconstruction from the fixture. */
  def storeRenameColumn(s: SparkSession, dir: String): DataFrame =
    builtRenameStore(s, dir).read(s).get
      .groupBy((col("uid") % 7).as("uid_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("uid")).as("uid_sum"),
        sum(col("event_id")).as("id_sum"))
      .orderBy("uid_bucket")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_schema_evolution" -> (storeSchemaEvolution _),
    "store_drop_column" -> (storeDropColumn _),
    "store_type_widening" -> (storeTypeWidening _),
    "store_rename_column" -> (storeRenameColumn _))

  val oracle: Map[String, String] = Map(
    "store_schema_evolution" -> """
      WITH evolved AS (
        SELECT event_id, user_id, event_type, value,
          CAST(NULL AS VARCHAR) AS source
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_id, user_id, event_type, value,
          's' || CAST(user_id % 3 AS VARCHAR) AS source
        FROM events WHERE event_id % 2 = 1)
      SELECT COALESCE(source, 'legacy') AS src, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM evolved GROUP BY 1 ORDER BY 1""",
    "store_drop_column" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
      FROM events GROUP BY event_type ORDER BY event_type""",
    "store_type_widening" -> """
      WITH w AS (
        SELECT event_type, CAST(event_id AS BIGINT) AS cnt,
          CAST(event_id * CAST(0.0625 AS DOUBLE) AS DECIMAL(12,4)) AS amt
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_type, event_id + 3000000000,
          CAST(event_id * CAST(0.0625 AS DOUBLE) + 10000000000 AS DECIMAL(24,4))
        FROM events WHERE event_id % 2 = 1)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(cnt) AS BIGINT) AS cnt_sum,
        CAST(MAX(cnt) AS BIGINT) AS cnt_max,
        CAST(SUM(amt) AS DOUBLE) AS amt_sum
      FROM w GROUP BY event_type ORDER BY event_type""",
    "store_rename_column" -> """
      SELECT user_id % 7 AS uid_bucket, COUNT(*) AS n,
        CAST(SUM(user_id) AS BIGINT) AS uid_sum,
        CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM events GROUP BY 1 ORDER BY 1""")
}
