package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{ManifestStore, MatView}

/** ManifestStore merge-on-read schema evolution (round-11 agenda #3):
  * adding a column is an append (old files untouched, old rows read the
  * new column as null); changing a column's type is rejected loudly at
  * commit time; MERGE and incremental matviews keep working across the
  * schema boundary. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_evolve_$tag").toString + "/store"

  test("append with a new column: old rows null-filled, schema recorded, no rewrite") {
    val store = new ManifestStore(freshRoot("add"))
    store.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val filesV1 = store.currentFiles(spark).toSet
    store.append(spark,
      Seq((3L, "c", 0.5), (4L, "d", 1.5)).toDF("id", "name", "score"))
    // merge-on-read: one unioned table across both generations
    val rows = store.read(spark).get
      .select("id", "name", "score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5)), (4L, "d", Some(1.5))))
    // history untouched; recorded schema is the union with `score` last
    assert(filesV1.subsetOf(store.currentFiles(spark).toSet))
    assert(store.currentSchema(spark).map(_.fieldNames.toSeq)
      .contains(Seq("id", "name", "score")))
  }

  test("type conflict: append and merge both rejected loudly at commit time") {
    val store = new ManifestStore(freshRoot("conflict"))
    store.append(spark, Seq((1L, 10.0)).toDF("id", "v"))
    val appendErr = intercept[IllegalArgumentException] {
      store.append(spark, Seq((2L, "not-a-double")).toDF("id", "v"))
    }
    assert(appendErr.getMessage.contains("type conflict") &&
      appendErr.getMessage.contains("v"), appendErr.getMessage)
    val mergeErr = intercept[IllegalArgumentException] {
      store.merge(spark, Seq((1L, "clobber")).toDF("id", "v"), Seq("id"))
    }
    assert(mergeErr.getMessage.contains("type conflict"), mergeErr.getMessage)
    // the store is intact after both rejections: same single row, same schema
    assert(store.read(spark).get.collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 10.0)))
    assert(store.currentSchema(spark).map(_.fieldNames.toSeq)
      .contains(Seq("id", "v")))
  }

  test("case-variant column names are the SAME column: conflict caught, not appended as new") {
    // Spark's read-path resolution is case-insensitive by default, so a
    // `Value string` against a stored `v double`... must reject at commit
    // time, not surface as a read-time coercion of a 'new' column
    val store = new ManifestStore(freshRoot("case"))
    store.append(spark, Seq((1L, 10.0)).toDF("id", "value"))
    val err = intercept[IllegalArgumentException] {
      store.append(spark, Seq((2L, "oops")).toDF("id", "Value"))
    }
    assert(err.getMessage.contains("type conflict"), err.getMessage)
    // a case-variant with the SAME type is fine and does NOT add a column
    store.append(spark, Seq((3L, 30.0)).toDF("id", "VALUE"))
    assert(store.currentSchema(spark).get.fieldNames.length == 2)
    assert(store.read(spark).get.count() == 2L)
  }

  test("a type-conflicting append is rejected BEFORE any data file is written") {
    val root = freshRoot("prewrite")
    val store = new ManifestStore(root)
    store.append(spark, Seq((1L, 10.0)).toDF("id", "v"))
    def dataDirs(): Int = {
      val d = new java.io.File(s"$root/data")
      if (d.isDirectory) d.listFiles().length else 0
    }
    val before = dataDirs()
    intercept[IllegalArgumentException] {
      store.append(spark, Seq((2L, "not-a-double")).toDF("id", "v"))
    }
    assert(dataDirs() == before,
      "the rejected append wrote orphan data files before the schema check")
  }

  test("type widening: int→long + decimal growth widen the record; narrow appends upcast on read") {
    import org.apache.spark.sql.types.{LongType, DecimalType}
    val store = new ManifestStore(freshRoot("widen"))
    store.append(spark, Seq((1L, 10), (2L, 20)).toDF("id", "cnt"))
    // the int generation: cast down explicitly
    val store2 = new ManifestStore(freshRoot("widen2"))
    store2.append(spark, Seq((1L, 10), (2L, 20)).toDF("id", "cnt")
      .withColumn("cnt", col("cnt").cast("int"))
      .withColumn("amt", lit(1.5).cast("decimal(10,2)")))
    val filesV1 = store2.currentFiles(spark).toSet
    // the widened generation: cnt outgrows int, amt outgrows (10,2)
    store2.append(spark, Seq((3L, 5000000000L), (4L, 6000000000L)).toDF("id", "cnt")
      .withColumn("amt", lit(123456789.25).cast("decimal(20,2)")))
    assert(filesV1.subsetOf(store2.currentFiles(spark).toSet),
      "widening must not rewrite old files")
    val sc = store2.currentSchema(spark).get
    assert(sc("cnt").dataType == LongType && sc("amt").dataType == DecimalType(20, 2))
    // both generations read at the widened types
    val rows = store2.read(spark).get.select("id", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 5000000000L), (4L, 6000000000L)))
    // a post-widening NARROW batch is accepted and the record stays wide
    store2.append(spark, Seq((5L, 50)).toDF("id", "cnt")
      .withColumn("cnt", col("cnt").cast("int"))
      .withColumn("amt", lit(2.5).cast("decimal(10,2)")))
    assert(store2.currentSchema(spark).get("cnt").dataType == LongType,
      "a narrow append must not narrow the recorded schema")
    assert(store2.read(spark).get.schema("cnt").dataType == LongType)
    assert(store2.read(spark).get.count() == 5)
    // time travel to the pre-widening version keeps the NARROW schema
    assert(store2.readVersion(spark, 1).get.schema("cnt").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("type widening rejects the lossy neighbors of the lattice") {
    val store = new ManifestStore(freshRoot("widen_reject"))
    store.append(spark, Seq((1L, 10L)).toDF("id", "cnt")
      .withColumn("amt", lit(1.5).cast("decimal(10,2)")))
    // long -> double: 2^53 cliff, NOT lossless
    val toDouble = scala.util.Try(store.append(spark,
      Seq((2L, 2.0)).toDF("id", "cnt")
        .withColumn("amt", lit(1.5).cast("decimal(10,2)"))))
    assert(toDouble.isFailure &&
      toDouble.failed.get.getMessage.contains("type conflict"))
    // decimal scale change: values need rescaling, a rewrite
    val rescale = scala.util.Try(store.append(spark,
      Seq((2L, 2L)).toDF("id", "cnt")
        .withColumn("amt", lit(1.5).cast("decimal(12,4)"))))
    assert(rescale.isFailure &&
      rescale.failed.get.getMessage.contains("type conflict"))
  }

  test("MERGE across the widening boundary rewrites narrow files at the wide type") {
    import org.apache.spark.sql.types.LongType
    val store = new ManifestStore(freshRoot("widen_merge"))
    store.append(spark, Seq((1L, 10), (2L, 20)).toDF("id", "cnt")
      .withColumn("cnt", col("cnt").cast("int")))
    store.append(spark, Seq((3L, 5000000000L)).toDF("id", "cnt"))
    // the update targets a row living in an INT file; the CoW rewrite
    // must project that file through the widened schema
    store.merge(spark, Seq((1L, 7000000000L)).toDF("id", "cnt"), Seq("id"))
    val rows = store.read(spark).get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 7000000000L), (2L, 20L), (3L, 5000000000L)))
    assert(store.currentSchema(spark).get("cnt").dataType == LongType)
  }

  test("incremental matview refresh across a widening append") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_widen_mv")
    val src = new ManifestStore(s"$tmp/src")
    src.append(spark, (0L until 100L).map(i => (i, i % 5, (i % 7).toInt))
      .toDF("id", "grp", "v").withColumn("v", col("v").cast("int")))
    val view = new MatView(s"$tmp/view", Seq("grp"), "v")
    view.refresh(spark, src)
    // the widened batch carries v as LONG with values past Int.MaxValue
    src.append(spark, (100L until 110L).map(i => (i, i % 5, 3000000000L))
      .toDF("id", "grp", "v"))
    view.refresh(spark, src)
    val st = view.state(spark).get
      .select(col("grp"), col("n"), col("vsum").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // per grp: 20 v1 rows summing (i%7 over its ids) + 2 widened rows
    val expect = (0L until 5L).map { g =>
      val v1 = (0L until 100L).filter(_ % 5 == g).map(_ % 7).sum
      (g, 22L, v1 + 2L * 3000000000L)
    }
    assert(st.toSeq == expect)
  }

  test("rename: chained a→b→c flattens; both physical generations read as c") {
    val store = new ManifestStore(freshRoot("rename_chain"))
    store.append(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "a"))
    store.renameColumn(spark, "a", "b")
    // a file written under the INTERMEDIATE name joins the mix
    store.append(spark, Seq((3L, 30.0)).toDF("id", "b"))
    store.renameColumn(spark, "b", "c")
    store.append(spark, Seq((4L, 40.0)).toDF("id", "c"))
    assert(store.currentSchema(spark).map(_.fieldNames.toSeq)
      .contains(Seq("id", "c")))
    val rows = store.read(spark).get.select("id", "c").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)))
    // BOTH retired names stay reserved until compact
    Seq("a", "b").foreach { n =>
      val readd = scala.util.Try(store.append(spark,
        Seq((9L, 1.0, -1.0)).toDF("id", "c", n)))
      assert(readd.isFailure && readd.failed.get.getMessage.contains("retired"),
        s"retired name '$n' re-add not rejected: $readd")
    }
  }

  test("rename → compact physically renames files and clears the aliases") {
    val store = new ManifestStore(freshRoot("rename_compact"))
    store.append(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    store.renameColumn(spark, "v", "w")
    store.compact(spark)
    // the compacted files carry the LOGICAL name physically: a raw read
    // of the current files (no projection) must show `w`, not `v`
    val raw = spark.read.parquet(store.currentFiles(spark): _*)
    assert(raw.columns.toSeq.contains("w") && !raw.columns.toSeq.contains("v"))
    // aliases cleared: the retired name is reusable as a NEW column
    store.append(spark, Seq((3L, 30.0, 99.0)).toDF("id", "w", "v"))
    val rows = store.read(spark).get.select("id", "w", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10.0, -1.0), (2L, 20.0, -1.0),
      (3L, 30.0, 99.0)))
  }

  test("rename guards: range column, existing/tombstoned/retired targets") {
    val store = new ManifestStore(freshRoot("rename_guards"))
    store.append(spark, Seq((1L, 10.0, 1.0)).toDF("block_number", "v", "x"),
      rangeCol = Some("block_number"))
    val rc = scala.util.Try(store.renameColumn(spark, "block_number", "bn"))
    assert(rc.isFailure && rc.failed.get.getMessage.contains("range column"))
    val dup = scala.util.Try(store.renameColumn(spark, "v", "x"))
    assert(dup.isFailure && dup.failed.get.getMessage.contains("already exists"))
    store.dropColumns(spark, Seq("x"))
    val ontoTomb = scala.util.Try(store.renameColumn(spark, "v", "x"))
    assert(ontoTomb.isFailure && ontoTomb.failed.get.getMessage.contains("dropped"))
    store.renameColumn(spark, "v", "w")
    val ontoRetired = scala.util.Try(store.renameColumn(spark, "w", "v"))
    assert(ontoRetired.isFailure &&
      ontoRetired.failed.get.getMessage.contains("retired"))
  }

  test("MERGE across the rename boundary rewrites old files under the new name") {
    val store = new ManifestStore(freshRoot("rename_merge"))
    store.append(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    store.renameColumn(spark, "v", "w")
    // the update targets a row living in a pre-rename file; the CoW
    // rewrite must project that file through the renamed schema
    store.merge(spark, Seq((1L, 100.0)).toDF("id", "w"), Seq("id"))
    val rows = store.read(spark).get.select("id", "w").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 100.0), (2L, 20.0)))
    // time travel to the pre-rename version reads the OLD name's values
    val v1 = store.readVersion(spark, 1).get
    assert(v1.columns.toSeq == Seq("id", "v"))
    assert(v1.select("v").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(10.0, 20.0))
  }

  test("MERGE with evolved updates: matched rows replaced, survivors null-filled") {
    val store = new ManifestStore(freshRoot("merge"))
    store.append(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    store.append(spark, Seq((3L, 30.0), (4L, 40.0)).toDF("id", "v"))
    // updates carry a NEW column `flag`: update id=2, insert id=9
    store.merge(spark,
      Seq((2L, 200.0, "upd"), (9L, 900.0, "ins")).toDF("id", "v", "flag"),
      Seq("id"))
    val rows = store.read(spark).get
      .select("id", "v", "flag").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) "null" else r.getString(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 10.0, "null"), (2L, 200.0, "upd"), (3L, 30.0, "null"),
      (4L, 40.0, "null"), (9L, 900.0, "ins")))
    assert(store.currentSchema(spark).map(_.fieldNames.toSeq)
      .contains(Seq("id", "v", "flag")))
  }

  test("incremental matview refresh across a schema-evolving append") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_evolve_mv")
    val src = new ManifestStore(s"$tmp/src")
    src.append(spark, (0L until 100L).map(i => (i, i % 5, 1.0)).toDF("id", "grp", "v"))
    val view = new MatView(s"$tmp/view", Seq("grp"), "v")
    view.refresh(spark, src)
    // the evolved batch adds `origin`; the view's group/value columns are
    // untouched, so the delta fold must work unchanged
    src.append(spark, (100L until 160L).map(i => (i, i % 5, 2.0, "late"))
      .toDF("id", "grp", "v", "origin"))
    view.refresh(spark, src)
    val st = view.state(spark).get
      .select(col("grp"), col("n"), col("vsum").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // per grp: 20 v1 rows at 1.0 + 12 evolved rows at 2.0
    assert(st.toSeq == (0L until 5L).map(g => (g, 32L, 44.0)))
    // and the source reads back whole with old rows null in `origin`
    val nulls = src.read(spark).get.filter(col("origin").isNull).count()
    assert(nulls == 100L)
  }

  test("metadata-only drop: column unreachable, zero data IO, stats pruning intact") {
    val store = new ManifestStore(freshRoot("drop"))
    store.append(spark, Seq((1L, "a", 0.1), (2L, "b", 0.2)).toDF("id", "name", "score"),
      rangeCol = Some("id"))
    val files = store.currentFiles(spark).toSet
    store.dropColumns(spark, Seq("score"))
    // metadata-only: same files, reduced schema, column gone from reads
    assert(store.currentFiles(spark).toSet == files)
    assert(store.read(spark).get.columns.toSeq == Seq("id", "name"))
    assert(store.currentSchema(spark).map(_.fieldNames.toSeq)
      .contains(Seq("id", "name")))
    // the range machinery survives (rangeCol kept; projection in readRange)
    assert(store.statsMax(spark).contains(2L))
    assert(store.readRange(spark, 2L, 9L).get.columns.toSeq == Seq("id", "name"))
    assert(store.readRange(spark, 2L, 9L).get.count() == 1L)
    // dropping the range column itself is refused
    val rcErr = intercept[IllegalArgumentException] {
      store.dropColumns(spark, Seq("id"))
    }
    assert(rcErr.getMessage.contains("range column"), rcErr.getMessage)
  }

  test("drop → compact physically removes the bytes and clears the tombstone") {
    val store = new ManifestStore(freshRoot("reclaim"))
    store.append(spark, Seq((1L, "secret-a", 1.0), (2L, "secret-b", 2.0))
      .toDF("id", "pii", "v"))
    store.dropColumns(spark, Seq("pii"))
    // before compaction: bytes still in the old files (raw read), but a
    // re-add of the name is tombstone-rejected — union-by-name would
    // resurface the old values
    val rawBefore = spark.read.parquet(store.currentFiles(spark): _*)
    assert(rawBefore.columns.contains("pii"),
      "test setup: pre-compact files should still carry the dropped bytes")
    val readdErr = intercept[IllegalArgumentException] {
      store.append(spark, Seq((3L, "new", 3.0)).toDF("id", "pii", "v"))
    }
    assert(readdErr.getMessage.contains("compact"), readdErr.getMessage)
    // compaction rewrites through the projection: bytes physically gone
    store.compact(spark)
    val rawAfter = spark.read.parquet(store.currentFiles(spark): _*)
    assert(!rawAfter.columns.contains("pii"),
      "compact did not physically remove the dropped column")
    // tombstone cleared: the name is reusable, even with a NEW type
    store.append(spark, Seq((3L, 42L, 3.0)).toDF("id", "pii", "v"))
    val rows = store.read(spark).get.select("id", "pii").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq((1L, -1L), (2L, -1L), (3L, 42L)),
      "old rows must read the re-added column as null, never old values")
  }

  test("zero-file snapshot: compact still clears tombstones (the documented recovery)") {
    val store = new ManifestStore(freshRoot("emptytomb"))
    store.append(spark, Seq((1L, "x")).toDF("id", "pii"))
    store.dropColumns(spark, Seq("pii"))
    // delete EVERYTHING: the snapshot now lists zero files, tombstones
    // carried forward — the dropped name must not be blocked forever
    store.delete(spark, org.apache.spark.sql.functions.lit(true))
    val blocked = intercept[IllegalArgumentException] {
      store.append(spark, Seq((2L, "y")).toDF("id", "pii"))
    }
    assert(blocked.getMessage.contains("compact"), blocked.getMessage)
    store.compact(spark) // no bytes left to erase; must clear the tombstone
    store.append(spark, Seq((2L, "y")).toDF("id", "pii"))
    assert(store.read(spark).get.count() == 1L)
  }

  test("comma-bearing column names are refused by dropColumns (tombstone encoding)") {
    val store = new ManifestStore(freshRoot("comma"))
    store.append(spark, Seq((1L, "x")).toDF("id", "name"))
    val e = intercept[IllegalArgumentException] {
      store.dropColumns(spark, Seq("a,b"))
    }
    assert(e.getMessage.contains("comma"), e.getMessage)
  }

  test("rewrites never copy dropped bytes forward: delete survivors are clean") {
    val store = new ManifestStore(freshRoot("gdpr"))
    // one file holding all three rows, so the delete's hit file HAS
    // survivors to rewrite (a victim-only file is simply dropped)
    store.append(spark, Seq((1L, "pii-a", 1.0), (2L, "pii-b", 2.0),
      (3L, "pii-c", 3.0)).toDF("id", "pii", "v").coalesce(1))
    store.dropColumns(spark, Seq("pii"))
    // a post-drop delete rewrites the survivors of the hit files; the
    // FRESH files must not physically carry the dropped column (files
    // the delete never touched legitimately keep their bytes until
    // compact() — the projection hides them meanwhile)
    val before = store.currentFiles(spark).toSet
    store.delete(spark, col("id") === 2L)
    val fresh = (store.currentFiles(spark).toSet -- before).toSeq
    assert(fresh.nonEmpty, "test setup: the delete rewrote no file")
    val raw = spark.read.option("mergeSchema", "true").parquet(fresh: _*)
    assert(!raw.columns.contains("pii"),
      "delete propagated dropped-column bytes into the rewritten file")
    assert(store.read(spark).get.select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 3L))
  }

  test("legacy pre-tracking store: first new-code append must not hide legacy columns") {
    // simulate a store written before schema tracking: strip the
    // #schema: line from its manifest, then append a NARROWER batch —
    // the legacy column must stay readable (baseline inferred from the
    // files, not adopted from the batch)
    val root = freshRoot("legacy")
    val store = new ManifestStore(root)
    store.append(spark, Seq((1L, "legacy-val", 0.5)).toDF("id", "extra", "v"))
    val mdir = new java.io.File(s"$root/_manifests")
    val mf = mdir.listFiles().filter(_.getName.endsWith(".manifest")).head
    val stripped = java.nio.file.Files.readAllLines(mf.toPath).toArray
      .map(_.toString).filterNot(_.startsWith("#schema:")).mkString("\n") + "\n"
    java.nio.file.Files.writeString(mf.toPath, stripped)
    val legacy = new ManifestStore(root) // fresh instance, no caches
    assert(legacy.currentSchema(spark).isEmpty, "test setup: schema line survived")
    legacy.append(spark, Seq((2L, 1.5)).toDF("id", "v")) // narrower batch
    val rows = legacy.read(spark).get.select("id", "extra", "v").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq((1L, Some("legacy-val"), 0.5), (2L, None, 1.5)),
      s"legacy column lost or values wrong: ${rows.toSeq}")
    // and the adopted baseline records the UNION, legacy columns included
    assert(legacy.currentSchema(spark).get.fieldNames.toSet ==
      Set("id", "extra", "v"))
  }

  test("time travel to a pre-drop version shows the dropped column's values") {
    val store = new ManifestStore(freshRoot("travel"))
    store.append(spark, Seq((1L, "keep", 9.5)).toDF("id", "name", "score"))
    val vBefore = store.currentVersion(spark)
    store.dropColumns(spark, Seq("score"))
    assert(!store.read(spark).get.columns.contains("score"))
    val old = store.readVersion(spark, vBefore).get
    assert(old.columns.toSeq == Seq("id", "name", "score"))
    assert(old.select("score").head().getDouble(0) == 9.5)
  }

  test("replaceAll resets the recorded schema to the replacement's") {
    val store = new ManifestStore(freshRoot("replace"))
    store.append(spark, Seq((1L, "x", 0.1)).toDF("id", "name", "score"))
    store.replaceAll(spark, Seq((7L, true)).toDF("id", "active"))
    assert(store.currentSchema(spark).map(_.fieldNames.toSeq)
      .contains(Seq("id", "active")),
      s"replaceAll must not union with the replaced history: ${store.currentSchema(spark)}")
    // a former column's type can now change freely — it is a new store
    store.append(spark, Seq((8L, false, "re-added-as-string"))
      .toDF("id", "active", "name"))
    assert(store.read(spark).get.count() == 2L)
  }

  test("same-schema appends never churn the recorded schema or no-op versions") {
    val store = new ManifestStore(freshRoot("stable"))
    store.append(spark, Seq((1L, "a")).toDF("id", "name"))
    val v1 = store.currentVersion(spark)
    val s1 = store.currentSchema(spark)
    // same schema, different column ORDER: recorded schema keeps the
    // store's canonical order (no spurious schema commit)
    store.append(spark, Seq(("b", 2L)).toDF("name", "id"))
    assert(store.currentSchema(spark) == s1)
    // empty same-schema append: still a complete no-op (no version bump)
    store.append(spark, Seq.empty[(Long, String)].toDF("id", "name"))
    assert(store.currentVersion(spark) == v1 + 1)
  }
}
