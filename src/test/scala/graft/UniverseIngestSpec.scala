package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{Demux, ManifestStore}
import java.math.{BigDecimal => JBigDecimal}
import scala.jdk.CollectionConverters._

/** Full-universe physical ingest E2E (round-12 verdict stretch #7): the
  * reference's EP1 at FULL breadth. Schema derivation, decode roundtrip
  * and dispatch were already spec'd over the whole 412-table config
  * tree (AbiSpec, DemuxSpec); this test physically WRITES the universe:
  * one synthetic log batch carrying rows for EVERY table derived from
  * /root/reference/conf, chunk-committed through the manifest store
  * partitioned by table_name, then resumed and replayed.
  *
  * Dispatch-key collisions are first-class here: distinct ABIs share
  * event shapes (same signature → same topic0), so a log legitimately
  * lands in every table whose key matches — per-table expectations are
  * computed from the key-collision groups, not assumed 1:1. */
class UniverseIngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("412-table universe: one batch writes every table; resume + replay are exact") {
    // generator shared with the bench's universe_demux throughput section
    // (graft.fixtures.UniverseFixture): one code path for the spec's
    // correctness evidence and the bench's rows/s
    val defs = graft.fixtures.UniverseFixture.defs()
    assume(defs.nonEmpty, "reference config tree not present")
    assert(defs.size >= 400, s"universe shrank: ${defs.size} tables")
    // schema qualification (round-15 agenda #1): every def carries its
    // conf-directory namespace and the QUALIFIED names are all distinct
    // — 412 defs ⇒ 412 tables, where bare names collapse to 388
    assert(defs.forall(_.schemaName.nonEmpty), "a def lost its namespace")
    assert(defs.map(_.qualified).distinct.size == defs.size,
      "qualified names collide")
    assert(defs.map(_.table).distinct.size < defs.size,
      "bare names no longer collide — the aave/aave_v2 regression corpus " +
        "vanished from the config tree")
    val b = graft.fixtures.UniverseFixture.batch(defs)
    val truth = b.truth
    val blockNo = b.lastBlock
    val raw = spark.createDataFrame(b.rows.asJava, Demux.rawLogSchema)
    val mid = 1_000_000L + b.rows.size / 2

    // chunk-committed ingest through the manifest store (EP1 cadence)
    val root = java.nio.file.Files
      .createTempDirectory("graft_universe").toString + "/store"
    val store = new ManifestStore(root)
    store.overwriteRange(spark,
      Demux.taggedKnown(raw.filter(col("block_number") <= mid), defs),
      1_000_000L, mid, "block_number", Seq("table_name"))
    store.overwriteRange(spark,
      Demux.taggedKnown(raw.filter(col("block_number") > mid), defs),
      mid + 1, blockNo, "block_number", Seq("table_name"))

    // every distinct QUALIFIED table of the universe physically landed —
    // all 412, not the 388 that bare names collapse to
    val snap = store.read(spark).get
    val landed = snap.select("table_name").distinct()
      .collect().map(_.getString(0)).toSet
    val expected = defs.map(_.qualified).toSet
    assert(landed == expected,
      s"missing tables: ${(expected -- landed).take(5)}; " +
        s"spurious: ${(landed -- expected).take(5)}")
    assert(landed.size == defs.size,
      s"universe landed ${landed.size} tables, expected ${defs.size}")

    // per-table row counts follow the dispatch-key collision groups
    // EXACTLY: keys repeat across tables and across SCHEMAS (shared
    // event shapes), so a table's expectation is the sum over its
    // dispatch keys of that key's total log count
    val byKey = defs.groupBy(d => Demux.topic0Key(d).toSeq)
    val logsPerKey = byKey.view.mapValues(2L * _.size).toMap
    val expectedCount: Map[String, Long] =
      defs.groupBy(_.qualified).view.mapValues { ds =>
        ds.groupBy(d => Demux.topic0Key(d).toSeq)
          .map { case (k, dups) => dups.size.toLong * logsPerKey(k) }.sum
      }.toMap
    val counts = snap.groupBy("table_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expectedCount.foreach { case (t, want) =>
      assert(counts(t) == want, s"$t: ${counts(t)} rows, expected $want")
    }
    // the aave/aave_v2 regression corpus: both schemas define
    // lending_pool_evt_deposit with DIFFERENT ABI shapes
    // (address,address,uint256,uint16,uint256 vs
    // address,address,address,uint256,uint16) — they must land as
    // SEPARATE tables with their own per-schema counts
    for (q <- Seq("aave.lending_pool_evt_deposit",
                  "aave_v2.lending_pool_evt_deposit")) {
      assert(counts.contains(q), s"$q missing from the demuxed store")
      assert(counts(q) == expectedCount(q),
        s"$q: ${counts(q)} rows, expected ${expectedCount(q)}")
    }
    val depositDefs = defs.filter(_.table == "lending_pool_evt_deposit")
    assert(depositDefs.map(_.schemaName).toSet == Set("aave", "aave_v2"))
    assert(depositDefs.map(_.entry.signature).distinct.size == 2,
      "the two deposit events no longer differ in shape — regression " +
        "corpus weakened")
    val total = snap.count()

    // resume watermark comes straight from manifest stats — no scan
    assert(store.statsMax(spark).contains(blockNo),
      s"resume watermark ${store.statsMax(spark)} != $blockNo")

    // replayed second chunk (same range) is replaced, not duplicated
    store.overwriteRange(spark,
      Demux.taggedKnown(raw.filter(col("block_number") > mid), defs),
      mid + 1, blockNo, "block_number", Seq("table_name"))
    assert(store.read(spark).get.count() == total,
      "replaying a chunk changed the row count")
    // ...and a zero-row incremental tick (nothing past the watermark)
    // publishes nothing
    val vBefore = store.currentVersion(spark)
    store.overwriteRange(spark,
      Demux.taggedKnown(raw.filter(col("block_number") > blockNo), defs),
      blockNo + 1, blockNo + 1000, "block_number", Seq("table_name"))
    assert(store.currentVersion(spark) == vBefore,
      "an empty catch-up tick bumped the version")

    // spot decode: tables with a single def whose topic0 is UNIQUE in
    // the universe and whose params are all static+non-indexed decode
    // back to the exact generated values through the store's pruned
    // read path
    val soloTables = defs.groupBy(_.qualified).filter(_._2.size == 1).keySet
    val unique = defs.filter(d => soloTables(d.qualified) &&
      byKey(Demux.topic0Key(d).toSeq).size == 1)
    val simple = unique.filter(_.entry.inputs.forall(p => !p.indexed &&
      (p.abiType == "address" || p.abiType.startsWith("uint") ||
        p.abiType == "bool") && !p.abiType.endsWith("[]")))
    assert(simple.size >= 5, s"too few spot-decodable tables: ${simple.size}")
    simple.take(5).foreach { d =>
      val got = Demux.readTable(spark, store, d)
        .orderBy("block_number").collect()
      assert(got.length == 2, s"${d.qualified}: decoded ${got.length} rows")
      got.zip(truth(d.qualified)).foreach { case (row, vals) =>
        // decoded columns follow the 6 commonCols, in param order; the
        // comparison is numeric-type-tolerant (a uint40 decodes to LONG
        // per the schema while the generator held a BigDecimal)
        def num(a: Any): Option[JBigDecimal] = a match {
          case x: JBigDecimal => Some(x)
          case x: java.lang.Number => Some(new JBigDecimal(x.toString))
          case _ => None
        }
        d.entry.inputs.zip(vals).zipWithIndex.foreach { case ((p, v), i) =>
          val dec = row.get(6 + i)
          val same = (dec, v) match {
            case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
            case (x, y) if num(x).isDefined && num(y).isDefined =>
              num(x).get.compareTo(num(y).get) == 0
            case (x, y) => x == y
          }
          assert(same, s"${d.table}.${p.name} (${p.abiType}): $dec != $v")
        }
      }
    }
  }
}
