package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.Demux
import scala.jdk.CollectionConverters._

/** The one-scan dispatch decode (Demux.decodesOk / DecodeDispatchOk) must
  * keep row-for-row what the per-table union form keeps — it replaces the
  * bench decode-through tier's union of 406 partition-pruned Demux.table
  * branches (opt round 1), so its conservation proof lives here:
  *
  *  1. breadth: the dispatch count over the WHOLE universe batch equals
  *     the driver-side expectation computed with the real encoder/decoder
  *     over the deterministic truth values (the same collision-group
  *     expectation the bench tier checks) — including the same-signature
  *     different-indexing landings that are undecodable BY DESIGN;
  *  2. per-table: on a deterministic sample biased to the collision
  *     groups (aave vs aave_v2 shared shapes), the dispatch per-table
  *     counts equal Demux.table's per-branch counts;
  *  3. an unknown tag evaluates false (the union form never scans it). */
class DecodeDispatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("dispatch decode ≡ per-table union decode over the universe batch") {
    val defs = graft.fixtures.UniverseFixture.defs()
    assume(defs.nonEmpty, "reference config tree not present")
    val b = graft.fixtures.UniverseFixture.batch(defs, rowsPerDef = 3)
    val raw = spark.createDataFrame(b.rows.asJava, Demux.rawLogSchema)
    val tagged = Demux.taggedKnown(raw, defs)

    // (1) breadth conservation: dispatch count == driver-side decodable
    // landings (real encoder/decoder over the truth values, per
    // collision group — the bench tier's exact expectation shape)
    val byKey = defs.groupBy(d => Demux.topic0Key(d).toSeq)
    val expectDecodable = defs.iterator.map { g =>
      val rows = b.truth(g.qualified)
      byKey(Demux.topic0Key(g).toSeq).iterator.map { d =>
        rows.count { vals =>
          try {
            if (g.isEvent) {
              val (tp, dt) = graft.codec.AbiDecoder.encodeEvent(g.entry, vals)
              graft.codec.AbiDecoder.decodeEvent(d.entry, tp, dt)
            } else {
              val call = graft.codec.AbiDecoder.encodeCall(g.entry, vals)
              graft.codec.AbiDecoder.decodeCall(d.entry, call.drop(4))
            }
            true
          } catch { case _: Throwable => false }
        }.toLong
      }.sum
    }.sum
    val dispatchTotal = tagged.filter(Demux.decodesOk(defs)).count()
    assert(dispatchTotal == expectDecodable,
      s"dispatch decoded $dispatchTotal rows, truth expects $expectDecodable")
    // the collision landings make the two counts genuinely different —
    // guard the guard: some tagged row must be undecodable by design
    assert(tagged.count() > expectDecodable,
      "no undecodable collision landings — the conservation check is vacuous")

    // (2) per-table equality on a sample biased to the collision groups
    // (same topic0 shared by >1 def: the aave/aave_v2 regression corpus)
    val collided = defs.filter(d => byKey(Demux.topic0Key(d).toSeq).size > 1)
    val sample = (collided.take(12) ++ defs.filter(!_.isEvent).take(6) ++
      defs.filter(_.isEvent).take(6)).distinct
    assert(sample.exists(d => byKey(Demux.topic0Key(d).toSeq).size > 1),
      "sample lost its collision defs")
    val perTableDispatch = tagged.filter(Demux.decodesOk(defs))
      .groupBy("table_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sample.foreach { d =>
      val branch = Demux.table(
        tagged.filter(col("table_name") === d.qualified)
          .drop("table_name"), d).count()
      assert(perTableDispatch.getOrElse(d.qualified, 0L) == branch,
        s"${d.qualified}: dispatch ${perTableDispatch.getOrElse(d.qualified, 0L)}" +
          s" != per-table branch $branch")
    }

    // (3) a tag unknown to the entry table evaluates false
    val relabeled = tagged.withColumn("table_name", lit("nope.unknown"))
    assert(relabeled.filter(Demux.decodesOk(defs)).count() == 0L,
      "unknown tag must never decode")
  }
}
