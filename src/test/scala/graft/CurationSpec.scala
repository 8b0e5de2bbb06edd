package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Curation

/** The composed curation pipeline's STAGE-ORDER contract — the
  * properties the end-to-end gate can't isolate:
  *
  *  - a quality reject never votes in dedup (it can't be the kept
  *    canonical of a near-dup cluster it would otherwise anchor);
  *  - exact dedup keeps the min doc_id of an identical-text group;
  *  - sampling runs last (a sampled-out doc's near-dup victims stay
  *    dropped — they don't resurrect).
  */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // a 60-token, all-distinct "good" sentence
  private val base = (0 until 60).map(i => s"tok$i").mkString(" ")
  // near-dup of base: one mid token changed (3-gram jaccard ≈ 0.9)
  private val nearDup = (0 until 60)
    .map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
  // quality-reject near-dup ANCHOR: base repeated 10× — shares nearly
  // all of base's shingles (jaccard ≈ 0.97) but uniq_ratio 0.1 < 0.2
  private val spam = Seq.fill(10)(base).mkString(" ")
  private val unique = (0 until 60).map(i => s"other$i").mkString(" ")

  private def docs = Seq(
    (1L, spam, "en", "s", spam.length.toLong),
    (5L, base, "en", "s", base.length.toLong),
    (6L, nearDup, "en", "s", nearDup.length.toLong),
    (10L, unique, "en", "s", unique.length.toLong),
    (20L, unique, "en", "s", unique.length.toLong), // exact dup of 10
    (30L, (0 until 60).map(i => s"third$i").mkString(" "), "en", "s", 1L),
    // fr rate is 25; draw(40) = 36 → sampled out
    (40L, (0 until 60).map(i => s"fourth$i").mkString(" "), "fr", "s", 1L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("stage order: quality rejects never anchor a cluster; exact-min kept; sample last") {
    val kept = Curation.curate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // d1 (spam) is out on quality — and because it never reached the
    // near-dup stage, d5 (not d1) is the cluster canonical and d6 drops
    assert(kept == Set(5L, 10L, 30L))
  }

  test("front stage: fused quality filter + exact dedup keeps min doc_id per text") {
    val front = Curation.frontStage(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // 1 fails uniq_ratio; 20 is the exact-dup loser; 40 survives the
    // front (sampling hasn't run yet — it must drop only at the END)
    assert(front == Set(5L, 6L, 10L, 30L, 40L))
  }

  test("corpus_split: one keep-best survivor per component, split keyed by component") {
    val dir = "/root/testdata/sf0.001"
    val out = Curation.corpusSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // one row (one survivor) per component, components distinct
    val comps = out.map(_._2)
    assert(comps.length == comps.distinct.length)
    // the split is a pure function of the component id: recompute the
    // component-keyed draw by hand and compare every row
    out.foreach { case (_, comp, _, split) =>
      val draw = (((comp % 2147483648L) + 2147483648L) % 2147483648L *
        2654435761L) % 4294967296L % 100L
      assert(split == (if (draw < 30L) "val" else "train"),
        s"component $comp split")
    }
    // both sides populated on the fixture
    assert(out.map(_._4).distinct.sorted.toSeq == Seq("train", "val"))
    // keep-best: within a multi-doc component the survivor has max
    // n_chars (ties min id) among the front-stage members
    val front = Curation.frontStage(
        Tables.load(spark, dir, "documents"))
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, _, nc, _) =>
      assert(front(id) == nc, s"survivor $id carries its own n_chars")
    }
  }
}
