package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Decontam

/** Benchmark decontamination: the exact n-gram rule at configurable n,
  * and the published-recipe normalization (lowercase + strip punct). */
class DecontamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def toks(tag: String, n: Int) =
    (0 until n).map(t => s"${tag}_$t").mkString(" ")

  private def flagsOf(df: org.apache.spark.sql.DataFrame, n: Int,
                      normalized: Boolean): Map[Long, Boolean] =
    Decontam.flags(df, col("doc_id") < 100L, n, normalized)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  test("a train doc is contaminated iff it shares a full n-gram with the eval set") {
    // eval doc 0: tokens e_0..e_19. Train 200 embeds a 13-token run of
    // it; train 201 embeds only a 12-token run — under n=13 only 200 flags.
    val eval0 = toks("e", 20)
    val docs = Seq(
      (0L, eval0),
      (200L, "x y " + (0 until 13).map(t => s"e_$t").mkString(" ") + " z"),
      (201L, "x y " + (0 until 12).map(t => s"e_$t").mkString(" ") + " z")
    ).toDF("doc_id", "text")
    val f = flagsOf(docs, 13, normalized = false)
    assert(f == Map(200L -> true, 201L -> false))
  }

  test("normalization flags case/punctuation-mangled leakage that exact match misses") {
    val evalText = toks("w", 13)
    val mangled = evalText.toUpperCase + "!!"
    val docs = Seq((0L, evalText), (200L, mangled)).toDF("doc_id", "text")
    assert(flagsOf(docs, 13, normalized = false) == Map(200L -> false),
      "exact match must NOT see the mangled copy")
    assert(flagsOf(docs, 13, normalized = true) == Map(200L -> true),
      "normalized match must see through case + punctuation")
  }

  test("normalization treats whitespace as a separator: line-wrapped leakage still matches") {
    val evalText = toks("w", 13)
    // the same 13 tokens wrapped across lines with punctuation noise —
    // deleting (rather than collapsing) the newline would weld two
    // tokens together and silently miss the leak
    val wrapped = evalText.split(' ').grouped(4).map(_.mkString(" "))
      .mkString(",\n  ")
    val docs = Seq((0L, evalText), (200L, wrapped)).toDF("doc_id", "text")
    assert(flagsOf(docs, 13, normalized = true) == Map(200L -> true),
      "wrapped copy must normalize to the same 13-gram")
  }

  test("fuzzy decontamination: max Jaccard flags near-copies, zero-overlap reports 0.0") {
    // eval 0 has 12 tokens → 10 distinct trigrams. Train 200 keeps 11 of
    // them and swaps the last token: 9 shared trigrams, J = 9/11.
    // Train 201 shares no trigram at all → max_jaccard must be exactly
    // 0.0 (left-join coalesce), not a missing row or NULL.
    val docs = Seq(
      (0L, toks("e", 12)),
      (200L, (0 until 11).map(t => s"e_$t").mkString(" ") + " zz"),
      (201L, toks("q", 12))
    ).toDF("doc_id", "text")
    val out = Decontam.fuzzyFlags(docs, col("doc_id") < 100L)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(200L) == (math.rint(9.0 / 11.0 * 1e6) / 1e6, true))
    assert(out(201L) == (0.0, false))
  }

  test("span scrub cuts exactly the leaking chunk and keeps the rest of the doc") {
    val c0 = (0 until 10).map(i => s"a$i").mkString(" ")
    val c1 = "b0 b1 e_0 e_1 e_2 e_3 e_4 b2 b3 b4" // carries an eval 5-gram
    val c2 = (0 until 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (0L, toks("e", 12)),
      (200L, s"$c0 $c1 $c2"),
      (201L, (0 until 10).map(i => s"d$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Decontam.scrubSpans(docs, col("doc_id") < 100L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(200L) == ((s"$c0 $c2", 1L)),
      "only the chunk containing the leaked 5-gram is cut")
    assert(out(201L) == (((0 until 10).map(i => s"d$i").mkString(" "), 0L)))
  }
}
