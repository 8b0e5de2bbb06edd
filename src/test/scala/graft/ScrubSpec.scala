package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Scrub

/** PII redaction patterns and the first-wins semantics of repeated-span
  * dedup, on hand-built corpora where the answer is checkable by eye. */
class ScrubSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("PII patterns redact emails, phones, and IPs; counts come from the original text") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org and call 555-123-4567 now"),
      (2L, "server 192.168.1.200 rebooted"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val (clean, n) = Scrub.scrubbed(col("text"))
    val out = df.select(col("doc_id"), clean.as("t"), n.as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("mail <EMAIL> and call <PHONE> now", 2L))
    assert(out(2L) == ("server <IP> rebooted", 1L))
    assert(out(3L) == ("nothing sensitive here", 0L))
  }

  test("uppercase PII redacts; counts equal placeholders when replacements interact") {
    val df = Seq(
      (1L, "reach Bob.Smith@Example.COM today"),
      // the email replacement exposes a boundary that makes the IP
      // match ('<EMAIL>10.0.0.1'); sequential counting must agree with
      // the two placeholders actually inserted
      (2L, "x@y.com10.0.0.1")
    ).toDF("doc_id", "text")
    val (clean, n) = Scrub.scrubbed(col("text"))
    val out = df.select(col("doc_id"), clean.as("t"), n.as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("reach <EMAIL> today", 1L))
    val (t2, n2) = out(2L)
    def occ(sub: String) = t2.sliding(sub.length).count(_ == sub)
    val inserted = Seq("<EMAIL>", "<PHONE>", "<IP>").map(occ).sum
    assert(t2 == "<EMAIL><IP>" && inserted == 2 && n2 == inserted,
      s"got $t2 / $n2")
  }

  test("normalization lowercases, strips punctuation, collapses whitespace") {
    val out = graft.ops.Scrub.normalize(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, t, n) =>
      assert(t == t.toLowerCase, s"doc $id not lowercased")
      assert(!t.exists(c => !c.isLetterOrDigit && c != ' '), s"doc $id has punct")
      assert(!t.contains("  ") && t == t.trim, s"doc $id has loose whitespace")
      assert(n == (if (t.isEmpty) 0L else t.split(' ').length.toLong))
    }
  }

  test("repeated-span dedup: first (doc_id, pos) occurrence wins, later copies cut") {
    def chunk(tag: String) = (0 until Scrub.ChunkTokens).map(t => s"${tag}$t").mkString(" ")
    val (a, b, c) = (chunk("a"), chunk("b"), chunk("c"))
    val docs = Seq(
      (1L, s"$a $b"),   // both first occurrences
      (2L, s"$b $c"),   // b already seen in doc 1 → only c survives
      (3L, s"$a $b")    // everything seen → empty text, row preserved
    ).toDF("doc_id", "text")
    val out = Scrub.dedupSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (s"$a $b", 2L))
    assert(out(2L) == (c, 1L))
    assert(out(3L) == ("", 0L))
  }

  test("a chunk repeated inside ONE doc also dedups, keeping the earliest position") {
    def chunk(tag: String) = (0 until Scrub.ChunkTokens).map(t => s"${tag}$t").mkString(" ")
    val (a, b) = (chunk("a"), chunk("b"))
    val docs = Seq((1L, s"$a $b $a")).toDF("doc_id", "text")
    val out = Scrub.dedupSpans(docs).collect().head
    assert(out.getString(1) == s"$a $b" && out.getLong(2) == 2L)
  }

  test("boilerplate scrub cuts exactly the spans carrying a top-df trigram") {
    val dir = "/root/testdata/sf0.001"
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    // by-hand top-K grams by distinct-doc frequency, ties by gram
    val df = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { case (_, t) =>
      val toks = t.split(' ')
      if (toks.length >= 3)
        toks.sliding(3).map(_.mkString(" ")).toSet[String]
          .foreach(g => df(g) = df.getOrElse(g, 0L) + 1L)
    }
    val top = df.toSeq.sortBy { case (g, c) => (-c, g) }
      .take(Scrub.BoilerTopK).map(_._1).toSet
    def chunksOf(t: String): Seq[String] = {
      val toks = if (t.isEmpty) Array("") else t.split(' ')
      toks.grouped(Scrub.ChunkTokens).map(_.mkString(" ")).toSeq
    }
    def dirty(c: String): Boolean = {
      val toks = c.split(' ')
      toks.length >= 3 && toks.sliding(3).exists(g => top(g.mkString(" ")))
    }
    val out = Scrub.boilerplateScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    texts.foreach { case (id, t) =>
      val cs = chunksOf(t)
      val kept = cs.filterNot(dirty)
      val (gotText, gotCut) = out(id)
      assert(gotCut == (cs.length - kept.length).toLong, s"doc $id n_cut")
      assert(gotText == kept.mkString(" "), s"doc $id rebuilt text")
    }
    // the scrub genuinely fires on the fixture
    assert(out.values.exists(_._2 > 0))
  }

  test("mlm masking replays the 80/10/10 recipe hash-deterministically") {
    val dir = "/root/testdata/sf0.001"
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    def draw(k: Long, m: Long): Long =
      ((k % 2147483648L) * 2654435761L) % 4294967296L % m
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.values.foreach(_.split(' ').filter(_.nonEmpty)
      .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(graft.ops.Retrieval.TokenizeVocabV).map(_._1).toIndexedSeq
    val got = Scrub.mlmMask(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(got.nonEmpty)
    got.foreach { case (id, pos, term, action, repl) =>
      assert(term == texts(id).split(' ')(pos.toInt))
      val mk = id * 1048576L + pos
      val exp =
        if (draw(mk, 100) >= Scrub.MaskPct) "none"
        else {
          val d2 = draw(mk + 999999937L, 10)
          if (d2 <= 7) "mask" else if (d2 == 8) "random" else "keep"
        }
      assert(action == exp, s"doc $id pos $pos")
      action match {
        case "mask" => assert(repl == "[MASK]")
        case "random" => assert(repl == vocab(
          draw(mk + 777767777L, vocab.length.toLong).toInt))
        case _ => assert(repl == term)
      }
    }
    // all four actions occur, and the mask rate lands near 15%
    val byAction = got.groupBy(_._4).view.mapValues(_.length).toMap
    assert(byAction.keySet == Set("none", "mask", "random", "keep"))
    val maskedFrac = (got.length - byAction("none")).toDouble / got.length
    assert(maskedFrac > 0.10 && maskedFrac < 0.20, s"masked $maskedFrac")
  }
}
