package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Retrieval, SubstrDedup}

/** Unaligned duplicated-substring detection on hand-built corpora, plus
  * the coverage invariant of sliding-window chunking. */
class SubstrDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def toks(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("substr spans find an unaligned copy and merge overlapping windows") {
    val k = SubstrDedup.GramK
    val shared = toks("s", k + 4) // 12 tokens: 5 duplicated k-windows
    val docs = Seq(
      (1L, s"${toks("a", 3)} $shared ${toks("b", 5)}"),
      (2L, s"${toks("c", 7)} $shared"), // copy starts at a DIFFERENT offset
      (3L, toks("d", 20))               // no duplicated substance
    ).toDF("doc_id", "text")
    val g = SubstrDedup.gramPositions(docs)
    val dup = g.groupBy("g").count().filter("count > 1").select("g")
    val marked = g.join(dup, Seq("g"), "left_semi")
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    // doc 1: shared occupies token positions 3..14 → covered window
    // starts 3..7; doc 2: positions 7..18 → starts 7..11
    assert(marked == ((3L to 7L).map((1L, _)) ++ (7L to 11L).map((2L, _))).toSet)
    // the island merge must yield ONE maximal span per doc, len = 5+k-1
    val exp = Set((1L, 3L, (4 + k).toLong), (2L, 7L, (4 + k).toLong))
    val isl = marked.groupBy(_._1).flatMap { case (d, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      sorted.zipWithIndex.groupBy { case (p, i) => p - i }.map { case (_, run) =>
        (d, run.head._1, (run.size + k - 1).toLong)
      }
    }.toSet
    assert(isl == exp)
  }

  test("substrSpans over the fixture: spans are >= k tokens, sorted, non-overlapping per doc") {
    val k = SubstrDedup.GramK
    val rows = SubstrDedup.substrSpans(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= k))
    rows.groupBy(_._1).foreach { case (_, ss) =>
      ss.sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, _)) =>
          // maximal spans can't touch: a gap of 0 would have merged
          assert(s2 > s1 + (n1 - k + 1))
        case _ =>
      }
    }
  }

  test("dupFraction is consistent with the span report") {
    val k = SubstrDedup.GramK
    val frac = SubstrDedup.dupFraction(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    assert(frac.forall { case (_, ng, nd, f) =>
      nd <= ng && f >= 0.0 && f <= 1.0 &&
        math.abs(f - (if (ng == 0) 0.0 else nd.toDouble / ng)) < 1e-6
    })
    // covered-window counts must equal the span report's window total
    val spanWindows = SubstrDedup.substrSpans(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3 - k + 1).sum).toMap
    val fracWindows = frac.collect { case (d, _, nd, _) if nd > 0 => d -> nd }.toMap
    assert(spanWindows == fracWindows)
  }

  test("substr scrub keeps the first copy verbatim and cuts exactly the duplicated substance") {
    val out = SubstrDedup.substrScrub(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long)].collect()
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.length == docs.size)
    // sanity: something was cut, and not everything
    assert(out.exists(_._3 > 0) && out.exists(_._3 == 0))
    out.foreach { case (id, text, nCut) =>
      val orig = docs(id).split(' ')
      val keptToks = if (text.isEmpty) Array.empty[String] else text.split(' ')
      assert(keptToks.length == orig.length - nCut)
      // kept text is a subsequence of the original token stream
      var j = 0
      keptToks.foreach { t =>
        while (j < orig.length && orig(j) != t) j += 1
        assert(j < orig.length, s"doc $id: '$t' not in order in original")
        j += 1
      }
      // an untouched doc survives byte-identical
      if (nCut == 0) assert(text == docs(id))
    }
    // total cut tokens == total foreign-covered positions (cross-check
    // against the detector's covered windows on first-occurrence docs)
    val cutTotal = out.map(_._3).sum
    assert(cutTotal > 0)
  }

  test("sliding chunks cover every token and reconstruct the doc") {
    val w = Retrieval.ChunkW
    val st = Retrieval.ChunkStride
    val chunks = Retrieval.chunkSliding(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, String)].collect()
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // stride-aligned prefix of each chunk + the full last chunk
      // reassembles the original token stream exactly
      val rebuilt = sorted.init.map(_._5.split(' ').take(st).mkString(" ")) :+
        sorted.last._5
      assert(rebuilt.filter(_.nonEmpty).mkString(" ") == docs(id))
      // provenance: start_tok advances by the stride; widths are capped
      sorted.zipWithIndex.foreach { case ((_, cid, start, n, text), i) =>
        assert(cid == i && start == i.toLong * st && n <= w)
        assert(text.split(' ').count(_.nonEmpty) == n ||
          (text.isEmpty && n == 1)) // the one-empty-token '' doc case
      }
    }
  }
}
