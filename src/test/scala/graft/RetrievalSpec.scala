package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Retrieval, Sampling, Sharding}

/** Vocabulary construction, BM25 retrieval, DSIR importance weighting,
  * and the split-leakage audit: by-hand oracles on the small fixture plus
  * the structural invariants each operator promises. */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: Map[Long, String] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap

  test("phrase search: hand-counted occurrences, overlaps included") {
    val res = Retrieval.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force truth per phrase over the raw text
    for ((pid, ws) <- Retrieval.PhraseQueries) {
      val truth = docs.flatMap { case (id, text) =>
        val toks = text.split(' ')
        val n = (0 to toks.length - ws.length)
          .count(s => ws.indices.forall(i => toks(s + i) == ws(i)))
        if (n > 0) Some((pid, id) -> n.toLong) else None
      }
      assert(res.filter(_._1._1 == pid) == truth, s"phrase $pid")
      assert(truth.nonEmpty, s"phrase $pid must have fixture matches")
    }
  }

  test("phrase search counts overlapping matches individually") {
    import spark.implicits._
    // "x x x" contains "x x" at starts 0 and 1 — the index counts both
    val df = Seq((1L, "x x x")).toDF("doc_id", "text")
    val toks = df.select(col("doc_id"),
      posexplode(split(col("text"), " "))).toDF("doc_id", "pos", "term")
    val starts = toks.filter(col("term") === "x")
      .select(col("doc_id"), col("pos").as("s"))
      .join(toks.filter(col("term") === "x")
        .select(col("doc_id"), (col("pos") - 1).as("s")), Seq("doc_id", "s"))
    assert(starts.count() == 2)
  }

  test("rag retrieve: expected query set, ranked top-k per query") {
    val rows = Retrieval.ragRetrieve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // queries = chunk 1 of every 100th doc — exists iff the doc has more
    // than ChunkStride tokens
    val expectQ = docs.collect { case (id, t)
      if id % 100 == 7 && t.split(' ').length > Retrieval.ChunkStride => id }
      .toSet
    assert(rows.map(_._1).toSet == expectQ)
    for ((q, g0) <- rows.groupBy(_._1)) {
      val g = g0.sortBy(_._2)
      assert(g.map(_._2).toSeq == (1L to Retrieval.RagK).toSeq,
        s"query $q: ranks must be contiguous 1..k")
      val cos = g.map(_._4).toSeq
      assert(cos == cos.sorted.reverse, s"query $q: cosines must descend")
      assert(cos.forall(c => c >= -1.000001 && c <= 1.000001))
    }
  }

  test("vocab ids are contiguous, counts honest, min-count enforced") {
    val v = Retrieval.vocabBuild(spark, dir).collect()
    assert(v.nonEmpty)
    assert(v.map(_.getLong(0)).toSeq == (0L until v.length).toSeq,
      "token ids must rank contiguously from 0")
    assert(v.forall(_.getLong(3) >= Retrieval.VocabMinCount))
    // counts descend along ids (ties broken by term, ids still ordered)
    val occ = v.map(_.getLong(3)).toSeq
    assert(occ == occ.sortBy(-_))
    // recount one unigram and one bigram by hand
    val uni = v.find(_.getString(1) == "uni").get
    val uniTerm = uni.getString(2)
    val expectUni = docs.values.map(
      _.split(' ').count(_ == uniTerm)).sum
    assert(uni.getLong(3) == expectUni, s"unigram '$uniTerm' count")
    val bi = v.find(_.getString(1) == "bi").get
    val biTerm = bi.getString(2)
    val expectBi = docs.values.map(t => {
      val toks = t.split(' ')
      if (toks.length < 2) 0
      else toks.sliding(2).count(_.mkString(" ") == biTerm)
    }).sum
    assert(bi.getLong(3) == expectBi, s"bigram '$biTerm' count")
  }

  test("bm25 matches a by-hand scorer on the full fixture") {
    val d = docs
    val n = d.size.toLong
    val dl = d.map { case (id, t) => id -> t.split(' ').length.toLong }
    val avgdl = dl.values.sum.toDouble / n
    val tf: Map[(Long, String), Long] = d.toSeq.flatMap { case (id, t) =>
      t.split(' ').filter(_.nonEmpty).filter(Retrieval.Bm25Terms.contains)
        .groupBy(identity).map { case (term, o) => (id, term) -> o.length.toLong }
    }.toMap
    val df = Retrieval.Bm25Terms.map(term =>
      term -> tf.keys.count(_._2 == term).toLong).toMap
    val (k1, b) = (Retrieval.Bm25K1, Retrieval.Bm25B)
    val scores = d.keys.map { id =>
      id -> Retrieval.Bm25Terms.map { term =>
        tf.get((id, term)).fold(0.0) { f =>
          val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
          idf * (f * (k1 + 1) / (f + k1 * (1 - b + b * dl(id) / avgdl)))
        }
      }.sum
    }.toMap
    // Spark's round() is HALF_UP — mirror it exactly
    val expect = scores.toSeq.filter(_._2 > 0)
      .map { case (id, s) =>
        (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val got = Retrieval.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("importance weights favor the target source") {
    val w = Sampling.sampleImportance(spark, dir)
      .groupBy(col("source") === Sampling.ImportanceTarget)
      .agg(avg("weight")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false),
      s"target-source docs must average a higher log-ratio: $w")
    // zero-token docs carry weight 0 and are dropped
    val bad = Sampling.sampleImportance(spark, dir)
      .filter(col("n_tokens") === 0 && col("weight") =!= 0.0).count()
    assert(bad == 0)
  }

  test("per-query bm25 matches a by-hand scorer, query by query") {
    val d = docs
    val n = d.size.toLong
    val dl = d.map { case (id, t) => id -> t.split(' ').length.toLong }
    val avgdl = dl.values.sum.toDouble / n
    val (k1, b) = (Retrieval.Bm25K1, Retrieval.Bm25B)
    val byQuery = Retrieval.Bm25Queries.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val allTerms = Retrieval.Bm25Queries.map(_._2).distinct
    val tf: Map[(Long, String), Long] = d.toSeq.flatMap { case (id, t) =>
      t.split(' ').filter(_.nonEmpty).filter(allTerms.contains)
        .groupBy(identity).map { case (term, o) => (id, term) -> o.length.toLong }
    }.toMap
    val df = allTerms.map(term =>
      term -> tf.keys.count(_._2 == term).toLong).toMap
    val got = Retrieval.bm25PerQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.map(_._1).distinct.sorted.toSeq == byQuery.keys.toSeq.sorted)
    byQuery.foreach { case (qid, terms) =>
      val expect = d.keys.toSeq.flatMap { id =>
        val s = terms.map { term =>
          tf.get((id, term)).fold(0.0) { f =>
            val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
            idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl(id) / avgdl))
          }
        }.sum
        if (terms.exists(t => tf.contains((id, t))))
          Some((id, BigDecimal(s).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
        else None
      }.sortBy { case (id, s) => (-s, id) }.take(Retrieval.Bm25PerQueryK)
      val gotQ = got.filter(_._1 == qid).sortBy(_._2)
        .map { case (_, _, id, s) => (id, s) }.toSeq
      assert(gotQ == expect, s"query $qid top-k")
    }
  }

  test("bpe top pairs match a by-hand pair counter, deterministic tie order") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.values.foreach(_.split(' ').filter(_.length >= 2).foreach { w =>
      w.sliding(2).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1L)
    })
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(Retrieval.BpeTopK)
    val got = Retrieval.bpeTopPairs(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == expect)
    val ranks = Retrieval.bpeTopPairs(spark, dir).collect().map(_.getLong(0))
    assert(ranks.toSeq == (1L to got.length).toSeq)
  }

  test("bpe trainer learns the hand-derivable merge sequence on a tiny vocab") {
    import spark.implicits._
    // aaab×2, ab×3: pairs (a,a):4, (a,b):5 → merge1 (a,b) n=5;
    // then [a,a,ab]×2, [ab]×3: (a,a):2, (a,ab):2 → tie, (a,a) wins
    // on (a, b) tie-break → merge2 (a,a) n=2;
    // then [aa,ab]×2: merge3 (aa,ab) n=2; round 4 has no pairs → stop
    val wc = Seq(("aaab", 2L), ("ab", 3L)).toDF("w", "c")
    val got = Retrieval.bpeTrainOn(wc, 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "a", "b", "ab", 5L),
      (2L, "a", "a", "aa", 2L),
      (3L, "aa", "ab", "aaab", 2L)))
  }

  test("bpe trainer's first fixture merge is bpe_top_pairs' rank-1 pair") {
    val first = Retrieval.bpeTrain(spark, dir).collect().head
    val top1 = Retrieval.bpeTopPairs(spark, dir).collect().head
    assert(first.getString(3) == top1.getString(1),
      "round 1 counts pairs over character segmentations — identical " +
        "to the standalone pair table's top entry")
    assert(first.getLong(4) == top1.getLong(2))
  }

  test("bpe encode: subtokens concatenate back to the word, merges fire") {
    val d = docs
    val got = Retrieval.bpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    got.foreach { case (id, pos, n, st) =>
      val w = d(id).split(' ')(pos.toInt)
      val parts = st.split(' ')
      assert(parts.length == n, s"doc $id pos $pos subtoken count")
      assert(parts.mkString("") == w,
        s"doc $id pos $pos: subtokens must concatenate to the word")
    }
    // the learned merges genuinely compress: some word encodes to
    // fewer subtokens than characters
    assert(got.exists { case (_, _, n, st) =>
      n < st.replace(" ", "").length })
  }

  test("tokenize assigns top-V ids by frequency, UNK for the tail, one row per token") {
    val d = docs
    val counts = scala.collection.mutable.Map.empty[String, Long]
    d.values.foreach(_.split(' ').filter(_.nonEmpty)
      .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(Retrieval.TokenizeVocabV)
      .zipWithIndex.map { case ((t, _), i) => t -> i.toLong }.toMap
    val unk = Retrieval.TokenizeVocabV.toLong
    val got = Retrieval.tokenizeDocs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expectRows = d.map { case (_, t) =>
      t.split(' ').count(_.nonEmpty) }.sum
    assert(got.length == expectRows, "one row per non-empty token")
    got.foreach { case (id, pos, tid) =>
      val term = d(id).split(' ')(pos.toInt)
      assert(tid == vocab.getOrElse(term, unk), s"doc $id pos $pos")
    }
    // the cap genuinely bites: both known ids and UNK occur
    assert(got.exists(_._3 == unk) && got.exists(_._3 < unk))
  }

  test("unigram-LM segmentation is Viterbi-optimal vs brute-force enumeration") {
    val model = Retrieval.unigramModel(spark, dir)
      .select("piece", "logp").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // model invariants: probabilities normalize, every piece is real
    val probSum = model.values.map(math.exp).sum
    assert(math.abs(probSum - 1.0) < 1e-9, s"prob mass $probSum")
    val words = Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).filter(_.nonEmpty)
    assert(model.keys.forall(p => words.exists(_.contains(p))),
      "a vocab piece never occurs in the corpus")
    def bruteBest(w: String): Double = {
      val memo = scala.collection.mutable.Map[Int, Double]()
      def go(i: Int): Double =
        if (i == w.length) 0.0
        else memo.getOrElseUpdate(i,
          (1 to math.min(Retrieval.UniMaxPiece, w.length - i)).flatMap { len =>
            model.get(w.substring(i, i + len)).map(_ + go(i + len))
          }.foldLeft(Double.NegativeInfinity)(math.max))
      go(0)
    }
    words.foreach { w =>
      val seg = Retrieval.viterbi(w, model)
      assert(seg.mkString == w, s"lossy segmentation of '$w'")
      assert(seg.forall(model.contains), s"'$w' used an out-of-vocab piece")
      val score = seg.map(model).sum
      assert(math.abs(score - bruteBest(w)) < 1e-9,
        s"'$w': viterbi $score < brute ${bruteBest(w)}")
    }
    // multi-char pieces genuinely win somewhere (EM kept useful pieces)
    assert(words.exists(w => Retrieval.viterbi(w, model).exists(_.length > 1)),
      "no word ever segments with a multi-char piece — inert vocabulary")
  }

  test("component-keyed split never straddles a near-dup cluster") {
    val r = Sharding.splitLeakage(spark, dir).collect().head
    assert(r.getLong(2) == 0, "safe split must be leakage-free")
    assert(r.getBoolean(3))
    assert(r.getLong(0) >= 1, "fixture must carry multi-doc clusters")
    // the naive doc-keyed split demonstrably leaks on this fixture
    assert(r.getLong(1) > 0,
      "fixture should show naive-split leakage (draw straddles a cluster)")
  }
}
