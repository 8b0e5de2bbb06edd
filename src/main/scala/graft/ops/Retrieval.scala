package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Lexical retrieval + tokenizer-prep operators over the `documents`
  * table: corpus vocabulary construction (the count table a BPE/WordPiece
  * trainer starts from) and BM25 ranked retrieval (the classic lexical
  * scorer behind retrieval-based data selection and eval-set mining).
  */
object Retrieval {

  /** Minimum corpus occurrences for a vocabulary entry ([[vocabBuild]]) —
    * the standard "prune the singleton tail" cut before merge training. */
  val VocabMinCount = 3L

  /** Query terms for the BM25 gate — frequent fixture-corpus tokens so
    * scores are dense and every df is well-populated. */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "merge")

  /** BM25 shape parameters (Robertson et al.'s defaults). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** Corpus vocabulary over unigram AND bigram entries — the merge-
    * candidate table a subword-tokenizer trainer consumes: every entry
    * with ≥ [[VocabMinCount]] corpus occurrences, ranked into contiguous
    * token ids by (occurrences desc, term).
    *
    * Scale shape: occurrences collapse to per-(doc, term) counts first
    * (map-side partial combine — a stopword ships one row per doc, not
    * one per occurrence), the rollup to corpus counts is one term-keyed
    * aggregate, and only then does the min-count cut apply. Token-id
    * assignment is [[Sharding.globalRowNumber]] — range partition +
    * broadcast per-partition offsets — NOT a bare `row_number() OVER
    * (ORDER BY …)`: a min-count-3 unigram+bigram vocabulary at corpus
    * scale is billions of rows, and Spark plans an empty partition spec
    * as ONE window task (the r7 verdict's one scale-killer; fixed here,
    * plan-asserted in PLANS.md).
    * A unigram never string-equals a bigram (bigrams contain a space), so
    * (occurrences, term) is a total order without the kind column. */
  def vocabBuild(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val uniOcc = d.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val uni = uniOcc.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("term").agg(sum("c").as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .withColumn("kind", lit("uni"))
    val bi = Dedup.shingles(d, 2, distinct = false)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      .groupBy("sh").agg(sum("c").as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .withColumnRenamed("sh", "term")
      .withColumn("kind", lit("bi"))
    val cut = uni.unionByName(bi)
      .filter(col("n_occurrences") >= VocabMinCount)
    Sharding.globalRowNumber(cut,
        Seq(col("n_occurrences").desc, col("term").asc))
      .withColumn("token_id", col("rank") - 1)
      .select(col("token_id"), col("kind"), col("term"),
        col("n_occurrences"), col("n_docs"))
      .orderBy("token_id")
  }

  /** BM25 top-10 documents for the fixed query [[Bm25Terms]]:
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Oracle-parity contract: every ln argument is built from integers and
    * exact halves with correctly-rounded divisions, so both engines hand
    * ln a bit-identical double (the [[TextAnalysis.unigramLp]] contract);
    * the ≤ |terms| addends are summed and rounded to 6 dp before any
    * rank, so ordering never straddles an ulp.
    *
    * Scale shape: term occurrences collapse to per-(doc, term) counts
    * map-side and the query-term filter prunes everything else BEFORE the
    * df aggregate and the length join, so only matching docs flow; N,
    * avgdl ride as lazy 1-row cross joins. The top-10 cut is orderBy +
    * limit — `TakeOrderedAndProject`, per-partition heaps merged on the
    * driver, never a global sort — and the rank window runs over the 10
    * surviving rows only. */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val occ = d.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val qtf = occ.filter(col("term").isin(Bm25Terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = d.select(col("doc_id"),
      size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = col("tf") * lit(Bm25K1 + 1) /
      (col("tf") + lit(Bm25K1) *
        (lit(1.0) - lit(Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    val scored = qtf.join(dfreq, "term").join(dl, "doc_id").crossJoin(stats)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum(idf * tfn), 6).as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(10)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy("rank")
  }

  /** The multi-query batch for [[bm25PerQuery]] — (query_id, term) rows,
    * the retrieval-based data-selection shape: each "query" is an eval
    * set's bag of terms, and the ranked matches are the corpus docs to
    * mine (or to hand to `decontaminate_fuzzy`). */
  val Bm25Queries: Seq[(Long, String)] = Seq(
    (1L, "spark"), (1L, "join"),
    (2L, "merge"), (2L, "window"),
    (3L, "data"), (3L, "query"), (3L, "batch"))

  /** Results per query id for [[bm25PerQuery]]. */
  val Bm25PerQueryK = 5

  /** BM25 ranked retrieval for a TABLE of queries — [[bm25TopK]]
    * generalized from one literal term list to (query_id, term) rows,
    * scoring each query independently and keeping the top
    * [[Bm25PerQueryK]] docs per query. This is the
    * mine-eval-set-neighbors-from-the-corpus operator: feed each eval
    * set's term bag in as one query id, get back the corpus docs to
    * inspect/decontaminate/select.
    *
    * Scale shape: the query table is small by definition (it is the
    * search INPUT), so its distinct-term set broadcasts and prunes the
    * corpus token stream BEFORE the df aggregate — per-(doc, term)
    * counts collapse map-side, then fan out per query id through a
    * second broadcast join (bounded by |query terms|, not corpus).
    * N and avgdl ride as lazy 1-row cross joins. The per-query top-k is
    * a (query_id)-partitioned rank window whose rk ≤ K filter prunes
    * through WindowGroupLimit — per-partition heaps, never a global
    * sort of the scored universe. Same oracle-parity float contract as
    * [[bm25TopK]]. */
  /** The pruned per-(doc, query-term) frequency stream (the oracle's
    * `qtf` CTE): broadcast query terms cut the token explode BEFORE
    * any aggregation — shared by the ranking and by [[retrievalEval]]'s
    * relevance table, so the eval gate doesn't pay a second corpus
    * scan + explode. */
  private def queryTermFreqs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Bm25Queries.toDF("query_id", "term")
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .join(broadcast(q.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
  }

  def bm25PerQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Bm25Queries.toDF("query_id", "term")
    val d = Tables.load(s, dir, "documents")
    val qtf = queryTermFreqs(s, dir)
    val dfreq = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = d.select(col("doc_id"),
      size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = col("tf") * lit(Bm25K1 + 1) /
      (col("tf") + lit(Bm25K1) *
        (lit(1.0) - lit(Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    val scored = qtf.join(broadcast(q), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id")).crossJoin(stats)
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum(idf * tfn), 6).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= Bm25PerQueryK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_terms"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** Pair-candidate count for [[bpeTopPairs]]. */
  val BpeTopK = 20

  /** The first iteration of BPE training, distributed: the corpus-wide
    * count of every adjacent character pair inside words — the table a
    * byte-pair-encoding trainer consumes to pick its next merge (the
    * trainer loop itself is driver-side over this vocab-bounded table,
    * exactly like [[graft.ops.Ivf]]'s driver-side Lloyd's over a
    * bounded sample).
    *
    * Scale shape: the token stream collapses to WORD counts first (one
    * term-keyed aggregate — the same vocab-bounded pre-agg as
    * [[vocabBuild]]), so the character-pair explode runs over the
    * vocabulary, not the corpus: a word occurring a billion times ships
    * ONE row into the pair expansion, carrying its count. The top-K cut
    * is orderBy + limit — `TakeOrderedAndProject`, per-partition heaps,
    * never a global sort — and the rank window runs over K rows only. */
  def bpeTopPairs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val words = d.select(
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
    val wc = words.groupBy("w").agg(count(lit(1)).as("c"))
    val pairs = wc.select(col("c"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("c").as("n_occurrences"))
    pairs.orderBy(col("n_occurrences").desc, col("pair")).limit(BpeTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("pair"))).cast("long"))
      .select(col("rank"), col("pair"), col("n_occurrences"))
      .orderBy("rank")
  }

  /** Merge rounds learned by [[bpeTrain]]. */
  val BpeMergeRounds = 10

  /** Standard greedy left-to-right non-overlapping BPE merge of the
    * adjacent pair (a, b) in one segmentation. */
  private[graft] def mergeAdjacent(seg: Seq[String], a: String,
                                   b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < seg.length) {
      if (i + 1 < seg.length && seg(i) == a && seg(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += seg(i); i += 1 }
    }
    out.result()
  }

  /** The full iterative BPE trainer over a (w, c) word-count table:
    * [[bpeTopPairs]]' single pair-count iterated `rounds` times, each
    * round merging the argmax pair (count desc, ties (left, right)
    * asc) into every segmentation. Returns the learned merge table
    * (rank, lhs, rhs, merged, n_occurrences) — the artifact a BPE
    * tokenizer IS.
    *
    * Scale shape: the state is the VOCAB-BOUNDED word-count table
    * (never the corpus — a billion-occurrence word is one row), each
    * round is one map-side-partial pair aggregate + a 1-row argmax
    * (`TakeOrderedAndProject`) + a compiled re-segmentation map;
    * `localCheckpoint` truncates the per-round lineage so round k
    * doesn't replay rounds 1..k-1. The driver holds only the k-row
    * merge list (the [[Ivf]] centroid pattern: tiny model state
    * driver-side, data distributed). */
  private[graft] def bpeTrainOn(wc: DataFrame, rounds: Int): DataFrame = {
    val s = wc.sparkSession
    import s.implicits._
    var seg = wc.select(col("w"), col("c")).as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString), c) }
      .toDF("seg", "c").localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // the size-≥2 guard matters: a fully-merged word's segmentation
      // is ONE symbol, and Spark's sequence(1, 0) steps DOWNWARD
      // ([1, 0]) instead of yielding an empty array
      val top = seg.filter(size(col("seg")) >= 2)
        .select(col("c"), explode(expr(
          """transform(sequence(1, size(seg) - 1),
               i -> struct(element_at(seg, i) AS a,
                           element_at(seg, i + 1) AS b))""")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, a, b, a + b, n))
        seg = seg.as[(Seq[String], Long)]
          .map { case (sg, c) => (mergeAdjacent(sg, a, b), c) }
          .toDF("seg", "c").localCheckpoint()
        round += 1
      }
    }
    merges.result().toDF("rank", "lhs", "rhs", "merged", "n_occurrences")
      .orderBy("rank")
  }

  /** [[bpeTrainOn]] over the corpus word counts, computed once per
    * corpus fingerprint and persisted ([[TruthCache]]) — the merge
    * table is the trained MODEL, shared by the train gate and the
    * encode gate the way [[IvfModel]] shares centroids. */
  private def trainedMerges(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    TruthCache.cached(s, "bpe_merges", Dedup.docsFingerprint(d), {
      val wc = d.select(
          explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("c"))
      bpeTrainOn(wc, BpeMergeRounds)
    })
  }

  /** Gate: [[BpeMergeRounds]] BPE merges learned from the documents
    * corpus (words of length ≥ 2 — single-character words carry no
    * pairs and never change). */
  def bpeTrain(s: SparkSession, dir: String): DataFrame =
    trainedMerges(s, dir).orderBy("rank")

  /** Subword ENCODING under the learned merges — the other half of the
    * tokenizer ([[bpeTrain]] trains it, this applies it): every corpus
    * word segmented by replaying the k merges in rank order (greedy
    * left-to-right each, exactly the training-time [[mergeAdjacent]]),
    * one output row per (doc, position).
    *
    * Scale shape: the merge list is the MODEL — k rows, collected
    * driver-side like centroids; segmentation runs once per DISTINCT
    * word (a vocab-bounded compiled map, never per occurrence), and
    * the corpus joins the encoded vocabulary back by word through a
    * broadcast (word→subword tables are vocab-bounded: real corpora
    * hold millions of distinct words — tens of MB — against billions
    * of occurrences). */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val merges = trainedMerges(s, dir).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val d = Tables.load(s, dir, "documents")
    val occ = d.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")))
      .toDF("doc_id", "pos", "w")
      .filter(length(col("w")) > 0)
    val encoded = occ.select("w").distinct().as[String].map { w =>
      var seg: Seq[String] = w.map(_.toString)
      merges.foreach { case (a, b) => seg = mergeAdjacent(seg, a, b) }
      (w, seg.mkString(" "), seg.length.toLong)
    }.toDF("w", "subtokens", "n_subtokens")
    occ.join(broadcast(encoded), Seq("w"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("n_subtokens"), col("subtokens"))
      .orderBy("doc_id", "pos")
  }

  /** Vocabulary cap for [[tokenizeDocs]] — deliberately below the
    * fixture's 31 distinct terms so the UNK path is exercised at every
    * scale factor; production sets 32k–200k. */
  val TokenizeVocabV = 20

  /** Corpus tokenization against a capped vocabulary — the encode step
    * that turns the curated corpus into the training token stream:
    * word-level ids under the top-[[TokenizeVocabV]] vocabulary
    * (count desc, ties by term), everything else the UNK id (= V).
    * One row per (doc, position).
    *
    * Scale shape: the vocabulary is CAPPED BY DESIGN (tokenizer vocabs
    * are; the cut is `TakeOrderedAndProject`), so the term→id table
    * broadcasts at any corpus size and the encode is a map-side
    * broadcast join behind the token scan — a stopword's billion
    * occurrences never shuffle on the term key. The id-rank window
    * runs over V rows only. */
  def tokenizeDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val occ = d.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")))
      .toDF("doc_id", "pos", "term")
      .filter(length(col("term")) > 0)
    val top = occ.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(TokenizeVocabV)
    val vocab = top.withColumn("token_id",
      row_number().over(
        Window.orderBy(col("c").desc, col("term"))).cast("long") - 1)
    occ.join(broadcast(vocab.select("term", "token_id")), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(TokenizeVocabV.toLong)).as("token_id"))
      .orderBy("doc_id", "pos")
  }

  // ---- SentencePiece-style unigram-LM tokenizer (Kudo 2018) ----

  /** Max piece length in characters. */
  val UniMaxPiece = 4

  /** Multi-character pieces retained after seeding (single characters
    * are always kept, so segmentation can never fail). */
  val UniMultiV = 40

  /** EM refinement rounds. */
  val UniEmRounds = 3

  /** Viterbi-best segmentation of `w` under piece log-probs `lp`: the
    * split maximizing Σ log p(piece). Deterministic tie-break: strictly-
    * greater updates with ascending split points prefer the LONGEST
    * final piece on equal scores. Single chars are always in `lp`, so a
    * segmentation always exists. */
  private[graft] def viterbi(w: String, lp: collection.Map[String, Double],
                             maxLen: Int = UniMaxPiece): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        lp.get(w.substring(j, i)) match {
          case Some(p) if best(j) + p > best(i) =>
            best(i) = best(j) + p; back(i) = j
          case _ =>
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer[String]()
    var k = n
    while (k > 0) { out.prepend(w.substring(back(k), k)); k = back(k) }
    out.toList
  }

  /** The trained unigram model (piece, count, logp), computed once per
    * corpus fingerprint ([[TruthCache]] — the [[IvfModel]]/BPE-merge
    * pattern). Seeding: every ≤[[UniMaxPiece]]-char substring of every
    * distinct word, count-weighted; all single chars plus the top
    * [[UniMultiV]] multi-char pieces survive. Each EM round is ONE
    * distributed pass over the DISTINCT-WORD table (vocab-bounded — a
    * billion-occurrence word Viterbi-segments once) with the k-entry
    * model broadcast; the E-step's piece-usage counts aggregate
    * map-side, the M-step renormalizes driver-side over the k-row
    * model — the centroid pattern. Unused pieces fall out of the vocab
    * (the paper's pruning, with usage as the importance score); single
    * chars are floored so coverage never breaks. */
  private[graft] def unigramModel(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    TruthCache.cached(s, "unigram_model", Dedup.docsFingerprint(d), {
      import s.implicits._
      val wc = d.select(
          explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c"))
        .as[(String, Long)]
        .localCheckpoint() // the EM loop re-reads this table every round
      val seeds = wc.flatMap { case (w, c) =>
        for {
          len <- 1 to math.min(UniMaxPiece, w.length)
          j <- 0 to w.length - len
        } yield (w.substring(j, j + len), c)
      }.toDF("piece", "c").groupBy("piece").agg(sum(col("c")).as("c"))
      val chars = seeds.filter(length(col("piece")) === 1)
      val multi = seeds.filter(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece")).limit(UniMultiV)
      var vocab: Map[String, Long] = chars.unionByName(multi)
        .as[(String, Long)].collect().toMap
      for (_ <- 1 to UniEmRounds) {
        val total = vocab.values.sum.toDouble
        val lp = vocab.map { case (p, c) => p -> math.log(c / total) }
        val bc = s.sparkContext.broadcast(lp)
        val used = wc.flatMap { case (w, c) =>
          viterbi(w, bc.value).map(p => (p, c))
        }.toDF("piece", "c").groupBy("piece").agg(sum(col("c")).as("c"))
          .as[(String, Long)].collect().toMap
        vocab = vocab.keysIterator.map { p =>
          p -> used.getOrElse(p, if (p.length == 1) 1L else 0L)
        }.filter(_._2 > 0).toMap
      }
      val total = vocab.values.sum.toDouble
      vocab.toSeq.sortBy(_._1)
        .map { case (p, c) => (p, c, math.log(c / total)) }
        .toDF("piece", "c", "logp")
    })
  }

  /** Gate: Viterbi segmentation of every distinct corpus word under the
    * trained model. The oracle-checked contract is LOSSLESSNESS and
    * coverage — `rebuilt` (the pieces re-concatenated) must equal the
    * word, for EVERY distinct word — which no segmentation bug
    * survives; optimality against brute-force enumeration is asserted
    * in the spec (no SQL engine replays Viterbi). */
  def unigramTokenize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lp = unigramModel(s, dir).select("piece", "logp")
      .as[(String, Double)].collect().toMap
    val bc = s.sparkContext.broadcast(lp)
    val d = Tables.load(s, dir, "documents")
    d.select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String]
      .map { w =>
        val seg = viterbi(w, bc.value)
        (w, seg.mkString, seg.forall(bc.value.contains))
      }
      .toDF("w", "rebuilt", "pieces_in_vocab")
      .orderBy("w")
  }

  /** Sliding-window chunk width / stride (tokens) for [[chunkSliding]] —
    * production RAG pipelines use 256–1024 with 50% overlap; the fixture
    * docs are 10–99 tokens, so 32/16 keeps the same coverage regime. */
  val ChunkW = 32
  val ChunkStride = 16

  /** Retrieval-unit construction: every doc cut into [[ChunkW]]-token
    * windows advancing by [[ChunkStride]] (50% overlap), each chunk
    * carrying provenance (doc_id, chunk_id, start_tok, n_tokens) — the
    * prep step that turns a curated corpus into the passage table a
    * dense or BM25 retriever indexes. The last window is partial; every
    * token is covered by at least one chunk.
    *
    * Scale shape: pure map-side typed flatMap behind the scan (compiled,
    * same rationale as [[Dedup.shingles]]) — zero shuffles; the output
    * inherits the scan's partitioning, ready for a downstream
    * `partitionBy`/index build. */
  def chunkSliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (w, st) = (ChunkW, ChunkStride)
    Tables.load(s, dir, "documents")
      // NULL → '' here (not a flatMap branch) so Spark and the oracle's
      // COALESCE see the identical one-empty-token split
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(' ')
        val starts = 0 until math.max(toks.length, 1) by st
        starts.iterator.map { start =>
          val slice = toks.slice(start, start + w)
          (id, (start / st).toLong, start.toLong, slice.length.toLong,
            slice.mkString(" "))
        }
      }
      .toDF("doc_id", "chunk_id", "start_tok", "n_tokens", "text")
      .orderBy("doc_id", "chunk_id")
  }

  /** The phrase-search gate's query set: two bigrams and a trigram over
    * the fixture vocabulary, all with non-empty result sets. */
  val PhraseQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("table", "value"),
    2L -> Seq("data", "stream"),
    3L -> Seq("join", "part", "filter"))

  /** Exact phrase search over a POSITIONAL inverted index — the query
    * shape BM25's bag-of-words ranking can't express (terms must be
    * adjacent, in order). The index is (term, doc_id, pos) postings; a
    * phrase of n terms matches at start s iff term_i sits at s+i for
    * every i.
    *
    * The classic plan is an n-way self-join on (doc, pos+i); this is
    * the align-and-count formulation that does it in ONE pass: each
    * posting that matches term_i contributes the candidate start
    * (pos − i), and a start with all n DISTINCT offsets present is a
    * full match. One broadcast semi-join discards every posting outside
    * the query vocabulary at the scan, so the shuffle is proportional
    * to the matched postings, not the corpus; at 100 TB the postings
    * table is the persisted artifact (partitioned by term hash, built
    * once) and each query reads only its terms' partitions. Overlapping
    * matches count individually — same contract as the oracle's
    * position scan. */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val postings = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")))
      .toDF("doc_id", "pos", "term")
    val pterms = PhraseQueries
      .flatMap { case (pid, ws) => ws.zipWithIndex.map { case (w, i) =>
        (pid, i.toLong, w, ws.length.toLong) } }
      .toDF("phrase_id", "idx", "term", "phrase_len")
    postings.join(broadcast(pterms), Seq("term"))
      .select(col("phrase_id"), col("doc_id"),
        (col("pos") - col("idx")).as("start"), col("idx"), col("phrase_len"))
      .groupBy("phrase_id", "doc_id", "start", "phrase_len")
      .agg(countDistinct(col("idx")).as("n_hit"))
      .filter(col("n_hit") === col("phrase_len") && col("start") >= 0)
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_matches"))
      .orderBy("phrase_id", "doc_id")
  }

  /** Neighbors returned per query by [[ragRetrieve]]. */
  val RagK = 3

  /** The RAG indexing pipeline end-to-end, as ONE composed dataflow:
    * [[chunkSliding]] cuts the corpus into passages, every passage is
    * hash-embedded ([[TextAnalysis.hashEmbed]]'s recipe — model-free, so
    * the whole chain stays oracle-exact: ±1 sums are integers in
    * doubles, hence bit-deterministic under any aggregation order), and
    * each query passage retrieves its [[RagK]] nearest corpus passages
    * by cosine. Corpus = chunk 0 of every doc (the passage index);
    * queries = chunk 1 of every 100th doc. (The fixture's ~30-word
    * shared vocabulary makes all bags-of-words look alike, so the gate
    * asserts the exact ranked listing, not source-doc recall — with a
    * real vocabulary the 50% token overlap would dominate.)
    *
    * Candidate semantics are sparse-retrieval standard (same as BM25):
    * only pairs sharing ≥1 nonzero dimension are scored — the
    * dim-keyed join IS the inverted index probe, and a pair with no
    * shared dimension has cosine 0 and loses to any candidate anyway.
    *
    * Scale shape: embeddings stay in sparse long form (key, dim, val)
    * end-to-end — chunking and embedding are map-side behind the scan;
    * the per-dim join ships only nonzero postings (query side tiny →
    * broadcast); ranking is a per-query window over candidate rows. At
    * real scale the corpus half is the persisted artifact (the IVF/LSH
    * index build path) and only the query batch is embedded per run. */
  def ragRetrieve(s: SparkSession, dir: String): DataFrame = {
    val chunks = chunkSliding(s, dir)
    def embed(df: DataFrame): DataFrame = {
      val terms = df.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .withColumn("fp", md5(col("term")))
      def hx(i: Int) = expr(s"instr('0123456789abcdef', substring(fp, $i, 1)) - 1")
      terms
        .withColumn("v", ((hx(1) * 16 + hx(2)) * 16 + hx(3)) * 16 + hx(4))
        .withColumn("dim", pmod(col("v"), lit(TextAnalysis.HashDim)).cast("long"))
        .withColumn("sgn", when(hx(5) % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))
        .groupBy("doc_id", "dim").agg(sum(col("sgn")).as("val"))
        .filter(col("val") =!= 0.0) // sparse: zero dims carry no signal
    }
    val cemb = embed(chunks.filter(col("chunk_id") === 0))
    val qemb = embed(chunks.filter(
      col("chunk_id") === 1 && pmod(col("doc_id"), lit(100)) === 7))
    def ssOf(e: DataFrame) = e.groupBy("doc_id")
      .agg(sum(col("val") * col("val")).as("ss"))
    // the corpus norm rides the posting rows through a window over the
    // ONE (doc, dim) aggregate instead of a second full embed pass +
    // n_doc shuffle join (opt r1, guide §2.4: cemb had two unreused
    // consumers — persist was tried and measured a no-op, removing the
    // recompute outright is the real fix). Bit-safety: ss values are
    // integer sums carried in doubles (squares of ±1-sign counts), so
    // window-vs-aggregate addition order cannot change a bit, and every
    // posting row of a doc carries the same css (max = that value).
    val cembSs = cemb.withColumn("css",
      sum(col("val") * col("val")).over(Window.partitionBy(col("doc_id"))))
    val prods = broadcast(qemb.select(col("doc_id").as("q_doc"),
        col("dim"), col("val").as("qv")))
      .join(cembSs.select(col("doc_id").as("n_doc"), col("dim"),
        col("val").as("cv"), col("css")), Seq("dim"))
      .groupBy("q_doc", "n_doc").agg(sum(col("qv") * col("cv")).as("dp"),
        max(col("css")).as("css"))
    val scored = prods
      .join(broadcast(ssOf(qemb).withColumnRenamed("doc_id", "q_doc")
        .withColumnRenamed("ss", "qss")), Seq("q_doc"))
      .withColumn("cosine", round(col("dp") / sqrt(col("qss") * col("css")), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_doc"))
          .orderBy(col("cosine").desc, col("n_doc"))).cast("long"))
      .filter(col("rank") <= RagK)
      .select(col("q_doc"), col("rank"), col("n_doc"), col("cosine"))
      .orderBy("q_doc", "rank")
  }

  /** Retrieval-quality EVALUATION (`retrieval_eval`) — MRR and nDCG@K
    * for the [[bm25PerQuery]] ranking against a graded relevance truth
    * derived from the corpus itself: rel(query, doc) = how many of the
    * query's distinct terms the doc contains (full containment = the
    * binary "relevant" for MRR; the graded value feeds nDCG's 2^rel−1
    * gains). This closes the retrieval loop — index → search →
    * measure — the way a training-data pipeline scores its retriever
    * before trusting it for data selection.
    *
    * Scale shape: the relevance table reuses the pruned
    * (doc, query-term) stream (broadcast query terms in front of the
    * scan), the ideal ranking prunes through a per-query
    * WindowGroupLimit, and every metric is a per-query aggregate of
    * ≤K rows. Determinism: DCG addends round to 9 dp and sum as
    * DECIMAL(18,9) (order-independent); log2 is spelled LN(x)/LN(2)
    * identically on both engines; final metrics round to 6 dp. */
  def retrievalEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Bm25Queries.toDF("query_id", "term")
    val qn = q.groupBy("query_id").agg(count(lit(1)).as("n_terms"))
    // relevance from the SAME pruned frequency stream the ranking uses
    // (the oracle derives rel from the shared qtf CTE identically)
    val rel = queryTermFreqs(s, dir).join(broadcast(q), Seq("term"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("rel"))
    val hits = bm25PerQuery(s, dir).select("query_id", "rank", "doc_id")
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    def gain(rankCol: org.apache.spark.sql.Column) =
      round((pow(lit(2.0), col("rel")) - lit(1.0)) /
        (log(rankCol.cast("double") + lit(1.0)) / log(lit(2.0))), 9)
        .cast("decimal(18,9)")
    val dcg = hits.groupBy("query_id")
      .agg(round(sum(gain(col("rank"))).cast("double"), 6).as("dcg"))
    val ideal = rel.withColumn("irank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rel").desc, col("doc_id"))).cast("long"))
      .filter(col("irank") <= Bm25PerQueryK)
    val idcg = ideal.groupBy("query_id")
      .agg(round(sum(gain(col("irank"))).cast("double"), 6).as("idcg"))
    val firstFull = hits.join(broadcast(qn), Seq("query_id"))
      .filter(col("rel") === col("n_terms"))
      .groupBy("query_id").agg(min(col("rank")).as("fr"))
    val nRel = rel.join(broadcast(qn), Seq("query_id"))
      .filter(col("rel") === col("n_terms"))
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    qn.select("query_id")
      .join(nRel, Seq("query_id"), "left")
      .join(firstFull, Seq("query_id"), "left")
      .join(dcg, Seq("query_id"), "left")
      .join(idcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(round(lit(1.0) / col("fr"), 6), lit(0.0)).as("mrr"),
        when(coalesce(col("idcg"), lit(0.0)) === 0.0, lit(0.0))
          .otherwise(round(col("dcg") / col("idcg"), 6)).as("ndcg"))
      .orderBy("query_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rag_retrieve" -> (ragRetrieve _),
    "text_phrase_search" -> (phraseSearch _),
    "chunk_sliding" -> (chunkSliding _),
    "vocab_build" -> (vocabBuild _),
    "text_bm25_topk" -> (bm25TopK _),
    "text_bm25_queries" -> (bm25PerQuery _),
    "retrieval_eval" -> (retrievalEval _),
    "bpe_top_pairs" -> (bpeTopPairs _),
    "bpe_train" -> (bpeTrain _),
    "bpe_encode" -> (bpeEncode _),
    "unigram_tokenize" -> (unigramTokenize _),
    "tokenize_docs" -> (tokenizeDocs _))

  /** The [[bm25PerQuery]] ranking as DuckDB CTEs (no leading WITH;
    * exposes q, qtf, dfreq, dl, stats, scored, ranked) — shared by the
    * ranking oracle and the retrieval-eval oracle on top of it. */
  private def bm25QueryCtesSql: String = {
    val qvals = Bm25Queries.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""q0(query_id, term) AS (VALUES $qvals),
      q AS (SELECT CAST(query_id AS BIGINT) AS query_id, term FROM q0),
      occ0 AS (
        SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
        FROM documents),
      qtf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM occ0
        WHERE length(term) > 0 AND term IN (SELECT DISTINCT term FROM q)
        GROUP BY 1, 2),
      dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM qtf GROUP BY 1),
      dl AS (
        SELECT doc_id,
          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS dl
        FROM documents),
      stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      scored AS (
        SELECT q.query_id, qtf.doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_terms,
          ROUND(SUM(
            ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
            (qtf.tf * ${Bm25K1 + 1} /
              (qtf.tf + $Bm25K1 *
                (1.0 - $Bm25B + $Bm25B * dl.dl / stats.avgdl)))), 6) AS score
        FROM qtf
          JOIN q USING (term)
          JOIN dfreq ON qtf.term = dfreq.term
          JOIN dl ON qtf.doc_id = dl.doc_id, stats
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, doc_id, n_terms, score,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        FROM scored)"""
  }

  /** The unrolled BPE training stages as DuckDB CTEs (no leading
    * WITH): word counts → char segmentations → k rounds of pair-count
    * aggregate, (n DESC, a, b) argmax (m1..mk) and list_reduce
    * re-segmentation implementing the same greedy left-to-right
    * non-overlapping merge as [[mergeAdjacent]] (the accumulator's
    * last element equals a||b after a merge, which differs from a, so
    * it can never immediately re-merge). Shared by the train and
    * encode oracles. */
  private def bpeTrainStagesSql(k: Int): String = {
    val stages = (1 to k).map { i =>
      val prev = s"seg${i - 1}"
      val segNext =
        if (i == k) "" // the last round's re-segmentation is unused
        else s""",
      seg$i AS (
        SELECT list_reduce(list_transform(seg, x -> [x]),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m$i.a
                             AND x[1] = m$i.b
                      THEN list_concat(acc[:-2], [m$i.a || m$i.b])
                      ELSE list_concat(acc, x) END) AS seg, c
        FROM $prev, m$i)"""
      s"""
      p$i AS (
        SELECT a, b, CAST(SUM(c) AS BIGINT) AS n FROM (
          SELECT c, seg[j] AS a, seg[j+1] AS b
          FROM $prev, unnest(generate_series(1, len(seg) - 1)) AS u(j))
        GROUP BY 1, 2),
      m$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1)$segNext"""
    }.mkString(",")
    s"""w0 AS (
        SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS w
        FROM documents),
      wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w0
             WHERE length(w) >= 2 GROUP BY 1),
      seg0 AS (SELECT string_split(w, '') AS seg, c FROM wc),
      $stages"""
  }

  private def bpeMergesUnionSql(k: Int): String =
    (1 to k).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, a AS lhs, b AS rhs,
            a || b AS merged, n AS n_occurrences FROM m$i""")
      .mkString(" UNION ALL ")

  /** Phrase-search oracle, generated from [[PhraseQueries]] so engine
    * and oracle share ONE phrase list: a 1-based position scan with
    * per-phrase adjacency conditions (out-of-range list indexes are
    * NULL in DuckDB, so partial windows at the doc tail fail the
    * equality naturally). */
  private def phraseOracleSql: String = {
    val arms = PhraseQueries.map { case (pid, ws) =>
      val conds = ws.zipWithIndex
        .map { case (w, i) => s"t[i+$i] = '$w'" }.mkString(" AND ")
      s"""SELECT CAST($pid AS BIGINT) AS phrase_id, doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM pos WHERE $conds GROUP BY doc_id"""
    }.mkString(" UNION ALL ")
    s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t FROM documents),
      pos AS (
        SELECT doc_id, t,
          CAST(unnest(generate_series(1, GREATEST(len(t), 1))) AS BIGINT) i
        FROM toks)
      SELECT * FROM ($arms) ORDER BY phrase_id, doc_id"""
  }

  /** [[ragRetrieve]]'s oracle: the same chunk → hash-embed → sparse
    * cosine → per-query rank chain in DuckDB (chunk CTE from the
    * chunk_sliding oracle, hex recipe from the text_hash_embed one). */
  private def ragOracleSql: String = {
    val hd = TextAnalysis.HashDim
    s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t FROM documents),
      chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
          t[(i*$ChunkStride+1):(i*$ChunkStride+$ChunkW)] AS w
        FROM toks, unnest(generate_series(0,
          CAST(ceil(GREATEST(len(t), 1) / ${ChunkStride}.0) AS INT) - 1)) u(i)),
      sel AS (
        SELECT doc_id, (chunk_id = 1) AS is_q, w FROM chunks
        WHERE chunk_id = 0 OR (chunk_id = 1 AND doc_id % 100 = 7)),
      terms AS (SELECT doc_id, is_q, unnest(w) AS term FROM sel),
      h AS (SELECT doc_id, is_q, md5(term) AS fp
        FROM terms WHERE length(term) > 0),
      hx AS (
        SELECT doc_id, is_q,
          strpos('0123456789abcdef', substring(fp, 1, 1)) - 1 AS h1,
          strpos('0123456789abcdef', substring(fp, 2, 1)) - 1 AS h2,
          strpos('0123456789abcdef', substring(fp, 3, 1)) - 1 AS h3,
          strpos('0123456789abcdef', substring(fp, 4, 1)) - 1 AS h4,
          strpos('0123456789abcdef', substring(fp, 5, 1)) - 1 AS h5
        FROM h),
      sgn AS (
        SELECT doc_id, is_q,
          (((h1*16 + h2)*16 + h3)*16 + h4) % $hd AS dim,
          CASE WHEN h5 % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
        FROM hx),
      vals AS (
        SELECT doc_id, is_q, dim, SUM(s) AS val FROM sgn
        GROUP BY 1, 2, 3 HAVING SUM(s) <> 0),
      ss AS (SELECT doc_id, is_q, SUM(val*val) AS ss FROM vals GROUP BY 1, 2),
      dp AS (
        SELECT q.doc_id AS q_doc, c.doc_id AS n_doc, SUM(q.val*c.val) AS dp
        FROM vals q JOIN vals c ON q.dim = c.dim
        WHERE q.is_q AND NOT c.is_q GROUP BY 1, 2),
      cos AS (
        SELECT d.q_doc, d.n_doc,
          ROUND(d.dp / sqrt(qs.ss * cs.ss), 6) AS cosine
        FROM dp d
        JOIN ss qs ON qs.doc_id = d.q_doc AND qs.is_q
        JOIN ss cs ON cs.doc_id = d.n_doc AND NOT cs.is_q),
      ranked AS (
        SELECT q_doc, n_doc, cosine,
          row_number() OVER (PARTITION BY q_doc
            ORDER BY cosine DESC, n_doc) AS rank
        FROM cos)
      SELECT q_doc, CAST(rank AS BIGINT) AS rank, n_doc, cosine
      FROM ranked WHERE rank <= $RagK ORDER BY q_doc, rank"""
  }

  val oracle: Map[String, String] = Map(
    "rag_retrieve" -> ragOracleSql,
    "text_phrase_search" -> phraseOracleSql,
    "unigram_tokenize" -> """
      SELECT term AS w, term AS rebuilt, CAST(1 AS BOOLEAN) AS pieces_in_vocab
      FROM (
        SELECT DISTINCT unnest(string_split(COALESCE(text, ''), ' ')) AS term
        FROM documents)
      WHERE length(term) > 0 ORDER BY w""",
    "chunk_sliding" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t FROM documents),
      chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
          CAST(i * $ChunkStride AS BIGINT) AS start_tok,
          t[(i*$ChunkStride+1):(i*$ChunkStride+$ChunkW)] AS w
        FROM toks, unnest(generate_series(0,
          CAST(ceil(GREATEST(len(t), 1) / ${ChunkStride}.0) AS INT) - 1)) u(i))
      SELECT doc_id, chunk_id, start_tok,
        CAST(len(w) AS BIGINT) AS n_tokens,
        array_to_string(w, ' ') AS text
      FROM chunks ORDER BY doc_id, chunk_id""",
    "vocab_build" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t FROM documents),
      u0 AS (SELECT doc_id, unnest(t) AS term FROM toks),
      up AS (SELECT doc_id, term, COUNT(*) c FROM u0
             WHERE length(term) > 0 GROUP BY 1, 2),
      uf AS (SELECT 'uni' AS kind, term, SUM(c) AS n_occ, COUNT(*) AS n_docs
             FROM up GROUP BY 2),
      b0 AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS term
             FROM (SELECT doc_id, t,
                     unnest(generate_series(1, greatest(len(t) - 1, 0))) i
                   FROM toks)),
      bp AS (SELECT doc_id, term, COUNT(*) c FROM b0 GROUP BY 1, 2),
      bf AS (SELECT 'bi' AS kind, term, SUM(c) AS n_occ, COUNT(*) AS n_docs
             FROM bp GROUP BY 2),
      vocab AS (
        SELECT * FROM uf UNION ALL SELECT * FROM bf),
      cut AS (SELECT * FROM vocab WHERE n_occ >= $VocabMinCount)
      SELECT
        CAST(row_number() OVER (ORDER BY n_occ DESC, term) - 1 AS BIGINT)
          AS token_id,
        kind, term,
        CAST(n_occ AS BIGINT) AS n_occurrences,
        CAST(n_docs AS BIGINT) AS n_docs
      FROM cut ORDER BY token_id""",
    "text_bm25_queries" -> s"""
      WITH $bm25QueryCtesSql
      SELECT query_id, rank, doc_id, n_terms, score FROM ranked
      WHERE rank <= $Bm25PerQueryK ORDER BY query_id, rank""",
    // MRR + nDCG@K on top of the SAME ranking CTEs; relevance = count
    // of the query's terms the doc contains; DCG addends through
    // DECIMAL(18,9) so the ≤K-term sums are order-independent
    "retrieval_eval" -> s"""
      WITH $bm25QueryCtesSql,
      rel AS (
        SELECT q.query_id, qtf.doc_id, CAST(COUNT(*) AS BIGINT) AS rel
        FROM qtf JOIN q USING (term) GROUP BY 1, 2),
      qn AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms
             FROM q GROUP BY 1),
      hits AS (
        SELECT r.query_id, r.rank, COALESCE(rel.rel, 0) AS rel
        FROM ranked r LEFT JOIN rel
          ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
        WHERE r.rank <= $Bm25PerQueryK),
      dcg AS (
        SELECT query_id, ROUND(CAST(SUM(CAST(ROUND(
            (POWER(2.0, rel) - 1.0) /
            (LN(CAST(rank + 1 AS DOUBLE)) / LN(2.0)), 9)
          AS DECIMAL(18,9))) AS DOUBLE), 6) AS dcg
        FROM hits GROUP BY 1),
      ideal AS (
        SELECT query_id, rel, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY rel DESC, doc_id) AS BIGINT) AS irank
        FROM rel),
      idcg AS (
        SELECT query_id, ROUND(CAST(SUM(CAST(ROUND(
            (POWER(2.0, rel) - 1.0) /
            (LN(CAST(irank + 1 AS DOUBLE)) / LN(2.0)), 9)
          AS DECIMAL(18,9))) AS DOUBLE), 6) AS idcg
        FROM ideal WHERE irank <= $Bm25PerQueryK GROUP BY 1),
      ff AS (
        SELECT h.query_id, MIN(h.rank) AS fr
        FROM hits h JOIN qn USING (query_id)
        WHERE h.rel = qn.n_terms GROUP BY 1),
      nrel AS (
        SELECT rel.query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM rel JOIN qn USING (query_id)
        WHERE rel.rel = qn.n_terms GROUP BY 1)
      SELECT qn.query_id,
        COALESCE(n_rel, 0) AS n_rel,
        COALESCE(ROUND(CAST(1.0 AS DOUBLE) / fr, 6), 0.0) AS mrr,
        CASE WHEN COALESCE(idcg, 0.0) = 0.0 THEN 0.0
          ELSE ROUND(dcg / idcg, 6) END AS ndcg
      FROM qn LEFT JOIN nrel USING (query_id) LEFT JOIN ff USING (query_id)
        LEFT JOIN dcg USING (query_id) LEFT JOIN idcg USING (query_id)
      ORDER BY qn.query_id""",
    // the trainer oracle unrolls the merge loop into K CTE stages: per
    // stage a pair-count aggregate, a (n DESC, a, b) argmax, and a
    // list_reduce re-segmentation implementing the same greedy
    // left-to-right non-overlapping merge as mergeAdjacent (the
    // accumulator's last element can never re-merge because it equals
    // a||b, which differs from a)
    "bpe_train" -> s"""
      WITH ${bpeTrainStagesSql(BpeMergeRounds)}
      ${bpeMergesUnionSql(BpeMergeRounds)} ORDER BY rank""",
    // encode = the SAME training stages (m1..mk) replayed over every
    // distinct corpus word (e0..ek; a LEFT JOIN ON TRUE keeps words
    // flowing if a round ran dry), joined back to (doc, position)
    "bpe_encode" -> {
      val k = BpeMergeRounds
      val applies = (1 to k).map { i =>
        s"""
      e$i AS (
        SELECT w,
          CASE WHEN m$i.a IS NULL THEN seg
          ELSE list_reduce(list_transform(seg, x -> [x]),
            (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m$i.a
                               AND x[1] = m$i.b
                        THEN list_concat(acc[:-2], [m$i.a || m$i.b])
                        ELSE list_concat(acc, x) END) END AS seg
        FROM e${i - 1} LEFT JOIN m$i ON TRUE)"""
      }.mkString(",")
      s"""
      WITH ${bpeTrainStagesSql(k)},
      dtoks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t
        FROM documents),
      occ AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS w
        FROM dtoks, unnest(generate_series(1, len(t))) AS u(i)
        WHERE length(t[i]) > 0),
      dw AS (SELECT DISTINCT w FROM occ),
      e0 AS (SELECT w, string_split(w, '') AS seg FROM dw),
      $applies
      SELECT o.doc_id, o.pos,
        CAST(len(e$k.seg) AS BIGINT) AS n_subtokens,
        array_to_string(e$k.seg, ' ') AS subtokens
      FROM occ o JOIN e$k ON o.w = e$k.w
      ORDER BY o.doc_id, o.pos"""
    },
    "tokenize_docs" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t
        FROM documents),
      occ AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS term
        FROM toks, unnest(generate_series(1, len(t))) AS u(i)
        WHERE length(t[i]) > 0),
      wc AS (SELECT term, COUNT(*) AS c FROM occ GROUP BY 1),
      vocab AS (
        SELECT term,
          CAST(row_number() OVER (ORDER BY c DESC, term) - 1 AS BIGINT)
            AS token_id
        FROM (SELECT * FROM wc ORDER BY c DESC, term LIMIT $TokenizeVocabV))
      SELECT o.doc_id, o.pos,
        COALESCE(v.token_id, $TokenizeVocabV) AS token_id
      FROM occ o LEFT JOIN vocab v USING (term)
      ORDER BY o.doc_id, o.pos""",
    "bpe_top_pairs" -> s"""
      WITH w0 AS (
        SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS w
        FROM documents),
      wc AS (SELECT w, COUNT(*) AS c FROM w0
             WHERE length(w) >= 2 GROUP BY 1),
      p AS (SELECT substring(w, i, 2) AS pair, c
            FROM wc, unnest(generate_series(1, length(w) - 1)) AS u(i)),
      agg AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS n_occurrences
              FROM p GROUP BY 1),
      top AS (
        SELECT pair, n_occurrences,
          CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair) AS BIGINT)
            AS rank
        FROM agg)
      SELECT rank, pair, n_occurrences FROM top
      WHERE rank <= $BpeTopK ORDER BY rank""",
    "text_bm25_topk" -> {
      val termsList = Bm25Terms.map(t => s"('$t')").mkString(", ")
      s"""
      WITH q(term) AS (VALUES $termsList),
      occ0 AS (
        SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
        FROM documents),
      qtf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM occ0 WHERE length(term) > 0 AND term IN (SELECT term FROM q)
        GROUP BY 1, 2),
      dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM qtf GROUP BY 1),
      dl AS (
        SELECT doc_id,
          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS dl
        FROM documents),
      stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl),
      scored AS (
        SELECT qtf.doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_terms,
          ROUND(SUM(
            ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
            (qtf.tf * ${Bm25K1 + 1} /
              (qtf.tf + $Bm25K1 *
                (1.0 - $Bm25B + $Bm25B * dl.dl / stats.avgdl)))), 6) AS score
        FROM qtf
          JOIN dfreq USING (term)
          JOIN dl ON qtf.doc_id = dl.doc_id, stats
        GROUP BY 1),
      ranked AS (
        SELECT doc_id, n_terms, score,
          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
            AS rank
        FROM scored)
      SELECT rank, doc_id, n_terms, score FROM ranked
      WHERE rank <= 10 ORDER BY rank"""
    })
}
