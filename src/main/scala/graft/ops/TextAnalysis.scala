package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for LLM data pipelines over the `documents`
  * table: token stats, quality scoring, language-ID heuristic, document
  * fingerprinting. All are narrow, codegen-friendly column expressions —
  * no shuffle except final ordering; at 100 TB these run map-side.
  */
object TextAnalysis {

  /** Tokens + char stats + a composite quality score (length, vocabulary
    * diversity, mean token length) — all integer-derived arithmetic so the
    * result is engine-exact. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    d.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("n_unique"),
      round((length(col("text")) - size(split(col("text"), " ")) + 1).cast("double")
        / size(split(col("text"), " ")), 6).as("avg_token_len"),
      round(
        least(lit(1.0), size(split(col("text"), " ")) / lit(80.0)) * 0.4 +
          (size(array_distinct(split(col("text"), " "))).cast("double")
            / size(split(col("text"), " "))) * 0.3 +
          least(lit(1.0), ((length(col("text")) - size(split(col("text"), " ")) + 1)
            .cast("double") / size(split(col("text"), " "))) / lit(6.0)) * 0.3,
        6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Marker-word language-ID heuristic: count per-language stopword hits
    * (non-overlapping, replace-based so the SQL oracle is exact) and take
    * the argmax with a fixed priority order. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val padded = concat(lit(" "), col("text"), lit(" "))
    def hits(m: String) =
      ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(m), "")))
        / m.length).cast("int")
    d.select(
      col("doc_id"), col("lang"),
      hits(" the ").as("c_en"), hits(" der ").as("c_de"),
      hits(" le ").as("c_fr"), hits(" el ").as("c_es"), hits("的").as("c_zh"))
      .withColumn("predicted",
        when(col("c_zh") > col("c_en") && col("c_zh") > col("c_de") &&
          col("c_zh") > col("c_fr") && col("c_zh") > col("c_es"), "zh")
          .when(col("c_de") > col("c_en") && col("c_de") > col("c_fr") &&
            col("c_de") > col("c_es"), "de")
          .when(col("c_fr") > col("c_en") && col("c_fr") > col("c_es"), "fr")
          .when(col("c_es") > col("c_en"), "es")
          .otherwise("en"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint: md5 of the lower-cased text (the exact-dedup
    * key; rolling-hash variant lives in Dedup.simhash). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
      .orderBy(col("doc_id"))

  /** Token counting: whitespace tokens + a BPE-ish greedy subword count
    * (≤4-letter chunks) — the cheap proxy for LLM token budgeting. */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0)))
        .cast("long").as("subword_tokens"))
      .orderBy(col("doc_id"))

  /** Top-3 terms per document by rarity-weighted term frequency
    * (tf · N/df — the unlogged linear-idf TF-IDF variant, chosen because
    * int→double casts, IEEE division and multiplication are all
    * correctly rounded, so both engines produce bit-identical scores; a
    * log-idf would ride on library `ln` ulps). One explode + two
    * aggregations + a windowed top-k: the shuffle keys are term and
    * doc_id — map-side partial aggs, never a cross product. */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    // N stays a lazy one-row aggregate inside the plan (cross-joined, as
    // the oracle does) — an eager d.count() here would run a full scan
    // at DataFrame-construction time, once more per invocation
    val nDf = d.agg(count(lit(1)).cast("double").as("n_docs"))
    val terms = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term").crossJoin(nDf)
      .withColumn("tfidf",
        round(col("tf") * (col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Rare-token cap for [[rareTokens]]: a token seen ≤ this many times
    * corpus-wide counts as rare. */
  val RareMaxFreq = 2L

  /** Reject threshold: documents whose rare-token share exceeds this
    * percent are dropped (OCR garbage, mojibake, boilerplate hashes —
    * the texts made of words nobody else uses). */
  val RarePctMax = 30L

  /** Corpus-frequency quality scoring — the integer-exact core of the
    * CCNet-style "does this document look like the rest of the corpus"
    * filter: the share of a document's tokens that are corpus-rare
    * (frequency ≤ [[RareMaxFreq]]). High share = noise; the LM-perplexity
    * version of this filter ranks by the same signal with float
    * smoothing, which no SQL oracle can reproduce bit-for-bit — the
    * count form keeps the gate exact.
    *
    * Shuffle discipline at 100 TB: tokens collapse FIRST to per-(doc,
    * term) partial counts — map-side combine caps every hot term ("the")
    * at one row per document before anything shuffles — then one
    * vocab-keyed aggregate builds the frequency table and one join on
    * term (skew bounded by the pre-aggregation: ≤ n_docs rows per term,
    * AQE handles the head) rolls back up to documents. The naive
    * token-stream↔vocab join would shuffle every occurrence of every
    * stopword. */
  def rareTokens(s: SparkSession, dir: String): DataFrame =
    rareTokensOf(Tables.load(s, dir, "documents"))

  private[graft] def rareTokensOf(d: DataFrame): DataFrame = {
    val terms = d.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy("term").agg(sum(col("tf")).as("c"))
    val per = tf.join(freq, "term")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tok"),
        sum(when(col("c") <= RareMaxFreq, col("tf")).otherwise(lit(0L)))
          .as("n_rare"))
    d.select("doc_id").join(per, Seq("doc_id"), "left")
      .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
      .withColumn("n_rare", coalesce(col("n_rare"), lit(0L)))
      .withColumn("rare_pct",
        when(col("n_tok") === 0, lit(100L)) // empty doc: reject
          .otherwise(expr("(100 * n_rare) div n_tok")))
      .withColumn("keep", col("rare_pct") <= RarePctMax)
      .orderBy("doc_id")
  }

  /** Corpus-overlap matrix — exact shingle-set Jaccard between every
    * pair of SOURCES (the "how much does the new crawl overlap the
    * curated set" governance question asked before mixing corpora).
    * EXACT is the scale-safe choice here, unlike doc-level pairs: the
    * per-source shingle sets collapse to at most vocab × n_sources rows,
    * every shingle-key join group is ≤ n_sources rows, and the pair
    * space is n_sources² — all bounded by the handful of sources a mix
    * manifest lists, never by corpus row count. Reuses the doc-level
    * machinery ([[Dedup.shingles]]/[[Dedup.jaccardPairs]]) with the
    * source ordinal standing in for doc_id, plus a corpus-level
    * distinct to turn per-document shingle bags into per-source sets. */
  def corpusOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val bySrc = docs.select(
      expr("cast(substring(source, 4) as bigint)").as("doc_id"), col("text"))
    Dedup.jaccardPairs(Dedup.shingles(bySrc).distinct(), 0.0)
      .select(col("i").as("sa"), col("j").as("sb"), col("jaccard"))
      .orderBy("sa", "sb")
  }

  /** Bigram language-model quality score — the next step from
    * [[unigramLp]] toward LM-perplexity filtering: per-doc mean bigram
    * log-prob under an add-one-smoothed bigram model estimated from the
    * corpus itself. addend(w1 w2) = ln((c(w1 w2)+1)/(c(w1)+V)) =
    * ln(c12+1) − ln(c1+V) — every ln argument is an exact integer, so
    * both engines' ln agree to ≪1e-12 relative and the 6-decimal
    * rounded mean is engine-exact (the [[unigramLp]] parity contract).
    *
    * Scale shape: bigram occurrences collapse to per-(doc, gram) counts
    * BEFORE the model joins ([[Dedup.shingles]] map-side flatMap +
    * partial combine), the unigram table and global bigram counts are
    * vocab-bounded, and the vocabulary size V is a lazy 1-row cross
    * join — no per-occurrence row ever crosses a join, no driver-side
    * count. */
  def bigramLp(s: SparkSession, dir: String): DataFrame =
    bigramLpOf(Tables.load(s, dir, "documents"))

  private[graft] def bigramLpOf(d: DataFrame): DataFrame = {
    val terms = d.select(col("doc_id"),
      explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
    val uni = terms.groupBy("term").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = Dedup.shingles(d, 2, distinct = false)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
    val c12 = bi.groupBy("sh").agg(sum(col("tf")).as("c12"))
    val per = bi.join(c12, "sh")
      .withColumn("term", substring_index(col("sh"), " ", 1))
      .join(uni, "term")
      .crossJoin(vocab)
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bi"),
        sum(col("tf") * (log(col("c12") + 1) - log(col("c1") + col("v"))))
          .as("lp_sum"))
    d.select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bi"), lit(0L)).as("n_bigrams"),
        coalesce(round(col("lp_sum") / col("n_bi"), 6), lit(0.0)).as("mean_lp"))
      .orderBy("doc_id")
  }

  /** Full-batch GD rounds / learning rate for [[classifierTrain]]. */
  val LrRounds = 5
  val LrEta = 0.5

  /** Model-based quality classification — the trainable cousin of the
    * rule filters (CCNet trains fastText on known-good vs crawl text;
    * here a logistic regression learns to predict the `lang == 'en'`
    * label from the SAME document-shape features the rule filter uses).
    * Training is full-batch gradient descent: each round is ONE
    * map-side-combined aggregate over the corpus computing the 4
    * per-feature gradient sums with the current weights broadcast in
    * the expression — the centroid pattern, k driver-held doubles and
    * zero corpus shuffles per round.
    *
    * Engine-exact contract (the DuckDB oracle replays the unrolled GD):
    * features derive from pre-rounded stats; per-row σ is rounded to
    * 12 dp (absorbing exp() ulp skew between libm and the JVM), the
    * per-row gradient contribution is cast to DECIMAL(38,18) so the
    * SUM is exact and order-independent, and the gradient mean is
    * re-rounded to 12 dp before the weight update. */
  def classifierTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
    val feats = d.select(col("doc_id"),
        lit(1.0).as("x0"),
        (Quality.nTokens / lit(100.0)).as("x1"),
        (Quality.meanTokLen / lit(10.0)).as("x2"),
        Quality.uniqRatio.as("x3"),
        when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
      .localCheckpoint() // re-read once per GD round
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to LrRounds) {
      val z = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      val sig = round(lit(1.0) / (lit(1.0) + exp(-z)), 12)
      val err = sig - col("y")
      val aggs = (0 to 3).map(j =>
        sum((err * col(s"x$j")).cast("decimal(38,18)")).as(s"s$j")) :+
        count(lit(1)).as("n")
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(4).toDouble
      w = w.zipWithIndex.map { case (wj, j) =>
        val g = BigDecimal(row.getDecimal(j).doubleValue() / n)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
        wj - LrEta * g
      }
    }
    Seq(("bias", w(0)), ("n_tokens_over_100", w(1)),
      ("mean_tok_len_over_10", w(2)), ("uniq_ratio", w(3)))
      .toDF("feature", "weight")
      .select(col("feature"), round(col("weight"), 6).as("weight"))
      .orderBy("feature")
  }

  /** The trained model applied back to the corpus — per-doc quality
    * probability (σ of the linear score, 12 dp then 6 dp for output)
    * and the keep flag at the 0.5 threshold. Inference is a pure
    * map-side expression with the 4 weights inlined as literals: the
    * classifier costs nothing at any corpus size (the whole point of
    * training a filter). The weights come from [[classifierTrain]]'s
    * deterministic GD, so train + apply share one contract. */
  def classifierScore(s: SparkSession, dir: String): DataFrame = {
    val w = classifierTrain(s, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val d = Tables.load(s, dir, "documents")
    val z = lit(w("bias")) * lit(1.0) +
      lit(w("n_tokens_over_100")) * (Quality.nTokens / lit(100.0)) +
      lit(w("mean_tok_len_over_10")) * (Quality.meanTokLen / lit(10.0)) +
      lit(w("uniq_ratio")) * Quality.uniqRatio
    val sig = round(lit(1.0) / (lit(1.0) + exp(-z)), 12)
    d.select(col("doc_id"), round(sig, 6).as("p_quality"),
        (sig >= 0.5).as("keep"))
      .orderBy("doc_id")
  }

  /** Decision thresholds for the [[classifierPr]] evaluation sweep. */
  val PrThresholds: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** Classifier EVALUATION — the precision/recall sweep every
    * model-based filter ships before its threshold is chosen: at each
    * cut the trained model's scores ([[classifierScore]], 6-dp doubles
    * identical across engines) split against the training labels
    * (lang = 'en'), and precision/recall are integer-count ratios in
    * IEEE double — engine-exact, NULL when the cut keeps nothing.
    * One score pass, one threshold-crossed aggregate; the sweep costs
    * |thresholds| copies of the per-doc rows, all map-side before the
    * final tiny groupBy. */
  def classifierPr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = classifierScore(s, dir).select(col("doc_id"), col("p_quality"))
    val lab = Tables.load(s, dir, "documents")
      .select(col("doc_id"), (col("lang") === "en").as("y"))
    val ths = PrThresholds.toDF("th")
    scored.join(lab, "doc_id").crossJoin(ths)
      .groupBy("th")
      .agg(
        sum(when(col("p_quality") >= col("th") && col("y"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("p_quality") >= col("th") && !col("y"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("p_quality") < col("th") && col("y"), 1L)
          .otherwise(0L)).as("fn"))
      .select(col("th"), col("tp"), col("fp"), col("fn"),
        round(col("tp").cast("double") /
          nullif(col("tp") + col("fp"), lit(0L)), 6).as("prec"),
        round(col("tp").cast("double") /
          nullif(col("tp") + col("fn"), lit(0L)), 6).as("rec"))
      .orderBy("th")
  }

  /** Classifier CALIBRATION (reliability) table — the companion readout
    * to [[classifierPr]]: scores bucket into per-mille probability
    * bins (the trained filter's scores cluster tightly — coarse decile
    * bins would collapse the whole corpus into one row); per bin, the observed positive rate against the mean
    * predicted probability says whether the filter's scores mean what
    * they claim. Determinism: bin = LEAST(999, floor(p·1000)) over the 6-dp
    * score (identical doubles both engines), mean_p through a
    * DECIMAL(18,6) sum (order-independent), rates as integer-count IEEE
    * ratios. Empty bins are absent rows (both engines agree). */
  def classifierCalibration(s: SparkSession, dir: String): DataFrame = {
    val scored = classifierScore(s, dir).select(col("doc_id"), col("p_quality"))
    val lab = Tables.load(s, dir, "documents")
      .select(col("doc_id"), (col("lang") === "en").as("y"))
    scored.join(lab, "doc_id")
      .withColumn("bin", least(lit(999L), floor(col("p_quality") * 1000).cast("long")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("p_quality").cast("decimal(18,6)")).as("psum"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
      .select(col("bin"), col("n"), col("pos"),
        // exact decimal sum → ONE double conversion → IEEE divide: the
        // same value in both engines (decimal/long division rounding
        // rules differ; double division does not)
        round(col("psum").cast("double") / col("n"), 6).as("mean_p"),
        round(col("pos").cast("double") / col("n"), 6).as("pos_rate"))
      .orderBy("bin")
  }

  /** Brier score (`quality_brier`) — the proper scoring rule completing
    * the eval trio (PR sweep, calibration table, Brier): mean squared
    * error of the 6-dp probabilities against the labels. (p − y)² is an
    * exact IEEE product of identical doubles; the sum goes through
    * DECIMAL(38,18) (the classifierTrain gradient-sum contract, already
    * proven engine-exact) so the mean is aggregation-order-free. One row,
    * one map-side aggregate. */
  def classifierBrier(s: SparkSession, dir: String): DataFrame = {
    val scored = classifierScore(s, dir).select(col("doc_id"), col("p_quality"))
    val lab = Tables.load(s, dir, "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    scored.join(lab, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum(((col("p_quality") - col("y")) * (col("p_quality") - col("y")))
          .cast("decimal(38,18)")).as("ssum"))
      .select(col("n"),
        round(col("ssum").cast("double") / col("n"), 6).as("brier"))
  }

  /** One-row dataset card — the corpus datasheet every published
    * training set ships (docs/tokens/chars, exact-duplicate rate,
    * language/source diversity): integer-exact totals so the gate is
    * engine-exact. One aggregate with map-side partials; the distinct
    * counts key on md5/lang/source — the md5 distinct is the same
    * shuffle the exact-dedup pass already pays, and at 100 TB the report
    * rides the SAME pass ([[graft.ops.Dedup.dedupExact]]) rather than a
    * second scan. */
  def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    d.agg(
        count(lit(1)).as("n_docs"),
        sum(nTok).as("n_tokens"),
        sum(length(coalesce(col("text"), lit(""))).cast("long")).as("n_chars"),
        countDistinct(md5(coalesce(col("text"), lit("")))).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(when(col("lang") === "en", lit(1L)).otherwise(lit(0L))).as("n_en"),
        min(nTok).as("min_tokens"),
        max(nTok).as("max_tokens"))
      .withColumn("n_dup_docs", col("n_docs") - col("n_distinct_texts"))
  }

  /** Dimensions of the [[hashEmbed]] feature-hashed vector — production
    * uses 2¹⁸–2²⁰; 16 keeps every dimension populated at fixture scale. */
  val HashDim = 16

  /** Feature-hashing document embedding (the hashing trick, Weinberger
    * et al. 2009): each token is hashed to a dimension with a ±1 sign
    * and the doc's vector is the signed count per dimension — a
    * model-free text→vector bridge whose output feeds the SAME ANN /
    * embedding-dedup machinery as learned embeddings ([[Similarity]],
    * [[Ivf]]), with no vocabulary table at all. The hash is md5-derived
    * (hex-digit arithmetic) so the DuckDB oracle computes the identical
    * buckets — Spark's murmur `hash()` has no DuckDB twin.
    *
    * Scale shape: token explode + ONE (doc, dim)-keyed aggregate with
    * map-side partial combine; the dense fill is a per-row 16-way
    * sequence explode. No vocabulary join, no shuffle wider than the
    * output itself — the whole point of hashing features. */
  def hashEmbed(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val terms = d.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("fp", md5(col("term")))
    def hx(i: Int) = expr(s"instr('0123456789abcdef', substring(fp, $i, 1)) - 1")
    val bucketed = terms
      .withColumn("v", ((hx(1) * 16 + hx(2)) * 16 + hx(3)) * 16 + hx(4))
      .withColumn("dim", pmod(col("v"), lit(HashDim)).cast("long"))
      .withColumn("sgn", when(hx(5) % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))
    val agg = bucketed.groupBy("doc_id", "dim").agg(sum(col("sgn")).as("val"))
    d.select(col("doc_id"),
        explode(sequence(lit(0), lit(HashDim - 1))).as("dim"))
      .withColumn("dim", col("dim").cast("long"))
      .join(agg, Seq("doc_id", "dim"), "left")
      .select(col("doc_id"), col("dim"),
        coalesce(col("val"), lit(0.0)).as("val"))
      .orderBy("doc_id", "dim")
  }

  /** Absolute discount for [[knLp]] — Kneser–Ney's standard 0.75. */
  val KnDiscount = 0.75

  /** Interpolated Kneser–Ney bigram scoring — the smoothing the n-gram-LM
    * quality filters actually ship (CCNet/KenLM lineage), upgrading
    * [[bigramLp]]'s add-one backoff: P(w2|w1) = max(c12−d,0)/c1 +
    * (d·N1+(w1,·)/c1)·Pcont(w2), with the continuation probability
    * Pcont(w2) = N1+(·,w2)/|bigram types| — so a word seen in MANY
    * contexts (a genuine continuation) backs off high, while a word
    * frequent only inside one collocation backs off low. Per-doc output
    * is the mean ln P over the doc's bigrams.
    *
    * Float parity: every count is an exact integer and the probability
    * expression is the IDENTICAL parenthesization on both engines, so
    * each IEEE step is exactly rounded to the same double; ln then
    * agrees to ≪1e-12 relative and the 6-decimal rounded mean is
    * engine-exact (the [[unigramLp]] contract).
    *
    * Scale shape: identical to [[bigramLp]] — per-(doc, gram)
    * pre-aggregation before any join, and ALL model tables (context
    * totals, continuation counts, the type total as a lazy 1-row cross
    * join) are vocab-bounded, derived from the same single global
    * bigram aggregate. */
  def knLp(s: SparkSession, dir: String): DataFrame =
    knLpOf(Tables.load(s, dir, "documents"))

  private[graft] def knLpOf(d: DataFrame): DataFrame = {
    val bi = Dedup.shingles(d, 2, distinct = false)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
    val glob = bi.groupBy("sh").agg(sum(col("tf")).as("c12"))
      .withColumn("w1", substring_index(col("sh"), " ", 1))
      .withColumn("w2", substring_index(col("sh"), " ", -1))
    val ctx = glob.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont = glob.groupBy("w2").agg(count(lit(1)).as("n2"))
    val types = glob.agg(count(lit(1)).as("b"))
    val per = bi
      .join(glob, "sh")
      .join(ctx, "w1").join(cont, "w2").crossJoin(types)
      .withColumn("p",
        greatest(col("c12") - lit(KnDiscount), lit(0.0)) / col("c1") +
          (lit(KnDiscount) * col("n1p") / col("c1")) *
            (col("n2") / col("b")))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bi"),
        sum(col("tf") * log(col("p"))).as("lp_sum"))
    d.select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bi"), lit(0L)).as("n_bigrams"),
        coalesce(round(col("lp_sum") / col("n_bi"), 6), lit(0.0)).as("mean_lp"))
      .orderBy("doc_id")
  }

  /** Top boilerplate n-grams — the corpus-wide most frequent word
    * trigrams with their total occurrence count and document frequency.
    * The "what template junk dominates this crawl" report: nav bars,
    * cookie banners, and license boilerplate surface as high-occurrence
    * high-doc-frequency grams, and the output feeds a line/span scrub
    * list ([[Scrub]]).
    *
    * Scale shape: occurrences collapse to per-(doc, gram) counts first
    * (map-side partial combine — a doc repeating one gram ships ONE row
    * per partition), the global rollup gets total + doc frequency from
    * the same pre-aggregated rows in one gram-keyed shuffle, and the
    * top-k is `TakeOrderedAndProject` — per-partition heaps merged on
    * the driver, never a global sort exchange. The (count desc, gram)
    * ordering is total, so the cut is deterministic. */
  def corpusNgrams(s: SparkSession, dir: String, n: Int = 3,
                   topK: Int = 20): DataFrame =
    corpusNgramsOf(Tables.load(s, dir, "documents"), n, topK)

  private[graft] def corpusNgramsOf(docs: DataFrame, n: Int,
                                    topK: Int): DataFrame = {
    val occ = Dedup.shingles(docs, n, distinct = false)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
    occ.groupBy("sh").agg(
        sum(col("c")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("sh"))
      .limit(topK)
      .select(col("sh").as("ngram"), col("n_occurrences"), col("n_docs"))
  }

  /** Unigram language-model quality score: per-doc mean token log-prob
    * under the corpus's own unigram distribution — the classic cheap
    * stand-in for LM-perplexity filtering (docs of improbable tokens
    * score low). mean_lp(d) = (Σ_t tf_t·ln c_t)/n_d − ln N.
    *
    * Scale shape mirrors [[rareTokensOf]]: tokens collapse to
    * per-(doc, term) counts BEFORE any join, so the vocab join never
    * shuffles per-occurrence stopword rows (a hot term contributes
    * ≤ n_docs rows, AQE handles the head). The corpus total N stays a
    * lazy 1-row cross join, never an eager driver-side count. Float
    * parity with the oracle holds because each addend is tf·ln(c) with
    * integer tf,c (both engines' ln agree to ≪1e-12 relative) and the
    * final value is a mean rounded to 6 decimals. */
  def unigramLp(s: SparkSession, dir: String): DataFrame =
    unigramLpOf(Tables.load(s, dir, "documents"))

  private[graft] def unigramLpOf(d: DataFrame): DataFrame = {
    val terms = d.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy("term").agg(sum(col("tf")).as("c"))
    val total = freq.agg(sum(col("c")).as("n_corpus"))
    val per = tf.join(freq, "term")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * log(col("c"))).as("sum_lc"))
    d.select("doc_id").join(per, Seq("doc_id"), "left").crossJoin(total)
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tokens"),
        round(col("sum_lc") / col("n_tok") - log(col("n_corpus")), 6)
          .as("mean_lp"))
      .orderBy("doc_id")
  }

  /** Context-window chunking — the training-prep step that splits every
    * document into fixed-width token windows with overlap (stride <
    * width), the shape fed to a tokenizer/packer downstream. Chunk k of
    * a doc with n tokens covers tokens [k·stride, min(k·stride+width, n));
    * n_chunks = ceil(max(n−width,0)/stride)+1, so the final chunk always
    * reaches the document tail and every chunk keeps ≥ width−stride+1
    * tokens. Pure per-row flatMap — zero shuffle, map-side at any scale;
    * typed flatMap rather than SQL higher-order functions for the same
    * compiled-vs-interpreted reason as [[Dedup.shingles]]. */
  def chunkFixedTokens(s: SparkSession, dir: String): DataFrame =
    chunksOf(Tables.load(s, dir, "documents"), 32, 24)
      .orderBy("doc_id", "chunk_id")

  private[graft] def chunksOf(docs: DataFrame, width: Int, stride: Int)
      : DataFrame = {
    require(0 < stride && stride <= width, s"need 0 < stride <= width")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        // null → '' → single empty token, matching string_split('', ' ')
        val toks = (if (text == null) "" else text).split(' ')
        val n = toks.length
        val nChunks = math.ceil(math.max(n - width, 0) / stride.toDouble).toLong + 1
        (0L until nChunks).iterator.map { k =>
          val from = (k * stride).toInt
          val until = math.min(from + width, n)
          (id, k, (until - from).toLong,
            toks.slice(from, until).mkString(" "))
        }
      }
      .toDF("doc_id", "chunk_id", "n_tokens", "chunk")
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        md5(col("chunk")).as("chunk_fp"))
  }

  /** Gopher-style quality stats as plain column expressions over a
    * `text` column — map-side, codegen'd, fuse into whatever scan the
    * caller has. Shared by the quality-filter gate and the composed
    * curation pipeline ([[Curation]]). */
  private[graft] object Quality {
    // NULL text is normalized to '' in BOTH engines: Spark's legacy
    // size(NULL) = -1 vs DuckDB's NULL-propagating CASE would otherwise
    // classify a NULL document oppositely (too_short vs ok)
    private val txt = coalesce(col("text"), lit(""))
    private val nTokRaw = size(split(txt, " ")).cast("long")
    private val nUniqRaw = size(array_distinct(split(txt, " "))).cast("long")
    val nTokens: Column = nTokRaw
    val meanTokLen: Column =
      round((length(txt) - nTokRaw + 1).cast("double") / nTokRaw, 6)
    val uniqRatio: Column = round(nUniqRaw.cast("double") / nTokRaw, 6)
    def reasonOf(nTok: Column, meanLen: Column, uniq: Column): Column =
      when(nTok < 5, "too_short")
        .when(nTok > 1000, "too_long")
        .when(meanLen < 2.0, "tokens_too_short")
        .when(meanLen > 12.0, "tokens_too_long")
        .when(uniq < 0.2, "too_repetitive")
        .otherwise("ok")
    /** The keep rules as ONE predicate — a pure filter a scan can fuse. */
    val keepPredicate: Column =
      reasonOf(nTokens, meanTokLen, uniqRatio) === "ok"
  }

  /** Quality-rule labels over `d`: (doc_id, n_tokens, mean_tok_len,
    * uniq_ratio, reason, keep). */
  private[ops] def qualityLabels(d: DataFrame): DataFrame =
    d.select(col("doc_id"), Quality.nTokens.as("n_tokens"),
      Quality.meanTokLen.as("mean_tok_len"),
      Quality.uniqRatio.as("uniq_ratio"))
      .withColumn("reason",
        Quality.reasonOf(col("n_tokens"), col("mean_tok_len"), col("uniq_ratio")))
      .withColumn("keep", col("reason") === "ok")

  /** Quality filter gate: the labels over the documents table. */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    qualityLabels(Tables.load(s, dir, "documents"))
      .orderBy(col("doc_id"))

  /** Per-source curation QC report — the "which crawl is rotten"
    * dashboard: doc counts, keep rate, and the reject-reason histogram
    * per source, plus token mass. One scan + one source-keyed hash
    * aggregate (conditional sums combine map-side); result cardinality
    * = n_sources, so this is a driver-readable report at any corpus
    * size. keep_pct is integer (`div`) and mean_tokens a ratio of two
    * exact integers — engine-exact, no float-parity risk. */
  def qualityBySource(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val lab = d.select(col("source"), Quality.nTokens.as("n_tokens"),
        Quality.meanTokLen.as("mean_tok_len"),
        Quality.uniqRatio.as("uniq_ratio"))
      .withColumn("reason", Quality.reasonOf(
        col("n_tokens"), col("mean_tok_len"), col("uniq_ratio")))
    def n(r: String) =
      sum(when(col("reason") === r, 1L).otherwise(0L))
    lab.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        n("ok").as("n_ok"),
        n("too_short").as("n_too_short"),
        n("too_long").as("n_too_long"),
        n("tokens_too_short").as("n_tok_short"),
        n("tokens_too_long").as("n_tok_long"),
        n("too_repetitive").as("n_repetitive"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("keep_pct", expr("(100 * n_ok) div n_docs"))
      .withColumn("mean_tokens",
        round(col("n_tokens").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  }

  /** The repetition-signature thresholds ([[repetition]]): a doc is
    * repetitive when its most common bigram covers > 6% of all bigram
    * positions or > 2% of trigram positions sit in a repeated trigram —
    * tuned so both outcomes occur on the fixture corpus (Gopher's
    * published 0.18/0.30 cut almost nothing on synthetic text). */
  val TopBigramFracMax = 0.06
  val DupTrigramFracMax = 0.02

  /** Gopher-style repetition metrics per document: the fraction of
    * bigram positions taken by the single most common bigram, and the
    * fraction of trigram positions inside any repeated trigram (Rae et
    * al. 2021 §A1.1's "top n-gram fraction" / "duplicated n-gram
    * fraction" family).
    *
    * Scale shape: occurrence shingling is the proven map-side flatMap
    * ([[Dedup.shingles]] with `distinct = false`); counting grams is a
    * (doc_id, gram)-keyed aggregate with map-side partial combine, then
    * a doc_id-keyed rollup — two narrow-keyed shuffles, never a join or
    * expansion. Docs too short for a gram (or NULL) surface with zero
    * fractions via the left join, mirrored in the oracle. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    repetitionLabels(Tables.load(s, dir, "documents")).orderBy(col("doc_id"))

  private[graft] def repetitionLabels(d: DataFrame): DataFrame = {
    val bi = Dedup.shingles(d, 2, distinct = false)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"), max("c").as("top_bigram_n"))
    val tri = Dedup.shingles(d, 3, distinct = false)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_trigrams"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_tri"))
    d.select("doc_id")
      .join(bi, Seq("doc_id"), "left")
      .join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(round(col("top_bigram_n") / col("n_bigrams"), 6), lit(0.0))
          .as("top_bigram_frac"),
        coalesce(round(col("dup_tri") / col("n_trigrams"), 6), lit(0.0))
          .as("dup_trigram_frac"))
      .withColumn("repetitive",
        col("top_bigram_frac") > TopBigramFracMax ||
          col("dup_trigram_frac") > DupTrigramFracMax)
  }

  /** The Gopher document-shape rules (Rae et al. 2021 §A1.1) that the
    * length-based [[Quality]] set doesn't cover: bullet-line fraction,
    * ellipsis-line fraction, symbol-to-word ratio, alphabetic-word
    * fraction, and the ≥2-distinct-stopwords rule. All metrics are
    * replace-count / split column expressions — map-side, engine-exact —
    * except the alphabetic-word count, which needs a per-word regex and
    * uses an array HOF (still map-side and embarrassingly parallel; a
    * codegen'd Expression is the production upgrade if it ever dominates
    * a profile). */
  private[graft] def gopherLabels(d: DataFrame): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    // non-overlapping occurrence count of literal `m`, the langId idiom
    def hits(in: Column, m: String): Column =
      ((length(in) - length(regexp_replace(in, java.util.regex.Pattern.quote(m), "")))
        / m.length).cast("long")
    val nWords = size(split(txt, " ")).cast("long")
    val nLines = hits(txt, "\n") + 1
    // a leading "\n" sentinel makes first-line bullets countable
    val bullets =
      hits(concat(lit("\n"), txt), "\n- ") + hits(concat(lit("\n"), txt), "\n* ")
    val ells = hits(concat(txt, lit("\n")), "...\n")
    val symbols = hits(txt, "#") + hits(txt, "...")
    val alphaWords =
      size(filter(split(txt, " "), w => w.rlike("[a-zA-Z]"))).cast("long")
    val pad = concat(lit(" "), txt, lit(" "))
    val nStop = GopherStopwords
      .map(w => when(instr(pad, s" $w ") > 0, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    d.select(col("doc_id"),
      nLines.as("n_lines"), nWords.as("n_words"),
      round(bullets.cast("double") / nLines, 6).as("bullet_frac"),
      round(ells.cast("double") / nLines, 6).as("ellipsis_frac"),
      round(symbols.cast("double") / nWords, 6).as("symbol_ratio"),
      round(alphaWords.cast("double") / nWords, 6).as("alpha_frac"),
      nStop.as("n_stop"))
      .withColumn("reason",
        when(col("bullet_frac") > 0.7, "too_many_bullets")
          .when(col("ellipsis_frac") > 0.3, "too_many_ellipses")
          .when(col("symbol_ratio") > 0.1, "too_many_symbols")
          .when(col("alpha_frac") < 0.8, "low_alpha")
          .when(col("n_stop") < 2, "few_stopwords")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
  }

  private[ops] val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "a", "in", "that")

  /** Gopher-rules gate. The fixture text is single-line and symbol-free,
    * so the gate deterministically DIRTIES it per doc_id class first
    * (bullet lines / ellipsis lines / hash runs / numeric words),
    * mirrored bit-exactly in the oracle — each line-shape rule
    * demonstrably fires rather than vacuously passing. */
  def qualityGopher(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val dirty = d.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("- first point\n- second point\n* third point\n"), col("text")))
        .when(pmod(col("doc_id"), lit(5)) === 1,
          concat(col("text"), lit("\nwait...\nmore...\nhuh...")))
        .when(pmod(col("doc_id"), lit(5)) === 2,
          concat(col("text"), lit(" ## ### # ####")))
        .when(pmod(col("doc_id"), lit(5)) === 3,
          concat(col("text"), lit(" 11 22 33 44 55 66 77 88 99 00")))
        .otherwise(col("text")))
    gopherLabels(dirty).orderBy(col("doc_id"))
  }

  /** ANALYZE-style column profile of the documents table in long format:
    * one aggregation pass (all stats in a single agg row, unpivoted with
    * `stack`), min/max rendered as strings per column type. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val agg = d.agg(
      count(lit(1)).as("n"),
      count(col("doc_id")).as("nn_doc_id"),
      countDistinct(col("doc_id")).as("nd_doc_id"),
      min(col("doc_id")).cast("string").as("min_doc_id"),
      max(col("doc_id")).cast("string").as("max_doc_id"),
      count(col("text")).as("nn_text"),
      countDistinct(col("text")).as("nd_text"),
      count(col("lang")).as("nn_lang"),
      countDistinct(col("lang")).as("nd_lang"),
      min(col("lang")).as("min_lang"), max(col("lang")).as("max_lang"),
      count(col("source")).as("nn_source"),
      countDistinct(col("source")).as("nd_source"),
      min(col("source")).as("min_source"), max(col("source")).as("max_source"),
      count(col("n_chars")).as("nn_n_chars"),
      countDistinct(col("n_chars")).as("nd_n_chars"),
      min(col("n_chars")).cast("string").as("min_n_chars"),
      max(col("n_chars")).cast("string").as("max_n_chars"))
    agg.selectExpr("""stack(5,
        'doc_id', n, n - nn_doc_id, nd_doc_id, min_doc_id, max_doc_id,
        'lang', n, n - nn_lang, nd_lang, min_lang, max_lang,
        'n_chars', n, n - nn_n_chars, nd_n_chars, min_n_chars, max_n_chars,
        'source', n, n - nn_source, nd_source, min_source, max_source,
        'text', n, n - nn_text, nd_text, CAST(NULL AS STRING), CAST(NULL AS STRING)
      ) AS (column_name, n_rows, n_null, n_distinct, min_value, max_value)""")
      .orderBy(col("column_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_counts" -> (tokenCounts _),
    "text_stats" -> (textStats _),
    "text_lang_id" -> (langId _),
    "text_fingerprint" -> (fingerprint _),
    "text_tfidf" -> (tfidf _),
    "text_quality_filter" -> (qualityFilter _),
    "quality_by_source" -> (qualityBySource _),
    "quality_gopher" -> (qualityGopher _),
    "quality_rare_tokens" -> (rareTokens _),
    "quality_unigram_lp" -> (unigramLp _),
    "quality_bigram_lp" -> (bigramLp _),
    "quality_kn_lp" -> (knLp _),
    "text_hash_embed" -> (hashEmbed _),
    "corpus_report" -> (corpusReport _),
    "quality_classifier" -> (classifierTrain _),
    "quality_classifier_scores" -> (classifierScore _),
    "quality_pr_curve" -> (classifierPr _),
    "quality_calibration" -> (classifierCalibration _),
    "quality_brier" -> (classifierBrier _),
    "chunk_fixed_tokens" -> (chunkFixedTokens _),
    "corpus_overlap" -> (corpusOverlap _),
    "corpus_ngrams" -> ((s: SparkSession, dir: String) => corpusNgrams(s, dir)),
    "quality_repetition" -> (repetition _),
    "profile_documents" -> (profile _))

  /** The unrolled logistic-GD oracle for [[classifierTrain]] — round r's
    * gradient CTE cross-joins round r−1's weight CTE, exactly the
    * driver loop. */
  private def lrCtesSql: String = {
    val z = (w: String) =>
      s"($w.a0*x0 + $w.a1*x1 + $w.a2*x2 + $w.a3*x3)"
    val rounds = (1 to LrRounds).map { r =>
      val pw = s"w${r - 1}"
      val sig = s"ROUND(1.0/(1.0 + exp(-${z("w")})), 12)"
      val sums = (0 to 3).map(j =>
        s"SUM(CAST(($sig - y) * x$j AS DECIMAL(38,18))) AS s$j").mkString(", ")
      val upd = (0 to 3).map(j =>
        s"w.a$j - $LrEta*ROUND(CAST(g.s$j AS DOUBLE)/g.n, 12) AS a$j").mkString(", ")
      s""",
      g$r AS (SELECT $sums, COUNT(*) AS n FROM feat, $pw w),
      w$r AS (SELECT $upd FROM g$r g, $pw w)"""
    }.mkString
    s"""$qualityCtesBody,
      feat AS (
        SELECT q.doc_id, 1.0 AS x0,
          CAST(n_tokens AS DOUBLE)/100.0 AS x1,
          mean_tok_len/10.0 AS x2, uniq_ratio AS x3,
          CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM qstats q JOIN documents d ON q.doc_id = d.doc_id),
      w0 AS (SELECT 0.0 AS a0, 0.0 AS a1, 0.0 AS a2, 0.0 AS a3)$rounds"""
  }

  private def lrOracleSql: String = {
    val out = Seq("bias" -> "a0", "n_tokens_over_100" -> "a1",
      "mean_tok_len_over_10" -> "a2", "uniq_ratio" -> "a3")
      .map { case (nm, a) =>
        s"SELECT '$nm' AS feature, ROUND($a, 6) AS weight FROM w$LrRounds" }
      .mkString(" UNION ALL ")
    s"""
      WITH $lrCtesSql
      SELECT feature, weight FROM ($out) ORDER BY feature"""
  }

  private def lrScoreOracleSql: String = s"""
      WITH $lrCtesSql,
      wr AS (SELECT ROUND(a0,6) AS b, ROUND(a1,6) AS c1,
        ROUND(a2,6) AS c2, ROUND(a3,6) AS c3 FROM w$LrRounds),
      sc AS (
        SELECT f.doc_id,
          ROUND(1.0/(1.0 + exp(-(w.b*1.0 + w.c1*x1 + w.c2*x2 + w.c3*x3))), 12)
            AS sig
        FROM feat f, wr w)
      SELECT doc_id, ROUND(sig, 6) AS p_quality, sig >= 0.5 AS keep
      FROM sc ORDER BY doc_id"""

  /** PR-sweep oracle: the same unrolled-GD score CTEs, labels joined
    * back, counts per threshold, IEEE ratios. */
  private def lrPrOracleSql: String = {
    val thValues = PrThresholds
      .map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""
      WITH $lrCtesSql,
      wr AS (SELECT ROUND(a0,6) AS b, ROUND(a1,6) AS c1,
        ROUND(a2,6) AS c2, ROUND(a3,6) AS c3 FROM w$LrRounds),
      sc AS (
        SELECT f.doc_id,
          ROUND(1.0/(1.0 + exp(-(w.b*1.0 + w.c1*x1 + w.c2*x2 + w.c3*x3))), 12)
            AS sig
        FROM feat f, wr w),
      lab AS (
        SELECT s.doc_id, ROUND(s.sig, 6) AS p, (d.lang = 'en') AS y
        FROM sc s JOIN documents d USING (doc_id)),
      th(th) AS (VALUES $thValues),
      agg AS (
        SELECT th,
          CAST(SUM(CASE WHEN p >= th AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN p >= th AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN p < th AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM lab, th GROUP BY th)
      SELECT th, tp, fp, fn,
        ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS prec,
        ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS rec
      FROM agg ORDER BY th"""
  }

  /** Calibration-table oracle: same score CTEs, ten equal-width bins,
    * decimal-exact mean-p, IEEE rates (per-mille bins, see the Spark
    * side). */
  private def lrCalibrationOracleSql: String = s"""
      WITH $lrCtesSql,
      wr AS (SELECT ROUND(a0,6) AS b, ROUND(a1,6) AS c1,
        ROUND(a2,6) AS c2, ROUND(a3,6) AS c3 FROM w$LrRounds),
      sc AS (
        SELECT f.doc_id,
          ROUND(1.0/(1.0 + exp(-(w.b*1.0 + w.c1*x1 + w.c2*x2 + w.c3*x3))), 12)
            AS sig
        FROM feat f, wr w),
      lab AS (
        SELECT LEAST(999, CAST(FLOOR(ROUND(s.sig, 6) * 1000) AS BIGINT)) AS bin,
          ROUND(s.sig, 6) AS p, (d.lang = 'en') AS y
        FROM sc s JOIN documents d USING (doc_id))
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        ROUND(CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
          AS mean_p,
        ROUND(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
          AS pos_rate
      FROM lab GROUP BY bin ORDER BY bin"""

  /** Brier oracle: same score CTEs, same DECIMAL(38,18) square sum. */
  private def lrBrierOracleSql: String = s"""
      WITH $lrCtesSql,
      wr AS (SELECT ROUND(a0,6) AS b, ROUND(a1,6) AS c1,
        ROUND(a2,6) AS c2, ROUND(a3,6) AS c3 FROM w$LrRounds),
      sc AS (
        SELECT f.doc_id,
          ROUND(1.0/(1.0 + exp(-(w.b*1.0 + w.c1*x1 + w.c2*x2 + w.c3*x3))), 12)
            AS sig
        FROM feat f, wr w),
      lab AS (
        SELECT ROUND(s.sig, 6) AS p,
          CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM sc s JOIN documents d USING (doc_id))
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(38,18))) AS DOUBLE)
          / COUNT(*), 6) AS brier
      FROM lab"""

  /** DuckDB quality-stats CTE body (matches [[qualityLabels]]) — shared
    * with the composed-curation oracle. */
  private[ops] val qualityCtesBody: String = """
      qd0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      qstats AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          ROUND(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS mean_tok_len,
          ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS uniq_ratio
        FROM qd0)"""

  /** Rare-token scoring CTE body (…scored: doc_id, n_tok, n_rare,
    * rare_pct; no leading WITH) — the DuckDB mirror of [[rareTokens]],
    * shared by its gate and the quality-budget sampler oracle. */
  private[ops] val rareCtesBody: String = s"""
      terms AS (
        SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
        FROM documents),
      tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM terms WHERE length(term) > 0 GROUP BY 1, 2),
      freq AS (
        SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
      per AS (
        SELECT tf.doc_id,
          CAST(SUM(tf.tf) AS BIGINT) AS n_tok,
          CAST(SUM(CASE WHEN freq.c <= $RareMaxFreq THEN tf.tf ELSE 0 END)
            AS BIGINT) AS n_rare
        FROM tf JOIN freq USING (term) GROUP BY 1),
      full_docs AS (
        SELECT d.doc_id,
          COALESCE(per.n_tok, 0) AS n_tok,
          COALESCE(per.n_rare, 0) AS n_rare
        FROM documents d LEFT JOIN per USING (doc_id)),
      scored AS (
        SELECT doc_id, n_tok, n_rare,
          CASE WHEN n_tok = 0 THEN 100
               ELSE (100 * n_rare) // n_tok END AS rare_pct
        FROM full_docs)"""

  private[ops] val QualityReasonCase: String =
    """CASE WHEN n_tokens < 5 THEN 'too_short'
             WHEN n_tokens > 1000 THEN 'too_long'
             WHEN mean_tok_len < 2.0 THEN 'tokens_too_short'
             WHEN mean_tok_len > 12.0 THEN 'tokens_too_long'
             WHEN uniq_ratio < 0.2 THEN 'too_repetitive'
             ELSE 'ok' END"""

  val oracle: Map[String, String] = Map(
    "text_token_counts" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS subword_tokens
      FROM documents ORDER BY doc_id""",
    "text_stats" -> """
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS len_chars,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
        ROUND(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
          / len(string_split(text, ' ')), 6) AS avg_token_len,
        ROUND(
          least(1.0, len(string_split(text, ' ')) / 80.0) * 0.4 +
          (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' '))) * 0.3 +
          least(1.0, (CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
            / len(string_split(text, ' '))) / 6.0) * 0.3,
        6) AS quality
      FROM documents ORDER BY doc_id""",
    "text_lang_id" -> """
      WITH c AS (
        SELECT doc_id, lang,
          CAST((length(' '||text||' ') - length(replace(' '||text||' ',' the ','')))/5 AS INT) AS c_en,
          CAST((length(' '||text||' ') - length(replace(' '||text||' ',' der ','')))/5 AS INT) AS c_de,
          CAST((length(' '||text||' ') - length(replace(' '||text||' ',' le ','')))/4 AS INT) AS c_fr,
          CAST((length(' '||text||' ') - length(replace(' '||text||' ',' el ','')))/4 AS INT) AS c_es,
          CAST((length(' '||text||' ') - length(replace(' '||text||' ','的','')))/1 AS INT) AS c_zh
        FROM documents)
      SELECT doc_id, lang, c_en, c_de, c_fr, c_es, c_zh,
        CASE WHEN c_zh > c_en AND c_zh > c_de AND c_zh > c_fr AND c_zh > c_es THEN 'zh'
             WHEN c_de > c_en AND c_de > c_fr AND c_de > c_es THEN 'de'
             WHEN c_fr > c_en AND c_fr > c_es THEN 'fr'
             WHEN c_es > c_en THEN 'es'
             ELSE 'en' END AS predicted
      FROM c ORDER BY doc_id""",
    "text_fingerprint" -> """
      SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id""",
    "quality_by_source" -> s"""
      WITH $qualityCtesBody,
      lab AS (
        SELECT d.source, q.n_tokens, $QualityReasonCase AS reason
        FROM qstats q JOIN documents d USING (doc_id)),
      agg AS (
        SELECT source, COUNT(*) AS n_docs,
          SUM(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END) AS n_ok,
          SUM(CASE WHEN reason = 'too_short' THEN 1 ELSE 0 END) AS n_too_short,
          SUM(CASE WHEN reason = 'too_long' THEN 1 ELSE 0 END) AS n_too_long,
          SUM(CASE WHEN reason = 'tokens_too_short' THEN 1 ELSE 0 END)
            AS n_tok_short,
          SUM(CASE WHEN reason = 'tokens_too_long' THEN 1 ELSE 0 END)
            AS n_tok_long,
          SUM(CASE WHEN reason = 'too_repetitive' THEN 1 ELSE 0 END)
            AS n_repetitive,
          SUM(n_tokens) AS sum_tok
        FROM lab GROUP BY 1)
      SELECT source,
        CAST(n_docs AS BIGINT) AS n_docs,
        CAST(n_ok AS BIGINT) AS n_ok,
        CAST(n_too_short AS BIGINT) AS n_too_short,
        CAST(n_too_long AS BIGINT) AS n_too_long,
        CAST(n_tok_short AS BIGINT) AS n_tok_short,
        CAST(n_tok_long AS BIGINT) AS n_tok_long,
        CAST(n_repetitive AS BIGINT) AS n_repetitive,
        CAST(sum_tok AS BIGINT) AS n_tokens,
        CAST((100 * n_ok) // n_docs AS BIGINT) AS keep_pct,
        ROUND(CAST(sum_tok AS DOUBLE) / n_docs, 6) AS mean_tokens
      FROM agg ORDER BY source""",
    "quality_unigram_lp" -> """
      WITH terms0 AS (
        SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
        FROM documents),
      terms AS (SELECT doc_id, term FROM terms0 WHERE length(term) > 0),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      freq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq),
      per AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tok,
          SUM(tf * ln(c)) AS sum_lc
        FROM tf JOIN freq USING (term) GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(p.n_tok, 0) AS BIGINT) AS n_tokens,
        ROUND(p.sum_lc / p.n_tok - ln(t.n), 6) AS mean_lp
      FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id, tot t
      ORDER BY d.doc_id""",
    "chunk_fixed_tokens" -> """
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS t
        FROM documents),
      base AS (SELECT doc_id, t, len(t) AS n FROM toks),
      chunks AS (
        SELECT doc_id, k,
          CAST(least(k*24 + 32, n) - k*24 AS BIGINT) AS n_tokens,
          array_to_string(t[k*24 + 1 : least(k*24 + 32, n)], ' ') AS chunk
        FROM base,
          unnest(generate_series(
            0, CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT))) AS u(k))
      SELECT doc_id, CAST(k AS BIGINT) AS chunk_id, n_tokens,
        md5(chunk) AS chunk_fp
      FROM chunks ORDER BY doc_id, chunk_id""",
    "corpus_overlap" -> """
      WITH toks AS (
        SELECT CAST(substring(source, 4) AS BIGINT) AS sid,
          string_split(text, ' ') t
        FROM documents),
      sh0 AS (
        SELECT sid, t,
          unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        FROM toks),
      sh AS (
        SELECT DISTINCT sid, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM sh0),
      sizes AS (SELECT sid, COUNT(*) sz FROM sh GROUP BY 1),
      inter AS (
        SELECT a.sid sa, b.sid sb, COUNT(*) c
        FROM sh a JOIN sh b ON a.s = b.s AND a.sid < b.sid GROUP BY 1, 2)
      SELECT sa, sb, ROUND(c*1.0/(za.sz + zb.sz - c), 6) AS jaccard
      FROM inter
        JOIN sizes za ON sa = za.sid
        JOIN sizes zb ON sb = zb.sid
      ORDER BY sa, sb""",
    "quality_classifier" -> lrOracleSql,
    "quality_classifier_scores" -> lrScoreOracleSql,
    "quality_pr_curve" -> lrPrOracleSql,
    "quality_calibration" -> lrCalibrationOracleSql,
    "quality_brier" -> lrBrierOracleSql,
    "corpus_report" -> """
      SELECT COUNT(*) AS n_docs,
        CAST(SUM(len(string_split(COALESCE(text, ''), ' '))) AS BIGINT) AS n_tokens,
        CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS n_chars,
        COUNT(DISTINCT md5(COALESCE(text, ''))) AS n_distinct_texts,
        COUNT(DISTINCT lang) AS n_langs,
        COUNT(DISTINCT source) AS n_sources,
        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        CAST(MIN(len(string_split(COALESCE(text, ''), ' '))) AS BIGINT) AS min_tokens,
        CAST(MAX(len(string_split(COALESCE(text, ''), ' '))) AS BIGINT) AS max_tokens,
        COUNT(*) - COUNT(DISTINCT md5(COALESCE(text, ''))) AS n_dup_docs
      FROM documents""",
    "text_hash_embed" -> s"""
      WITH terms AS (
        SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
        FROM documents),
      h AS (
        SELECT doc_id, md5(term) AS fp FROM terms WHERE length(term) > 0),
      hx AS (
        SELECT doc_id,
          strpos('0123456789abcdef', substring(fp, 1, 1)) - 1 AS h1,
          strpos('0123456789abcdef', substring(fp, 2, 1)) - 1 AS h2,
          strpos('0123456789abcdef', substring(fp, 3, 1)) - 1 AS h3,
          strpos('0123456789abcdef', substring(fp, 4, 1)) - 1 AS h4,
          strpos('0123456789abcdef', substring(fp, 5, 1)) - 1 AS h5
        FROM h),
      sgn AS (
        SELECT doc_id,
          (((h1*16 + h2)*16 + h3)*16 + h4) % $HashDim AS dim,
          CASE WHEN h5 % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
        FROM hx),
      agg AS (SELECT doc_id, dim, SUM(s) AS val FROM sgn GROUP BY 1, 2),
      dims AS (
        SELECT doc_id, CAST(i AS BIGINT) AS dim
        FROM (SELECT DISTINCT doc_id FROM documents),
          unnest(generate_series(0, ${HashDim - 1})) u(i))
      SELECT d.doc_id, d.dim, COALESCE(a.val, 0.0) AS val
      FROM dims d LEFT JOIN agg a ON d.doc_id = a.doc_id AND d.dim = a.dim
      ORDER BY d.doc_id, d.dim""",
    "quality_kn_lp" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t
        FROM documents),
      sh0 AS (
        SELECT doc_id, t,
          unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
        FROM toks),
      occ AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS s FROM sh0),
      bi AS (SELECT doc_id, s, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
      gbi AS (
        SELECT s, SUM(tf) AS c12,
          split_part(s, ' ', 1) AS w1, split_part(s, ' ', 2) AS w2
        FROM bi GROUP BY 1),
      ctx AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p FROM gbi GROUP BY 1),
      cont AS (SELECT w2, COUNT(*) AS n2 FROM gbi GROUP BY 1),
      typ AS (SELECT COUNT(*) AS b FROM gbi),
      per AS (
        SELECT bi.doc_id,
          CAST(SUM(bi.tf) AS BIGINT) AS n_bi,
          SUM(bi.tf * ln(
            greatest(gbi.c12 - $KnDiscount, 0.0) / ctx.c1 +
              ($KnDiscount * ctx.n1p / ctx.c1) * (cont.n2 / typ.b))) AS lp_sum
        FROM bi JOIN gbi USING (s)
          JOIN ctx ON gbi.w1 = ctx.w1
          JOIN cont ON gbi.w2 = cont.w2, typ
        GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(p.n_bi, 0) AS BIGINT) AS n_bigrams,
        COALESCE(ROUND(p.lp_sum / p.n_bi, 6), 0.0) AS mean_lp
      FROM documents d LEFT JOIN per p USING (doc_id)
      ORDER BY d.doc_id""",
    "quality_bigram_lp" -> """
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t
        FROM documents),
      terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
      uni AS (SELECT term, COUNT(*) AS c1 FROM terms GROUP BY 1),
      voc AS (SELECT COUNT(*) AS v FROM uni),
      sh0 AS (
        SELECT doc_id, t,
          unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
        FROM toks),
      occ AS (
        SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS s
        FROM sh0),
      bi AS (SELECT doc_id, w1, s, COUNT(*) AS tf FROM occ GROUP BY 1, 2, 3),
      c12 AS (SELECT s, SUM(tf) AS c12 FROM bi GROUP BY 1),
      per AS (
        SELECT bi.doc_id,
          CAST(SUM(bi.tf) AS BIGINT) AS n_bi,
          SUM(bi.tf * (ln(c12.c12 + 1) - ln(uni.c1 + voc.v))) AS lp_sum
        FROM bi JOIN c12 USING (s) JOIN uni ON bi.w1 = uni.term, voc
        GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(p.n_bi, 0) AS BIGINT) AS n_bigrams,
        COALESCE(ROUND(p.lp_sum / p.n_bi, 6), 0.0) AS mean_lp
      FROM documents d LEFT JOIN per p USING (doc_id)
      ORDER BY d.doc_id""",
    "corpus_ngrams" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      sh0 AS (
        SELECT doc_id, t,
          unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        FROM toks),
      occ AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM sh0),
      pg AS (
        SELECT s, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
        FROM occ GROUP BY 1)
      SELECT s AS ngram,
        CAST(n_occurrences AS BIGINT) AS n_occurrences,
        CAST(n_docs AS BIGINT) AS n_docs
      FROM pg ORDER BY n_occurrences DESC, s LIMIT 20""",
    "quality_rare_tokens" -> s"""
      WITH $rareCtesBody
      SELECT doc_id, n_tok, n_rare, rare_pct,
        rare_pct <= $RarePctMax AS keep
      FROM scored ORDER BY doc_id""",
    "text_tfidf" -> """
      WITH terms0 AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      terms AS (SELECT doc_id, term FROM terms0 WHERE length(term) > 0),
      tf AS (SELECT doc_id, term, COUNT(*) tf FROM terms GROUP BY 1, 2),
      df AS (SELECT term, COUNT(*) df FROM
        (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
      n AS (SELECT COUNT(*) n FROM documents),
      scored AS (
        SELECT doc_id, term,
          ROUND(tf * (CAST(n.n AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN df USING (term), n),
      ranked AS (
        SELECT doc_id, term, tfidf,
          ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, term) AS rk
        FROM scored)
      SELECT doc_id, rk, term, tfidf FROM ranked WHERE rk <= 3
      ORDER BY doc_id, rk""",
    "text_quality_filter" -> s"""
      WITH $qualityCtesBody
      SELECT doc_id, n_tokens, mean_tok_len, uniq_ratio,
        $QualityReasonCase AS reason,
        ($QualityReasonCase) = 'ok' AS keep
      FROM qstats ORDER BY doc_id""",
    "quality_gopher" -> {
      val stopHits = GopherStopwords.map(w =>
        s"CASE WHEN instr(' '||text||' ', ' $w ') > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH dirty AS (
        SELECT doc_id, CASE
          WHEN doc_id % 5 = 0 THEN '- first point' || chr(10) || '- second point'
            || chr(10) || '* third point' || chr(10) || text
          WHEN doc_id % 5 = 1 THEN text || chr(10) || 'wait...' || chr(10)
            || 'more...' || chr(10) || 'huh...'
          WHEN doc_id % 5 = 2 THEN text || ' ## ### # ####'
          WHEN doc_id % 5 = 3 THEN text || ' 11 22 33 44 55 66 77 88 99 00'
          ELSE text END AS text
        FROM documents),
      g AS (
        SELECT doc_id,
          CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS n_lines,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST((length(chr(10)||text) - length(replace(chr(10)||text, chr(10)||'- ', ''))) / 3
            + (length(chr(10)||text) - length(replace(chr(10)||text, chr(10)||'* ', ''))) / 3
            AS BIGINT) AS bullets,
          CAST((length(text||chr(10)) - length(replace(text||chr(10), '...'||chr(10), ''))) / 4
            AS BIGINT) AS ells,
          CAST(length(text) - length(replace(text, '#', ''))
            + (length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS symbols,
          CAST(len(list_filter(string_split(text, ' '),
            w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS alpha_words,
          CAST($stopHits AS BIGINT) AS n_stop
        FROM dirty),
      m AS (
        SELECT doc_id, n_lines, n_words,
          ROUND(bullets * 1.0 / n_lines, 6) AS bullet_frac,
          ROUND(ells * 1.0 / n_lines, 6) AS ellipsis_frac,
          ROUND(symbols * 1.0 / n_words, 6) AS symbol_ratio,
          ROUND(alpha_words * 1.0 / n_words, 6) AS alpha_frac,
          n_stop
        FROM g)
      SELECT doc_id, n_lines, n_words, bullet_frac, ellipsis_frac,
        symbol_ratio, alpha_frac, n_stop,
        CASE WHEN bullet_frac > 0.7 THEN 'too_many_bullets'
             WHEN ellipsis_frac > 0.3 THEN 'too_many_ellipses'
             WHEN symbol_ratio > 0.1 THEN 'too_many_symbols'
             WHEN alpha_frac < 0.8 THEN 'low_alpha'
             WHEN n_stop < 2 THEN 'few_stopwords'
             ELSE 'ok' END AS reason,
        (CASE WHEN bullet_frac > 0.7 THEN 'too_many_bullets'
              WHEN ellipsis_frac > 0.3 THEN 'too_many_ellipses'
              WHEN symbol_ratio > 0.1 THEN 'too_many_symbols'
              WHEN alpha_frac < 0.8 THEN 'low_alpha'
              WHEN n_stop < 2 THEN 'few_stopwords'
              ELSE 'ok' END) = 'ok' AS keep
      FROM m ORDER BY doc_id"""
    },
    "quality_repetition" -> s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      b0 AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS s
             FROM (SELECT doc_id, t,
                     unnest(generate_series(1, greatest(len(t)-1, 0))) i
                   FROM toks)),
      bc AS (SELECT doc_id, s, COUNT(*) c FROM b0 GROUP BY 1, 2),
      bagg AS (SELECT doc_id, SUM(c) n_bigrams, MAX(c) top_n FROM bc GROUP BY 1),
      t0 AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
             FROM (SELECT doc_id, t,
                     unnest(generate_series(1, greatest(len(t)-2, 0))) i
                   FROM toks)),
      tc AS (SELECT doc_id, s, COUNT(*) c FROM t0 GROUP BY 1, 2),
      tagg AS (SELECT doc_id, SUM(c) n_tri,
                 SUM(CASE WHEN c > 1 THEN c ELSE 0 END) dup_tri
               FROM tc GROUP BY 1),
      m AS (
        SELECT d.doc_id,
          COALESCE(CAST(n_bigrams AS BIGINT), 0) AS n_bigrams,
          COALESCE(CAST(top_n AS BIGINT), 0) AS top_bigram_n,
          COALESCE(ROUND(top_n * 1.0 / n_bigrams, 6), 0.0) AS top_bigram_frac,
          COALESCE(ROUND(dup_tri * 1.0 / n_tri, 6), 0.0) AS dup_trigram_frac
        FROM documents d
        LEFT JOIN bagg USING (doc_id) LEFT JOIN tagg USING (doc_id))
      SELECT doc_id, n_bigrams, top_bigram_n, top_bigram_frac, dup_trigram_frac,
        (top_bigram_frac > $TopBigramFracMax
          OR dup_trigram_frac > $DupTrigramFracMax) AS repetitive
      FROM m ORDER BY doc_id""",
    "profile_documents" -> """
      SELECT 'doc_id' AS column_name, COUNT(*) AS n_rows,
        COUNT(*) - COUNT(doc_id) AS n_null,
        COUNT(DISTINCT doc_id) AS n_distinct,
        CAST(MIN(doc_id) AS VARCHAR) AS min_value,
        CAST(MAX(doc_id) AS VARCHAR) AS max_value FROM documents
      UNION ALL
      SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
        COUNT(DISTINCT lang), MIN(lang), MAX(lang) FROM documents
      UNION ALL
      SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
        COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR),
        CAST(MAX(n_chars) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
        COUNT(DISTINCT source), MIN(source), MAX(source) FROM documents
      UNION ALL
      SELECT 'text', COUNT(*), COUNT(*) - COUNT(text),
        COUNT(DISTINCT text), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM documents
      ORDER BY column_name""")
}
