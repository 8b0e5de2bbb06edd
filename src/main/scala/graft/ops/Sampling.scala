package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic stratified sampling for training-data curation
  * (SURVEY §7.5 adjunct): per-stratum keep rates — the "mix 100% of
  * high-quality, 10% of boilerplate" step every large-corpus pipeline
  * runs before training.
  *
  * Sampling is a pure per-row hash predicate, so it is:
  *  - exactly reproducible (no RNG state, no partition-order dependence —
  *    unlike `DataFrame.sample`, whose draw depends on partitioning);
  *  - embarrassingly parallel: a filter fused into the scan, zero
  *    shuffles, survives any repartitioning of a 100 TB input;
  *  - stable under re-runs and appends: a document's fate is a function
  *    of its id alone, so incremental pipelines never flip decisions.
  *
  * The hash is a Knuth multiplicative mix mod 2^32 expressed in plain
  * BIGINT arithmetic — chosen (over e.g. xxhash64) because the oracle
  * engine must compute the identical value; a production deployment
  * would swap in xxhash64 with the same contract. */
object Sampling {

  /** Knuth multiplicative hash of doc_id in [0, 100): the percent draw.
    * doc_id is reduced to a NON-NEGATIVE value mod 2^31 before the
    * multiply, so the product stays below 2^63 for any BIGINT id (no
    * ANSI-mode overflow) and every later `%` operates on non-negative
    * operands — where Spark's `pmod` and DuckDB's sign-following `%`
    * agree exactly. DuckDB spells the non-negative reduction as
    * ((x % m) + m) % m. */
  private[graft] def drawSqlMod(m: Long): String = drawSqlModOn("doc_id", m)
  private[ops] def drawDuckMod(m: Long): String = drawDuckModOn("doc_id", m)

  /** The same draw keyed by an arbitrary BIGINT column — e.g. the
    * near-dup component id for leakage-safe split assignment
    * ([[Sharding.splitLeakage]]). */
  private[graft] def drawSqlModOn(c: String, m: Long): String =
    s"pmod(pmod($c, 2147483648) * 2654435761, 4294967296) % $m"
  private[ops] def drawDuckModOn(c: String, m: Long): String =
    s"((((($c % 2147483648) + 2147483648) % 2147483648) " +
      s"* 2654435761) % 4294967296) % $m"
  private[graft] val DrawSql = drawSqlMod(100)
  private[ops] val DrawDuck = drawDuckMod(100)

  /** Per-language keep rates (percent): the shape of a quality-weighted
    * training mix over the fixture corpus's language strata. */
  val Rates: Seq[(String, Int)] = Seq(("en", 100), ("de", 50), ("fr", 25))
  val DefaultRate = 10

  /** The per-language keep-rate column (percent), Spark side. */
  private[graft] def rateCol: org.apache.spark.sql.Column =
    Rates.foldLeft(lit(DefaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }

  /** The per-language keep-rate CASE, DuckDB side. */
  private[ops] val RateDuck: String =
    "(CASE lang " + Rates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString(" ") + s" ELSE $DefaultRate END)"

  /** Stratified sample of `documents`: keep a doc iff its deterministic
    * percent draw falls under its language's rate. Returns the sampled
    * rows (id, stratum, draw) — exact row-level reproducibility is the
    * point, so the gate compares the full listing. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    docs
      .withColumn("draw", expr(DrawSql))
      .withColumn("rate", rateCol)
      .filter(col("draw") < col("rate"))
      .select(col("doc_id"), col("lang"), col("draw").cast("long").as("draw"))
      .orderBy(col("doc_id"))
  }

  /** Token budget per language stratum for [[sampleTokenBudget]]. */
  val TokenBudget = 20000L

  /** Keep-rate granularity for token-budget sampling: parts-per-million,
    * NOT percent — an integer percent floors to 0 for any stratum whose
    * total exceeds 100× the budget (i.e. every stratum at corpus scale),
    * silently emptying the sample. At ppm the cliff moves to 10⁶× the
    * budget, and the rate product (10⁶ · budget) stays far below 2⁶³. */
  val RatePpm = 1000000L

  /** Token-budget calibrated sampling: keep ~`TokenBudget` TOKENS per
    * stratum (the "mix N billion tokens of each source" step), not a
    * fixed row fraction. Two passes, both scale-safe:
    *
    *  1. one tiny aggregate — total tokens per stratum (map-side
    *     partial, broadcast back);
    *  2. the same deterministic hash draw as [[sampleStratified]]
    *     against a CALIBRATED rate = min(100, 100·budget div total) —
    *     integer `div` so both engines compute the identical rate.
    *
    * The naive formulation (cumulative-sum window per stratum, keep
    * while cumsum ≤ budget) would shuffle the corpus on the stratum key
    * and serialize each stratum into ONE window task — a few-strata
    * corpus at 100 TB collapses onto a handful of executors. The
    * calibrated-rate form keeps the row decision embarrassingly
    * parallel and append-stable, trading exact-budget for
    * expected-budget (the standard trade in production mixing). */
  def sampleTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val tot = docs.groupBy("lang").agg(sum(nTok).as("tot"))
    docs
      .withColumn("n_tokens", nTok)
      .join(broadcast(tot), Seq("lang")) // strata are dimension-sized
      .withColumn("rate",
        // pre-multiplied in Scala: an inline `1000000 * 20000` parses
        // as int·int and overflows under ANSI; the 2·10¹⁰ literal
        // parses as bigint
        least(lit(RatePpm), expr(s"${RatePpm * TokenBudget} div tot")))
      .withColumn("draw", expr(drawSqlMod(RatePpm)))
      .filter(col("draw") < col("rate"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("rate").cast("long").as("rate"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-mixing config for [[corpusMix]]: a 5000-token total budget
    * split across sources by integer weight — src0–src4 (the "curated"
    * tier) weigh 6, src5–src9 weigh 3, the long tail 1. The weight sum
    * is part of the mixing SPEC (config, not data): absent sources
    * simply leave their budget share unspent, exactly like a production
    * mix whose manifest lists more sources than this shard carries. */
  val MixBudget = 5000L
  val MixWeightSum = 55L // 5·6 + 5·3 + 10·1 over the src0..src19 universe

  /** Source-weighted token-budget mixing — the "upsample curated
    * sources, downsample the crawl" step of training-corpus assembly,
    * composed from the same primitives as [[sampleTokenBudget]]: one
    * tiny per-source token aggregate (broadcast back), an integer-
    * arithmetic calibrated ppm rate per source (weight · budget share ÷
    * source tokens — `div` end-to-end so both engines agree exactly),
    * and the deterministic per-row hash draw. Zero corpus shuffles; the
    * row decision stays append-stable and embarrassingly parallel. */
  def corpusMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val tot = docs.groupBy("source").agg(sum(nTok).as("tot"))
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("sn", expr("cast(substring(source, 4) as int)"))
      .withColumn("weight",
        when(col("sn") < 5, lit(6L)).when(col("sn") < 10, lit(3L))
          .otherwise(lit(1L)))
      .join(broadcast(tot), Seq("source")) // sources are dimension-sized
      .withColumn("rate",
        least(lit(RatePpm),
          expr(s"($RatePpm * (($MixBudget * weight) div $MixWeightSum)) div tot")))
      .withColumn("draw", expr(drawSqlMod(RatePpm)))
      .filter(col("draw") < col("rate"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("weight"),
        col("rate").cast("long").as("rate"))
      .orderBy(col("doc_id"))
  }

  /** Token budget for [[sampleQualityBudget]]. */
  val QualityBudget = 10000L

  /** Quality-ranked exact token budget: rank the corpus cleanest-first
    * (integer rare-token percent, ties to doc_id — engine-exact
    * ordering) and keep each document whose running token total STARTS
    * inside the budget — "take the best N tokens", the selection a
    * final training mix runs after scoring. Where [[sampleTokenBudget]]
    * trades exact-budget for a parallel per-row rate (the right call
    * for per-stratum mixing), this delivers the EXACT greedy selection
    * and stays scale-safe by running the budget walk through
    * [[Sharding.globalPrefixSum]] — range partition + broadcast
    * offsets, never the single-task `SUM(…) OVER (ORDER BY …)` global
    * window. */
  def sampleQualityBudget(s: SparkSession, dir: String): DataFrame =
    Sharding.globalPrefixSum(
        TextAnalysis.rareTokens(s, dir).select("doc_id", "n_tok", "rare_pct"),
        Seq(col("rare_pct").asc, col("doc_id").asc), col("n_tok"),
        "cum_tokens")
      .filter(col("cum_tokens") - col("n_tok") < QualityBudget)
      .select(col("doc_id"), col("rare_pct"), col("n_tok"), col("cum_tokens"))
      .orderBy("doc_id")

  /** Target source for [[sampleImportance]] — the "domain we want more
    * of"; the raw distribution is the whole corpus. */
  val ImportanceTarget = "src0"

  /** DSIR-style importance weighting (Xie et al. 2023's data-selection
    * recipe, unigram form): per-document mean token log-likelihood RATIO
    * between a target-domain unigram LM and the raw-corpus unigram LM,
    * both add-one smoothed over the raw vocabulary —
    * w(d) = (1/n_d)·Σ_t tf_t·[ln(ct+1) − ln(Nt+V) − ln(cr+1) + ln(Nr+V)].
    * Positive weight = looks more like the target than the raw corpus;
    * `keep` selects those documents (the resampling step samples
    * proportionally — the deterministic threshold form keeps the gate
    * exact).
    *
    * Oracle parity: every ln argument is an exact integer (the
    * [[TextAnalysis.unigramLp]] contract), the mean is rounded to 6 dp,
    * and the keep threshold compares the ROUNDED value so the cut can
    * never straddle an ulp.
    *
    * Scale shape: tokens collapse to per-(doc, term) counts map-side
    * before the vocab joins (hot terms bounded at one row per doc); the
    * target LM is vocab-bounded (left join, absent terms smooth to
    * ln 1 = 0 via ct = 0); Nt, Nr and V ride as a lazy 1-row cross join.
    * In production the target counts come from a separate small curated
    * corpus — here the in-corpus `source` stratum stands in, which also
    * keeps the oracle self-contained. */
  def sampleImportance(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    def occOf(d: DataFrame) = d.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = occOf(docs).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val rawFreq = tf.groupBy("term").agg(sum("tf").as("cr"))
    val tgtFreq = occOf(docs.filter(col("source") === ImportanceTarget))
      .groupBy("term").agg(count(lit(1)).as("ct"))
    val scalars = rawFreq.agg(sum("cr").as("nr"), count(lit(1)).as("v"))
      .crossJoin(tgtFreq.agg(coalesce(sum("ct"), lit(0L)).as("nt")))
    val per = tf.join(rawFreq, "term")
      .join(tgtFreq, Seq("term"), "left")
      .withColumn("ct", coalesce(col("ct"), lit(0L)))
      .crossJoin(scalars)
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * (log(col("ct") + 1) - log(col("nt") + col("v"))
          - log(col("cr") + 1) + log(col("nr") + col("v")))).as("w_sum"))
    docs.select("doc_id", "source").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(round(col("w_sum") / col("n_tokens"), 6), lit(0.0))
          .as("weight"))
      .withColumn("keep", col("weight") > 0)
      .orderBy("doc_id")
  }

  /** Temperature-based source re-balancing (the multilingual-training
    * recipe of mBERT/XLM-R/mT5, α = 0.5 here): sampling shares follow
    * q_s ∝ p_s^α instead of the raw share p_s, flattening the source
    * distribution — head sources are downsampled, tail sources kept at
    * (relatively) higher rates. The per-source ACCEPT probability is the
    * likelihood ratio q_s/p_s normalized so the most-upweighted source
    * keeps 100% (no replication in a keep/drop pipeline); the row
    * decision is the same deterministic hash draw as every sampler here.
    *
    * α is fixed at 1/2 so p^α is `sqrt` — correctly rounded in IEEE,
    * unlike libm `pow` — and every cross-engine float follows the
    * oracle-parity contract: shares divide exact integers, each
    * intermediate is rounded (6–9 dp) before reuse, and the share SUM
    * runs over 6-dp DECIMALs (exact, order-free — a double sum would be
    * partition-order dependent).
    *
    * Scale shape: one tiny per-source token aggregate (map-side
    * partial), the rate table is dimension-sized and broadcast back, the
    * accept test is a fused per-row filter — zero corpus shuffles,
    * append-stable. */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val tot = docs.groupBy("source").agg(sum(nTok).as("tot"))
      .withColumn("sdec",
        round(sqrt(col("tot").cast("double")), 6).cast("decimal(38,6)"))
    val gt = tot.agg(sum("tot").as("gt"))           // 1 row, lazy
    val ssum = tot.agg(sum("sdec").as("ssum"))      // 1 row, exact decimal
    val rates = tot.crossJoin(gt).crossJoin(ssum)
      .withColumn("q",
        round(col("sdec").cast("double") / col("ssum").cast("double"), 9))
      .withColumn("p",
        round(col("tot").cast("double") / col("gt").cast("double"), 9))
      .withColumn("w", round(col("q") / col("p"), 9))
    val wmax = rates.agg(max("w").as("wmax"))       // 1 row; max is exact
    val pct = rates.crossJoin(wmax)
      .withColumn("accept_pct",
        round(col("w") / col("wmax") * 100, 6))
      .select(col("source"), col("accept_pct"))
    docs
      .join(broadcast(pct), Seq("source")) // sources are dimension-sized
      .withColumn("draw", expr(DrawSql))
      .filter(col("draw") < col("accept_pct"))
      .select(col("doc_id"), col("source"), col("accept_pct"))
      .orderBy(col("doc_id"))
  }

  /** Sample size for [[sampleFixedK]]. */
  val FixedK = 200

  /** Deterministic FIXED-SIZE sample (`sample_fixed_k`) — exactly K
    * rows whatever the corpus size, the reservoir-sampling use case
    * done the distributed-friendly way: rank every row by a stable
    * content hash (md5 of the id — identical text in both engines) and
    * keep the K smallest. Unlike a true reservoir this is reproducible
    * row-for-row and stable under repartitioning; membership is fixed
    * for a FIXED corpus (an append can introduce smaller hashes and
    * displace earlier members — inherent to any exactly-K scheme, and
    * exactly how a re-drawn reservoir would behave), and it needs no
    * sequential state: Spark plans it as
    * TakeOrderedAndProject — a per-partition K-heap plus one K-row
    * merge at the driver, never a global sort (the same shape as the
    * corpus top-k queries). Output is the per-lang rollup of the
    * sampled rows, which pins the exact membership. */
  def sampleFixedK(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .orderBy(md5(col("doc_id").cast("string")))
      .limit(FixedK)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .orderBy("lang")

  /** Sample size for [[sampleWeighted]]. */
  val AesK = 100

  /** WEIGHTED sample without replacement (`sample_weighted`) — the
    * Efraimidis–Spirakis A-ES scheme (IPL 2006): every row gets key
    * ln(u)/w for a uniform u and weight w, and the K LARGEST keys are
    * a weighted-without-replacement sample: each successive draw picks
    * item i with probability w_i over the remaining items' total
    * weight (the A-ES guarantee — marginal inclusion probabilities are
    * only approximately ∝ w). The training-data use case: favor long/
    * high-quality documents in a fixed-size subset without a
    * sequential reservoir. Distribution-friendly by the same argument
    * as [[sampleFixedK]]: the key is a pure per-row function (u comes
    * from the deterministic Knuth draw at full 2^32 granularity, w =
    * n_chars), so the cut is TakeOrderedAndProject — per-partition
    * K-heaps, one K-row driver merge, no RNG state, no global sort,
    * reproducible under any repartitioning. Keys are ROUNDED to 9 dp
    * BEFORE ranking with a doc_id tiebreak, so selection is identical
    * on both engines even at LN's last-ulp (precedent: the PSI gate's
    * LN). */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val draw = drawSqlModOn("doc_id", 4294967296L)
    Tables.load(s, dir, "documents")
      .withColumn("key", round(
        log((expr(draw).cast("double") + 0.5) / 4294967296.0) /
          greatest(col("n_chars"), lit(1L)).cast("double"), 9))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(AesK)
      .select(col("doc_id"), col("lang"), col("key"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_fixed_k" -> (sampleFixedK _),
    "sample_weighted" -> (sampleWeighted _),
    "sample_temperature" -> (sampleTemperature _),
    "sample_stratified" -> (sampleStratified _),
    "sample_token_budget" -> (sampleTokenBudget _),
    "sample_quality_budget" -> (sampleQualityBudget _),
    "sample_importance" -> (sampleImportance _),
    "corpus_mix" -> (corpusMix _))

  val oracle: Map[String, String] = Map(
    "sample_fixed_k" -> s"""
      WITH samp AS (
        SELECT doc_id, lang FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT $FixedK)
      SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM samp GROUP BY lang ORDER BY lang""",
    "sample_weighted" -> s"""
      WITH k AS (
        SELECT doc_id, lang,
          ROUND(LN((CAST(${drawDuckModOn("doc_id", 4294967296L)} AS DOUBLE)
              + 0.5) / 4294967296.0)
            / CAST(GREATEST(n_chars, 1) AS DOUBLE), 9) AS key
        FROM documents),
      samp AS (
        SELECT doc_id, lang, key FROM k
        ORDER BY key DESC, doc_id LIMIT $AesK)
      SELECT doc_id, lang, key FROM samp ORDER BY doc_id""",
    "sample_temperature" -> s"""
      WITH tok AS (
        SELECT doc_id, source,
          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS nt
        FROM documents),
      tot AS (
        SELECT source, CAST(SUM(nt) AS BIGINT) AS tot,
          CAST(ROUND(sqrt(CAST(SUM(nt) AS DOUBLE)), 6) AS DECIMAL(38,6))
            AS sdec
        FROM tok GROUP BY 1),
      gt AS (SELECT CAST(SUM(tot) AS BIGINT) AS gt FROM tot),
      ssum AS (SELECT SUM(sdec) AS ssum FROM tot),
      rates AS (
        SELECT source,
          ROUND(CAST(sdec AS DOUBLE) / CAST(ssum AS DOUBLE), 9) AS q,
          ROUND(CAST(tot AS DOUBLE) / CAST(gt AS DOUBLE), 9) AS p
        FROM tot, gt, ssum),
      w AS (SELECT source, ROUND(q / p, 9) AS w FROM rates),
      wm AS (SELECT MAX(w) AS wmax FROM w),
      pct AS (
        SELECT source, ROUND(w / wmax * 100, 6) AS accept_pct FROM w, wm)
      SELECT d.doc_id, d.source, p.accept_pct
      FROM documents d JOIN pct p USING (source)
      WHERE $DrawDuck < p.accept_pct
      ORDER BY d.doc_id""",
    "sample_stratified" -> s"""
      SELECT doc_id, lang, CAST($DrawDuck AS BIGINT) AS draw
      FROM documents
      WHERE $DrawDuck < $RateDuck
      ORDER BY doc_id""",
    "sample_token_budget" -> s"""
      WITH tok AS (
        SELECT doc_id, lang,
          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      tot AS (SELECT lang, SUM(n_tokens) AS tot FROM tok GROUP BY 1),
      rated AS (
        SELECT t.doc_id, t.lang, t.n_tokens,
          LEAST($RatePpm, ${RatePpm * TokenBudget} // tot.tot) AS rate
        FROM tok t JOIN tot USING (lang))
      SELECT doc_id, lang, n_tokens, CAST(rate AS BIGINT) AS rate
      FROM rated
      WHERE ${drawDuckMod(RatePpm)} < rate
      ORDER BY doc_id""",
    "sample_quality_budget" -> s"""
      WITH ${TextAnalysis.rareCtesBody},
      c AS (
        SELECT doc_id, rare_pct, n_tok,
          SUM(n_tok) OVER (ORDER BY rare_pct, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM scored)
      SELECT doc_id, rare_pct, n_tok, CAST(cum AS BIGINT) AS cum_tokens
      FROM c WHERE cum - n_tok < $QualityBudget ORDER BY doc_id""",
    "sample_importance" -> s"""
      WITH occ0 AS (
        SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
        FROM documents),
      occ AS (SELECT doc_id, term FROM occ0 WHERE length(term) > 0),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM occ GROUP BY 1, 2),
      rawf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cr FROM tf GROUP BY 1),
      tocc0 AS (
        SELECT d.doc_id, unnest(string_split(COALESCE(d.text, ''), ' ')) AS term
        FROM documents d WHERE d.source = '$ImportanceTarget'),
      tgtf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ct FROM tocc0
               WHERE length(term) > 0 GROUP BY 1),
      sc AS (
        SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM rawf) AS nr,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM rawf) AS v,
          (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tgtf) AS nt),
      per AS (
        SELECT tf.doc_id,
          CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
          SUM(tf.tf * (ln(COALESCE(tgtf.ct, 0) + 1) - ln(sc.nt + sc.v)
            - ln(rawf.cr + 1) + ln(sc.nr + sc.v))) AS w_sum
        FROM tf JOIN rawf USING (term) LEFT JOIN tgtf USING (term), sc
        GROUP BY 1)
      SELECT d.doc_id, d.source,
        COALESCE(p.n_tokens, 0) AS n_tokens,
        COALESCE(ROUND(p.w_sum / p.n_tokens, 6), 0.0) AS weight,
        COALESCE(ROUND(p.w_sum / p.n_tokens, 6), 0.0) > 0 AS keep
      FROM documents d LEFT JOIN per p USING (doc_id)
      ORDER BY d.doc_id""",
    "corpus_mix" -> s"""
      WITH tok AS (
        SELECT doc_id, source,
          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens,
          CAST(substr(source, 4) AS INT) AS sn
        FROM documents),
      w AS (
        SELECT doc_id, source, n_tokens,
          CAST(CASE WHEN sn < 5 THEN 6 WHEN sn < 10 THEN 3 ELSE 1 END AS BIGINT) AS weight
        FROM tok),
      tot AS (SELECT source, SUM(n_tokens) AS tot FROM w GROUP BY 1),
      rated AS (
        SELECT w.doc_id, w.source, w.n_tokens, w.weight,
          LEAST($RatePpm, ($RatePpm * (($MixBudget * weight) // $MixWeightSum)) // tot.tot) AS rate
        FROM w JOIN tot USING (source))
      SELECT doc_id, source, n_tokens, weight, CAST(rate AS BIGINT) AS rate
      FROM rated
      WHERE ${drawDuckMod(RatePpm)} < rate
      ORDER BY doc_id""")
}
