package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benchmark decontamination — the training-pipeline step that removes
  * eval-set leakage from the training corpus (SURVEY §7.5 adjunct): a
  * training document is CONTAMINATED when it shares at least one
  * distinct word n-gram with any benchmark document (the exact-match
  * n-gram rule of GPT-3 appendix C / The Pile; n here 5).
  *
  * Scale shape: the corpus side is one shingle pass (map-side,
  * already-proven [[Dedup.shingles]]); the benchmark side is tiny by
  * nature (benchmarks are KBs–MBs against a 100 TB corpus), so its
  * distinct n-gram set broadcasts and the contamination test is a
  * broadcast semi-join fused behind the corpus scan — no shuffle of
  * corpus shingles, no self-join. A zipf-hot n-gram cannot blow up a
  * task: the join is semi (existence), not an expansion.
  */
object Decontam {

  /** The published recipes' text normalization (GPT-3 appendix C / The
    * Pile): lowercase, strip punctuation, treat whitespace as a
    * SEPARATOR — newlines/tabs collapse to single spaces (deleting them
    * would weld line-wrapped words together and miss real leakage), and
    * stripped punctuation can't leave empty tokens behind. Applied
    * map-side before tokenization; the DuckDB oracle mirrors the exact
    * pattern text (explicit [ \t\n\r] class — Java and RE2 disagree on
    * \s's fringe members — and the 'g' flag for replace-all). */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 \\t\\n\\r]", ""),
      "[ \\t\\n\\r]+", " "))

  /** (doc_id, contaminated) for every TRAIN doc (`!isEval`), true when
    * the doc shares ≥1 distinct n-gram with the eval set. `n` follows
    * the published recipes (5 here by default; GPT-3 uses 13);
    * `normalized` lowercases and strips punctuation first. Each side is
    * shingled exactly once, from its own pre-filtered scan — shingling
    * the full corpus and semi-joining the eval slice out afterwards
    * would tokenize the 100 TB training side twice. */
  def flags(docs: DataFrame, isEval: Column, n: Int = 5,
            normalized: Boolean = false): DataFrame = {
    val base =
      if (normalized) docs.withColumn("text", normalize(col("text")))
      else docs
    val evalSh = Dedup.shingles(base.filter(isEval), n)
      .select("sh").distinct()
    val contaminated = Dedup.shingles(base.filter(!isEval), n)
      .join(evalSh, Seq("sh"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
    base.filter(!isEval).select("doc_id")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Gate: docs with doc_id % 10 == 0 play the benchmark set; every
    * other doc is flagged. The fixture's planted near-duplicate pairs
    * straddle the split, so both flag values occur. */
  def decontaminate(s: SparkSession, dir: String): DataFrame =
    flags(Tables.load(s, dir, "documents"),
      pmod(col("doc_id"), lit(10)) === 0)
      .orderBy(col("doc_id"))

  /** The GPT-3 recipe variant: 13-gram exact match after lowercasing +
    * punctuation stripping. The fixture text is already clean, so the
    * gate deterministically DIRTIES it first (case + punctuation,
    * mirrored in the oracle) — the flags computed on the normalized
    * dirty text hash-match the oracle's identical pipeline, proving the
    * normalization round-trips rather than vacuously passing through. */
  def decontaminateN13(s: SparkSession, dir: String): DataFrame = {
    val dirty = Tables.load(s, dir, "documents").withColumn("text",
      when(pmod(col("doc_id"), lit(3)) === 0, concat(upper(col("text")), lit("!!")))
        .when(pmod(col("doc_id"), lit(3)) === 1, concat(col("text"), lit(", end.")))
        .otherwise(col("text")))
    flags(dirty, pmod(col("doc_id"), lit(10)) === 0, n = 13, normalized = true)
      .orderBy(col("doc_id"))
  }

  /** Fuzzy (near-match) decontamination — the Llama-style variant that
    * flags training docs NEAR-duplicating an eval doc, not just sharing
    * one exact n-gram: per train doc, the max shingle-Jaccard against
    * any eval doc (0.0 when they share no shingle), contaminated when it
    * clears `threshold`.
    *
    * Scale shape: eval shingles are benchmark-sized → both the shingle
    * equi-join and the eval-sizes join are explicit broadcasts, so the
    * 100 TB train side is never shuffled for candidate generation; the
    * only wide exchanges are keyed on (train doc, eval doc) intersection
    * pairs and then train doc — both bounded by actual overlap, not
    * corpus size. Exact Jaccard (not MinHash-estimated) keeps the gate
    * oracle-exact; the LSH prefilter path for when even the overlap
    * pairs are too many is [[Dedup.lshCandidates]] composed upstream. */
  def fuzzyFlags(docs: DataFrame, isEval: Column, n: Int = 3,
                 threshold: Double = 0.5): DataFrame = {
    val evalSh = Dedup.shingles(docs.filter(isEval), n)
      .withColumnRenamed("doc_id", "eval_id")
    val trainSh = Dedup.shingles(docs.filter(!isEval), n)
    val evalSizes = evalSh.groupBy("eval_id").agg(count(lit(1)).as("esz"))
    val trainSizes = trainSh.groupBy("doc_id").agg(count(lit(1)).as("tsz"))
    val best = trainSh.join(broadcast(evalSh), Seq("sh"))
      .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("c"))
      .join(trainSizes, "doc_id")
      .join(broadcast(evalSizes), "eval_id")
      .withColumn("j",
        round(col("c") / (col("tsz") + col("esz") - col("c")), 6))
      .groupBy("doc_id").agg(max(col("j")).as("max_jaccard"))
    docs.filter(!isEval).select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"))
      .withColumn("contaminated", col("max_jaccard") >= threshold)
  }

  /** Gate: same mod-10 eval split as [[decontaminate]]; the planted
    * near-duplicate pairs straddling the split surface as max_jaccard
    * ≈ 0.99 while ordinary vocabulary overlap stays ≤ 0.05. */
  def decontaminateFuzzy(s: SparkSession, dir: String): DataFrame =
    fuzzyFlags(Tables.load(s, dir, "documents"),
      pmod(col("doc_id"), lit(10)) === 0)
      .orderBy(col("doc_id"))

  /** Span-level surgical decontamination: instead of dropping a whole
    * contaminated document ([[flags]]), cut only the [[Scrub.ChunkTokens]]-
    * token spans whose n-grams leak from the eval set and rebuild the doc
    * from its surviving spans — the "remove the quote, keep the article"
    * policy of surgical-removal pipelines.
    *
    * Scale shape: chunking is the shared map-side front
    * ([[Scrub.chunked]]); chunk n-grams are the proven shingle flatMap
    * over a synthetic (doc, pos) key; contamination is the same broadcast
    * eval semi-join as [[flags]]; the cut is a broadcast anti-join
    * (contaminated chunk keys are bounded by actual leakage, not corpus
    * size); the rebuild is one doc_id-keyed aggregate. No self-joins, no
    * corpus-wide wide rows. */
  def scrubSpans(docs: DataFrame, isEval: Column, n: Int = 5): DataFrame = {
    val evalSh = Dedup.shingles(docs.filter(isEval), n)
      .select("sh").distinct()
    val chunks = Scrub.chunked(docs.filter(!isEval))
    // synthetic chunk key: pos is bounded by doc length / ChunkTokens, so
    // 2^20 spans per doc is unreachable long before doc_id * 2^20 can
    // overflow a corpus's id space (doc_id < 2^42 documented)
    val ckey = col("doc_id") * 1048576L + col("pos")
    val contaminated = Dedup.shingles(
      chunks.select(ckey.as("doc_id"), col("chunk").as("text")), n)
      .join(broadcast(evalSh), Seq("sh"), "left_semi")
      .select(col("doc_id").as("ckey")).distinct()
    val kept = chunks.withColumn("ckey", ckey)
      .join(contaminated, Seq("ckey"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, chunk))), x -> x.chunk), ' ')")
          .as("kept_text"),
        count(lit(1)).as("n_kept"))
    val totals = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_total"))
    docs.filter(!isEval).select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("text"),
        (coalesce(col("n_total"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_cut"))
  }

  /** Gate: mod-10 eval split as in [[decontaminate]]; contaminated docs
    * keep their clean spans instead of vanishing. */
  def decontaminateSpans(s: SparkSession, dir: String): DataFrame =
    scrubSpans(Tables.load(s, dir, "documents"),
      pmod(col("doc_id"), lit(10)) === 0)
      .orderBy(col("doc_id"))

  /** One-row cross-method contamination report: per-method flag counts
    * plus pairwise agreement — the summary a data audit publishes
    * before a training run (exact 5-gram, GPT-3-style normalized
    * 13-gram, fuzzy Jaccard; the embedding method lives on the vector
    * corpus as `decontaminate_semantic`). Each method's flags are the
    * already-gated dataflows; the report is one 3-way doc_id join and
    * one aggregate on top. */
  def decontamReport(s: SparkSession, dir: String): DataFrame = {
    val ex = decontaminate(s, dir)
      .select(col("doc_id"), col("contaminated").as("ex"))
    val n13 = decontaminateN13(s, dir)
      .select(col("doc_id"), col("contaminated").as("nf"))
    val fz = decontaminateFuzzy(s, dir)
      .select(col("doc_id"), col("contaminated").as("fu"))
    ex.join(n13, "doc_id").join(fz, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ex").cast("long")).as("n_exact"),
        sum(col("nf").cast("long")).as("n_n13"),
        sum(col("fu").cast("long")).as("n_fuzzy"),
        sum((col("ex") && col("nf")).cast("long")).as("n_exact_and_n13"),
        sum((col("ex") && col("fu")).cast("long")).as("n_exact_and_fuzzy"),
        sum((col("ex") || col("nf") || col("fu")).cast("long")).as("n_any"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate" -> (decontaminate _),
    "decontaminate_n13" -> (decontaminateN13 _),
    "decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "decontaminate_spans" -> (decontaminateSpans _),
    "decontam_report" -> (decontamReport _))

  private val baseOracle: Map[String, String] = Map(
    "decontaminate" -> s"""
      WITH ${Dedup.shingleCtes("documents", 5)},
      evalsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
      contam AS (SELECT DISTINCT doc_id FROM sh
                 WHERE doc_id % 10 <> 0 AND s IN (SELECT s FROM evalsh))
      SELECT d.doc_id, (c.doc_id IS NOT NULL) AS contaminated
      FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
      WHERE d.doc_id % 10 <> 0
      ORDER BY d.doc_id""",
    "decontaminate_n13" -> s"""
      WITH dirty AS (
        SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN upper(text) || '!!'
                            WHEN doc_id % 3 = 1 THEN text || ', end.'
                            ELSE text END AS text
        FROM documents),
      norm AS (
        SELECT doc_id,
          trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 \t\n\r]', '', 'g'),
            '[ \t\n\r]+', ' ', 'g')) AS text
        FROM dirty),
      ${Dedup.shingleCtes("norm", 13)},
      evalsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
      contam AS (SELECT DISTINCT doc_id FROM sh
                 WHERE doc_id % 10 <> 0 AND s IN (SELECT s FROM evalsh))
      SELECT d.doc_id, (c.doc_id IS NOT NULL) AS contaminated
      FROM norm d LEFT JOIN contam c ON d.doc_id = c.doc_id
      WHERE d.doc_id % 10 <> 0
      ORDER BY d.doc_id""",
    "decontaminate_fuzzy" -> s"""
      WITH ${Dedup.shingleCtes("documents", 3)},
      esz AS (SELECT doc_id, COUNT(*) sz FROM sh WHERE doc_id % 10 = 0 GROUP BY 1),
      tsz AS (SELECT doc_id, COUNT(*) sz FROM sh WHERE doc_id % 10 <> 0 GROUP BY 1),
      inter AS (SELECT a.doc_id i, b.doc_id e, COUNT(*) c
                FROM sh a JOIN sh b ON a.s = b.s
                WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0 GROUP BY 1, 2),
      jc AS (SELECT i, ROUND(c * 1.0 / (t.sz + e2.sz - c), 6) j
             FROM inter JOIN tsz t ON i = t.doc_id JOIN esz e2 ON e = e2.doc_id),
      mx AS (SELECT i AS doc_id, MAX(j) mj FROM jc GROUP BY 1)
      SELECT d.doc_id, COALESCE(mj, 0.0) AS max_jaccard,
        COALESCE(mj, 0.0) >= 0.5 AS contaminated
      FROM documents d LEFT JOIN mx USING (doc_id)
      WHERE d.doc_id % 10 <> 0
      ORDER BY d.doc_id""",
    "decontaminate_spans" -> {
      val egram = (0 until 5).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      val cgram = (0 until 5).map(k => s"ct[i+$k]").mkString(" || ' ' || ")
      s"""
      WITH train AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
      ${Scrub.chunkCtes("train")},
      etoks AS (
        SELECT doc_id, string_split(text, ' ') t
        FROM documents WHERE doc_id % 10 = 0),
      esh0 AS (SELECT t, unnest(generate_series(1, greatest(len(t)-4, 0))) i
               FROM etoks),
      evalsh AS (SELECT DISTINCT $egram AS s FROM esh0),
      ctoks AS (SELECT doc_id, pos, string_split(chunk, ' ') ct FROM chunks),
      csh0 AS (SELECT doc_id, pos, ct,
                 unnest(generate_series(1, greatest(len(ct)-4, 0))) i
               FROM ctoks),
      bad AS (SELECT DISTINCT doc_id, pos FROM csh0
              WHERE $cgram IN (SELECT s FROM evalsh)),
      kept AS (SELECT c.doc_id, c.pos, c.chunk FROM chunks c
               LEFT JOIN bad b ON c.doc_id = b.doc_id AND c.pos = b.pos
               WHERE b.doc_id IS NULL),
      rebuilt AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS kept_text,
                    CAST(COUNT(*) AS BIGINT) AS n_kept
                  FROM kept GROUP BY 1),
      tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total
              FROM chunks GROUP BY 1)
      SELECT d.doc_id, COALESCE(kept_text, '') AS text,
        COALESCE(n_total, 0) - COALESCE(n_kept, 0) AS n_cut
      FROM train d
      LEFT JOIN tot USING (doc_id) LEFT JOIN rebuilt USING (doc_id)
      ORDER BY doc_id"""
    })
  /** decontam_report's oracle composes the three method oracles as
    * subqueries, so the report can never drift from the gated flags. */
  private def wrapFlags(k: String, as_ : String): String =
    s"(SELECT doc_id, contaminated AS ${as_} FROM (${baseOracle(k)}))"

  val oracle: Map[String, String] = baseOracle + ("decontam_report" -> s"""
      SELECT COUNT(*) AS n_docs,
        CAST(SUM(CAST(ex AS BIGINT)) AS BIGINT) AS n_exact,
        CAST(SUM(CAST(nf AS BIGINT)) AS BIGINT) AS n_n13,
        CAST(SUM(CAST(fu AS BIGINT)) AS BIGINT) AS n_fuzzy,
        CAST(SUM(CAST(ex AND nf AS BIGINT)) AS BIGINT) AS n_exact_and_n13,
        CAST(SUM(CAST(ex AND fu AS BIGINT)) AS BIGINT) AS n_exact_and_fuzzy,
        CAST(SUM(CAST(ex OR nf OR fu AS BIGINT)) AS BIGINT) AS n_any
      FROM ${wrapFlags("decontaminate", "ex")} e
      JOIN ${wrapFlags("decontaminate_n13", "nf")} n USING (doc_id)
      JOIN ${wrapFlags("decontaminate_fuzzy", "fu")} f USING (doc_id)""")
}
