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
    "profile_documents" -> (profile _))

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
