package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_counts" -> (tokenCounts _),
    "text_stats" -> (textStats _),
    "text_lang_id" -> (langId _),
    "text_fingerprint" -> (fingerprint _))

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
      SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id""")
}
