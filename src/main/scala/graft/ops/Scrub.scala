package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus scrubbing operators the published training-data pipelines run
  * between crawl and train (C4/RefinedWeb/Dolma lineage, SURVEY §7.5
  * adjunct):
  *
  *  - PII redaction: email / phone / IPv4 patterns replaced with typed
  *    placeholder tokens — pure map-side `regexp_replace`, fused behind
  *    the scan (no shuffle at any corpus size). Patterns stay within the
  *    Java∩RE2 common subset (no lookaround, explicit [0-9] classes) so
  *    the DuckDB oracle runs the IDENTICAL pattern text.
  *  - Repeated-span (line-level) dedup: C4 removes duplicate three-
  *    sentence spans corpus-wide; over the token-stream fixture the span
  *    unit is a fixed 10-token chunk. First occurrence (doc_id, pos)
  *    wins; later copies are cut and each doc's text is rebuilt from its
  *    surviving chunks. Scale shape: chunking is map-side (explode), the
  *    first-wins rule is ONE shuffle on the chunk key (window), the
  *    rebuild one shuffle on doc_id — never a self-join, and a
  *    boilerplate chunk repeated a million times costs one window group,
  *    not a pair expansion.
  */
object Scrub {

  // Java∩RE2-safe pattern texts, shared verbatim with the DuckDB oracle.
  // (?i) on the email: real PII is case-insensitive, and the inline flag
  // is in the common subset (digit-only patterns don't need it).
  private val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  private val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** (text', redactions) for one text column. Each pattern is COUNTED on
    * the exact text its replacement runs on (email on the original,
    * phone on the email-scrubbed text, IP on the phone-scrubbed text) so
    * `redactions` always equals the number of placeholders inserted —
    * counting all three on the original text disagrees whenever one
    * replacement creates or consumes a later pattern's match (e.g. an
    * email whose local part looks like a phone number). */
  def scrubbed(text: Column): (Column, Column) = {
    val c1 = regexp_count(text, lit(EmailRe))
    val t1 = regexp_replace(text, EmailRe, "<EMAIL>")
    val c2 = regexp_count(t1, lit(PhoneRe))
    val t2 = regexp_replace(t1, PhoneRe, "<PHONE>")
    val c3 = regexp_count(t2, lit(IpRe))
    val t3 = regexp_replace(t2, IpRe, "<IP>")
    (t3, (c1 + c2 + c3).cast("long"))
  }

  /** Gate: the fixture text is PII-free, so deterministic PII is
    * injected first (mirrored in the oracle) — docs ≡ 0/1/2 (mod 7)
    * gain an email / phone / IP; scrubbing must redact exactly those. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val dirty = Tables.load(s, dir, "documents").withColumn("text",
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com for info")))
        .when(pmod(col("doc_id"), lit(7)) === 1,
          concat(col("text"), lit(" or call 555-867-5309 today")))
        .when(pmod(col("doc_id"), lit(7)) === 2,
          concat(col("text"), lit(" from host 10.0.0.42 logs")))
        .otherwise(col("text")))
    val (clean, n) = scrubbed(col("text"))
    dirty.select(col("doc_id"), clean.as("text"), n.as("redactions"))
      .orderBy(col("doc_id"))
  }

  /** Tokens per span chunk — C4's unit is three sentences; the token-
    * stream fixture has no sentence structure, so a fixed window stands
    * in. */
  val ChunkTokens = 10

  /** Corpus-wide repeated-span dedup: docs rebuilt from the chunks that
    * are each the FIRST occurrence of their exact text (order by
    * (doc_id, pos)). Returns (doc_id, text, n_chunks_kept) for every
    * input doc — a doc whose every chunk was seen before keeps an empty
    * text rather than vanishing. */
  /** (doc_id, pos, chunk): every doc cut into [[ChunkTokens]]-token
    * spans — map-side, the shared front of the span operators (repeated-
    * span dedup here, span-level decontamination in [[Decontam]]). */
  private[ops] def chunked(docs: DataFrame): DataFrame = {
    val k = ChunkTokens
    docs
      .withColumn("_t", split(coalesce(col("text"), lit("")), " "))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(_t) / ${k}.0) AS INT) - 1),
              i -> array_join(slice(_t, i * $k + 1, $k), ' '))""")))
      .toDF("doc_id", "pos", "chunk")
  }

  def dedupSpans(docs: DataFrame): DataFrame = {
    val chunks = chunked(docs)
    val kept = chunks
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("pos"))))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy("doc_id")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, chunk))), x -> x.chunk), ' ')")
          .as("kept_text"),
        count(lit(1)).as("n_kept"))
    docs.select("doc_id")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_chunks_kept"))
  }

  def dedupLines(s: SparkSession, dir: String): DataFrame =
    dedupSpans(Tables.load(s, dir, "documents"))
      .orderBy(col("doc_id"))

  /** Boilerplate grams kept for [[boilerplateScrub]] — production sets
    * this to the size of its curated boilerplate list. */
  val BoilerTopK = 30

  /** Corpus-frequent-span ("boilerplate") scrub — the C4-lineage cleanup
    * that strips navigation chrome, cookie banners and license footers:
    * the [[BoilerTopK]] highest-document-frequency 3-grams are declared
    * boilerplate, and every [[ChunkTokens]]-token span containing one is
    * cut, each doc rebuilt from its surviving spans (the
    * [[Decontam.scrubSpans]] surgery with the corpus's own frequent
    * grams in place of the eval set).
    *
    * Scale shape: document frequency is the distinct-shingle aggregate
    * (map-side partial, one term-keyed shuffle); the boilerplate list is
    * capped to top-K via `TakeOrderedAndProject` (per-partition heaps —
    * never a global sort) so it BROADCASTS regardless of corpus size;
    * span marking is a broadcast semi-join behind the chunk scan; the
    * rebuild is one doc_id-keyed aggregate. A gram occurring in every
    * document costs one aggregate row, never a pair expansion. */
  def boilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val top = Dedup.shingles(docs, 3)
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("sh")).limit(BoilerTopK)
    val chunks = chunked(docs)
    // synthetic chunk key — same bound argument as Decontam.scrubSpans
    val ckey = col("doc_id") * 1048576L + col("pos")
    val bad = Dedup.shingles(
        chunks.select(ckey.as("doc_id"), col("chunk").as("text")), 3)
      .join(broadcast(top.select("sh")), Seq("sh"), "left_semi")
      .select(col("doc_id").as("ckey")).distinct()
    val kept = chunks.withColumn("ckey", ckey)
      .join(bad, Seq("ckey"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, chunk))), x -> x.chunk), ' ')")
          .as("kept_text"),
        count(lit(1)).as("n_kept"))
    val totals = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_total"))
    docs.select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("text"),
        (coalesce(col("n_total"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_cut"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[chunked]] over `tbl` (no leading WITH) — shared
    * with the span-decontamination oracle in [[Decontam]]. */
  private[ops] def chunkCtes(tbl: String): String = s"""
      toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t FROM $tbl),
      chunks AS (
        SELECT doc_id, i AS pos,
          array_to_string(t[(i*$ChunkTokens+1):(i*$ChunkTokens+$ChunkTokens)], ' ') AS chunk
        FROM toks,
          unnest(generate_series(0,
            CAST(ceil(len(t) / ${ChunkTokens}.0) AS INT) - 1)) AS u(i))"""

  /** Masking rate (percent) and the BERT 80/10/10 action split for
    * [[mlmMask]]. */
  val MaskPct = 15L

  /** Deterministic masked-LM corruption (the BERT recipe): each token
    * position draws masked with probability [[MaskPct]]%; a masked
    * position becomes `[MASK]` 80% of the time, a RANDOM vocabulary
    * token 10%, and keeps its token 10%. Every draw is the same
    * engine-exact multiplicative hash the samplers use, keyed by the
    * synthetic (doc, position) key — so the corruption is exactly
    * reproducible, append-stable, and re-runs never re-roll (the
    * property that makes an MLM dataset cacheable).
    *
    * Scale shape: pure map-side hash arithmetic fused behind the token
    * explode, plus ONE broadcast join against the capped
    * [[Retrieval.TokenizeVocabV]]-row vocabulary for the random-token
    * replacement — zero corpus shuffles. */
  def mlmMask(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val occ = d.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")))
      .toDF("doc_id", "pos", "term")
      .filter(length(col("term")) > 0)
      // same synthetic-key bound argument as Decontam.scrubSpans
      .withColumn("mk", col("doc_id") * 1048576L + col("pos"))
      // independent draws from large-odd-offset keys of the same hash
      .withColumn("mk2", col("mk") + 999999937L)
      .withColumn("mk3", col("mk") + 777767777L)
    val masked = occ
      .withColumn("d1", expr(Sampling.drawSqlModOn("mk", 100)))
      .withColumn("d2", expr(Sampling.drawSqlModOn("mk2", 10)))
      .withColumn("rid", expr(
        Sampling.drawSqlModOn("mk3", Retrieval.TokenizeVocabV.toLong)))
      .withColumn("action",
        when(col("d1") >= MaskPct, "none")
          .when(col("d2") <= 7, "mask")
          .when(col("d2") === 8, "random")
          .otherwise("keep"))
    // the same capped vocab the tokenizer broadcasts (count desc, term)
    val vocab = occ.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(Retrieval.TokenizeVocabV)
      .withColumn("rid",
        row_number().over(
          Window.orderBy(col("c").desc, col("term"))).cast("long") - 1)
      .select(col("rid"), col("term").as("rnd_term"))
    masked.join(broadcast(vocab), Seq("rid"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("term"),
        col("action"),
        when(col("action") === "mask", lit("[MASK]"))
          .when(col("action") === "random", col("rnd_term"))
          .otherwise(col("term")).as("replacement"))
      .orderBy("doc_id", "pos")
  }

  /** Text normalization — the canonical pre-dedup cleanup (C4/CCNet
    * lineage): lowercase, non-alphanumerics to spaces, whitespace
    * collapsed, trimmed; plus the post-normalization token count. Pure
    * map-side column expressions fused behind the scan — zero shuffles
    * at any corpus size. Patterns live in the Java∩RE2 common subset so
    * the oracle runs the identical text. */
  def normalize(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val t = trim(regexp_replace(regexp_replace(
      lower(coalesce(col("text"), lit(""))), "[^a-z0-9 ]", " "), " +", " "))
    d.select(col("doc_id"), t.as("text"),
        when(length(t) === 0, lit(0L))
          .otherwise(size(split(t, " ")).cast("long")).as("n_tokens"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_normalize" -> (normalize _),
    "text_pii_scrub" -> (piiScrub _),
    "dedup_lines" -> (dedupLines _),
    "text_boilerplate_scrub" -> (boilerplateScrub _),
    "text_mlm_mask" -> (mlmMask _))

  val oracle: Map[String, String] = Map(
    "text_normalize" -> """
      WITH norm AS (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text
        FROM documents)
      SELECT doc_id, text,
        CAST(CASE WHEN length(text) = 0 THEN 0
             ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_tokens
      FROM norm ORDER BY doc_id""",
    "text_pii_scrub" -> s"""
      WITH dirty AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
                 CAST(doc_id AS VARCHAR) || '@example.com for info'
               WHEN doc_id % 7 = 1 THEN text || ' or call 555-867-5309 today'
               WHEN doc_id % 7 = 2 THEN text || ' from host 10.0.0.42 logs'
               ELSE text END AS text
        FROM documents)
      , s1 AS (
        SELECT doc_id,
          regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t,
          len(regexp_extract_all(text, '$EmailRe')) AS c1
        FROM dirty),
      s2 AS (
        SELECT doc_id,
          regexp_replace(t, '$PhoneRe', '<PHONE>', 'g') AS t,
          c1, len(regexp_extract_all(t, '$PhoneRe')) AS c2
        FROM s1)
      SELECT doc_id,
        regexp_replace(t, '$IpRe', '<IP>', 'g') AS text,
        CAST(c1 + c2 + len(regexp_extract_all(t, '$IpRe')) AS BIGINT) AS redactions
      FROM s2 ORDER BY doc_id""",
    "dedup_lines" -> s"""
      WITH ${chunkCtes("documents")},
      kept AS (
        SELECT doc_id, pos, chunk,
          ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        FROM chunks),
      rebuilt AS (
        SELECT doc_id,
          string_agg(chunk, ' ' ORDER BY pos) AS kept_text,
          CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept WHERE rn = 1 GROUP BY doc_id)
      SELECT d.doc_id,
        COALESCE(r.kept_text, '') AS text,
        COALESCE(r.n_kept, 0) AS n_chunks_kept
      FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
      ORDER BY d.doc_id""",
    "text_boilerplate_scrub" -> s"""
      WITH ${Dedup.shingleCtes("documents", 3)},
      dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
      top AS (SELECT s FROM dfreq ORDER BY df DESC, s LIMIT $BoilerTopK),
      ctoks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') ct
        FROM documents),
      chunks AS (
        SELECT doc_id, i AS pos,
          array_to_string(ct[(i*$ChunkTokens+1):(i*$ChunkTokens+$ChunkTokens)], ' ') AS chunk
        FROM ctoks,
          unnest(generate_series(0,
            CAST(ceil(len(ct) / ${ChunkTokens}.0) AS INT) - 1)) AS u(i)),
      cg AS (SELECT doc_id, pos, string_split(chunk, ' ') AS g FROM chunks),
      cs0 AS (SELECT doc_id, pos, g,
                unnest(generate_series(1, greatest(len(g) - 2, 0))) AS i
              FROM cg),
      bad AS (SELECT DISTINCT doc_id, pos FROM cs0
              WHERE g[i] || ' ' || g[i+1] || ' ' || g[i+2]
                IN (SELECT s FROM top)),
      kept AS (SELECT c.doc_id, c.pos, c.chunk FROM chunks c
               LEFT JOIN bad b ON c.doc_id = b.doc_id AND c.pos = b.pos
               WHERE b.doc_id IS NULL),
      rebuilt AS (
        SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS kept_text,
          CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY 1),
      tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total
              FROM chunks GROUP BY 1)
      SELECT d.doc_id, COALESCE(kept_text, '') AS text,
        COALESCE(n_total, 0) - COALESCE(n_kept, 0) AS n_cut
      FROM documents d
      LEFT JOIN tot USING (doc_id) LEFT JOIN rebuilt USING (doc_id)
      ORDER BY d.doc_id""",
    "text_mlm_mask" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t
        FROM documents),
      occ AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS term,
          doc_id * 1048576 + (i - 1) AS mk
        FROM toks, unnest(generate_series(1, len(t))) AS u(i)
        WHERE length(t[i]) > 0),
      drawn AS (
        SELECT doc_id, pos, term,
          (${Sampling.drawDuckModOn("mk", 100)}) AS d1,
          (${Sampling.drawDuckModOn("(mk + 999999937)", 10)}) AS d2,
          (${Sampling.drawDuckModOn(
            "(mk + 777767777)", Retrieval.TokenizeVocabV.toLong)}) AS rid
        FROM occ),
      acted AS (
        SELECT doc_id, pos, term, rid,
          CASE WHEN d1 >= ${MaskPct} THEN 'none'
               WHEN d2 <= 7 THEN 'mask'
               WHEN d2 = 8 THEN 'random'
               ELSE 'keep' END AS action
        FROM drawn),
      vocab AS (
        SELECT CAST(row_number() OVER (ORDER BY c DESC, term) - 1 AS BIGINT)
            AS rid, term AS rnd_term
        FROM (SELECT term, COUNT(*) AS c FROM occ GROUP BY 1
              ORDER BY c DESC, term LIMIT ${Retrieval.TokenizeVocabV}))
      SELECT a.doc_id, a.pos, a.term, a.action,
        CASE WHEN a.action = 'mask' THEN '[MASK]'
             WHEN a.action = 'random' THEN v.rnd_term
             ELSE a.term END AS replacement
      FROM acted a LEFT JOIN vocab v USING (rid)
      ORDER BY a.doc_id, a.pos""")
}
