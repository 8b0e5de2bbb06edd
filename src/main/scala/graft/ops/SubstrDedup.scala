package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Unaligned duplicated-substring detection — the ExactSubstr recipe of
  * Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  * Better" (arXiv:2107.06499), re-expressed for Spark.
  *
  * The paper builds a suffix array over the concatenated corpus and
  * reports every ≥L-token substring that occurs twice. Suffix arrays
  * don't distribute, but the same spans fall out of a k-gram inverted
  * index: a token position p of a doc is *covered* iff the k tokens
  * starting at p occur somewhere else in the corpus, and a maximal run
  * of r consecutive covered positions is a maximal span of r + k - 1
  * tokens in which EVERY k-token window is duplicated. That is the
  * standard scalable approximation of the suffix-array output: each
  * reported window is a genuine corpus duplicate; the full span is the
  * union of overlapping duplicated windows (which a suffix array would
  * report piecewise too when the copies come from different places).
  *
  * Unlike [[Scrub.dedupSpans]] (fixed ALIGNED chunks — C4's unit), the
  * windows here slide one token at a time, so a copy that starts
  * mid-chunk is still found. This is the detector; the chunk-aligned
  * scrubbers remain the cutting policy.
  *
  * Scale shape (100 TB): gram extraction is a compiled typed flatMap
  * behind the scan (map-side, like [[Dedup.shingles]]); the duplicated-
  * gram set is ONE gram-keyed aggregate with map-side partial
  * combine — a gram occurring a million times costs one row out of the
  * partial agg, never a pair expansion (the skew-safe alternative to a
  * per-gram window count, which would buffer the hot gram's million
  * rows in one window partition); coverage marking is a semi-join on
  * the gram key; the run merge is a doc-bounded window. No self-join,
  * no driver-side state.
  */
object SubstrDedup {

  /** Window width in tokens. Lee et al. use 50 over byte-level tokens;
    * the fixture docs are 10–99 whitespace tokens, so 8 keeps the
    * regime (window ≪ doc ≪ corpus) while exercising real overlap. */
  val GramK = 8

  /** (doc_id, pos, g): every k-token window of every doc with its start
    * position. Compiled flatMap — the SQL higher-order-function
    * formulation evaluates its lambdas interpreted (see
    * [[Dedup.shingles]], which measured 35×). */
  private[graft] def gramPositions(docs: DataFrame, k: Int = GramK): DataFrame = {
    import docs.sparkSession.implicits._
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val narrow = docs.select(col("doc_id"), col("text"))
    val spread =
      if (narrow.rdd.getNumPartitions < p) narrow.repartition(p) else narrow
    spread.as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = if (text == null) Array.empty[String] else text.split(' ')
        if (toks.length < k) Iterator.empty
        else toks.sliding(k).zipWithIndex.map {
          case (w, i) => (id, i.toLong, w.mkString(" "))
        }
      }
      .toDF("doc_id", "pos", "g")
  }

  /** Start positions whose k-gram occurs more than once corpus-wide.
    * Shared front of [[substrSpans]] and [[dupFraction]]. */
  private def coveredPositions(g: DataFrame): DataFrame = {
    val dup = g.groupBy("g").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1L).select("g")
    g.join(dup, Seq("g"), "left_semi")
  }

  /** Maximal duplicated spans: (doc_id, start, n_tokens), every
    * [[GramK]]-token window inside the span occurring ≥2 times in the
    * corpus (self-repeats included, as in the paper). */
  def substrSpans(s: SparkSession, dir: String): DataFrame =
    substrSpansOf(Tables.load(s, dir, "documents"))

  private[graft] def substrSpansOf(docs: DataFrame): DataFrame = {
    val marked = coveredPositions(gramPositions(docs))
    // gaps-and-islands: consecutive covered positions share (pos - rank)
    val isl = marked.withColumn("island",
      col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    isl.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("start"),
        (count(lit(1)) + lit((GramK - 1).toLong)).as("n_tokens"))
      .select(col("doc_id"), col("start"), col("n_tokens"))
      .orderBy(col("doc_id"), col("start"))
  }

  /** Per-doc inter-document repetition signal: the fraction of a doc's
    * k-gram windows that occur elsewhere in the corpus — the
    * document-level quality column the span detector implies (a doc
    * that is mostly duplicated substance scores near 1 and is a
    * near-free dedup candidate even when no single chunk matches).
    * Docs shorter than [[GramK]] tokens have no windows and score 0. */
  def dupFraction(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val g = gramPositions(docs)
    val per = coveredPositions(g)
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    val tot = g.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    docs.select("doc_id")
      .join(tot, Seq("doc_id"), "left")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0L)) /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)), 6)
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** The cutting policy over [[substrSpans]]' detection — Lee et al.'s
    * "remove all but one occurrence": a window is *foreign* iff its
    * k-gram occurs more than once corpus-wide and this (doc, pos) is
    * not the gram's first occurrence (min by (doc_id, pos)); every
    * token covered by a foreign window is cut and each doc is rebuilt
    * from its surviving tokens. The first copy of a duplicated span
    * keeps its text verbatim; later copies (and later self-repeats
    * inside the same doc) lose exactly the duplicated substance, with
    * unique flanks preserved to the token.
    *
    * Scale shape: the first-occurrence table is the SAME single
    * gram-keyed aggregate as the detector (min over a (doc_id, pos)
    * struct is partial-aggregable — a million-copy gram still costs
    * one row); marking joins grams to that table on the gram key;
    * token coverage is a bounded ≤k-fold explode deduped per
    * (doc, token); the rebuild is one doc-keyed aggregate. Never a
    * corpus self-join. */
  def substrScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val g = gramPositions(docs)
    val firsts = g.groupBy("g")
      .agg(count(lit(1)).as("n"),
        min(struct(col("doc_id"), col("pos"))).as("f"))
      .filter(col("n") > 1L)
      .select(col("g"), col("f.doc_id").as("fdoc"), col("f.pos").as("fpos"))
    val foreign = g.join(firsts, Seq("g"))
      .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
    val cut = foreign.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit((GramK - 1).toLong))).as("tp"))
      .distinct()
    val toks = docs.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")))
      .toDF("doc_id", "tp", "tok")
      .withColumn("tp", col("tp").cast("long"))
    val kept = toks.join(cut, Seq("doc_id", "tp"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(tp, tok))), x -> x.tok), ' ')")
          .as("kept_text"),
        count(lit(1)).as("n_kept"))
    val totals = toks.groupBy("doc_id").agg(count(lit(1)).as("n_total"))
    docs.select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("text"),
        (coalesce(col("n_total"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_cut"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_substr_spans" -> (substrSpans _),
    "dedup_substr_scrub" -> (substrScrub _),
    "quality_dup_fraction" -> (dupFraction _))

  /** DuckDB twin of [[gramPositions]] + [[coveredPositions]] (no
    * leading WITH). */
  private val gramCtes = s"""
      toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t FROM documents),
      grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
          array_to_string(t[(i+1):(i+$GramK)], ' ') AS g
        FROM toks, unnest(generate_series(0, len(t) - $GramK)) u(i)
        WHERE len(t) >= $GramK),
      dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
      marked AS (
        SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup))"""

  val oracle: Map[String, String] = Map(
    "dedup_substr_spans" -> s"""
      WITH $gramCtes,
      isl AS (
        SELECT doc_id, pos,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM marked)
      SELECT doc_id, MIN(pos) AS start,
        COUNT(*) + ${GramK - 1} AS n_tokens
      FROM isl GROUP BY doc_id, island
      ORDER BY doc_id, start""",
    "dedup_substr_scrub" -> s"""
      WITH toks AS (
        SELECT doc_id, string_split(COALESCE(text, ''), ' ') t FROM documents),
      grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
          array_to_string(t[(i+1):(i+$GramK)], ' ') AS g
        FROM toks, unnest(generate_series(0, len(t) - $GramK)) u(i)
        WHERE len(t) >= $GramK),
      firsts AS (
        SELECT g, doc_id AS fdoc, pos AS fpos FROM (
          SELECT g, doc_id, pos,
            row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
            count(*) OVER (PARTITION BY g) AS n
          FROM grams)
        WHERE rn = 1 AND n > 1),
      frn AS (
        SELECT gr.doc_id, gr.pos FROM grams gr JOIN firsts f ON gr.g = f.g
        WHERE NOT (gr.doc_id = f.fdoc AND gr.pos = f.fpos)),
      cut AS (
        SELECT DISTINCT doc_id, pos + i AS tp
        FROM frn, unnest(generate_series(0, ${GramK - 1})) u(i)),
      tokstream AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS tp, t[i] AS tok
        FROM toks, unnest(generate_series(1, len(t))) u(i)),
      kept AS (
        SELECT ts.doc_id, ts.tp, ts.tok FROM tokstream ts
        WHERE NOT EXISTS (
          SELECT 1 FROM cut c WHERE c.doc_id = ts.doc_id AND c.tp = ts.tp)),
      reb AS (
        SELECT doc_id, array_to_string(list(tok ORDER BY tp), ' ') AS kept_text,
          count(*) AS n_kept
        FROM kept GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_total FROM tokstream GROUP BY doc_id)
      SELECT d.doc_id,
        COALESCE(reb.kept_text, '') AS text,
        CAST(COALESCE(tot.n_total, 0) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_cut
      FROM documents d
      LEFT JOIN tot ON d.doc_id = tot.doc_id
      LEFT JOIN reb ON d.doc_id = reb.doc_id
      ORDER BY d.doc_id""",
    "quality_dup_fraction" -> s"""
      WITH $gramCtes,
      per AS (SELECT doc_id, count(*) AS n_dup FROM marked GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
      SELECT d.doc_id,
        COALESCE(tot.n_grams, 0) AS n_grams,
        COALESCE(per.n_dup, 0) AS n_dup,
        ROUND(COALESCE(per.n_dup, 0) /
          GREATEST(COALESCE(tot.n_grams, 0), 1), 6) AS dup_frac
      FROM documents d
      LEFT JOIN tot ON d.doc_id = tot.doc_id
      LEFT JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id""")
}
