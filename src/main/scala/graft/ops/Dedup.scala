package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for LLM data pipelines (SURVEY §7.5):
  *
  *  - exact: hash-groupBy on a content fingerprint — one shuffle on the
  *    md5 key; at 100 TB this is the classic map-side-combine dedup.
  *  - n-gram Jaccard (brute): shingle self-join — the exact baseline.
  *    O(pairs-sharing-a-shingle); used to verify the scale path.
  *  - MinHash+LSH: k=128 hash functions, 32 bands × 4 rows; candidates
  *    only where a band collides, then exact-Jaccard verification of the
  *    (tiny) candidate set. This is the 100 TB path: cost is
  *    O(docs·shingles·k) map-side + one shuffle on (band, bandkey),
  *    never all-pairs.
  *  - SimHash: 64-bit sign-aggregated token hashes; near-dup = small
  *    Hamming distance.
  */
object Dedup {

  /** Distinct word n-gram shingles per document: (doc_id, sh). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(expr(
        s"""transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 0)),
            i -> array_join(slice(split(text, ' '), i, $n), ' '))"""))).as("sh"))

  /** Exact all-pairs Jaccard ≥ threshold via shingle self-join. */
  def jaccardPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("szi")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("sz").as("szj")), "j")
      .withColumn("jaccard", round(col("c") / (col("szi") + col("szj") - col("c")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  // ------------------------------------------------------------- MinHash

  val NumHashes = 128
  val Bands = 32 // → 4 rows per band
  private val MersennePrime = 2147483647L // 2^31-1
  /** Deterministic hash-family coefficients (fixed seed). */
  private lazy val coeffs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(1234)
    Seq.fill(NumHashes)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Per-doc minhash signature rows: (doc_id, pos, mh). */
  def minhash(sh: DataFrame): DataFrame = {
    val coeffArray = coeffs.map { case (a, b) => s"struct(${a}L AS a, ${b}L AS b)" }
      .mkString("array(", ",", ")")
    sh
      .withColumn("h0", (hash(col("sh")).cast("long") + 2147483648L)) // [0, 2^32)
      .select(col("doc_id"),
        posexplode(expr(s"transform($coeffArray, c -> pmod(c.a * h0 + c.b, ${MersennePrime}L))"))
          .as(Seq("pos", "hv")))
      .groupBy("doc_id", "pos").agg(min("hv").as("mh"))
  }

  /** LSH candidate pairs: docs colliding in ≥1 band. */
  def lshCandidates(sig: DataFrame): DataFrame = {
    val banded = sig
      .withColumn("band", expr(s"pos div ${NumHashes / Bands}"))
      .groupBy("doc_id", "band")
      .agg(expr("hash(sort_array(collect_list(struct(pos, mh))))").as("bk"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
  }

  /** MinHash-LSH near-dup: candidates verified by exact Jaccard. Same
    * output contract as [[jaccardPairs]] — at the fixture's clean
    * similarity separation (planted ≥0.9, background <0.3) the result is
    * identical with overwhelming probability, so it shares the oracle. */
  def minhashLsh(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(docs).persist()
    val cand = lshCandidates(minhash(sh))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val interC = cand
      .join(sh.select(col("doc_id").as("i"), col("sh").as("sha")), "i")
      .join(sh.select(col("doc_id").as("j"), col("sh").as("shb")), "j")
      .filter(col("sha") === col("shb"))
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
    interC
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("szi")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("sz").as("szj")), "j")
      .withColumn("jaccard", round(col("c") / (col("szi") + col("szj") - col("c")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc: sign-aggregate of xxhash64 over 3-gram
    * shingles. Shingles, not unigrams: with a small vocabulary every doc
    * contains nearly every word, so unigram *sets* are identical across
    * unrelated docs and unigram-simhash collapses (observed: 444
    * hamming-0 false pairs on the fixture corpus). */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = shingles(docs)
      .withColumn("h", xxhash64(col("sh")))
    val bitSums: Seq[Column] = (0 until 64).map(j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sig.as("sim"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val s = simhash(docs)
    s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", bit_count(col("a.sim").bitwiseXOR(col("b.sim"))))
      .filter(col("hamming") <= maxDist)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"), col("hamming"))
  }

  // ------------------------------------------------------------- queries

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("fp"))

  def dedupJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(shingles(Tables.load(s, dir, "documents")), 0.7)
      .orderBy(col("i"), col("j"))

  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashLsh(Tables.load(s, dir, "documents"), 0.7)
      .orderBy(col("i"), col("j"))

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.load(s, dir, "documents"), 10)
      .orderBy(col("i"), col("j"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_jaccard_pairs" -> (dedupJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _))

  private val jaccardOracle = """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      sh0 AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
              FROM toks),
      sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
      sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
      inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      jc AS (SELECT i, j, ROUND(c*1.0/(sa.sz + sb.sz - c), 6) AS jaccard
             FROM inter JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id)
      SELECT i, j, jaccard FROM jc WHERE jaccard >= 0.7 ORDER BY i, j"""

  /** dedup_simhash has no SQL-expressible oracle (xxhash64 is
    * Spark-specific) → rows-only check; covered by DedupSpec instead. */
  val oracle: Map[String, String] = Map(
    "dedup_exact" -> """
      SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n
      FROM documents GROUP BY 1 ORDER BY fp""",
    "dedup_jaccard_pairs" -> jaccardOracle,
    "dedup_minhash_lsh" -> jaccardOracle)
}
