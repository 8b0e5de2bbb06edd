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

  /** Distinct word n-gram shingles per document: (doc_id, sh).
    * Repartitions first: the source is a single small parquet file → one
    * scan partition, which would serialize all downstream hashing onto
    * one core (observed 4× slowdown at sf0.1). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    // typed flatMap, not SQL higher-order functions: the HOF formulation
    // (transform+slice+array_join+array_distinct) evaluates its lambdas
    // interpreted — 35 CPU-s at sf0.1 vs ~1 CPU-s compiled.
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(' ')
        if (toks.length < n) Iterator.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet[String].iterator.map(sh => (id, sh))
      }
      .toDF("doc_id", "sh")
  }

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

  val NumHashes = 64
  val Bands = 16 // → 4 rows per band; P(candidate | j=0.9) ≈ 1 - 3e-8

  /** Per-doc minhash signature: (doc_id, mins array<long>[k]).
    *
    * Shape chosen for codegen economy: a 128-wide min-aggregate compiles
    * an enormous generated class per query (Janino time dominated the
    * sf0.1 bench), so instead the per-doc shingle hashes are gathered
    * with collect_list (ObjectHashAggregate — no codegen blowup; shingle
    * count per doc is bounded ~100) and the k mins fold over that array
    * in one compact expression. */
  def minhash(sh: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    val agg = Shim.column(MinHashAgg(
      Shim.expression(hash(col("sh")).cast("long")), NumHashes, 1234)
      .toAggregateExpression())
    sh.groupBy("doc_id").agg(agg.as("mins"))
  }

  /** LSH candidate pairs: docs colliding in ≥1 band (band key = murmur
    * hash of that band's signature slice). Pairs come from grouping on
    * (band, key) — no self-join; bucket occupancy is small by design.
    * Band keying and pair expansion are typed flatMaps (compiled). */
  def lshCandidates(sig: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    val r = NumHashes / Bands
    val nBands = Bands
    val banded = sig.as[(Long, Seq[Long])].flatMap { case (id, mins) =>
      (0 until nBands).iterator.map { b =>
        (b, scala.util.hashing.MurmurHash3.orderedHash(mins.slice(b * r, b * r + r)), id)
      }
    }.toDF("band", "bk", "doc_id")
    banded.groupBy("band", "bk").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val s = ids.sorted
        for (x <- s.iterator; y <- s if x < y) yield (x, y)
      }
      .toDF("i", "j")
      .distinct()
  }

  /** MinHash-LSH near-dup: candidates verified by exact Jaccard. Same
    * output contract as [[jaccardPairs]] — at the fixture's clean
    * similarity separation (planted ≥0.9, background <0.3) the result is
    * identical with overwhelming probability, so it shares the oracle. */
  def minhashLsh(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(docs).persist()
    val cand = lshCandidates(minhash(sh)).persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // restrict shingles to candidate docs first (broadcast semi-join) so
    // the verification join touches only the candidate set
    val candIds = cand.select(col("i").as("doc_id"))
      .unionByName(cand.select(col("j").as("doc_id"))).distinct()
    val shC = sh.join(broadcast(candIds), "doc_id").persist()
    val interC = cand
      .join(shC.select(col("doc_id").as("i"), col("sh").as("sha")), "i")
      .join(shC.select(col("doc_id").as("j"), col("sh").as("shb")), "j")
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
    import org.apache.spark.sql.graftshim.Shim
    val agg = Shim.column(SimHashAgg(
      Shim.expression(xxhash64(col("sh")))).toAggregateExpression())
    shingles(docs).groupBy("doc_id").agg(agg.as("sim"))
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
