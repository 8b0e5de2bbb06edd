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
  *  - MinHash+LSH: k=64 hash functions, 16 bands × 4 rows; candidates
  *    only where a band collides, then exact-Jaccard verification of the
  *    (tiny) candidate set. This is the 100 TB path: cost is
  *    O(docs·shingles·k) map-side + one shuffle on (band, bandkey),
  *    never all-pairs.
  *  - SimHash: 64-bit sign-aggregated shingle hashes; near-dup = small
  *    Hamming distance, paired via pigeonhole banding (no all-pairs).
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
    * Shape chosen for codegen economy: a k-wide column-per-hash
    * min-aggregate compiles an enormous generated class per query
    * (Janino time dominated the sf0.1 bench), so the k=64 mins are
    * folded in a single [[MinHashAgg]] TypedImperativeAggregate whose
    * buffer is one long[k] — ObjectHashAggregate, no codegen blowup,
    * map-side partial merge. */
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

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, via
    * pigeonhole banding: the 64-bit signature splits into maxDist+1
    * bands, so any pair within maxDist collides exactly on ≥1 band.
    * Pairs come from grouping on (band, bits) — the same shape as the
    * MinHash LSH path, never an all-pairs join — and Hamming is verified
    * only inside buckets. Cost scales with bucket occupancy (shuffle on
    * the band key), not n²; for production corpora prefer small maxDist
    * (e.g. 3 → 4×16-bit bands, the classic 64-bit fingerprint setup)
    * since band width shrinks as maxDist grows. */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val nBands = maxDist + 1
    val banded = simhash(docs).as[(Long, Long)].flatMap { case (id, sim) =>
      (0 until nBands).iterator.map { b =>
        val lo = b * 64 / nBands
        val width = (b + 1) * 64 / nBands - lo
        val bits = (sim >>> lo) & (if (width == 64) -1L else (1L << width) - 1L)
        (b, bits, id, sim)
      }
    }.toDF("band", "bits", "doc_id", "sim")
    banded.groupBy("band", "bits")
      .agg(collect_list(struct(col("doc_id"), col("sim"))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(col("xs")).as[Seq[(Long, Long)]]
      .flatMap { xs =>
        val sorted = xs.sortBy(_._1)
        for {
          a <- sorted.iterator
          b <- sorted if a._1 < b._1
          d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= maxDist
        } yield (a._1, b._1, d)
      }
      .toDF("i", "j", "hamming")
      .distinct()
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

  /** Gate row: recall of simhash(maxDist=10) against the exact
    * jaccard≥0.7 truth — `hits` is deterministic (seeded data, exact
    * Hamming), so the DuckDB oracle asserts it by value; the pair
    * listing itself is cross-checked in OpsSpec/DedupSpec. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val truePairs = jaccardPairs(shingles(docs), 0.7).select("i", "j").persist()
    truePairs.join(simhashPairs(docs, 10).select("i", "j"), Seq("i", "j"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .crossJoin(truePairs.agg(count(lit(1)).as("n_true")))
      .select(col("n_true"), col("hits"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_jaccard_pairs" -> (dedupJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _))

  private val jaccardCtes = """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      sh0 AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
              FROM toks),
      sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
      sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
      inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      jc AS (SELECT i, j, ROUND(c*1.0/(sa.sz + sb.sz - c), 6) AS jaccard
             FROM inter JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id)"""

  private val jaccardOracle =
    s"$jaccardCtes SELECT i, j, jaccard FROM jc WHERE jaccard >= 0.7 ORDER BY i, j"

  /** dedup_simhash: the simhash bits are Spark-side (xxhash64), so the
    * oracle asserts the deterministic recall count against the exact
    * jaccard truth instead of the pair list. */
  val oracle: Map[String, String] = Map(
    "dedup_exact" -> """
      SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n
      FROM documents GROUP BY 1 ORDER BY fp""",
    "dedup_jaccard_pairs" -> jaccardOracle,
    "dedup_minhash_lsh" -> jaccardOracle,
    "dedup_simhash" -> s"""$jaccardCtes
      SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
        CAST(25 AS BIGINT) AS hits
      FROM jc WHERE jaccard >= 0.7""")
}
