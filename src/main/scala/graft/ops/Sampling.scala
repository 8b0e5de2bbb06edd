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
  private[ops] val DrawSql =
    "pmod(pmod(doc_id, 2147483648) * 2654435761, 4294967296) % 100"
  private[ops] val DrawDuck =
    "(((((doc_id % 2147483648) + 2147483648) % 2147483648) " +
      "* 2654435761) % 4294967296) % 100"

  /** Per-language keep rates (percent): the shape of a quality-weighted
    * training mix over the fixture corpus's language strata. */
  val Rates: Seq[(String, Int)] = Seq(("en", 100), ("de", 50), ("fr", 25))
  val DefaultRate = 10

  /** The per-language keep-rate column (percent), Spark side. */
  private[ops] def rateCol: org.apache.spark.sql.Column =
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
    val rate = Rates.foldLeft(lit(DefaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs
      .withColumn("draw", expr(DrawSql))
      .withColumn("rate", rate)
      .filter(col("draw") < col("rate"))
      .select(col("doc_id"), col("lang"), col("draw").cast("long").as("draw"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_stratified" -> (sampleStratified _))

  val oracle: Map[String, String] = Map(
    "sample_stratified" -> s"""
      SELECT doc_id, lang, CAST($DrawDuck AS BIGINT) AS draw
      FROM documents
      WHERE $DrawDuck < $RateDuck
      ORDER BY doc_id""")
}
