package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-shard assignment — the "write the curated corpus as N
  * balanced output shards" step at the end of every data pipeline —
  * built on a GLOBAL row number that scales.
  *
  * The naive spelling, `row_number() OVER (ORDER BY …)` with no
  * PARTITION BY, is correct and useless at 100 TB: Spark plans an empty
  * partition spec as ONE window task, so the whole corpus funnels
  * through a single executor thread. The scalable form is the
  * distributed zipWithIndex pattern, in DataFrame terms:
  *
  *  1. `repartitionByRange` + `sortWithinPartitions` on the sort key —
  *     a normal distributed range sort (the same machinery as a global
  *     ORDER BY, parallel in both shuffle and sort);
  *  2. one TINY per-partition count aggregate (numPartitions rows to the
  *     driver) → cumulative offsets, broadcast back;
  *  3. `row_number()` windowed BY PARTITION ID (parallel — one window
  *     task per range partition, not one total) + the partition's
  *     offset.
  *
  * The materialized range partitioning is pinned with a localCheckpoint
  * so the count pass and the output pass see the SAME boundaries —
  * recomputing the range exchange could re-sample them between jobs and
  * skew every offset.
  *
  * Shards are then assigned round-robin on the rank, ordered by
  * descending token count: consecutive ranks land on different shards,
  * so each of the N shards receives near-identical token mass (the
  * greedy "longest processing time" heuristic's streaming cousin) while
  * staying a pure function of the sorted position — deterministic,
  * re-runnable, and exactly what the DuckDB oracle computes. */
object Sharding {

  /** Output shard count for the gate — production sets this to the
    * target file count (e.g. corpus tokens / 100M-token shard). */
  val NumShards = 8

  /** (df + `rank` BIGINT): 1-based global row number under `order`,
    * computed with per-range-partition parallelism. `order` must be a
    * TOTAL order (tie-break on a key) for the result to be
    * deterministic. */
  def globalRowNumber(df: DataFrame, order: Seq[Column]): DataFrame = {
    val parted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin boundaries across the two consuming jobs
    val spark = df.sparkSession
    import spark.implicits._
    // numPartitions rows — the only driver-side data in the pattern
    val counts = parted.groupBy("_pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, c)) => (pid, acc + c)
    }.sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    val offsetDf = offsets.toDF("_pid", "_offset")
    parted
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn("rank",
        (col("_offset") +
          row_number().over(
            Window.partitionBy(col("_pid")).orderBy(order: _*)).cast("long")))
      .drop("_pid", "_offset")
  }

  /** (df + `out` BIGINT): inclusive prefix sum of `value` under `order`
    * — same two-pass shape as [[globalRowNumber]] (range partition, a
    * numPartitions-row sum aggregate broadcast back as exclusive
    * offsets, then a per-partition running sum windowed BY PARTITION
    * ID). The one-task `SUM(…) OVER (ORDER BY …)` global window never
    * appears. */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                      out: String): DataFrame = {
    val parted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", value.cast("long"))
      .localCheckpoint() // pin boundaries across the two consuming jobs
    val spark = df.sparkSession
    import spark.implicits._
    val sums = parted.groupBy("_pid").agg(sum(col("_v")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, s)) => (pid, acc + s)
    }.sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    val offsetDf = offsets.toDF("_pid", "_offset")
    parted
      .join(broadcast(offsetDf), Seq("_pid"))
      .withColumn(out,
        col("_offset") + sum(col("_v")).over(
          Window.partitionBy(col("_pid")).orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_pid", "_offset", "_v")
  }

  /** Deterministic-shuffle draw: the same Knuth multiplicative hash the
    * samplers use ([[Sampling.drawSqlMod]]) at full 2³² range, so the
    * oracle engine computes the identical permutation. */
  private[graft] val ShuffleDrawSql = Sampling.drawSqlMod(4294967296L)
  private[ops] val ShuffleDrawDuck = Sampling.drawDuckMod(4294967296L)

  /** Token budget per packed training batch for [[packBatches]]. */
  val PackBudget = 2000L

  /** Gate: the training-order shuffle — every document's position under
    * a deterministic pseudo-random permutation (hash draw, doc_id
    * tie-break), computed with [[globalRowNumber]] parallelism. Unlike
    * `ORDER BY rand()`, re-runs and appends never reorder history. */
  def corpusShuffle(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id")).withColumn("draw", expr(ShuffleDrawSql))
    globalRowNumber(docs, Seq(col("draw").asc, col("doc_id").asc))
      .withColumnRenamed("rank", "pos")
      .select("doc_id", "draw", "pos")
      .orderBy("doc_id")
  }

  /** Gate: greedy sequence packing — walk the shuffled order, assign
    * each document to the [[PackBudget]]-token batch its running total
    * starts in (`(cum - n_tokens) div budget`: the standard
    * deterministic first-fit that lets a long doc spill its batch
    * rather than re-sort). The running total is [[globalPrefixSum]],
    * so packing a 100 TB corpus is two shuffles and a broadcast — no
    * single-task window, no driver-side walk. */
  def packBatches(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val base = docs.select(col("doc_id"), nTok.as("n_tokens"))
      .withColumn("draw", expr(ShuffleDrawSql))
    globalPrefixSum(base, Seq(col("draw").asc, col("doc_id").asc),
      col("n_tokens"), "cum_tokens")
      .withColumn("batch_id",
        expr(s"(cum_tokens - n_tokens) div $PackBudget"))
      .select("doc_id", "n_tokens", "cum_tokens", "batch_id")
      .orderBy("doc_id")
  }

  /** Gate: every document's (rank, shard) under descending-token-count
    * round-robin packing into [[NumShards]] shards. */
  def shardAssign(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val nTok = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
    val withTok = docs.select(col("doc_id"), nTok.as("n_tokens"))
    globalRowNumber(withTok, Seq(col("n_tokens").desc, col("doc_id").asc))
      .withColumn("shard", pmod(col("rank") - 1, lit(NumShards.toLong)))
      .select("doc_id", "n_tokens", "rank", "shard")
      .orderBy("doc_id")
  }

  /** Validation-split percent for [[splitLeakage]]. */
  val ValPct = 30L

  /** Train/validation split leakage audit — the check every training
    * pipeline owes its eval set: a doc-keyed hash split puts the two
    * halves of a near-duplicate pair on OPPOSITE sides of the split
    * (the val set "leaks" into train), while keying the SAME hash draw
    * by the near-dup COMPONENT id sends every member of a cluster to
    * one side, making cross-split leakage structurally zero.
    *
    * The gate reports both, per multi-doc near-dup cluster: how many
    * clusters straddle the split under the naive doc-keyed draw vs the
    * component-keyed one (provably 0 — the split is a function of the
    * component). One row; `leakage_free` asserts the zero.
    *
    * Scale shape: reuses the cached component labels
    * ([[Components.labelsFor]] — LSH edges + star rounds, computed once
    * per corpus fingerprint), adds two per-row hash columns (map-side),
    * and rolls up by component — one dimension-bounded aggregate; no
    * edge list, no extra corpus pass. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val labels = Components.labelsFor(s, dir).select("doc_id", "component")
      .withColumn("naive_val",
        expr(Sampling.drawSqlModOn("doc_id", 100)) < ValPct)
      .withColumn("safe_val",
        expr(Sampling.drawSqlModOn("component", 100)) < ValPct)
    labels.groupBy("component")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("naive_val")).as("dn"),
        countDistinct(col("safe_val")).as("ds"))
      .filter(col("n") >= 2)
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("dn") > 1, 1L).otherwise(0L)).as("n_split_naive"),
        sum(when(col("ds") > 1, 1L).otherwise(0L)).as("n_split_safe"))
      .withColumn("leakage_free", col("n_split_safe") === 0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "shard_assign" -> (shardAssign _),
    "corpus_shuffle" -> (corpusShuffle _),
    "pack_batches" -> (packBatches _),
    "split_leakage" -> (splitLeakage _))

  val oracle: Map[String, String] = Map(
    "shard_assign" -> s"""
      WITH t AS (
        SELECT doc_id,
          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      r AS (
        SELECT doc_id, n_tokens,
          CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT)
            AS rank
        FROM t)
      SELECT doc_id, n_tokens, rank, (rank - 1) % $NumShards AS shard
      FROM r ORDER BY doc_id""",
    "corpus_shuffle" -> s"""
      WITH d AS (
        SELECT doc_id, CAST($ShuffleDrawDuck AS BIGINT) AS draw
        FROM documents)
      SELECT doc_id, draw,
        CAST(row_number() OVER (ORDER BY draw, doc_id) AS BIGINT) AS pos
      FROM d ORDER BY doc_id""",
    "split_leakage" -> s"""
      WITH RECURSIVE ${Components.componentsCtesBody("documents")},
      sp AS (
        SELECT doc_id, component,
          (${Sampling.drawDuckModOn("doc_id", 100)}) < $ValPct AS naive_val,
          (${Sampling.drawDuckModOn("component", 100)}) < $ValPct AS safe_val
        FROM labels),
      cl AS (
        SELECT component, COUNT(*) AS n,
          COUNT(DISTINCT naive_val) AS dn,
          COUNT(DISTINCT safe_val) AS ds
        FROM sp GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
        CAST(SUM(CASE WHEN dn > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_split_naive,
        CAST(SUM(CASE WHEN ds > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_split_safe,
        SUM(CASE WHEN ds > 1 THEN 1 ELSE 0 END) = 0 AS leakage_free
      FROM cl WHERE n >= 2""",
    "pack_batches" -> s"""
      WITH d AS (
        SELECT doc_id,
          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
            AS n_tokens,
          CAST($ShuffleDrawDuck AS BIGINT) AS draw
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY draw, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
        FROM d)
      SELECT doc_id, n_tokens, cum_tokens,
        (cum_tokens - n_tokens) // $PackBudget AS batch_id
      FROM c ORDER BY doc_id""")
}
