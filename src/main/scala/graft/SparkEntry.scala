package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): each entry is a
  * Spark-native implementation; `oracleSql` holds the equivalent DuckDB SQL
  * the driver uses as the correctness oracle at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full assets_per_type-shaped CTE chain (the reference's one
    * production query, re-expressed over the driver testdata). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q17AssetsShape(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Relational2.queries ++
      graft.queries.Relational3.queries ++ graft.queries.Events.queries ++
      graft.queries.Colocated.queries ++ graft.queries.Tpch.queries ++
      graft.queries.MakerDw.queries ++ graft.queries.PgQueries.queries ++
      graft.ops.TextAnalysis.queries ++ graft.ops.Dedup.queries ++
      graft.ops.Components.queries ++ graft.ops.Sampling.queries ++
      graft.ops.Curation.queries ++ graft.ops.Decontam.queries ++
      graft.ops.Scrub.queries ++ graft.ops.Sharding.queries ++
      graft.ops.Retrieval.queries ++ graft.ops.SubstrDedup.queries ++
      graft.ops.Similarity.queries ++ graft.ops.Ivf.queries ++
      graft.ops.IvfIndex.queries ++ graft.ops.ExactIndex.queries ++
      graft.ops.Multimodal.queries ++ graft.ops.PageRank.queries ++
      graft.ops.LangId.queries ++
      graft.ingest.Forget.queries ++ graft.ingest.Evolution.queries ++
      graft.ingest.MatView.queries ++ graft.ingest.Validated.queries ++
      graft.ingest.Skipping.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.Relational2.oracle ++
      graft.queries.Relational3.oracle ++ graft.queries.Events.oracle ++
      graft.queries.Colocated.oracle ++ graft.queries.Tpch.oracle ++
      graft.queries.MakerDw.oracle ++ graft.queries.PgQueries.oracle ++
      graft.ops.TextAnalysis.oracle ++ graft.ops.Dedup.oracle ++
      graft.ops.Components.oracle ++ graft.ops.Sampling.oracle ++
      graft.ops.Curation.oracle ++ graft.ops.Decontam.oracle ++
      graft.ops.Scrub.oracle ++ graft.ops.Sharding.oracle ++
      graft.ops.Retrieval.oracle ++ graft.ops.SubstrDedup.oracle ++
      graft.ops.Similarity.oracle ++ graft.ops.Ivf.oracle ++
      graft.ops.IvfIndex.oracle ++ graft.ops.ExactIndex.oracle ++
      graft.ops.Multimodal.oracle ++ graft.ops.PageRank.oracle ++
      graft.ops.LangId.oracle ++
      graft.ingest.Forget.oracle ++ graft.ingest.Evolution.oracle ++
      graft.ingest.MatView.oracle ++ graft.ingest.Validated.oracle ++
      graft.ingest.Skipping.oracle
}
