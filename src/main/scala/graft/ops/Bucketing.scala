package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY "Partitioning &
  * shuffle": bucketing for co-located joins). Writing both sides of a
  * recurring join bucketed+sorted on the join key makes every subsequent
  * join shuffle-free (bucket-local sort-merge) — at 100 TB this turns the
  * dominant repeated-shuffle cost into a one-time layout cost. */
object Bucketing {

  /** Persist `df` as a bucketed, sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key. With matching
    * bucket counts Spark plans a shuffle-free sort-merge join. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
