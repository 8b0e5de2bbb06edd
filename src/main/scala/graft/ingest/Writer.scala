package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append sink + incremental resume (S4–S6).
  *
  * The reference appends row-at-a-time INSERTs and resumes from
  * `max(block_number)+1` over every table of a contract
  * (classes.py:32-50,119-127). Here: columnar parquet appends; the resume
  * watermark is the same max+1 semantics. Idempotent re-ingest replaces
  * the reference's "delete the tables and re-run" (README.md:93) — a
  * block-range overwrite instead of full truncation.
  */
object Writer {

  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Overwrite-by-range idempotent write: drop rows in [from, to] then
    * append the new batch (all other data untouched). Crash-safe but not
    * atomic for readers — a reader landing inside the delete→rename swap
    * can transiently miss the path; [[ManifestStore.overwriteRange]] is
    * the snapshot-isolated form (readers resolve complete manifests
    * only). */
  def overwriteRange(spark: SparkSession, df: DataFrame, path: String,
                     from: Long, to: Long): Unit = {
    val existing =
      try Some(spark.read.parquet(path))
      catch { case _: Exception => None }
    existing match {
      case Some(old) =>
        val kept = old.filter(col("block_number") < from || col("block_number") > to)
        val merged = kept.unionByName(df)
        // write to a temp then swap, since we're reading what we overwrite
        val tmp = path + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
      case None =>
        df.write.mode("overwrite").parquet(path)
    }
  }

  /** Resume watermark: max(block_number)+1 over every table path of a
    * contract, else `creationBlock` (classes.py:41-46 semantics). */
  def nextBlock(spark: SparkSession, tablePaths: Seq[String], creationBlock: Long): Long = {
    val maxes = tablePaths.flatMap { p =>
      try {
        spark.read.parquet(p).agg(max("block_number")).collect()
          .headOption.flatMap(r => Option(r.get(0)).map(_.toString.toLong))
      } catch { case _: Exception => None }
    }
    if (maxes.isEmpty) creationBlock else maxes.max + 1
  }
}
