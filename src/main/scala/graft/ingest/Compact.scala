package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the demux store. Incremental micro-batch
  * appends (streaming ingest, per-chunk jobs) accumulate many small
  * parquet files per table partition; at warehouse scale that bloats
  * metadata and task counts. Compaction rewrites each table partition
  * into ceil(bytes / targetBytes) files — layout-only: row content,
  * schema, and the partition-pruned read path are unchanged.
  *
  * Concurrency contract: run as an exclusive maintenance job — no
  * concurrent WRITERS (an append landing between the read and the swap
  * would be dropped), and concurrent readers can transiently miss one
  * partition during its delete→rename swap window. On plain parquet this
  * job instead guarantees crash-safety: a re-run after a crash first
  * restores any partition whose only copy survives in the temp
  * directory. For full snapshot isolation — readers never observing the
  * swap — use [[ManifestStore.compact]], which flips the whole file set
  * in one atomic manifest commit.
  */
object Compact {

  /** Compact every table_name partition of `store`; returns the number
    * of data files after compaction. */
  def run(spark: SparkSession, store: String,
          targetBytes: Long = 128L * 1024 * 1024): Long = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val storePath = new Path(store)
    // sibling of the store root regardless of trailing slashes — never
    // inside the store (would corrupt partition discovery if left over)
    val tmp = new Path(storePath.getParent, storePath.getName + "__compact_tmp")

    // crash recovery: a previous run may have deleted a store partition
    // and died before renaming its compacted copy back — restore any
    // tmp partition whose store copy is missing, then discard tmp
    if (fs.exists(tmp)) {
      fs.listStatus(tmp).filter(_.getPath.getName.startsWith("table_name="))
        .foreach { t =>
          val dest = new Path(storePath, t.getPath.getName)
          if (!fs.exists(dest)) fs.rename(t.getPath, dest)
        }
      fs.delete(tmp, true)
    }

    val parts = fs.listStatus(storePath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("table_name="))
    parts.foreach { p =>
      val bytes = fs.listStatus(p.getPath)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      spark.read.parquet(p.getPath.toString)
        .repartition(nFiles)
        .write.mode("overwrite")
        .parquet(new Path(tmp, p.getPath.getName).toString)
    }
    // swap each compacted partition into place
    parts.foreach { p =>
      fs.delete(p.getPath, true)
      fs.rename(new Path(tmp, p.getPath.getName), p.getPath)
    }
    fs.delete(tmp, true)
    countDataFiles(fs, storePath)
  }

  private[graft] def countDataFiles(fs: FileSystem, dir: Path): Long =
    fs.listStatus(dir).map { s =>
      if (s.isDirectory) countDataFiles(fs, s.getPath)
      else if (s.getPath.getName.endsWith(".parquet")) 1L
      else 0L
    }.sum
}
