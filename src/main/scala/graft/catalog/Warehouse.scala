package graft.catalog

import org.apache.spark.sql.SparkSession
import graft.abi.AbiSchema
import graft.ingest.Demux

/** Schema-qualified warehouse namespaces (SURVEY Q2; reference
  * classes.py:56 `create schema if not exists {schema}`, README.md:73's
  * `CREATE DATABASE makermcd`): decoded tables are materialized into
  * `<db>.<table>` through the session catalog, so a BI tool or
  * `spark.sql("SELECT ... FROM makermcd.vat_call_frob")` resolves them by
  * qualified name like any warehouse table.
  *
  * Design: the demux store stays the ingest-side format (raw+tag,
  * partitioned by table_name); the warehouse holds the decoded serving
  * copy — the same split the reference makes between its fetch loop and
  * the PG/Snowflake tables it INSERTs decoded rows into. Decode runs once
  * at materialization instead of on every read, the right trade for a
  * many-reader warehouse at scale; `saveAsTable` keeps Spark's native
  * parquet layout so downstream scans get pushdown/pruning as usual.
  */
object Warehouse {

  /** Create `db` if needed and materialize each decoded table from the
    * demux store. Idempotent: existing tables are kept unless `overwrite`
    * (the reference's autocreate-then-append shape, classes.py:56). */
  def materialize(spark: SparkSession, storePath: String,
                  defs: Seq[AbiSchema.TableDef], db: String = "makermcd",
                  overwrite: Boolean = false): Unit = synchronized {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    defs.foreach { d =>
      val fq = s"$db.${d.table}"
      val exists = spark.catalog.tableExists(fq)
      if (!exists) {
        // the in-memory catalog starts empty each session, but a previous
        // session's managed-table directory can survive in the warehouse
        // dir — CREATE refuses an existing location, so clear the orphan
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs.delete(new org.apache.hadoop.fs.Path(
          warehouse, s"$db.db/${d.table}"), true)
      }
      if (!exists || overwrite)
        Demux.readTable(spark, storePath, d)
          .write.mode("overwrite").format("parquet").saveAsTable(fq)
    }
  }
}
