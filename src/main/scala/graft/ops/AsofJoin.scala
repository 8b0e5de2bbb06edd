package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same key
  * and `right.time <= left.time` — the event × slowly-changing-dimension
  * join (e.g. each vat event priced at the jug rate in force at its
  * block).
  *
  * Spark-first shape: tag the sides, union, and LOCF the right values
  * with an ordered window per key — ONE shuffle on the key, never a
  * range-join/broadcast-nested-loop explosion, so it scales like any
  * windowed aggregation (partitions by key; skewed keys salt like any
  * other window). A `left.join(right, leftTime >= rightTime)` formulation
  * would be O(left × right-per-key) — this is O((left+right) log) via
  * sort-within-partition.
  */
object AsofJoin {

  /** Left as-of join. `valueCols` of `right` come back in a struct column
    * `asof` (null when no right row precedes the left row). `left` and
    * `right` must both have columns `key` and `time`; right rows at the
    * same `time` as a left row are visible to it (<= semantics). Right
    * (key, time) pairs should be unique — the standard as-of contract. */
  def leftAsof(left: DataFrame, right: DataFrame,
               key: String, time: String, valueCols: Seq[String]): DataFrame = {
    val r = right.select(col(key), col(time),
      struct(valueCols.map(col): _*).as("_rv"))
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    // right rows order before left rows at equal time → <= inclusion
    val w = Window.partitionBy(key).orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv")
  }
}
