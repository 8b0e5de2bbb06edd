package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi-key: points t ⋈ intervals
  * [lo, hi] with t BETWEEN lo AND hi.
  *
  * Spark's naive plan for a pure inequality join is a
  * BroadcastNestedLoopJoin — O(points × intervals), a scale killer. The
  * banded form restores an equi-key: intervals explode into fixed-width
  * time bands, each point maps to exactly ONE band, and the join runs
  * band-equal first with the exact containment filtered after. Cost is
  * one shuffle on the band key; interval replication is
  * ceil(len/bandWidth)+1 rows, so pick bandWidth near the median
  * interval length. Because a point lives in a single band, each
  * (point, interval) match appears exactly once — no dedup pass.
  */
object RangeJoin {

  /** Inner point-in-interval join; returns point columns + interval
    * columns. `bandWidth` must be > 0. */
  def pointInInterval(points: DataFrame, tCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    // integer `div`, not `/`: nanos-scale longs overflow double precision
    val banded = intervals.withColumn("_band",
      explode(sequence(expr(s"`$loCol` div ${bandWidth}L"),
        expr(s"`$hiCol` div ${bandWidth}L"))))
    val pts = points.withColumn("_band", expr(s"`$tCol` div ${bandWidth}L"))
    pts.join(banded, "_band")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("_band")
  }
}
