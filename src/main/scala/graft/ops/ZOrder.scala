package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping —
  * the layout optimization Delta exposes as `OPTIMIZE ... ZORDER BY`:
  * rows are sorted along an interleaved-bit curve over several columns,
  * so every written file/row group covers a small HYPER-RECTANGLE of the
  * key space instead of a full-width stripe. Parquet min/max statistics
  * then prune multi-dimensional range predicates on ANY of the z-ordered
  * columns, not just the leading sort key — no reader or metadata
  * changes needed, the skipping falls out of ordinary footer stats.
  *
  * Bucketing: each column maps to a `bits`-wide bucket id via
  * `width_bucket` over its global min/max (one small aggregate per
  * column; uniform-width buckets — the right trade for roughly uniform
  * keys like block numbers and hashed ids; heavily skewed keys would
  * want rank-based cuts, which cost a quantile pass). The z-value
  * interleaves the bucket bits with plain shift/mask arithmetic —
  * codegen-friendly, no UDF.
  */
object ZOrder {

  /** Interleave `bits`-wide bucket columns into a single z-value: bit i
    * of dimension d lands at position i*dims + d. */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val dims = buckets.size
    val terms = for {
      (b, d) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * dims + d)
    terms.reduce(_ + _)
  }

  /** `df` clustered along the z-curve of `cols` into `nFiles` range
    * partitions, each internally z-sorted; the helper column is dropped
    * after partitioning, so the written schema is unchanged. */
  def cluster(df: DataFrame, cols: Seq[String], nFiles: Int,
              bits: Int = 16): DataFrame = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(cols.size * bits <= 62, s"${cols.size} dims at $bits bits overflow")
    // one tiny agg: global [min, max] per z column
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      // fail loud on columns the curve can't order: non-numeric (casts
      // to null), all-null (schema-evolved null-fill), or NaN bounds —
      // silent bucket-0 degradation would just pretend to cluster
      require(!bounds.isNullAt(2 * i) && !bounds.isNullAt(2 * i + 1) &&
        !bounds.getDouble(2 * i).isNaN && !bounds.getDouble(2 * i + 1).isNaN,
        s"z-order column '$c' has no numeric non-null bounds " +
          "(non-numeric, all-null, or NaN) — cannot cluster on it")
    }
    val nBuckets = 1L << bits
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      if (lo == hi) lit(0L)
      // width_bucket yields 1..n inside [lo, hi] (n+1 at hi) → 0-based, clamped
      else least(lit(nBuckets - 1),
        greatest(lit(0L),
          width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(nBuckets)) - 1))
    }
    // helper column name guaranteed not to collide with user columns
    val zc = Iterator.iterate("_z")("_" + _).dropWhile(df.columns.contains).next()
    df.withColumn(zc, interleave(buckets, bits))
      .repartitionByRange(math.max(1, nFiles), col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
