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

  /** Bucket id of `c` against sorted quantile `cuts` (= number of cuts
    * ≤ c, in 0..cuts.length), as an UNROLLED binary search of nested
    * CASE WHENs — ⌈log₂(cuts+1)⌉ comparisons per row, all inside
    * whole-stage codegen (a linear CASE chain or an array HOF would be
    * O(buckets) or interpreted). NULLs pin to bucket 0. */
  private[ops] def rankBucket(c: Column, cuts: Array[Double]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi + 1) / 2
        when(c < lit(cuts(mid - 1)), go(lo, mid - 1)).otherwise(go(mid, hi))
      }
    when(c.isNull, lit(0L)).otherwise(go(0, cuts.length))
  }

  /** Rank-based (equi-depth) cut points: 2^bits − 1 approximate
    * quantiles per column, one `percentile_approx` aggregate over all
    * columns at once. The cuts are deduplicated — a value occupying many
    * quantiles (a zipf head) collapses to one cut instead of wasting
    * bucket ids on an un-splittable point mass. */
  private def quantileCuts(df: DataFrame, cols: Seq[String],
                           bits: Int): Seq[Array[Double]] = {
    val nBuckets = 1 << bits
    val pcts = array((1 until nBuckets).map(i =>
      lit(i.toDouble / nBuckets)): _*)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), pcts, lit(10000)))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      // fail loud on an all-null column, exactly like the uniform-width
      // path's bounds check: silent bucket-0 degradation would just
      // pretend to cluster
      require(!row.isNullAt(i),
        s"z-order column '${cols(i)}' has no numeric non-null values " +
          "— cannot rank-bucket it")
      row.getSeq[Double](i).distinct.sorted.toArray
    }
  }

  /** Deterministic range partitioning on the bounded z-domain — the
    * tail of both cluster paths. `repartitionByRange` draws its
    * boundaries from a RANDOMLY-SEEDED reservoir sample (Spark's
    * RangePartitioner), which (a) jitters the written file layout per
    * build — the store_skipping_auto stripe tripwire measurably moved
    * 7→13 of 25 files across identical builds — and (b) is the
    * guide-§2.5 retry hazard: a re-sampled boundary set on task retry
    * is a different row→partition function mid-shuffle. The z-value
    * domain is BOUNDED (`totalBits` wide), so exact boundaries are
    * cheap instead: one map-side-combined count over the ≤2^16 coarse
    * cells of the domain's top bits (collected: ≤65k rows), cut at
    * equal cumulative mass, then an explicit partitioner — every step a
    * pure function of the data. Same job count as before (the sampling
    * pass becomes the histogram pass).
    *
    * Returns `df` partitioned into ≤ `nFiles` z-ranges, each internally
    * z-sorted; the z column is still present (callers drop it). */
  private def partitionByZ(withZ: DataFrame, zc: String, nFiles: Int,
                           totalBits: Int): DataFrame = {
    val n = math.max(1, nFiles)
    if (n == 1) return withZ.repartition(1).sortWithinPartitions(zc)
    val cellShift = math.max(0, totalBits - 16)
    // NULL z (a row with every z column null) pins to cell 0 — the same
    // nulls-first placement range partitioning gave it
    val cell = coalesce(shiftright(col(zc), cellShift), lit(0L))
    val hist = withZ.groupBy(cell.as("_zcell")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = hist.iterator.map(_._2).sum
    // upper-exclusive cell cuts at cumulative mass thresholds i·total/n;
    // a cell crossing several thresholds emits ONE cut (an un-splittable
    // point mass yields fewer, fuller partitions, never a wrong split)
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 0L
    var next = 1
    // threshold test in BigInt: acc·n and total·next in Long overflow
    // near 2^63 (r15 ADVICE #3 — at 100 TB row counts times file counts
    // get there), and an overflowed comparison cuts in the wrong places
    def reached(k: Int): Boolean = BigInt(acc) * n >= BigInt(total) * k
    hist.foreach { case (c, cnt) =>
      acc += cnt
      if (next < n && reached(next)) {
        cuts += c + 1
        while (next < n && reached(next)) next += 1
      }
    }
    val pid = Iterator.iterate("_zpid")("_" + _)
      .dropWhile(withZ.columns.contains).next()
    val withPid = withZ.withColumn(pid,
      rankBucket(cell.cast("double"), cuts.map(_.toDouble).toArray))
    val pidIdx = withPid.schema.fieldIndex(pid)
    // deliberate RDD[Row] round-trip (r15 ADVICE #4): external-Row
    // decode + re-encode per row, losing codegen for this one stage.
    // Measured at the gate-store scale it is noise next to the parquet
    // write that follows, and the explicit partitioner is what buys the
    // retry-safe, sampling-free layout; a Dataset-level exact-partition
    // exchange needs a custom physical operator — revisit only if a
    // profile ever shows this stage, not before.
    val parted = withPid.rdd
      .map(r => (r.getLong(pidIdx), r))
      .partitionBy(new ZOrder.ExactPartitioner(n))
      .values
    withZ.sparkSession.createDataFrame(parted, withPid.schema)
      .sortWithinPartitions(zc)
      .drop(pid)
  }

  /** key IS the partition id (keys are 0-based and < n by construction). */
  private final class ExactPartitioner(n: Int) extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
  }

  /** `df` clustered along the z-curve of `cols` into `nFiles` range
    * partitions, each internally z-sorted; the helper column is dropped
    * after partitioning, so the written schema is unchanged.
    *
    * `rankBuckets = true` switches the per-column bucketing from
    * uniform-width (`width_bucket` over global min/max — right for
    * roughly uniform keys, degenerates on skew: a zipf head squeezes
    * the tail into one bucket and the curve stops tiling) to equi-depth
    * quantile cuts (one `percentile_approx` pass; each bucket holds
    * ~equal ROWS regardless of the value distribution). */
  def cluster(df: DataFrame, cols: Seq[String], nFiles: Int,
              bits: Int = 16, rankBuckets: Boolean = false): DataFrame = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(cols.size * bits <= 62, s"${cols.size} dims at $bits bits overflow")
    if (rankBuckets) return clusterByRank(df, cols, nFiles, bits)
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
    partitionByZ(df.withColumn(zc, interleave(buckets, bits)),
      zc, nFiles, cols.size * bits)
      .drop(zc)
  }

  /** The rank-bucket variant of [[cluster]]: equi-depth quantile cuts
    * per column, bucket via unrolled binary search, same interleave and
    * range-partition tail. */
  private def clusterByRank(df: DataFrame, cols: Seq[String], nFiles: Int,
                            bits: Int): DataFrame = {
    // equi-depth cuts need far fewer buckets than uniform width to tile
    // (each bucket holds ~equal rows by construction), and 2^bits−1
    // requested quantiles beyond ~256 per column just strain
    // percentile_approx for no extra file-level discrimination
    val rbits = math.min(bits, 8)
    val cuts = quantileCuts(df, cols, rbits)
    val buckets = cols.zip(cuts).map { case (c, cut) =>
      if (cut.isEmpty) lit(0L) else rankBucket(col(c).cast("double"), cut)
    }
    val zc = Iterator.iterate("_z")("_" + _).dropWhile(df.columns.contains).next()
    partitionByZ(df.withColumn(zc, interleave(buckets, rbits)),
      zc, nFiles, cols.size * rbits)
      .drop(zc)
  }
}
