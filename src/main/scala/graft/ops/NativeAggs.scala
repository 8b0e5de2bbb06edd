package graft.ops

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native aggregate functions for the dedup sketches.
  *
  * Spark's higher-order functions (transform/zip_with/array_min) evaluate
  * their lambdas interpreted — the SQL formulation of minhash burned
  * ~130 CPU-seconds at sf0.1 for what is ~20M long-ops. These
  * TypedImperativeAggregates run the inner loop as compiled Scala with a
  * primitive buffer, and are map-side combinable (partial aggregation
  * before the shuffle), which is the property that matters at 100 TB.
  */
/** Analysis-time whitelist for the LONG-KEYED sketches (CMS, MG): their
  * update paths coerce via `Number.longValue()`, which would silently
  * truncate a DOUBLE input's fraction and sketch the wrong keys. Integral
  * widths narrower than bigint coerce losslessly and stay accepted;
  * fractional types are an analysis error, matching the contract
  * [[IntersectCountSortedLong]] already enforces for its array inputs. */
private[ops] object IntegralKeyCheck {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def apply(name: String, e: Expression): TypeCheckResult = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an integral key (tinyint/smallint/int/bigint), got " +
        s"${other.simpleString}: fractional keys would be truncated silently" +
        " — hash or floor/round the column explicitly first")
  }
}

object MinHashAgg {
  val MersennePrime = 2147483647L // 2^31-1

  /** Deterministic hash-family coefficients for (k, seed). */
  def coeffs(k: Int, seed: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(k)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }
}

/** dot_double(a, b) → double: left-to-right fold of elementwise products
  * over two array<double> columns. Bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,p) -> acc+p)` and to
  * DuckDB's sequential `list_sum`, but the loop is compiled — interpreted
  * via a primitive Scala loop, and codegen'd via `nullSafeCodeGen` (the
  * generated for-loop reads `ArrayData.getDouble` in place, no boxing, no
  * array copy), so the similarity hot path stays inside whole-stage
  * codegen end to end. */
case class DotDouble(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ys = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var acc = 0.0
    var i = 0
    val n = math.min(xs.numElements(), ys.numElements())
    while (i < n) { acc += xs.getDouble(i) * ys.getDouble(i); i += 1 }
    acc
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
  : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotDouble =
    copy(left = l, right = r)
  override def prettyName: String = "dot_double"
}

/** intersect_count_sorted(a, b) → bigint: |a ∩ b| for two SORTED
  * array<bigint> columns with distinct non-null elements — a two-pointer
  * merge, O(|a|+|b|) with ZERO allocation per row. The built-in
  * `size(array_intersect(a, b))` builds a hash set AND materializes the
  * intersection array per row; on the triangle-counting hot path (one
  * call per edge, ~1.2M rows at sf0.1) the merge count is the same
  * answer without the garbage. Caller contract: inputs sorted
  * ascending, elements distinct (the adjacency builder guarantees both
  * via sort_array over grouped distinct edges). */
case class IntersectCountSortedLong(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  // refuse non-bigint arrays at ANALYSIS time: the codegen path reads
  // ArrayData.getLong, which over e.g. array<int> would return garbage
  // counts silently (8-byte reads over 4-byte slots)
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count_sorted needs two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ys = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val (n, m) = (xs.numElements(), ys.numElements())
    var (i, j) = (0, 0)
    var acc = 0L
    while (i < n && j < m) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { acc += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
  : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $acc++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
  : IntersectCountSortedLong = copy(left = l, right = r)
  override def prettyName: String = "intersect_count_sorted"
}

/** minhash_agg(hash64) → array<long>[k]: per-group minimum of k affine
  * hashes of the input. Input is any long hash of the group's set
  * elements (we use murmur3 of the shingle). */
case class MinHashAgg(child: Expression, k: Int, seed: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val (as, bs) = MinHashAgg.coeffs(k, seed)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & 0x7fffffffL // 31 bits: a*h+b stays in Long
      var i = 0
      while (i < k) {
        val x = (as(i) * h + bs(i)) % MinHashAgg.MersennePrime
        if (x < buffer(i)) buffer(i) = x
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storage)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
  override def prettyName: String = "minhash_agg"
}

/** simhash_agg(hash64) → long: 64-bit SimHash — per bit position, sign of
  * the sum of ±1 contributions across the group's element hashes. */
case class SimHashAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) buffer(j) += 1 else buffer(j) -= 1
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buffer(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(storage)
    Array.fill(64)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
  override def prettyName: String = "simhash_agg"
}

/** Count-min sketch plumbing shared by the aggregate, the merge
  * aggregate, and the estimator. Layout: `depth` rows × `width` counters
  * (longs) + one trailing total-count cell, serialized row-major. The
  * guarantee that matters for gating: estimate ≥ true count ALWAYS
  * (counters only ever add), and ≤ true + O(N/width) with the usual CMS
  * probability — deterministic for a fixed seed and input. */
object Cms {
  val Depth = 5
  val Width = 4096
  val Seed = 4242

  def cells: Int = Depth * Width + 1

  /** splitmix64 finalizer then 31-bit fold — spreads arbitrary longs
    * before the affine row hashes (which need a bounded domain). */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & 0x7fffffffL
  }

  @transient lazy val (as, bs) = MinHashAgg.coeffs(Depth, Seed)

  def slot(row: Int, x: Long): Int =
    (row * Width +
      ((as(row) * mix(x) + bs(row)) % MinHashAgg.MersennePrime % Width)).toInt

  /** Self-describing header: (depth, width, seed) ints. A persisted
    * sketch from a DIFFERENT configuration (other width, other hash
    * family) must refuse to merge/estimate — elementwise-adding
    * mismatched layouts would corrupt counts SILENTLY, the failure mode
    * a stored-and-refreshed matview sketch is most exposed to. */
  private val Header = 12

  private def checkHeader(bb: ByteBuffer, what: String): Unit = {
    require(bb.capacity >= Header + 8 * cells,
      s"$what: binary too short (${bb.capacity} B) to be a count-min " +
        s"sketch of this layout — rebuild the sketch")
    val (d, w, sd) = (bb.getInt(0), bb.getInt(4), bb.getInt(8))
    require(d == Depth && w == Width && sd == Seed,
      s"$what: stored count-min sketch has layout depth=$d width=$w " +
        s"seed=$sd but this build uses $Depth/$Width/$Seed — rebuild the " +
        "sketch; merging mismatched layouts silently corrupts counts")
  }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Header + 8 * cells)
    bb.putInt(Depth).putInt(Width).putInt(Seed)
    buf.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    checkHeader(bb, "cms deserialize")
    bb.position(Header)
    Array.fill(cells)(bb.getLong)
  }

  def estimate(bytes: Array[Byte], x: Long): Long = {
    val bb = ByteBuffer.wrap(bytes)
    checkHeader(bb, "cms_estimate")
    var est = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = bb.getLong(Header + 8 * slot(r, x))
      if (c < est) est = c
      r += 1
    }
    est
  }

  def total(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes)
    checkHeader(bb, "cms_total")
    bb.getLong(Header + 8 * (cells - 1))
  }
}

/** cms_agg(long) → binary: mergeable count-min sketch of the group's
  * values — the classic frequency sketch (Cormode & Muthukrishnan '05)
  * with finite state, so point-frequency queries (heavy hitters,
  * top-k candidates) can be maintained INCREMENTALLY: partials combine
  * map-side, stored sketches fold with a delta's sketch by elementwise
  * add ([[CmsMergeAgg]]) — the same property that lets
  * [[graft.ingest.MatView]] keep COUNT DISTINCT current via HLL. */
case class CmsAgg(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    IntegralKeyCheck("cms_agg", child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Cms.cells)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // any INTEGRAL width (gated by checkInputDataTypes above): the
      // registered SQL surface sees int columns and int literals as
      // readily as longs, and a raw asInstanceOf[Long] would throw
      val x = v.asInstanceOf[java.lang.Number].longValue()
      var r = 0
      while (r < Cms.Depth) { buffer(Cms.slot(r, x)) += 1L; r += 1 }
      buffer(Cms.cells - 1) += 1L
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Cms.cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = Cms.serialize(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Cms.serialize(buffer)
  override def deserialize(storage: Array[Byte]): Array[Long] = Cms.deserialize(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_agg"
}

/** cms_merge_agg(binary) → binary: union of stored sketches by
  * elementwise add — the refresh-path combiner (sketch(A) ⊎ sketch(B)
  * = sketch(A ⊎ B), exactly). */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Cms.cells)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) merge(buffer, Cms.deserialize(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Cms.cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = Cms.serialize(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Cms.serialize(buffer)
  override def deserialize(storage: Array[Byte]): Array[Long] = Cms.deserialize(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_merge_agg"
}

/** cms_estimate(sketch, value) → long: point-frequency estimate (min
  * over the sketch's rows). */
case class CmsEstimate(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects a cms_agg sketch (binary), got ${left.dataType.simpleString}")
    else IntegralKeyCheck("cms_estimate", right)
  override protected def nullSafeEval(sk: Any, v: Any): Any =
    Cms.estimate(sk.asInstanceOf[Array[Byte]],
      v.asInstanceOf[java.lang.Number].longValue())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}

/** cms_total(sketch) → long: the sketch's total update count (the N in
  * the ε·N error bound). */
case class CmsTotal(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any): Any =
    Cms.total(sk.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): CmsTotal =
    copy(child = newChild)
  override def prettyName: String = "cms_total"
}

/** Mergeable equi-width histogram for incremental QUANTILES — the third
  * classic sketch next to HLL (distinct) and CMS (frequency): bucket
  * counts add exactly, so hist(A) ⊎ hist(B) = hist(A ⊎ B) and a
  * discrete quantile reads off the cumulative counts with error bounded
  * by the BIN WIDTH — a deterministic bound, not a probabilistic one.
  *
  * Layout: [[Bins]] longs over the declared domain [0, [[Max]]) +
  * an out-of-range cell + a total cell. The domain is fixed UP FRONT
  * (the trade that makes the state finite and mergeable); inputs
  * outside it land in the out-of-range cell, which consumers MUST
  * check — a domain-busting input stream reads as a loud counter, not
  * silently distorted quantiles. */
object Hist {
  val Bins = 4096
  val Max = 1024.0
  def width: Double = Max / Bins // 0.25
  def cells: Int = Bins + 2 // + outOfRange + total
  private def oorCell = Bins
  private def totalCell = Bins + 1

  def update(buf: Array[Long], x: Double): Unit = {
    if (x >= 0.0 && x < Max) buf((x / width).toInt) += 1L
    else buf(oorCell) += 1L
    buf(totalCell) += 1L
  }

  /** Self-describing header: (bins, domain-max bits). Same refuse-on-
    * mismatch contract as [[Cms]] — adding counts binned over a
    * DIFFERENT domain or width silently skews every quantile. */
  private val Header = 12

  private def checkHeader(bb: ByteBuffer, what: String): Unit = {
    require(bb.capacity >= Header + 8 * cells,
      s"$what: binary too short (${bb.capacity} B) to be a histogram " +
        "of this layout — rebuild the sketch")
    val (b, mx) = (bb.getInt(0), bb.getLong(4))
    require(b == Bins && mx == java.lang.Double.doubleToLongBits(Max),
      s"$what: stored histogram has layout bins=$b max=" +
        s"${java.lang.Double.longBitsToDouble(mx)} but this build uses " +
        s"$Bins/$Max — rebuild the sketch; merging mismatched layouts " +
        "silently skews quantiles")
  }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Header + 8 * cells)
    bb.putInt(Bins).putLong(java.lang.Double.doubleToLongBits(Max))
    buf.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    checkHeader(bb, "hist deserialize")
    bb.position(Header)
    Array.fill(cells)(bb.getLong)
  }

  def outOfRange(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes)
    checkHeader(bb, "hist_oor")
    bb.getLong(Header + 8 * oorCell)
  }

  def total(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes)
    checkHeader(bb, "hist total")
    bb.getLong(Header + 8 * totalCell)
  }

  /** Discrete-quantile estimate: midpoint of the bin holding the
    * 0-indexed rank floor(p·(n−1)) order statistic (in-range values
    * only). Error ≤ width/2 vs the true order statistic. */
  def quantile(bytes: Array[Byte], p: Double): Double = {
    val bb = ByteBuffer.wrap(bytes)
    checkHeader(bb, "hist_quantile")
    var inRange = 0L
    var b = 0
    while (b < Bins) { inRange += bb.getLong(Header + 8 * b); b += 1 }
    if (inRange == 0L) return Double.NaN
    val rank = math.floor(p * (inRange - 1)).toLong // 0-indexed
    var cum = 0L
    b = 0
    while (b < Bins) {
      cum += bb.getLong(Header + 8 * b)
      if (cum > rank) return (b + 0.5) * width
      b += 1
    }
    Max - width / 2
  }
}

/** hist_agg(double) → binary: mergeable fixed-domain histogram. */
case class HistAgg(child: Expression,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Hist.cells)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      Hist.update(buffer, v.asInstanceOf[java.lang.Number].doubleValue())
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Hist.cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = Hist.serialize(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Hist.serialize(buffer)
  override def deserialize(storage: Array[Byte]): Array[Long] = Hist.deserialize(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): HistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistAgg =
    copy(child = newChild)
  override def prettyName: String = "hist_agg"
}

/** hist_merge_agg(binary) → binary: union by elementwise add. */
case class HistMergeAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Hist.cells)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) merge(buffer, Hist.deserialize(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Hist.cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = Hist.serialize(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Hist.serialize(buffer)
  override def deserialize(storage: Array[Byte]): Array[Long] = Hist.deserialize(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): HistMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "hist_merge_agg"
}

/** hist_quantile(sketch, p) → double: bin-midpoint discrete quantile. */
case class HistQuantile(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sk: Any, p: Any): Any =
    Hist.quantile(sk.asInstanceOf[Array[Byte]],
      p.asInstanceOf[java.lang.Number].doubleValue())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HistQuantile =
    copy(left = l, right = r)
  override def prettyName: String = "hist_quantile"
}

/** hist_oor(sketch) → long: out-of-domain update count — consumers gate
  * on 0 before trusting any quantile. */
case class HistOutOfRange(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any): Any =
    Hist.outOfRange(sk.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): HistOutOfRange =
    copy(child = newChild)
  override def prettyName: String = "hist_oor"
}

/** Misra–Gries summary plumbing — heavy-hitter DISCOVERY (no candidate
  * list needed, unlike a CMS point query): at most [[K]] counters; any
  * value with true frequency > N/(K+1) is guaranteed present, and its
  * stored count e satisfies  true − N/(K+1) ≤ e ≤ true  (MG only ever
  * UNDERcounts — the mirror of CMS's overcount). Summaries MERGE
  * (Agarwal et al., PODS'12): add counts pointwise, then subtract the
  * (K+1)-th largest count and drop non-positives — the guarantee
  * survives any merge order, which is exactly what a distributed
  * aggregation needs (Spark's partial-merge order is nondeterministic;
  * consumers must gate on the GUARANTEE, not on raw counter values). */
object Mg {
  val K = 16

  /** Self-describing header (the [[Cms]]/[[Hist]] refuse-on-mismatch
    * contract): K first — guarantee math for a stored summary built
    * with a different K is silently wrong otherwise. */
  def serialize(m: scala.collection.mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * m.size)
    bb.putInt(K)
    bb.putInt(m.size)
    // sorted for a canonical byte form (map iteration order is not)
    m.toSeq.sortBy(_._1).foreach { case (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[Long, Long] = {
    require(bytes.length >= 8,
      s"mg: binary too short (${bytes.length} B) to be a summary")
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    require(k == K,
      s"mg: stored summary built with K=$k but this build uses K=$K — " +
        "rebuild; its error bounds do not transfer")
    val n = bb.getInt
    require(n >= 0 && bytes.length >= 8 + 16L * n,
      s"mg: summary declares $n entries but carries only ${bytes.length} B " +
        s"(need ${8 + 16L * n}) — truncated or corrupt")
    val m = scala.collection.mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  def update(m: scala.collection.mutable.HashMap[Long, Long], x: Long): Unit = {
    m.get(x) match {
      case Some(c) => m.update(x, c + 1)
      case None if m.size < K => m.put(x, 1L)
      case None => // decrement-all; drop zeros
        val dead = scala.collection.mutable.ArrayBuffer[Long]()
        m.foreach { case (v, c) => if (c == 1L) dead += v else m.update(v, c - 1) }
        dead.foreach(m.remove)
    }
  }

  def merge(a: scala.collection.mutable.HashMap[Long, Long],
            b: scala.collection.mutable.HashMap[Long, Long])
      : scala.collection.mutable.HashMap[Long, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    if (a.size > K) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(K) // (K+1)-th largest
      val dead = scala.collection.mutable.ArrayBuffer[Long]()
      a.foreach { case (v, c) =>
        if (c - cut <= 0L) dead += v else a.update(v, c - cut) }
      dead.foreach(a.remove)
    }
    a
  }

  /** Stored count for `x` (0 when absent — by the MG guarantee, absence
    * proves true frequency ≤ N/(K+1)). */
  def estimate(bytes: Array[Byte], x: Long): Long =
    deserialize(bytes).getOrElse(x, 0L)
}

/** mg_agg(long) → binary: mergeable Misra–Gries heavy-hitter summary. */
case class MgAgg(child: Expression,
                 mutableAggBufferOffset: Int = 0,
                 inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Long, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    IntegralKeyCheck("mg_agg", child)

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[Long, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buffer: scala.collection.mutable.HashMap[Long, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) Mg.update(buffer, v.asInstanceOf[java.lang.Number].longValue())
    buffer
  }

  override def merge(b1: scala.collection.mutable.HashMap[Long, Long],
                     b2: scala.collection.mutable.HashMap[Long, Long])
      : scala.collection.mutable.HashMap[Long, Long] = Mg.merge(b1, b2)

  override def eval(buffer: scala.collection.mutable.HashMap[Long, Long]): Any =
    Mg.serialize(buffer)
  override def serialize(buffer: scala.collection.mutable.HashMap[Long, Long]): Array[Byte] =
    Mg.serialize(buffer)
  override def deserialize(storage: Array[Byte])
      : scala.collection.mutable.HashMap[Long, Long] = Mg.deserialize(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): MgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgAgg =
    copy(child = newChild)
  override def prettyName: String = "mg_agg"
}

/** mg_estimate(sketch, value) → long: the summary's stored count (0 if
  * absent — proof of non-heaviness, by the MG guarantee). */
case class MgEstimate(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mg_estimate expects an mg_agg sketch (binary), got ${left.dataType.simpleString}")
    else IntegralKeyCheck("mg_estimate", right)
  override protected def nullSafeEval(sk: Any, v: Any): Any =
    Mg.estimate(sk.asInstanceOf[Array[Byte]],
      v.asInstanceOf[java.lang.Number].longValue())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MgEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "mg_estimate"
}

/** mg_keys(sketch) → array<bigint>: the summary's candidate keys,
  * sorted ascending. The DISCOVERY half of production heavy-hitters:
  * by the MG guarantee the array contains every value with true
  * frequency > N/(K+1) (among ≤K candidates, merge-order-dependent
  * extras included) — a second EXACT counting pass over the candidates
  * then yields a fully deterministic result (`events_heavy_verified`). */
case class MgKeys(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(sk: Any): Any =
    new GenericArrayData(
      Mg.deserialize(sk.asInstanceOf[Array[Byte]]).keysIterator.toArray.sorted)
  override protected def withNewChildInternal(newChild: Expression): MgKeys =
    copy(child = newChild)
  override def prettyName: String = "mg_keys"
}
