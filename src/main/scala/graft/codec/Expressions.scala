package graft.codec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.abi.{AbiJson, AbiSchema, Keccak}

/** Static helpers callable from generated Java code. */
object CodecRuntime {
  def bytesToAscii(b: Array[Byte]): UTF8String =
    UTF8String.fromBytes(b.filter(_ != 0))

  /** Big-endian unsigned integer bytes → double (correctly-rounded via
    * BigDecimal, matching Decimal.toDouble semantics). */
  def uintToDouble(b: Array[Byte]): Double =
    new java.math.BigDecimal(new java.math.BigInteger(1, b)).doubleValue

  /** [[uintToDouble]] with a LOUD signedness guard: a set sign bit on a
    * full 32-byte word means the column is almost certainly a SIGNED
    * wide int (int256 dart/dink/rate) decoded as two's-complement raw
    * words — reading it unsigned would silently turn a small negative
    * into ~10^77 positive. A genuine uint256 quantity ≥ 2^255 (~5.8e76)
    * does not occur in any token-quantity domain (rad-scale tops out
    * ~10^45·balance), so failing is strictly safer than guessing. */
  def uintToDoubleChecked(b: Array[Byte]): Double = {
    if (b.length >= 32 && (b(0) & 0x80) != 0)
      throw new ArithmeticException(
        "rescale: binary word has its sign bit set - this looks like a signed " +
          "(int256) wide int decoded as two's-complement; use the signed " +
          "rescaler (wad_s/ray_s) instead of the unsigned wad/ray/rad")
    uintToDouble(b)
  }

  /** Two's-complement signed counterpart of [[uintToDouble]] — for wide
    * SIGNED ints (int256) carried as raw 32-byte words. */
  def intToDouble(b: Array[Byte]): Double =
    new java.math.BigDecimal(new java.math.BigInteger(b)).doubleValue

  /** Big-endian unsigned integer bytes → exact decimal digit string —
    * the DISPLAY/EXPORT form for wide ints kept as binary (rad-scale
    * values exceed every fixed-precision SQL type on both engines, so
    * the exact value travels as digits). */
  def uintToDecimalString(b: Array[Byte]): UTF8String =
    UTF8String.fromString(new java.math.BigInteger(1, b).toString)

  /** Two's-complement signed counterpart of [[uintToDecimalString]] —
    * the display form for wide SIGNED ints (int256 dart/dink/rate kept
    * as raw words). */
  def intToDecimalString(b: Array[Byte]): UTF8String =
    UTF8String.fromString(new java.math.BigInteger(b).toString)

  /** EIP-55 mixed-case checksum display form of a 20-byte address
    * (public standard; replaces the reference's `w3.toChecksumAddress`,
    * eth-contract.py:39 / SURVEY S14). */
  def checksumAddress(b: Array[Byte]): UTF8String = {
    val hex = b.map(x => f"${x & 0xff}%02x").mkString
    val hash = Keccak.hash256(hex.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val sb = new StringBuilder("0x")
    var i = 0
    while (i < 40) {
      val c = hex.charAt(i)
      val nibble = (hash(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xf
      sb += (if (c.isLetter && nibble >= 8) c.toUpper else c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** PG `encode(bytea, 'escape')`: printable ASCII as-is, `\` doubled,
    * everything else `\` + 3-digit octal (see [[PgEncodeEscape]]). */
  def pgEscape(b: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(b.length + 8)
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c == '\\') sb.append("\\\\")
      else if (c >= 0x20 && c <= 0x7e) sb.append(c.toChar)
      else {
        sb.append('\\')
        val oct = Integer.toOctalString(c)
        var pad = 3 - oct.length
        while (pad > 0) { sb.append('0'); pad -= 1 }
        sb.append(oct)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** keccak256(binary) → 32-byte binary. Whole-stage-codegen friendly
  * (emits a static call — no interpreter fallback on the hot path).
  * Reference: dispatch-key computation functions.py:90-93,105. */
case class Keccak256(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    Keccak.hash256(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.abi.Keccak.hash256($c)")
  override protected def withNewChildInternal(newChild: Expression): Keccak256 =
    copy(child = newChild)
  override def prettyName: String = "keccak256"
}

/** bytes32 → ASCII with NUL bytes stripped — the Spark-native form of PG's
  * `replace(encode(ilk, 'escape'), '\000', '')`
  * (assets_per_type.sql:51, SURVEY Q15). */
case class Bytes32ToAscii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    CodecRuntime.bytesToAscii(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.CodecRuntime.bytesToAscii($c)")
  override protected def withNewChildInternal(newChild: Expression): Bytes32ToAscii =
    copy(child = newChild)
  override def prettyName: String = "bytes32_to_ascii"
}

/** checksum_address(binary[20]) → EIP-55 mixed-case display string. */
case class ChecksumAddress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    CodecRuntime.checksumAddress(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.CodecRuntime.checksumAddress($c)")
  override protected def withNewChildInternal(newChild: Expression): ChecksumAddress =
    copy(child = newChild)
  override def prettyName: String = "checksum_address"
}

/** uint_to_decimal_string(binary) → string: exact base-10 digits of a
  * big-endian unsigned integer — the lossless display form for wide
  * ints carried as 32-byte binary (`AbiSchema.tables(wideIntsAsBinary
  * = true)`, SURVEY §1.2). Rad-scale values need up to 78 digits;
  * Decimal(38) on the Spark side and HUGEINT (128-bit) on the DuckDB
  * side both overflow, so exact cross-engine comparison happens on the
  * digit string (`maker_rad_extreme`). */
case class UintToDecimalString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"uint_to_decimal_string needs binary input, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    CodecRuntime.uintToDecimalString(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.CodecRuntime.uintToDecimalString($c)")
  override protected def withNewChildInternal(newChild: Expression): UintToDecimalString =
    copy(child = newChild)
  override def prettyName: String = "uint_to_decimal_string"
}

/** int_to_decimal_string(binary) → string: the SIGNED (two's-complement)
  * counterpart of [[UintToDecimalString]] — for wide int256 columns
  * (dart/dink/rate) carried as raw words. */
case class IntToDecimalString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_to_decimal_string needs binary input, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    CodecRuntime.intToDecimalString(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.CodecRuntime.intToDecimalString($c)")
  override protected def withNewChildInternal(newChild: Expression): IntToDecimalString =
    copy(child = newChild)
  override def prettyName: String = "int_to_decimal_string"
}

/** Maker fixed-point rescaler: token quantity → double at 10^-digits.
  * wad=18, ray=27, rad=45 (SURVEY §1.2). Computed exactly as SQL
  * `CAST(x AS DOUBLE)/1eN` would be (two IEEE roundings) so results stay
  * bit-identical with warehouse SQL ports.
  *
  * Accepts DecimalType (the default uint256 mapping) AND BinaryType —
  * the rad-safe representation: rad-scale values need up to 78 decimal
  * digits, overflowing Decimal(38), so `AbiSchema.tables(wideIntsAsBinary
  * = true)` keeps them as 32-byte big-endian and this expression rescales
  * losslessly-to-double from either form. Binary signedness is dispatched
  * by the `signed` flag: the unsigned form (wad/ray/rad — the rad-scale
  * vat quantities dai/debt/tab are uint256 in the reference schema) FAILS
  * LOUDLY on a 32-byte word with its sign bit set instead of silently
  * reading a negative int256 as ~10^77 positive, because `AbiSchema
  * .sparkType(wideIntsAsBinary = true)` maps SIGNED wide ints (int256
  * dart/dink/rate) to BinaryType too and the decoder emits their raw
  * two's-complement words — for those use the signed form (wad_s/ray_s).
  * Display-form exact digits: [[UintToDecimalString]] /
  * [[IntToDecimalString]]. */
case class RescaleToDouble(child: Expression, digits: Int,
                           signed: Boolean = false)
  extends UnaryExpression {
  require(digits >= 0 && digits <= 45)
  private val divisor: Double = math.pow(10, digits)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any = input match {
    case d: Decimal => d.toDouble / divisor
    case b: Array[Byte] =>
      (if (signed) CodecRuntime.intToDouble(b)
       else CodecRuntime.uintToDoubleChecked(b)) / divisor
    case n: Long => n.toDouble / divisor
    case n: Int => n.toDouble / divisor
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType =>
        val fn = if (signed) "intToDouble" else "uintToDoubleChecked"
        defineCodeGen(ctx, ev, c =>
          s"graft.codec.CodecRuntime.$fn($c) / ${divisor}D")
      case _: DecimalType =>
        defineCodeGen(ctx, ev, c => s"$c.toDouble() / ${divisor}D")
      case _ =>
        defineCodeGen(ctx, ev, c => s"(double)$c / ${divisor}D")
    }
  override protected def withNewChildInternal(newChild: Expression): RescaleToDouble =
    copy(child = newChild)
  override def prettyName: String =
    s"rescale_e$digits${if (signed) "_s" else ""}"
}

private[codec] object CatalystConv {
  def toCatalyst(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => b
    case d: java.math.BigDecimal => Decimal(d)
    case s: String => UTF8String.fromString(s)
    case AbiDecoder.TupleValue(xs) => InternalRow.fromSeq(xs.map(toCatalyst))
    case xs: Seq[_] => new GenericArrayData(xs.map(toCatalyst).toArray)
    case other => other // Boolean / Short / Int / Long pass through
  }
}

/** abi_decode_event(topics, data) → struct of the event's params.
  * The ABI entry rides along as a JSON literal so the expression is
  * serializable to executors; parsed once per task (lazy).
  * Reference semantics: eth_event.decode_log (eth-contract.py:122, S9).
  *
  * Codegen emits a direct call into this instance (via a plan reference
  * object) rather than falling back to interpreted evaluation — the
  * decode stays inside whole-stage codegen, so scan+decode+project
  * remain one generated loop. */
case class DecodeEvent(entryJson: String, topics: Expression, data: Expression,
                       wideIntsAsBinary: Boolean = false)
  extends BinaryExpression {
  @transient private lazy val entry: AbiJson.Entry = AbiJson.parse(s"[$entryJson]").head

  override def left: Expression = topics
  override def right: Expression = data
  override def dataType: DataType = StructType(
    entry.inputs.zipWithIndex.map { case (p, i) =>
      StructField(AbiSchema.columnName(p, i),
        AbiSchema.sparkType(p, wideIntsAsBinary))
    })

  override def nullable: Boolean = true

  override protected def nullSafeEval(topicsVal: Any, dataVal: Any): Any = {
    val topicArr = topicsVal.asInstanceOf[ArrayData]
    val topicBytes = (0 until topicArr.numElements()).map(topicArr.getBinary)
    // null (→ dropped by the demux's _params filter), never a task
    // failure, on a log this entry cannot decode: distinct ABIs can
    // share a SIGNATURE (hence topic0) while splitting the params
    // indexed/non-indexed differently — such a log legitimately lands
    // in this entry's collision group but belongs only to the other
    // table (the r15 decode-through tier caught exactly this at
    // universe breadth: aave vs aave_v2 Deposit)
    try {
      val values = graft.codec.AbiDecoder.decodeEvent(
        entry, topicBytes, dataVal.asInstanceOf[Array[Byte]], wideIntsAsBinary)
      InternalRow.fromSeq(values.map(CatalystConv.toCatalyst))
    } catch { case _: Exception => null }
  }

  /** Generated-code entry point (null = undecodable by THIS entry). */
  def decode(topicsVal: ArrayData, dataVal: Array[Byte]): InternalRow =
    nullSafeEval(topicsVal, dataVal).asInstanceOf[InternalRow]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decodeEvent", this, classOf[DecodeEvent].getName)
    nullSafeCodeGen(ctx, ev, (t, d) => s"""
      ${ev.value} = $ref.decode($t, $d);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DecodeEvent =
    copy(topics = newLeft, data = newRight)
  override def prettyName: String = "abi_decode_event"
}

/** abi_decode_calldata(data) → struct of the function's params. `data` is
  * the full calldata; the selector is verified then stripped, scanning
  * word-aligned for proxy-wrapped payloads (S10, functions.py:119-149).
  * Returns null when the selector never matches. */
case class DecodeCalldata(entryJson: String, data: Expression,
                          wideIntsAsBinary: Boolean = false)
  extends UnaryExpression {
  @transient private lazy val entry: AbiJson.Entry = AbiJson.parse(s"[$entryJson]").head
  @transient private lazy val selector: Seq[Byte] =
    Keccak.hash256(entry.signature).take(4).toSeq

  override def child: Expression = data
  override def dataType: DataType = StructType(
    entry.inputs.zipWithIndex.map { case (p, i) =>
      StructField(AbiSchema.columnName(p, i),
        AbiSchema.sparkType(p, wideIntsAsBinary))
    })
  override def nullable: Boolean = true

  override protected def nullSafeEval(dataVal: Any): Any = {
    val bytes = dataVal.asInstanceOf[Array[Byte]]
    // word-aligned scan over candidate selector offsets (proxy unwrap).
    // A failed decode at one offset keeps scanning — a spurious 4-byte
    // match before the real payload must not drop the row (mirrors
    // AbiDecoder.decodeCallDispatch).
    var off = 0
    var result: Any = null
    while (result == null && off + 4 <= bytes.length && off <= 64 * 4) {
      if (bytes.slice(off, off + 4).toSeq == selector) {
        try {
          val values = AbiDecoder.decodeCall(entry, bytes.drop(off + 4),
            wideIntsAsBinary)
          result = InternalRow.fromSeq(values.map(CatalystConv.toCatalyst))
        } catch { case _: Exception => () }
      }
      off += 4
    }
    result
  }

  /** Generated-code entry point (null when no selector/decode matches). */
  def decode(bytes: Array[Byte]): InternalRow =
    nullSafeEval(bytes).asInstanceOf[InternalRow]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decodeCalldata", this, classOf[DecodeCalldata].getName)
    nullSafeCodeGen(ctx, ev, d => s"""
      ${ev.value} = $ref.decode($d);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeCalldata =
    copy(data = newChild)
  override def prettyName: String = "abi_decode_calldata"
}

/** abi_decode_dispatch_ok(table_name, topics, data) → boolean: does the
  * row decode under the ABI entry its demux tag routes it to?
  *
  * The ONE-SCAN form of "decode every table of a demuxed store": the
  * per-table formulation unions N partition-pruned [[DecodeEvent]] /
  * [[DecodeCalldata]] branches — same total IO, but the plan carries N
  * scans, N codegen stages and ≥N tasks (measured 19–28 s for N=406 at
  * 2.46M rows, ~90% plan/stage overhead). Here the entry table rides
  * along like [[DecodeEvent]]'s JSON literal and dispatch is one hash
  * lookup per row, so the whole store decodes in a single codegen'd
  * scan. Per-row work is IDENTICAL to the per-table form: the lookup
  * lands on the same [[DecodeEvent]]/[[DecodeCalldata]] instances and
  * calls their generated-code entry points (full decode + Catalyst
  * conversion, null → undecodable-by-this-entry → false, mirroring the
  * demux `_params` null-filter). Rows whose tag is unknown to `entries`
  * evaluate false — same as the per-table union never scanning them. */
case class DecodeDispatchOk(entries: Seq[(String, String, Boolean, Boolean)],
                            tableName: Expression, topics: Expression,
                            data: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = tableName
  override def second: Expression = topics
  override def third: Expression = data
  override def dataType: DataType = BooleanType

  // (qualified name → decoder) built once per task from the serialized
  // (name, entryJson, isEvent, wideIntsAsBinary) tuples; the nested
  // expressions' children are never evaluated (only their decode(...)
  // generated-code entry points run), so placeholder children are fine
  @transient private lazy val byTable: java.util.HashMap[UTF8String, AnyRef] = {
    val m = new java.util.HashMap[UTF8String, AnyRef](entries.size * 2)
    entries.foreach { case (name, json, isEvent, wide) =>
      val ph = org.apache.spark.sql.catalyst.expressions.Literal(null, BinaryType)
      val dec: AnyRef =
        if (isEvent) DecodeEvent(json, ph, ph, wide)
        else DecodeCalldata(json, ph, wide)
      m.put(UTF8String.fromString(name), dec)
    }
    m
  }

  /** Generated-code entry point. */
  def ok(name: UTF8String, topicsVal: ArrayData, dataVal: Array[Byte]): Boolean =
    byTable.get(name) match {
      case e: DecodeEvent => e.decode(topicsVal, dataVal) != null
      case c: DecodeCalldata => c.decode(dataVal) != null
      case _ => false
    }

  override protected def nullSafeEval(nameVal: Any, topicsVal: Any,
                                      dataVal: Any): Any =
    ok(nameVal.asInstanceOf[UTF8String], topicsVal.asInstanceOf[ArrayData],
      dataVal.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decodeDispatch", this,
      classOf[DecodeDispatchOk].getName)
    nullSafeCodeGen(ctx, ev, (n, t, d) =>
      s"${ev.value} = $ref.ok($n, $t, $d);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DecodeDispatchOk =
    copy(tableName = newFirst, topics = newSecond, data = newThird)
  override def prettyName: String = "abi_decode_dispatch_ok"
}

/** pg_encode_escape(binary) → string: PostgreSQL's `encode(bytea,
  * 'escape')` output format, byte-for-byte (PG datum/encode.c semantics,
  * public format): printable ASCII (0x20..0x7e) passes through,
  * backslash doubles to `\\`, every other byte becomes `\` + 3-digit
  * octal. The PG front-end ([[graft.frontend.PgDialect]]) maps
  * `encode(x, 'escape')` here so the reference's
  * `replace(encode(ilk, 'escape'), '\000', '')` idiom
  * (assets_per_type.sql:51) runs unmodified; [[Bytes32ToAscii]] remains
  * the fused Spark-native form of that whole idiom. */
case class PgEncodeEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pg_encode_escape needs binary input, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    CodecRuntime.pgEscape(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.CodecRuntime.pgEscape($c)")
  override protected def withNewChildInternal(newChild: Expression): PgEncodeEscape =
    copy(child = newChild)
  override def prettyName: String = "pg_encode_escape"
}

/** pg_div(a, b): PostgreSQL `/` semantics for the PG front-end
  * ([[graft.frontend.PgDialect]] rule 3). Integral/integral divides as
  * PG integer division — truncation toward zero (Java long semantics,
  * identical to PG's int8div and to Spark's own `div`); any other
  * numeric pairing divides as float8. Divide-by-zero yields NULL — the
  * Spark house rule (PG raises; a gated oracle query never divides by
  * zero, and NULL keeps the expression non-throwing under codegen).
  * Decimal/decimal also takes the float8 path (PG would keep exact
  * NUMERIC) — the same trade the reviewed hand ports make; every
  * division the front-end's gated queries emit has a float8 or
  * integer-typed operand. */
case class PgDiv(left: Expression, right: Expression)
  extends BinaryExpression {
  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def bothIntegral: Boolean =
    isIntegral(left.dataType) && isIntegral(right.dataType)
  override def dataType: DataType = if (bothIntegral) LongType else DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: NumericType, _: NumericType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pg_div needs numeric inputs, got ${l.simpleString} / ${r.simpleString}")
    }
  private def asDouble(v: Any, t: DataType): Double = t match {
    case _: DecimalType => v.asInstanceOf[Decimal].toDouble
    case _ => v.asInstanceOf[Number].doubleValue()
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (bothIntegral) {
      val rl = r.asInstanceOf[Number].longValue()
      if (rl == 0L) null
      else java.lang.Long.valueOf(l.asInstanceOf[Number].longValue() / rl)
    } else {
      val rd = asDouble(r, right.dataType)
      if (rd == 0.0) null
      else java.lang.Double.valueOf(asDouble(l, left.dataType) / rd)
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      def dbl(t: DataType, x: String): String = t match {
        case _: DecimalType => s"$x.toDouble()"
        case DoubleType => x
        case _ => s"(double)($x)"
      }
      if (bothIntegral) {
        s"""
           |if ((long)$r == 0L) { ${ev.isNull} = true; }
           |else { ${ev.value} = (long)$l / (long)$r; }
         """.stripMargin
      } else {
        val rd = ctx.freshName("pgDivR")
        s"""
           |double $rd = ${dbl(right.dataType, r)};
           |if ($rd == 0.0D) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${dbl(left.dataType, l)} / $rd; }
         """.stripMargin
      }
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgDiv =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pg_div"
}
