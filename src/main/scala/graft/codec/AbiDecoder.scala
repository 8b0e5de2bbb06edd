package graft.codec

import java.math.BigInteger
import graft.abi.AbiJson.{Entry, Param}
import graft.abi.AbiSchema

/** Word-level ABI codec (decode + encode) for event data and calldata.
  *
  * Implements the public Solidity ABI encoding: 32-byte words, static types
  * in place, dynamic types (bytes/string/T[]) offset-addressed head/tail.
  * Replaces the reference's `eth_event.decode_log` /
  * `contract.decode_function_input` calls (eth-contract.py:122,
  * functions.py:119-149).
  *
  * Decoded values are returned as the JVM types matching
  * [[graft.abi.AbiSchema.sparkType]]: Array[Byte] for address/bytes*,
  * Short/Int/Long for narrow ints, java.math.BigDecimal for 64..256-bit
  * ints, Boolean, String, Seq for arrays.
  */
object AbiDecoder {

  private val Word = 32

  /** Decoded ABI tuple value — distinct from Seq so the Catalyst
    * conversion can map tuples to InternalRow (struct) while plain Seq
    * stays ArrayData (array). */
  final case class TupleValue(values: Seq[Any])

  /** Array-element param that keeps tuple component info. */
  private def elemOf(p: Param, elemType: String): Param =
    Param("", elemType, indexed = false, p.components)

  // ------------------------------------------------------------- decoding

  /** Decode one event log: indexed params come from topics(1..), the rest
    * sequentially from `data`. Dynamic indexed params are keccak hashes —
    * kept as the raw 32-byte topic (standard Ethereum semantics). */
  def decodeEvent(entry: Entry, topics: Seq[Array[Byte]], data: Array[Byte],
                  wide: Boolean = false): Seq[Any] = {
    val (indexed, unindexed) = entry.inputs.partition(_.indexed)
    val topicVals = indexed.zipWithIndex.map { case (p, i) =>
      val t = topics(i + 1)
      // reference types (arrays/tuples/bytes/string) arrive as their
      // keccak hash; keep the raw topic (undecodable by design)
      if (AbiSchema.hashedWhenIndexed(p)) t
      else decodeHead(p, t, 0, t, wide)
    }
    val dataVals = decodeTuple(unindexed, data, wide)
    // re-interleave in declaration order
    var ti = 0
    var di = 0
    entry.inputs.map { p =>
      if (p.indexed) { val v = topicVals(ti); ti += 1; v }
      else { val v = dataVals(di); di += 1; v }
    }
  }

  /** Decode function calldata (selector already stripped). */
  def decodeCall(entry: Entry, argsData: Array[Byte],
                 wide: Boolean = false): Seq[Any] =
    decodeTuple(entry.inputs, argsData, wide)

  /** Decode calldata including its 4-byte selector, dispatching via `index`.
    * When the top-level selector is unknown, scans forward word-aligned for
    * a known selector — the deterministic version of the reference's
    * progressive `x+=8` retry that unwraps proxy `execute()` wrapping
    * (functions.py:130-146). Returns (tableDef, values) or None. */
  def decodeCallDispatch(data: Array[Byte],
                         index: Map[Seq[Byte], AbiSchema.TableDef],
                         maxScanWords: Int = 64): Option[(AbiSchema.TableDef, Seq[Any])] = {
    def tryAt(off: Int): Option[(AbiSchema.TableDef, Seq[Any])] =
      if (off + 4 > data.length) None
      else index.get(data.slice(off, off + 4).toSeq).flatMap { d =>
        try Some((d, decodeCall(d.entry, data.drop(off + 4))))
        catch { case _: Exception => None }
      }
    // direct, then scan at 4-byte alignment (proxy wrappers insert
    // selector+head words, all word-aligned after the outer selector)
    tryAt(0).orElse {
      (1 to maxScanWords).iterator.map(i => tryAt(i * 4)).collectFirst {
        case Some(hit) => hit
      }
    }
  }

  /** Head/tail decode of a parameter tuple. `wide` = decode 64..256-bit
    * ints as their raw 32-byte big-endian words (two's complement for
    * signed types) instead of Decimal(38,0) — the rad-safe mapping of
    * `AbiSchema.tables(wideIntsAsBinary = true)`: rad-scale uint256
    * values need up to 78 digits and silently overflow Decimal(38). */
  def decodeTuple(params: Seq[Param], data: Array[Byte],
                  wide: Boolean = false): Seq[Any] = {
    var headOff = 0
    params.map { p =>
      val v =
        if (isDynamic(p)) {
          val tailOff = uintAt(data, headOff).intValueExact()
          decodeTail(p, data, tailOff, wide)
        } else decodeHead(p, data, headOff, data, wide)
      headOff += headSize(p)
      v
    }
  }

  /** ABI spec: bytes/string/T[] are dynamic; T[k] is dynamic iff T is;
    * a tuple is dynamic iff any component is. */
  private def isDynamic(p: Param): Boolean = p.abiType match {
    case "bytes" | "string" => true
    case t if t.endsWith("[]") => true
    case FixedArrayPat(elem, _) => isDynamic(elemOf(p, elem))
    case "tuple" => p.components.exists(isDynamic)
    case _ => false
  }

  private val FixedArrayPat = raw"(.+)\[(\d+)\]".r

  private def headSize(p: Param): Int = p.abiType match {
    case _ if isDynamic(p) => Word
    case FixedArrayPat(elem, n) => // static fixed array: n in-place elements
      n.toInt * headSize(elemOf(p, elem))
    case "tuple" => p.components.map(headSize).sum // static tuple: inline
    case _ => Word
  }

  /** Decode a static value whose word starts at `off`. */
  private def decodeHead(p: Param, data: Array[Byte], off: Int,
                         full: Array[Byte], wide: Boolean = false): Any =
    p.abiType match {
      case "tuple" => // static tuple: members inline from off
        TupleValue(decodeTuple(p.components, data.drop(off), wide))
      case FixedArrayPat(elem, n) =>
        val ep = elemOf(p, elem)
        val sz = headSize(ep)
        (0 until n.toInt).map(i => decodeHead(ep, data, off + i * sz, full, wide))
      case "address" => data.slice(off + 12, off + 32)
      case "bool" => data(off + 31) != 0
      case t if t.startsWith("bytes") && t != "bytes" =>
        val n = t.drop(5).toInt
        data.slice(off, off + n)
      case t if wide && AbiSchema.isWideInt(t) =>
        // rad-safe: the raw 32-byte word, exactly as on the wire
        data.slice(off, off + Word)
      case t =>
        val signed = t.startsWith("int")
        val bi =
          if (signed) new BigInteger(data.slice(off, off + 32))
          else uintAt(data, off)
        integral(t, bi)
    }

  /** Decode a dynamic value whose tail starts at `off`. */
  private def decodeTail(p: Param, data: Array[Byte], off: Int,
                         wide: Boolean = false): Any = p.abiType match {
    case "bytes" =>
      val len = uintAt(data, off).intValueExact()
      data.slice(off + Word, off + Word + len)
    case "string" =>
      val len = uintAt(data, off).intValueExact()
      new String(data.slice(off + Word, off + Word + len),
        java.nio.charset.StandardCharsets.UTF_8)
    case t if t.endsWith("[]") =>
      val elemType = t.dropRight(2)
      val n = uintAt(data, off).intValueExact()
      val elemParam = elemOf(p, elemType)
      val base = off + Word
      if (isDynamic(elemParam)) {
        (0 until n).map { i =>
          val rel = uintAt(data, base + i * Word).intValueExact()
          decodeTail(elemParam, data, base + rel, wide)
        }
      } else {
        val sz = headSize(elemParam)
        (0 until n).map(i => decodeHead(elemParam, data, base + i * sz, data, wide))
      }
    case FixedArrayPat(elemType, nStr) => // T[k] with dynamic T: k tail offsets
      val n = nStr.toInt
      val elemParam = elemOf(p, elemType)
      (0 until n).map { i =>
        val rel = uintAt(data, off + i * Word).intValueExact()
        decodeTail(elemParam, data, off + rel, wide)
      }
    case "tuple" => // dynamic tuple: member offsets relative to tuple start
      TupleValue(decodeTuple(p.components, data.drop(off), wide))
    case other => throw new IllegalArgumentException(s"not a dynamic type: $other")
  }

  /** Integral → JVM value per the schema type map. */
  private def integral(abiType: String, v: BigInteger): Any =
    AbiSchema.sparkType(abiType) match {
      case org.apache.spark.sql.types.ShortType => v.shortValueExact()
      case org.apache.spark.sql.types.IntegerType => v.intValueExact()
      case org.apache.spark.sql.types.LongType => v.longValueExact()
      case _ => new java.math.BigDecimal(v)
    }

  private def uintAt(data: Array[Byte], off: Int): BigInteger =
    new BigInteger(1, data.slice(off, off + Word))

  // ------------------------------------------------------------- encoding
  // (used by tests + fixture generation: roundtrip property ABI §5.3)

  /** Encode a parameter tuple (calldata body / event data). */
  def encodeTuple(params: Seq[Param], values: Seq[Any]): Array[Byte] = {
    val heads = Array.ofDim[Array[Byte]](params.length)
    val tails = Array.ofDim[Array[Byte]](params.length)
    val headLen = params.map(headSize).sum
    var tailOff = headLen
    params.indices.foreach { i =>
      val p = params(i)
      if (isDynamic(p)) {
        val tail = encodeTail(p, values(i))
        heads(i) = word(BigInteger.valueOf(tailOff))
        tails(i) = tail
        tailOff += tail.length
      } else {
        heads(i) = encodeHead(p, values(i))
        tails(i) = Array.emptyByteArray
      }
    }
    (heads ++ tails).flatten.toArray
  }

  /** Encode one event: returns (topics incl. topic0, data). */
  def encodeEvent(entry: Entry, values: Seq[Any]): (Seq[Array[Byte]], Array[Byte]) = {
    val topic0 = graft.abi.Keccak.hash256(entry.signature)
    val topics = scala.collection.mutable.ArrayBuffer[Array[Byte]](topic0)
    val dataParams = scala.collection.mutable.ArrayBuffer.empty[Param]
    val dataVals = scala.collection.mutable.ArrayBuffer.empty[Any]
    entry.inputs.zip(values).foreach { case (p, v) =>
      if (p.indexed) {
        if (AbiSchema.hashedWhenIndexed(p)) topics += v.asInstanceOf[Array[Byte]] // pre-hashed
        else topics += encodeHead(p, v)
      } else { dataParams += p; dataVals += v }
    }
    (topics.toSeq, encodeTuple(dataParams.toSeq, dataVals.toSeq))
  }

  /** Encode calldata: selector + args. */
  def encodeCall(entry: Entry, values: Seq[Any]): Array[Byte] =
    graft.abi.Keccak.hash256(entry.signature).take(4) ++
      encodeTuple(entry.inputs, values)

  private def tupleValues(v: Any): Seq[Any] = v match {
    case TupleValue(xs) => xs
    case xs: Seq[_] => xs
  }

  private def encodeHead(p: Param, v: Any): Array[Byte] = p.abiType match {
    case "address" =>
      val b = v.asInstanceOf[Array[Byte]]
      new Array[Byte](12) ++ b
    case "bool" =>
      val w = new Array[Byte](32); if (v.asInstanceOf[Boolean]) w(31) = 1; w
    case "tuple" => // static tuple: members inline
      encodeTuple(p.components, tupleValues(v))
    case FixedArrayPat(elem, _) => // static T[k]: k in-place heads
      val ep = elemOf(p, elem)
      v.asInstanceOf[Seq[Any]].toArray.flatMap(x => encodeHead(ep, x))
    case t if t.startsWith("bytes") && t != "bytes" => // after T[k]: bytes32[2] is an array
      val b = v.asInstanceOf[Array[Byte]]
      java.util.Arrays.copyOf(b, 32)
    case t =>
      val bi = v match {
        case d: java.math.BigDecimal => d.toBigIntegerExact
        case bi: BigInteger => bi
        case n: Long => BigInteger.valueOf(n)
        case n: Int => BigInteger.valueOf(n.toLong)
        case n: Short => BigInteger.valueOf(n.toLong)
      }
      word(bi)
  }

  private def encodeTail(p: Param, v: Any): Array[Byte] = p.abiType match {
    case "bytes" =>
      val b = v.asInstanceOf[Array[Byte]]
      word(BigInteger.valueOf(b.length)) ++ padRight(b)
    case "string" =>
      val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
      word(BigInteger.valueOf(b.length)) ++ padRight(b)
    case t if t.endsWith("[]") =>
      val elemParam = elemOf(p, t.dropRight(2))
      val xs = v.asInstanceOf[Seq[Any]]
      word(BigInteger.valueOf(xs.length)) ++ encodeTuple(
        Seq.fill(xs.length)(elemParam), xs)
    case FixedArrayPat(elem, _) => // dynamic T[k]: tuple of k, no length word
      val elemParam = elemOf(p, elem)
      val xs = v.asInstanceOf[Seq[Any]]
      encodeTuple(Seq.fill(xs.length)(elemParam), xs)
    case "tuple" => // dynamic tuple: nested head/tail block
      encodeTuple(p.components, tupleValues(v))
    case other => throw new IllegalArgumentException(s"not a dynamic type: $other")
  }

  /** Two's-complement value into a 32-byte big-endian word. */
  private def word(v: BigInteger): Array[Byte] = {
    val out = new Array[Byte](32)
    if (v.signum() < 0) java.util.Arrays.fill(out, 0xff.toByte)
    val b = v.toByteArray // two's complement, minimal length
    val src = if (b.length > 32) b.drop(b.length - 32) else b
    System.arraycopy(src, 0, out, 32 - src.length, src.length)
    out
  }

  private def padRight(b: Array[Byte]): Array[Byte] = {
    val padded = ((b.length + 31) / 32) * 32
    java.util.Arrays.copyOf(b, padded)
  }
}
