package graft

import org.scalatest.funsuite.AnyFunSuite
import java.math.{BigDecimal => JBigDecimal, BigInteger}
import graft.abi.{AbiJson, AbiSchema, Keccak}
import graft.codec.AbiDecoder
import org.apache.spark.sql.types._

class KeccakSpec extends AnyFunSuite {
  test("keccak256 known vectors") {
    assert(Keccak.hex(Keccak.hash256("")) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(Keccak.hex(Keccak.hash256("abc")) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // ERC-20 Transfer topic0 — the ubiquitous public test vector
    assert(Keccak.hex(Keccak.hash256("Transfer(address,address,uint256)")) ==
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }

  test("keccak256 multi-block input (>136 bytes)") {
    val input = Array.fill[Byte](200)(0x61)
    // cross-checked: keccak256 of 200 'a' bytes
    assert(Keccak.hex(Keccak.hash256(input)).length == 64)
    // determinism + block boundary: 135/136/137 byte inputs all distinct
    val h = (134 to 138).map(n => Keccak.hex(Keccak.hash256(Array.fill[Byte](n)(1))))
    assert(h.distinct.size == h.size)
  }
}

class AbiJsonSpec extends AnyFunSuite {
  test("parses strict JSON ABI (jug.abi)") {
    val abi = AbiJson.parseFile("/root/reference/conf/makermcd/jug.abi")
    assert(abi.nonEmpty)
    val files = abi.filter(e => e.entryType == "function" && e.name == "file")
    assert(files.size == 3) // jug has three file overloads (SURVEY §1.1)
  }

  test("parses python-repr ABI (vat.abi, single quotes + True/False)") {
    val abi = AbiJson.parseFile("/root/reference/conf/makermcd/vat.abi")
    assert(abi.nonEmpty)
    val frob = abi.find(e => e.entryType == "function" && e.name == "frob").get
    assert(frob.inputs.map(_.abiType) ==
      Seq("bytes32", "address", "address", "address", "int256", "int256"))
    val files = abi.filter(e => e.entryType == "function" && e.name == "file")
    assert(files.size == 2) // vat has two file overloads
  }

  test("canonical signature") {
    val e = AbiJson.Entry("function", "frob",
      Seq("bytes32", "address", "address", "address", "int256", "int256")
        .map(t => AbiJson.Param("x", t, indexed = false, Nil)), "nonpayable", anonymous = false)
    assert(e.signature == "frob(bytes32,address,address,address,int256,int256)")
  }
}

class AbiSchemaSpec extends AnyFunSuite {
  test("type map follows SURVEY §1.2") {
    assert(AbiSchema.sparkType("address") == BinaryType)
    assert(AbiSchema.sparkType("uint256") == DecimalType(38, 0))
    assert(AbiSchema.sparkType("int256") == DecimalType(38, 0))
    assert(AbiSchema.sparkType("bytes32") == BinaryType)
    assert(AbiSchema.sparkType("bool") == BooleanType)
    assert(AbiSchema.sparkType("uint16") == IntegerType)
    assert(AbiSchema.sparkType("uint8") == ShortType)
    assert(AbiSchema.sparkType("string") == StringType) // NOT bytea (PG quirk)
    assert(AbiSchema.sparkType("address[]") == ArrayType(BinaryType))
    assert(AbiSchema.sparkType("uint256[]") == ArrayType(DecimalType(38, 0))) // NOT scalar
  }

  test("overload suffix rule: bare, then 0, 1 (functions.py:96-103)") {
    val abi = AbiJson.parseFile("/root/reference/conf/makermcd/jug.abi")
    val tables = AbiSchema.tables("jug", abi).map(_.table)
    assert(tables.count(_.startsWith("jug_call_file")) == 3)
    assert(tables.contains("jug_call_file"))
    assert(tables.contains("jug_call_file0"))
    assert(tables.contains("jug_call_file1"))
  }

  test("vat tables have 6 common columns + abi inputs") {
    val abi = AbiJson.parseFile("/root/reference/conf/makermcd/vat.abi")
    val frob = AbiSchema.tables("vat", abi).find(_.table == "vat_call_frob").get
    assert(frob.schema.fieldNames.take(6).toSeq == Seq("block_number", "block_hash",
      "address", "log_index", "transaction_index", "transaction_hash"))
    assert(frob.schema.fieldNames.drop(6).toSeq == Seq("i", "u", "v", "w", "dink", "dart"))
    assert(frob.schema("dart").dataType == DecimalType(38, 0))
  }

  test("view functions and anonymous events are excluded") {
    val abi = AbiJson.parseFile("/root/reference/conf/makermcd/vat.abi")
    val tables = AbiSchema.tables("vat", abi)
    // vat's LogNote event is anonymous → no evt tables from it
    assert(!tables.exists(_.table.contains("_evt_lognote")))
    // `dai` / `ilks` etc are view functions → excluded
    assert(!tables.exists(_.table == "vat_call_dai"))
  }

  test("unnamed inputs become v0, v1 (classes.py:67-72)") {
    val e = AbiJson.Entry("function", "poke",
      Seq(AbiJson.Param("", "bytes32", indexed = false, Nil),
        AbiJson.Param("", "uint256", indexed = false, Nil)), "nonpayable", anonymous = false)
    val t = AbiSchema.tables("spot", Seq(e)).head
    assert(t.schema.fieldNames.drop(6).toSeq == Seq("v0", "v1"))
  }

  test("dispatch keys: events full topic0, functions 4-byte selector") {
    val abi = AbiJson.parseFile("/root/reference/conf/makermcd/psm.abi")
    val defs = AbiSchema.tables("psm", abi)
    val buygem = defs.find(_.table == "psm_evt_buygem").get
    assert(buygem.dispatchKey.length == 32)
    val sellgem = defs.find(_.table == "psm_call_sellgem").get
    assert(sellgem.dispatchKey.length == 4)
  }
}

class AbiDecoderSpec extends AnyFunSuite {
  private def p(t: String, name: String = "x", indexed: Boolean = false) =
    AbiJson.Param(name, t, indexed, Nil)

  test("static tuple decode: vat.frob shape") {
    val entry = AbiJson.Entry("function", "frob",
      Seq(p("bytes32", "i"), p("address", "u"), p("address", "v"), p("address", "w"),
        p("int256", "dink"), p("int256", "dart")), "nonpayable", anonymous = false)
    val ilk = java.util.Arrays.copyOf("ETH-A".getBytes, 32)
    val addr = Array.tabulate[Byte](20)(_.toByte)
    val vals: Seq[Any] = Seq(ilk, addr, addr, addr,
      new JBigDecimal("12345678901234567890"), new JBigDecimal("-42"))
    val data = AbiDecoder.encodeCall(entry, vals)
    assert(data.length == 4 + 6 * 32)
    val decoded = AbiDecoder.decodeCall(entry, data.drop(4))
    assert(decoded(0).asInstanceOf[Array[Byte]].toSeq == ilk.toSeq)
    assert(decoded(1).asInstanceOf[Array[Byte]].toSeq == addr.toSeq)
    assert(decoded(4) == new JBigDecimal("12345678901234567890"))
    assert(decoded(5) == new JBigDecimal("-42")) // signed two's complement
  }

  test("wide decode: 45-digit uint256 survives as the raw 32-byte word") {
    val entry = AbiJson.Entry("function", "file",
      Seq(p("bytes32", "ilk"), p("bytes32", "what"), p("uint256", "data")),
      "nonpayable", anonymous = false)
    val ilk = java.util.Arrays.copyOf("ETH-A".getBytes, 32)
    val big = new BigInteger("123456789012345678901234567890123456789012345") // 45 digits
    assert(big.toString.length == 45 && big.bitLength > 127) // > Decimal(38), > HUGEINT
    val data = AbiDecoder.encodeCall(entry, Seq[Any](ilk, ilk, new JBigDecimal(big)))
    // default mapping throws or truncates into Decimal — wide returns the word
    val wide = AbiDecoder.decodeCall(entry, data.drop(4), wide = true)
    val word = wide(2).asInstanceOf[Array[Byte]]
    assert(word.length == 32)
    assert(new BigInteger(1, word) == big)
    assert(graft.codec.CodecRuntime.uintToDecimalString(word).toString == big.toString)
    // rescale path: rad() from binary is bit-identical to the
    // string→double route the DuckDB oracle takes
    val viaBinary = graft.codec.CodecRuntime.uintToDouble(word) / 1e45
    val viaString = big.toString.toDouble / 1e45
    assert(java.lang.Double.doubleToLongBits(viaBinary) ==
      java.lang.Double.doubleToLongBits(viaString))
    // signed wide type: the raw word IS the two's complement encoding
    val sEntry = AbiJson.Entry("function", "fold",
      Seq(p("bytes32", "i"), p("address", "u"), p("int256", "rate")),
      "nonpayable", anonymous = false)
    val neg = new BigInteger("-987654321098765432109876543210987654321")
    val sData = AbiDecoder.encodeCall(sEntry,
      Seq[Any](ilk, new Array[Byte](20), new JBigDecimal(neg)))
    val sWide = AbiDecoder.decodeCall(sEntry, sData.drop(4), wide = true)
    val sWord = sWide(2).asInstanceOf[Array[Byte]]
    assert(new BigInteger(sWord) == neg) // signed interpretation roundtrips
    assert(graft.codec.CodecRuntime.intToDecimalString(sWord).toString == neg.toString)
    // wide ARRAY element path: uint256[] decodes as 32-byte words too
    val aEntry = AbiJson.Entry("function", "batch",
      Seq(p("uint256[]", "xs")), "nonpayable", anonymous = false)
    val vals = Seq(big, big.add(BigInteger.ONE)).map(new JBigDecimal(_))
    val aData = AbiDecoder.encodeCall(aEntry, Seq[Any](vals))
    val aWide = AbiDecoder.decodeCall(aEntry, aData.drop(4), wide = true)
    val words = aWide(0).asInstanceOf[Seq[Any]].map(_.asInstanceOf[Array[Byte]])
    assert(words.map(w => new BigInteger(1, w)) ==
      Seq(big, big.add(BigInteger.ONE)))
  }

  test("event decode with indexed params: psm BuyGem") {
    val entry = AbiJson.Entry("event", "BuyGem",
      Seq(p("address", "owner", indexed = true), p("uint256", "value"), p("uint256", "fee")),
      "", anonymous = false)
    val owner = Array.tabulate[Byte](20)(i => (i + 1).toByte)
    val vals: Seq[Any] = Seq(owner, new JBigDecimal("5000000"), new JBigDecimal("2500"))
    val (topics, data) = AbiDecoder.encodeEvent(entry, vals)
    assert(topics.length == 2) // topic0 + indexed owner
    assert(topics.head.toSeq == Keccak.hash256("BuyGem(address,uint256,uint256)").toSeq)
    val decoded = AbiDecoder.decodeEvent(entry, topics, data)
    assert(decoded(0).asInstanceOf[Array[Byte]].toSeq == owner.toSeq)
    assert(decoded(1) == new JBigDecimal("5000000"))
    assert(decoded(2) == new JBigDecimal("2500"))
  }

  test("dynamic types: bytes, string, uint256[], address[]") {
    val params = Seq(p("bytes", "b"), p("string", "s"), p("uint256[]", "ns"), p("address[]", "as"))
    val addr1 = Array.fill[Byte](20)(7)
    val vals: Seq[Any] = Seq(
      Array[Byte](1, 2, 3, 4, 5),
      "hello graft",
      Seq(new JBigDecimal("1"), new JBigDecimal("2"), new JBigDecimal(BigInteger.TWO.pow(200))),
      Seq(addr1))
    val data = AbiDecoder.encodeTuple(params, vals)
    val decoded = AbiDecoder.decodeTuple(params, data)
    assert(decoded(0).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3, 4, 5))
    assert(decoded(1) == "hello graft")
    assert(decoded(2).asInstanceOf[Seq[Any]] ==
      Seq(new JBigDecimal("1"), new JBigDecimal("2"), new JBigDecimal(BigInteger.TWO.pow(200))))
    assert(decoded(3).asInstanceOf[Seq[Any]].head.asInstanceOf[Array[Byte]].toSeq == addr1.toSeq)
  }

  test("proxy-wrapped calldata is found by the aligned scan (functions.py:130-146)") {
    val entry = AbiJson.Entry("function", "frob",
      Seq(p("bytes32", "i"), p("int256", "dart")), "nonpayable", anonymous = false)
    val defs = AbiSchema.tables("vat", Seq(entry))
    val index = AbiSchema.dispatchIndex(defs)
    val inner = AbiDecoder.encodeCall(entry,
      Seq(java.util.Arrays.copyOf("ETH-A".getBytes, 32), new JBigDecimal("99")))
    // wrap: unknown outer selector + one head word + inner calldata
    val wrapped = Array[Byte](0x1c, 0x2d, 0x3e, 0x4f) ++ new Array[Byte](32) ++ inner
    val hit = AbiDecoder.decodeCallDispatch(wrapped, index)
    assert(hit.isDefined)
    assert(hit.get._1.table == "vat_call_frob")
    assert(hit.get._2(1) == new JBigDecimal("99"))
  }

  test("tuples: static, dynamic, fixed arrays of dynamic, tuple arrays") {
    import AbiDecoder.TupleValue
    def tup(name: String, suffix: String, comps: AbiJson.Param*) =
      AbiJson.Param(name, s"tuple$suffix", indexed = false, comps.toSeq)
    val addr = Array.fill[Byte](20)(9)

    // static tuple (uint256, address) inline
    val staticT = tup("t", "", p("uint256", "a"), p("address", "b"))
    val sVals: Seq[Any] = Seq(TupleValue(Seq(new JBigDecimal("77"), addr)), new JBigDecimal("5"))
    val sParams = Seq(staticT, p("uint256", "after"))
    val sDec = AbiDecoder.decodeTuple(sParams, AbiDecoder.encodeTuple(sParams, sVals))
    assert(sDec(0).asInstanceOf[TupleValue].values(0) == new JBigDecimal("77"))
    assert(sDec(1) == new JBigDecimal("5"))

    // dynamic tuple (string member) offset-addressed
    val dynT = tup("d", "", p("string", "s"), p("uint256", "n"))
    val dVals: Seq[Any] = Seq(TupleValue(Seq("hello tuple", new JBigDecimal("3"))))
    val dDec = AbiDecoder.decodeTuple(Seq(dynT), AbiDecoder.encodeTuple(Seq(dynT), dVals))
    assert(dDec(0).asInstanceOf[TupleValue].values == Seq("hello tuple", new JBigDecimal("3")))

    // fixed array of dynamic elements: string[2] (ADVICE: T[k] dynamic iff T is)
    val sa = Seq(p("string[2]", "xs"), p("uint256", "z"))
    val saVals: Seq[Any] = Seq(Seq("one", "two"), new JBigDecimal("8"))
    val saDec = AbiDecoder.decodeTuple(sa, AbiDecoder.encodeTuple(sa, saVals))
    assert(saDec(0).asInstanceOf[Seq[Any]] == Seq("one", "two"))
    assert(saDec(1) == new JBigDecimal("8"))

    // dynamic array of static tuples
    val arrT = tup("ts", "[]", p("uint256", "x"), p("uint256", "y"))
    val aVals: Seq[Any] = Seq(Seq(
      TupleValue(Seq(new JBigDecimal("1"), new JBigDecimal("2"))),
      TupleValue(Seq(new JBigDecimal("3"), new JBigDecimal("4")))))
    val aDec = AbiDecoder.decodeTuple(Seq(arrT), AbiDecoder.encodeTuple(Seq(arrT), aVals))
    assert(aDec(0).asInstanceOf[Seq[Any]].map(_.asInstanceOf[TupleValue].values) ==
      Seq(Seq(new JBigDecimal("1"), new JBigDecimal("2")),
        Seq(new JBigDecimal("3"), new JBigDecimal("4"))))

    // schema: tuple → StructType; indexed reference type → topic hash binary
    val struct = AbiSchema.sparkType(staticT)
    assert(struct == StructType(Seq(StructField("a", DecimalType(38, 0)),
      StructField("b", BinaryType))))
    assert(AbiSchema.sparkType(
      AbiJson.Param("ix", "tuple", indexed = true,
        Seq(p("uint256", "a")))) == BinaryType)
    assert(AbiSchema.sparkType(p("uint256[]", "u", indexed = true)) == BinaryType)
  }

  test("roundtrip property: encode→decode = id for the §1.2 type universe") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val u = new JBigDecimal(new BigInteger(rnd.nextInt(256), rnd.self))
      val i = new JBigDecimal(BigInteger.valueOf(rnd.nextLong())
        .multiply(BigInteger.valueOf(rnd.nextLong())))
      val a = Array.fill[Byte](20)(rnd.nextInt().toByte)
      val b32 = Array.fill[Byte](32)(rnd.nextInt().toByte)
      val s = rnd.alphanumeric.take(rnd.nextInt(100)).mkString
      val params = Seq(p("uint256", "u"), p("int256", "i"), p("address", "a"),
        p("bytes32", "b"), p("string", "s"), p("bool", "f"))
      val vals: Seq[Any] = Seq(u, i, a, b32, s, rnd.nextBoolean())
      val decoded = AbiDecoder.decodeTuple(params, AbiDecoder.encodeTuple(params, vals))
      assert(decoded(0) == u)
      assert(decoded(1) == i)
      assert(decoded(2).asInstanceOf[Array[Byte]].toSeq == a.toSeq)
      assert(decoded(3).asInstanceOf[Array[Byte]].toSeq == b32.toSeq)
      assert(decoded(4) == s)
      assert(decoded(5) == vals(5))
    }
  }

  test("fuzz roundtrip: 300 random nested ABI shapes (tuples/arrays/dynamics)") {
    import AbiDecoder.TupleValue
    val rnd = new scala.util.Random(4242)

    def randType(depth: Int): AbiJson.Param = {
      val leafs = Seq("uint256", "int256", "address", "bytes32", "bool",
        "string", "bytes", "uint16", "uint8")
      rnd.nextInt(if (depth >= 2) 6 else 10) match {
        case n if n < 6 => AbiJson.Param(s"f$n", leafs(rnd.nextInt(leafs.size)),
          indexed = false, Nil)
        case 6 | 7 => // tuple of 1..3 members
          AbiJson.Param("t", "tuple", indexed = false,
            Seq.fill(1 + rnd.nextInt(3))(randType(depth + 1)))
        case 8 => // dynamic array of a non-array element
          val e = randType(depth + 1)
          AbiJson.Param("arr", e.abiType + "[]", indexed = false, e.components)
        case 9 => // fixed array
          val e = randType(depth + 1)
          AbiJson.Param("fix", e.abiType + s"[${1 + rnd.nextInt(3)}]",
            indexed = false, e.components)
      }
    }

    def randValue(p: AbiJson.Param): Any = p.abiType match {
      case t if t.endsWith("[]") =>
        val e = AbiJson.Param("", t.dropRight(2), indexed = false, p.components)
        Seq.fill(rnd.nextInt(3))(randValue(e))
      case t if t.matches(".+\\[\\d+\\]") =>
        val n = t.substring(t.lastIndexOf('[') + 1, t.length - 1).toInt
        val e = AbiJson.Param("", t.substring(0, t.lastIndexOf('[')),
          indexed = false, p.components)
        Seq.fill(n)(randValue(e))
      case "tuple" => TupleValue(p.components.map(randValue))
      case "uint256" => new JBigDecimal(new BigInteger(rnd.nextInt(256), rnd.self))
      case "int256" => new JBigDecimal(BigInteger.valueOf(rnd.nextLong()))
      case "uint16" => rnd.nextInt(65536)
      case "uint8" => rnd.nextInt(256).toShort
      case "address" => Array.fill[Byte](20)(rnd.nextInt().toByte)
      case "bytes32" => Array.fill[Byte](32)(rnd.nextInt().toByte)
      case "bytes" => Array.fill[Byte](rnd.nextInt(70))(rnd.nextInt().toByte)
      case "string" => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      case "bool" => rnd.nextBoolean()
    }

    // structural equality that treats byte arrays by content
    def eq(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (TupleValue(x), TupleValue(y)) =>
        x.size == y.size && x.zip(y).forall((eq _).tupled)
      case (x: Seq[_], y: Seq[_]) =>
        x.size == y.size && x.zip(y).forall((eq _).tupled)
      case (x, y) => x == y
    }

    (1 to 300).foreach { i =>
      val params = Seq.fill(1 + rnd.nextInt(4))(randType(0))
      val vals = params.map(randValue)
      val decoded = AbiDecoder.decodeTuple(params,
        AbiDecoder.encodeTuple(params, vals))
      vals.zip(decoded).zipWithIndex.foreach { case ((v, d), j) =>
        assert(eq(v, d), s"iteration $i param $j (${params(j).abiType}): $v != $d")
      }
    }
  }

  test("corpus-wide roundtrip: encode→decode = id for all 412 real table shapes") {
    val rnd = new scala.util.Random(7)
    def valueFor(t: String, indexed: Boolean): Any =
      if (indexed && (t == "string" || t == "bytes" || t.endsWith("[]")))
        Array.fill[Byte](32)(rnd.nextInt().toByte) // pre-hashed topic
      else t match {
        case "address" => Array.fill[Byte](20)(rnd.nextInt().toByte)
        case "bool" => rnd.nextBoolean()
        case "string" => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
        case "bytes" => Array.fill[Byte](rnd.nextInt(100))(rnd.nextInt().toByte)
        case b if b.startsWith("bytes") =>
          Array.fill[Byte](b.drop(5).toInt)(rnd.nextInt().toByte)
        case "uint8" => rnd.nextInt(256).toShort
        case "uint16" => rnd.nextInt(65536)
        case a if a.endsWith("[]") =>
          Seq.fill(rnd.nextInt(4))(valueFor(a.dropRight(2), indexed = false))
        case i if i.startsWith("int") =>
          new JBigDecimal(BigInteger.valueOf(rnd.nextLong()))
        case u if u.startsWith("uint") =>
          new JBigDecimal(new BigInteger(200, rnd.self))
        case other => fail(s"no generator for ABI type $other")
      }
    def same(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
      case (x: Seq[_], y: Seq[_]) =>
        x.length == y.length && x.zip(y).forall { case (p, q) => same(p, q) }
      case (x, y) => x == y
    }

    val confDir = new java.io.File("/root/reference/conf")
    val defs = confDir.listFiles.filter(_.isDirectory).flatMap(_.listFiles)
      .filter(_.getName.endsWith(".abi"))
      .flatMap(f => AbiSchema.tables(f.getName.stripSuffix(".abi"),
        AbiJson.parseFile(f.getPath)))
    assert(defs.length >= 400)
    defs.foreach { d =>
      val values = d.entry.inputs.map(p => valueFor(p.abiType, p.indexed))
      val decoded =
        if (d.isEvent) {
          val (topics, data) = AbiDecoder.encodeEvent(d.entry, values)
          AbiDecoder.decodeEvent(d.entry, topics, data)
        } else {
          val call = AbiDecoder.encodeCall(d.entry, values)
          AbiDecoder.decodeCall(d.entry, call.drop(4))
        }
      values.zip(decoded).zipWithIndex.foreach { case ((v, dv), i) =>
        assert(same(v, dv),
          s"${d.table} param $i (${d.entry.inputs(i).abiType}): $v != $dv")
      }
    }
  }

  test("full ABI corpus: every table derives a schema (28 ABIs, 412 tables)") {
    val confDir = new java.io.File("/root/reference/conf")
    val abiFiles = confDir.listFiles.filter(_.isDirectory).flatMap(_.listFiles)
      .filter(_.getName.endsWith(".abi"))
    assert(abiFiles.length >= 28)
    val all = abiFiles.flatMap { f =>
      val contract = f.getName.stripSuffix(".abi")
      AbiSchema.tables(contract, AbiJson.parseFile(f.getPath))
    }
    assert(all.length >= 400) // SURVEY §1.1: 412 tables
    all.foreach(d => assert(d.schema.fields.length >= 6))
    // every dispatch key is well-formed
    all.foreach(d => assert(d.dispatchKey.length == (if (d.isEvent) 32 else 4)))
  }
}

/** ABI fetch-and-cache layer (reference functions.py:20-37). */
class AbiFetchSpec extends AnyFunSuite {
  import graft.abi.{AbiCache, MapAbiFetcher}

  private val jugText =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/conf/makermcd/jug.abi"))

  test("cache miss fetches, writes through, and parses") {
    val tmp = java.nio.file.Files.createTempDirectory("abicache").toString
    val fetcher = new MapAbiFetcher(Map("19c0976f590d67707e62397c87829d896dc0f1f1" -> jugText))
    val cache = new AbiCache(tmp, fetcher)
    val parsed = cache.abi("makermcd", "jug", "19c0976f590d67707e62397c87829d896dc0f1f1")
    assert(parsed.nonEmpty && fetcher.calls == 1)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(tmp, "makermcd", "jug.abi")))
  }

  test("cache hit never touches the fetcher") {
    val tmp = java.nio.file.Files.createTempDirectory("abicache").toString
    val fetcher = new MapAbiFetcher(Map("19c0976f590d67707e62397c87829d896dc0f1f1" -> jugText))
    val cache = new AbiCache(tmp, fetcher)
    val a = cache.abi("makermcd", "jug", "19c0976f590d67707e62397c87829d896dc0f1f1")
    val b = cache.abi("makermcd", "jug", "19c0976f590d67707e62397c87829d896dc0f1f1")
    assert(fetcher.calls == 1 && a == b)
  }

  test("pre-seeded reference cache dir (python-repr dialect) reads without fetch") {
    // the reference's own conf tree IS a cache directory in its dialect
    val fetcher = new MapAbiFetcher(Map.empty)
    val cache = new AbiCache("/root/reference/conf", fetcher)
    val vat = cache.abi("makermcd", "vat", "deadbeef")
    assert(vat.exists(_.name == "frob") && fetcher.calls == 0)
  }

  test("bad fetched text is not cached") {
    val tmp = java.nio.file.Files.createTempDirectory("abicache").toString
    val fetcher = new MapAbiFetcher(Map("00" -> "not json at all {"))
    val cache = new AbiCache(tmp, fetcher)
    intercept[Exception] { cache.abi("s", "c", "00") }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tmp, "s", "c.abi")))
  }
}
