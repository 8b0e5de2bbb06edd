package graft.abi

import scala.collection.mutable.ArrayBuffer

/** ABI JSON model + a tolerant parser.
  *
  * The reference caches Etherscan ABIs by writing the *Python repr* of the
  * parsed list (single-quoted strings, True/False/None —
  * functions.py:32), so on-disk ABIs come in two dialects. This parser
  * accepts strict JSON and the repr-ish variant. No external deps — the
  * grammar is tiny and self-contained.
  */
object AbiJson {

  /** One input/output parameter of an ABI entry. */
  final case class Param(name: String, abiType: String, indexed: Boolean,
                         components: Seq[Param])

  /** One ABI entry (function/event/constructor/...). */
  final case class Entry(entryType: String, name: String, inputs: Seq[Param],
                         stateMutability: String, anonymous: Boolean) {
    /** Canonical signature `name(type1,type2,…)` used for selectors/topic0. */
    def signature: String = s"$name(${inputs.map(canonicalType).mkString(",")})"
  }

  /** Canonical ABI type for signature purposes (tuples expand to components). */
  def canonicalType(p: Param): String =
    if (p.abiType.startsWith("tuple")) {
      val suffix = p.abiType.drop("tuple".length) // "", "[]", "[2]" …
      s"(${p.components.map(canonicalType).mkString(",")})$suffix"
    } else p.abiType

  def parse(text: String): Seq[Entry] = {
    val v = new Parser(text).parseValue()
    v match {
      case arr: Seq[_] => arr.collect { case m: Map[String @unchecked, Any @unchecked] => toEntry(m) }
      case _ => throw new IllegalArgumentException("ABI root is not a list")
    }
  }

  /** Render one entry back to strict JSON (used to ship ABI entries inside
    * serialized Catalyst expressions). parse(render(e)) == e. */
  def render(e: Entry): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def renderParam(p: Param): String = {
      val comps = if (p.components.nonEmpty)
        s""","components":[${p.components.map(renderParam).mkString(",")}]""" else ""
      s"""{"name":${q(p.name)},"type":${q(p.abiType)},"indexed":${p.indexed}$comps}"""
    }
    s"""{"type":${q(e.entryType)},"name":${q(e.name)},"inputs":[${
      e.inputs.map(renderParam).mkString(",")}],"stateMutability":${
      q(e.stateMutability)},"anonymous":${e.anonymous}}"""
  }

  def parseFile(path: String): Seq[Entry] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  private def toEntry(m: Map[String, Any]): Entry = Entry(
    entryType = m.getOrElse("type", "function").toString,
    name = m.getOrElse("name", "").toString,
    inputs = m.get("inputs") match {
      case Some(xs: Seq[_]) => xs.collect { case p: Map[String @unchecked, Any @unchecked] => toParam(p) }
      case _ => Nil
    },
    stateMutability = m.getOrElse("stateMutability", "").toString,
    anonymous = m.get("anonymous").contains(true))

  private def toParam(m: Map[String, Any]): Param = Param(
    name = m.getOrElse("name", "").toString,
    abiType = m.getOrElse("type", "").toString,
    indexed = m.get("indexed").contains(true),
    components = m.get("components") match {
      case Some(xs: Seq[_]) => xs.collect { case p: Map[String @unchecked, Any @unchecked] => toParam(p) }
      case _ => Nil
    })

  /** Recursive-descent parser for JSON + Python-repr dialect. */
  private final class Parser(s: String) {
    private var pos = 0

    def parseValue(): Any = {
      skipWs()
      s.charAt(pos) match {
        case '[' => parseArray()
        case '{' => parseObject()
        case '"' | '\'' => parseString()
        case 't' => expect("true"); true
        case 'T' => expect("True"); true
        case 'f' => expect("false"); false
        case 'F' => expect("False"); false
        case 'n' => expect("null"); null
        case 'N' => expect("None"); null
        case _ => parseNumber()
      }
    }

    private def parseArray(): Seq[Any] = {
      pos += 1 // [
      val out = ArrayBuffer.empty[Any]
      skipWs()
      if (peek() == ']') { pos += 1; return out.toSeq }
      while (true) {
        out += parseValue()
        skipWs()
        peek() match {
          case ',' => pos += 1; skipWs()
          case ']' => pos += 1; return out.toSeq
          case c => fail(s"expected , or ] got $c")
        }
      }
      out.toSeq
    }

    private def parseObject(): Map[String, Any] = {
      pos += 1 // {
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      skipWs()
      if (peek() == '}') { pos += 1; return out.toMap }
      while (true) {
        skipWs()
        val k = parseString()
        skipWs()
        if (peek() != ':') fail("expected :")
        pos += 1
        out(k) = parseValue()
        skipWs()
        peek() match {
          case ',' => pos += 1
          case '}' => pos += 1; return out.toMap
          case c => fail(s"expected , or } got $c")
        }
      }
      out.toMap
    }

    private def parseString(): String = {
      val quote = peek()
      if (quote != '"' && quote != '\'') fail(s"expected string got $quote")
      pos += 1
      val sb = new StringBuilder
      while (peek() != quote) {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => sb += other
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.toString
    }

    private def parseNumber(): Any = {
      val start = pos
      while (pos < s.length && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos)))) pos += 1
      val t = s.substring(start, pos)
      if (t.contains('.') || t.contains('e') || t.contains('E')) t.toDouble
      else t.toLong
    }

    private def peek(): Char = s.charAt(pos)
    private def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def expect(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) fail(s"expected $lit")
      pos += lit.length
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"ABI parse error at $pos: $msg")
  }
}
