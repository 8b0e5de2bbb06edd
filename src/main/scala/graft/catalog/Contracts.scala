package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** Contract registry from the reference's HOCON config tree (SURVEY §1.4:
  * config.conf includes per-schema contract files; per contract:
  * addresses, creationBlock, optional blocksStep with global fallback —
  * eth-contract.py:17-31).
  *
  * The parser covers the subset the reference's configs use: `key = v`,
  * `key: v`, `key { … }`, single-line arrays, quoted/unquoted scalars
  * (incl. python `None`), `#`/`//` comments, and `include "path"`
  * (resolved relative to the including file; missing includes are
  * skipped — the shipped config includes dev.conf/prod.conf which do
  * not exist in the repo).
  */
object Contracts {

  final case class Contract(schema: String, name: String,
                            addresses: Seq[String], creationBlock: Long,
                            blocksStep: Long)

  final case class Registry(contracts: Seq[Contract], defaultBlocksStep: Long) {
    def apply(schema: String, name: String): Contract =
      contracts.find(c => c.schema == schema && c.name == name)
        .getOrElse(throw new NoSuchElementException(s"$schema.$name"))
  }

  /** Parse a config tree rooted at `path` into the registry. */
  def load(path: String): Registry = {
    val root = Hocon.parseFile(Paths.get(path))
    val defaultStep = root.get("blocksStep") match {
      case Some(n: Long) => n
      case _ => 100L
    }
    val contractsNode = root.get("contracts") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => Map.empty[String, Any]
    }
    val out = for {
      (schema, v) <- contractsNode.toSeq
      schemaMap <- v match {
        case m: Map[String @unchecked, Any @unchecked] => Seq(m)
        case _ => Nil
      }
      (name, cv) <- schemaMap.toSeq
      c <- cv match {
        case m: Map[String @unchecked, Any @unchecked] => Seq(m)
        case _ => Nil
      }
    } yield Contract(
      schema = schema,
      name = name,
      addresses = c.get("addresses") match {
        case Some(xs: Seq[_]) => xs.collect { case s: String => s.toLowerCase }
        case _ => Nil
      },
      creationBlock = c.get("creationBlock") match {
        case Some(n: Long) => n
        case _ => 0L
      },
      blocksStep = c.get("blocksStep") match {
        case Some(n: Long) => n
        case _ => defaultStep
      })
    Registry(out, defaultStep)
  }

  /** Minimal tolerant HOCON-subset parser (line-oriented). */
  object Hocon {

    def parseFile(path: Path): Map[String, Any] = {
      if (!Files.exists(path)) return Map.empty
      val text = new String(Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      parse(text, path.toAbsolutePath.getParent)
    }

    def parse(text: String, baseDir: Path): Map[String, Any] = {
      val rootObj = mutable.LinkedHashMap.empty[String, Any]
      val stack = mutable.Stack[mutable.LinkedHashMap[String, Any]](rootObj)
      val IncludeRe = raw"""include\s+"([^"]+)"""".r
      val BlockOpenRe = raw"""([A-Za-z0-9_.\-]+)\s*[:=]?\s*\{""".r
      val KeyValRe = raw"""([A-Za-z0-9_.\-]+)\s*[:=]\s*(.*)""".r

      stripComments(text).linesIterator.map(_.trim).filter(_.nonEmpty).foreach {
        case IncludeRe(rel) =>
          val inc = parseFile(baseDir.resolve(rel))
          merge(stack.top, inc)
        case "}" =>
          if (stack.size > 1) stack.pop()
        case BlockOpenRe(key) =>
          val child = stack.top.get(key) match {
            case Some(m: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) => m
            case _ =>
              val m = mutable.LinkedHashMap.empty[String, Any]
              stack.top(key) = m
              m
          }
          stack.push(child)
        case KeyValRe(key, raw) =>
          val v = raw.trim
          if (v.nonEmpty) stack.top(key) = parseValue(v)
        case _ => // bare token (e.g. stray line) — ignore
      }
      deepImmutable(rootObj)
    }

    private def merge(into: mutable.LinkedHashMap[String, Any], from: Map[String, Any]): Unit =
      from.foreach { case (k, v) =>
        (into.get(k), v) match {
          case (Some(a: mutable.LinkedHashMap[String @unchecked, Any @unchecked]),
                b: Map[String @unchecked, Any @unchecked]) =>
            merge(a, b)
          case (_, b: Map[String @unchecked, Any @unchecked]) =>
            val m = mutable.LinkedHashMap.empty[String, Any]
            merge(m, b)
            into(k) = m
          case (_, b) => into(k) = b
        }
      }

    private def parseValue(v: String): Any = v match {
      case s if s.startsWith("[") =>
        val inner = s.stripPrefix("[").stripSuffix("]").trim
        if (inner.isEmpty) Nil
        else inner.split(',').toSeq.map(x => parseScalar(x.trim))
      case s => parseScalar(s)
    }

    private def parseScalar(v: String): Any = v match {
      case s if s.startsWith("\"") || s.startsWith("'") =>
        s.substring(1, math.max(1, s.length - 1))
      case "None" | "null" => null
      case "true" | "True" => true
      case "false" | "False" => false
      case s if s.matches("-?\\d+") => s.toLong
      case s if s.matches("-?\\d*\\.\\d+([eE]-?\\d+)?") => s.toDouble
      case s => s
    }

    /** Drop `#` and `//` comments (quote-aware). */
    private def stripComments(text: String): String =
      text.linesIterator.map { line =>
        var inQ = false
        var qc = ' '
        val sb = new StringBuilder
        var i = 0
        var done = false
        while (i < line.length && !done) {
          val c = line.charAt(i)
          if (inQ) {
            sb += c
            if (c == qc) inQ = false
          } else c match {
            case '"' | '\'' => inQ = true; qc = c; sb += c
            case '#' => done = true
            case '/' if i + 1 < line.length && line.charAt(i + 1) == '/' => done = true
            case other => sb += other
          }
          i += 1
        }
        sb.toString
      }.mkString("\n")

    private def deepImmutable(m: mutable.LinkedHashMap[String, Any]): Map[String, Any] =
      m.map {
        case (k, v: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) =>
          k -> deepImmutable(v)
        case (k, v) => k -> v
      }.toMap
  }
}
