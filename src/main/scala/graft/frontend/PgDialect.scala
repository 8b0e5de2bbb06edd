package graft.frontend

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PostgreSQL-dialect SQL front-end: a deterministic, token-level
  * PG→Spark-SQL translator, sized to run the reference warehouse's shipped
  * query artifacts byte-for-byte from disk
  * (`queries/makerdao/assets_per_type.sql:1-79` — the one query file the
  * reference repo ships; SURVEY §7.3 documents the dialect gaps this
  * closes). The translation is SYNTAX, not semantics: each rule maps one
  * documented PG construct onto the Spark construct with the same meaning,
  * so the translated text plans through Catalyst exactly like a hand port.
  *
  * Rules (each token-aware — string literals, quoted identifiers and
  * comments are never rewritten from inside):
  *
  *   1. String literals: PG `standard_conforming_strings=on` treats
  *      backslash as a plain character; Spark unescapes it. Every
  *      backslash in a literal is doubled so `'\000'` stays the
  *      four-character text PG sees (assets_per_type.sql:51).
  *   2. `a ^ b` → `POWER(a, b)` with PG's precedence (`^` binds tighter
  *      than `*`/`/`, left-associative): `data/10^27` →
  *      `data/POWER(10,27)` (assets_per_type.sql:31). NOTE: PG resolves
  *      integer`^`integer to NUMERIC power; like the hand ports this
  *      front-end uses float8 power — the only shape Spark evaluates
  *      natively — which is also what PG itself computes the moment
  *      either operand is float8.
  *   3. `a / b` → `pg_div(a, b)` ([[graft.codec.PgDiv]]): PG truncates
  *      integer/integer division toward zero where Spark's `/` promotes
  *      to double (assets_per_type.sql:50 `block_number/10000`); all
  *      other numeric pairings divide as float8. The left operand is the
  *      full preceding multiplicative chain (`a*b/c` = `(a*b)/c`).
  *   4. `expr::type` → `CAST(expr AS T)` with the PG→Spark type map
  *      (`numeric` unqualified → DECIMAL(38,0), the warehouse's
  *      uint256/numeric storage type per the reference's PG DDL mapping,
  *      classes.py:137; `int` → INT; `timestamp` → TIMESTAMP_NTZ; ...).
  *   5. `encode(x, 'escape')` → `pg_encode_escape(x)`
  *      ([[graft.codec.PgEncodeEscape]]) — a faithful PG escape encoder
  *      (octal escapes), so `replace(encode(ilk,'escape'),'\000','')`
  *      strips NUL bytes exactly as in PG.
  *   6. Implicit-lateral table functions: PG allows a correlated
  *      set-returning function as a bare FROM item; Spark needs the
  *      LATERAL keyword and a column alias. `cross join
  *      generate_series(a,b,s) d` → `cross join LATERAL
  *      generate_series(a,b,s) AS d(d)` (assets_per_type.sql:27); the
  *      `generate_series` TVF itself is registered by
  *      [[graft.codec.GraftFunctions.registerGenerateSeries]].
  *
  * Documented non-goals (none appear in the reference's artifacts):
  * `E'...'` escape-string literals, dollar-quoting, `FILTER (WHERE ...)`
  * aggregate suffixes as division operands, and PG exact-NUMERIC
  * arithmetic for `^`/`/` on two decimals (float8 semantics apply, the
  * same trade the three reviewed hand ports make — every rewrite is
  * oracle-covered by `assets_per_type*` gates).
  */
object PgDialect {

  /** Translate PG-dialect SQL text to Spark SQL text. Pure function. */
  def translate(pgSql: String): String = {
    var ts = lex(pgSql)
    ts = ts.map { case Lit(t) => Lit(escapeLiteral(t)); case t => t }
    ts = rewriteEncodeEscape(ts)
    // casts FIRST: `::` binds tighter than every arithmetic operator in
    // PG, so `7 / 2::numeric` must become pg_div(7, CAST(2 AS ...)) —
    // rewritten casts are ordinary call primaries for the scans below
    ts = rewriteCasts(ts)
    // then `^` (tighter than * / %), with the left operand absorbing a
    // unary sign: PG puts unary minus ABOVE `^`, so -2^2 = (-2)^2 = 4
    ts = rewriteBinOp(ts, "^",
      (v, le) => absorbUnary(v, primaryBack(v, le)), "POWER")
    ts = rewriteBinOp(ts, "/", divLeftStart, "pg_div")
    ts = rewriteLateralTvfs(ts)
    ts.map(_.text).mkString
  }

  /** Register the dialect's runtime functions and run translated SQL. */
  def run(spark: SparkSession, pgSql: String): DataFrame = {
    graft.codec.GraftFunctions.register(spark)
    spark.sql(translate(pgSql))
  }

  // ---------------------------------------------------------------- lexer

  private[frontend] sealed trait Tok { def text: String }
  private[frontend] case class Ws(text: String) extends Tok // + comments
  private[frontend] case class Ident(text: String) extends Tok // + "quoted"
  private[frontend] case class Num(text: String) extends Tok
  private[frontend] case class Lit(text: String) extends Tok // '...' incl quotes
  private[frontend] case class Op(text: String) extends Tok

  private val twoCharOps = Set("::", "<>", "<=", ">=", "!=", "||")

  private[frontend] def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) {
        val j = i; while (i < n && s.charAt(i).isWhitespace) i += 1
        out += Ws(s.substring(j, i))
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        val j = i; while (i < n && s.charAt(i) != '\n') i += 1
        out += Ws(s.substring(j, i))
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val j = i; i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        require(i + 1 < n, "PgDialect: unterminated /* comment")
        i += 2; out += Ws(s.substring(j, i))
      } else if (c == '\'') {
        // PG standard_conforming_strings: backslash is plain, '' escapes a quote
        val j = i; i += 1
        var closed = false
        while (i < n && !closed) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 else { closed = true; i += 1 }
          } else i += 1
        }
        require(closed, "PgDialect: unterminated string literal")
        out += Lit(s.substring(j, i))
      } else if (c == '"') {
        val j = i; i += 1
        var closed = false
        while (i < n && !closed) {
          if (s.charAt(i) == '"') {
            if (i + 1 < n && s.charAt(i + 1) == '"') i += 2 else { closed = true; i += 1 }
          } else i += 1
        }
        require(closed, "PgDialect: unterminated quoted identifier")
        out += Ident(s.substring(j, i))
      } else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val j = i
        while (i < n && s.charAt(i).isDigit) i += 1
        if (i < n && s.charAt(i) == '.') { i += 1; while (i < n && s.charAt(i).isDigit) i += 1 }
        if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
          val k = i + (if (i + 1 < n && (s.charAt(i + 1) == '+' || s.charAt(i + 1) == '-')) 2 else 1)
          if (k < n && s.charAt(k).isDigit) { i = k; while (i < n && s.charAt(i).isDigit) i += 1 }
        }
        out += Num(s.substring(j, i))
      } else if (isIdentStart(c)) {
        val j = i; while (i < n && isIdentPart(s.charAt(i))) i += 1
        out += Ident(s.substring(j, i))
      } else {
        if (i + 1 < n && twoCharOps.contains(s.substring(i, i + 2))) {
          out += Op(s.substring(i, i + 2)); i += 2
        } else { out += Op(c.toString); i += 1 }
      }
    }
    out.result()
  }

  /** Rule 1: PG literal → Spark literal (double every backslash; ''
    * quote-doubling is shared syntax and passes through). */
  private def escapeLiteral(withQuotes: String): String =
    withQuotes.replace("\\", "\\\\")

  // ------------------------------------------------ operand-extent scans

  /** Non-reserved-looking words before a '(' are treated as function
    * names; these keywords are not, so `in (...)` / `when (...)` keep
    * the paren group as the whole operand. */
  private val keywords = Set(
    "and", "or", "not", "in", "like", "ilike", "similar", "between",
    "when", "then", "else", "end", "case", "as", "on", "using", "where",
    "select", "from", "join", "cross", "inner", "left", "right", "full",
    "outer", "lateral", "union", "all", "distinct", "group", "by",
    "order", "having", "limit", "offset", "is", "null", "true", "false",
    "asc", "desc", "partition", "window", "with", "exists", "any",
    "some", "values", "escape", "interval", "filter", "rows", "range",
    "preceding", "following", "unbounded", "current", "row", "nulls",
    "first", "last")

  private def isWsTok(t: Tok) = t.isInstanceOf[Ws]

  private def prevIdx(ts: Vector[Tok], i: Int): Int = {
    var j = i - 1; while (j >= 0 && isWsTok(ts(j))) j -= 1; j
  }

  private def nextIdx(ts: Vector[Tok], i: Int): Int = {
    var j = i + 1; while (j < ts.length && isWsTok(ts(j))) j += 1
    if (j < ts.length) j else -1
  }

  private def matchBack(ts: Vector[Tok], close: Int): Int = {
    var depth = 0; var j = close
    while (j >= 0) {
      ts(j) match {
        case Op(")") => depth += 1
        case Op("(") => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j -= 1
    }
    throw new IllegalArgumentException("PgDialect: unbalanced ')'")
  }

  private def matchFwd(ts: Vector[Tok], open: Int): Int = {
    var depth = 0; var j = open
    while (j < ts.length) {
      ts(j) match {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    throw new IllegalArgumentException("PgDialect: unbalanced '('")
  }

  /** Consume a qualified name (a.b.c) backward from its last part. */
  private def qualStart(ts: Vector[Tok], i: Int): Int = {
    var start = i
    var p = prevIdx(ts, start)
    while (p > 0 && ts(p) == Op(".") && prevIdx(ts, p) >= 0 &&
      ts(prevIdx(ts, p)).isInstanceOf[Ident]) {
      start = prevIdx(ts, p); p = prevIdx(ts, start)
    }
    start
  }

  /** Start index of the tightest-binding operand (a "primary") ENDING at
    * `end`: literal, number, (qualified) identifier, balanced paren
    * group, function call, `agg(...) OVER (...)` window, CASE...END. */
  private def primaryBack(ts: Vector[Tok], end: Int): Int = ts(end) match {
    case Op(")") =>
      val open = matchBack(ts, end)
      val p = prevIdx(ts, open)
      if (p < 0) open
      else ts(p) match {
        case Ident(name) if name.equalsIgnoreCase("over") =>
          // window suffix: the operand is the whole `agg(...) over (...)`
          val q = prevIdx(ts, p)
          require(q >= 0, "PgDialect: OVER with no preceding aggregate")
          primaryBack(ts, q)
        case Ident(name) if !keywords.contains(name.toLowerCase) =>
          qualStart(ts, p) // function call: include the (qualified) name
        case _ => open
      }
    case Ident(e) if e.equalsIgnoreCase("end") => // CASE ... END
      var depth = 1; var j = end - 1
      while (j >= 0 && depth > 0) {
        ts(j) match {
          case Ident(x) if x.equalsIgnoreCase("end") => depth += 1
          case Ident(x) if x.equalsIgnoreCase("case") => depth -= 1
          case _ =>
        }
        if (depth > 0) j -= 1
      }
      require(j >= 0, "PgDialect: END with no CASE")
      j
    case Ident(_) => qualStart(ts, end)
    case Num(_) | Lit(_) => end
    case t => throw new IllegalArgumentException(
      s"PgDialect: cannot scan operand ending at '${t.text}'")
  }

  /** End index of the primary STARTING at `start` (forward twin of
    * [[primaryBack]]; consumes one optional unary sign). */
  private def primaryFwd(ts: Vector[Tok], start: Int): Int = ts(start) match {
    case Op("-") | Op("+") =>
      val n = nextIdx(ts, start)
      require(n >= 0, "PgDialect: dangling unary sign")
      primaryFwd(ts, n)
    case Op("(") => matchFwd(ts, start)
    case Num(_) | Lit(_) => start
    case Ident(c) if c.equalsIgnoreCase("case") =>
      var depth = 1; var j = start + 1
      while (j < ts.length && depth > 0) {
        ts(j) match {
          case Ident(x) if x.equalsIgnoreCase("case") => depth += 1
          case Ident(x) if x.equalsIgnoreCase("end") => depth -= 1
          case _ =>
        }
        if (depth > 0) j += 1
      }
      require(j < ts.length, "PgDialect: CASE with no END")
      j
    case Ident(name) =>
      var last = start
      var p = nextIdx(ts, last)
      while (p >= 0 && ts(p) == Op(".") && nextIdx(ts, p) >= 0 &&
        ts(nextIdx(ts, p)).isInstanceOf[Ident]) {
        last = nextIdx(ts, p); p = nextIdx(ts, last)
      }
      if (p >= 0 && ts(p) == Op("(") && !keywords.contains(name.toLowerCase))
        matchFwd(ts, p)
      else last
    case t => throw new IllegalArgumentException(
      s"PgDialect: cannot scan operand starting at '${t.text}'")
  }

  /** Keywords that END an operand when read backwards: a `-`/`*`/`%`
    * after one of these is binary arithmetic on that operand, not a
    * unary sign or a SELECT star (END closes a CASE primary; NULL,
    * TRUE, FALSE are literals). Every other keyword (WHEN, THEN, AND,
    * SELECT, ',', ...) cannot end an operand. */
  private def endsOperand(t: Tok): Boolean = t match {
    case Op(")") | Num(_) | Lit(_) => true
    case Ident(x) =>
      val l = x.toLowerCase
      !keywords.contains(l) || l == "end" || l == "null" ||
        l == "true" || l == "false"
    case _ => false
  }

  /** Include leading unary sign(s) in the operand starting at `start`
    * when whatever precedes each sign cannot END an operand (so the
    * sign is unary, not binary). PG's unary +/- binds tighter than `^`,
    * `*`, `/` and `%`, and STACKS (`- -2^2` = (- -2)^2), so every
    * consecutive unary sign travels with the primary it prefixes. */
  private def absorbUnary(ts: Vector[Tok], start: Int): Int = {
    var s = start
    var done = false
    while (!done) {
      val p = prevIdx(ts, s)
      if (p >= 0 && (ts(p) == Op("-") || ts(p) == Op("+")) &&
        (prevIdx(ts, p) < 0 || !endsOperand(ts(prevIdx(ts, p))))) s = p
      else done = true
    }
    s
  }

  /** Left-operand start for `/`: the full multiplicative chain
    * (`a*b/c` = `(a*b)/c`, `a%b/c` = `(a%b)/c` — `*`, `/` and `%` share
    * precedence and associate left; `%` needs no rewrite of its own,
    * Spark's mod matches PG's), plus a leading unary sign when nothing
    * before it could end an operand. A `*` whose left context cannot
    * end an operand is a star (SELECT *, COUNT(*)) and stops the
    * chain. */
  private def divLeftStart(ts: Vector[Tok], end: Int): Int = {
    var start = primaryBack(ts, end)
    var done = false
    while (!done) {
      val p = prevIdx(ts, start)
      if (p >= 0 && (ts(p) == Op("*") || ts(p) == Op("%"))) {
        val q = prevIdx(ts, p)
        if (q >= 0 && endsOperand(ts(q))) start = primaryBack(ts, q)
        else done = true // a `*` here is a star (SELECT *, COUNT(*))
      } else {
        start = absorbUnary(ts, start)
        done = true
      }
    }
    start
  }

  private def splice(ts: Vector[Tok], from: Int, to: Int,
                     repl: Vector[Tok]): Vector[Tok] =
    ts.take(from) ++ repl ++ ts.drop(to + 1)

  /** Rules 2+3: rewrite the leftmost `opText` into `fname(l, r)` until
    * none remain. Leftmost-first reproduces left-associativity, and a
    * rewritten call becomes a primary for the next iteration, so chains
    * and nesting fall out naturally. */
  private def rewriteBinOp(ts0: Vector[Tok], opText: String,
                           leftStart: (Vector[Tok], Int) => Int,
                           fname: String): Vector[Tok] = {
    var ts = ts0
    var i = ts.indexWhere(_ == Op(opText))
    while (i >= 0) {
      val le = prevIdx(ts, i)
      require(le >= 0, s"PgDialect: '$opText' with no left operand")
      val ls = leftStart(ts, le)
      val rs = nextIdx(ts, i)
      require(rs >= 0, s"PgDialect: '$opText' with no right operand")
      val re = primaryFwd(ts, rs)
      val repl = Vector[Tok](Ident(fname), Op("(")) ++ ts.slice(ls, le + 1) ++
        Vector[Tok](Op(","), Ws(" ")) ++ ts.slice(rs, re + 1) :+ Op(")")
      ts = splice(ts, ls, re, repl)
      i = ts.indexWhere(_ == Op(opText))
    }
    ts
  }

  /** PG type name → Spark type name. `keepArgs` types carry their
    * `(p[,s])` through; `numeric`/`decimal` default to DECIMAL(38,0) —
    * the reference warehouse's uint256→numeric storage type
    * (classes.py:137) — when unqualified. */
  private val typeMap: Map[String, String] = Map(
    "int" -> "INT", "int4" -> "INT", "integer" -> "INT",
    "smallint" -> "SMALLINT", "int2" -> "SMALLINT",
    "bigint" -> "BIGINT", "int8" -> "BIGINT",
    "numeric" -> "DECIMAL", "decimal" -> "DECIMAL",
    "float8" -> "DOUBLE", "float4" -> "FLOAT", "real" -> "FLOAT",
    "text" -> "STRING", "varchar" -> "VARCHAR", "char" -> "CHAR",
    "bpchar" -> "CHAR", "bool" -> "BOOLEAN", "boolean" -> "BOOLEAN",
    "bytea" -> "BINARY", "date" -> "DATE",
    "timestamp" -> "TIMESTAMP_NTZ", "timestamptz" -> "TIMESTAMP")

  private val typesWithArgs = Set("numeric", "decimal", "varchar", "char", "bpchar")

  /** Rule 4: `expr::type` → `CAST(expr AS T)`. Leftmost-first, so
    * chained casts nest correctly. */
  private def rewriteCasts(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = ts.indexWhere(_ == Op("::"))
    while (i >= 0) {
      val le = prevIdx(ts, i)
      require(le >= 0, "PgDialect: '::' with no operand")
      val ls = primaryBack(ts, le)
      val ti = nextIdx(ts, i)
      require(ti >= 0 && ts(ti).isInstanceOf[Ident],
        "PgDialect: '::' with no type name")
      val tn = ts(ti).text.toLowerCase
      var te = ti
      val typeToks: Vector[Tok] =
        if (tn == "double") {
          val n2 = nextIdx(ts, ti)
          require(n2 >= 0 && ts(n2).text.equalsIgnoreCase("precision"),
            "PgDialect: '::double' must be '::double precision'")
          te = n2
          Vector(Ident("DOUBLE"))
        } else {
          val mapped = typeMap.getOrElse(tn, throw new IllegalArgumentException(
            s"PgDialect: unmapped PG type '::$tn'"))
          val n2 = nextIdx(ts, ti)
          if (n2 >= 0 && ts(n2) == Op("(") && typesWithArgs.contains(tn)) {
            val close = matchFwd(ts, n2)
            te = close
            Ident(mapped) +: ts.slice(n2, close + 1)
          } else if (tn == "numeric" || tn == "decimal") {
            Vector(Ident("DECIMAL(38,0)"))
          } else if (tn == "varchar" || tn == "char" || tn == "bpchar") {
            Vector(Ident("STRING")) // unqualified: unbounded text
          } else Vector(Ident(mapped))
        }
      val repl = Vector[Tok](Ident("CAST"), Op("(")) ++ ts.slice(ls, le + 1) ++
        Vector[Tok](Ws(" "), Ident("AS"), Ws(" ")) ++ typeToks :+ Op(")")
      ts = splice(ts, ls, te, repl)
      i = ts.indexWhere(_ == Op("::"))
    }
    ts
  }

  /** Rule 5: `encode(x, 'escape')` → `pg_encode_escape(x)`. Other encode
    * formats (hex/base64) have direct Spark builtins and are left for
    * the day a reference artifact uses them. */
  private def rewriteEncodeEscape(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < ts.length && !changed) {
        ts(i) match {
          case Ident(n) if n.equalsIgnoreCase("encode") =>
            val open = nextIdx(ts, i)
            if (open >= 0 && ts(open) == Op("(")) {
              val close = matchFwd(ts, open)
              // top-level comma split
              var depth = 0; var comma = -1
              var j = open + 1
              while (j < close && comma < 0) {
                ts(j) match {
                  case Op("(") => depth += 1
                  case Op(")") => depth -= 1
                  case Op(",") if depth == 0 => comma = j
                  case _ =>
                }
                j += 1
              }
              if (comma >= 0) {
                val arg2 = ts.slice(comma + 1, close).filterNot(isWsTok)
                if (arg2.length == 1 && arg2.head == Lit("'escape'")) {
                  val repl = Vector[Tok](Ident("pg_encode_escape"), Op("(")) ++
                    ts.slice(open + 1, comma) :+ Op(")")
                  ts = splice(ts, i, close, repl)
                  changed = true
                }
              }
            }
          case _ =>
        }
        i += 1
      }
    }
    ts
  }

  /** Table functions PG lets stand as (implicitly lateral) FROM items. */
  private val lateralTvfs = Set("generate_series")

  /** Rule 6: `join generate_series(...) d` / `, generate_series(...) d`
    * → `join LATERAL generate_series(...) AS d(d)`. A PG function FROM
    * item aliased `d` names both the derived table AND its single
    * column `d`; Spark needs the column list spelled out. */
  private def rewriteLateralTvfs(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Ident(n) if lateralTvfs.contains(n.toLowerCase) =>
          val p = prevIdx(ts, i)
          // a join operand can (and in Spark must) take LATERAL; a
          // leading `FROM tvf(...)` item is uncorrelated and may not
          val needsLateral = p >= 0 && (ts(p) == Op(",") ||
            (ts(p) match {
              case Ident(w) => w.equalsIgnoreCase("join")
              case _ => false
            }))
          val isFromItem = needsLateral ||
            (p >= 0 && (ts(p) match {
              case Ident(w) => w.equalsIgnoreCase("from")
              case _ => false
            }))
          val open = nextIdx(ts, i)
          if (isFromItem && open >= 0 && ts(open) == Op("(")) {
            val close = matchFwd(ts, open)
            // locate the alias: [AS] ident not-a-keyword, no column list yet
            val aStart = nextIdx(ts, close)
            var aliasIdx = -1
            val hasAsKw = aStart >= 0 && ts(aStart).text.equalsIgnoreCase("as")
            if (hasAsKw) {
              val a2 = nextIdx(ts, aStart)
              if (a2 >= 0 && ts(a2).isInstanceOf[Ident]) aliasIdx = a2
            } else if (aStart >= 0 && (ts(aStart) match {
              case Ident(a) => !keywords.contains(a.toLowerCase)
              case _ => false
            })) aliasIdx = aStart
            val hasColList = aliasIdx >= 0 && {
              val after = nextIdx(ts, aliasIdx)
              after >= 0 && ts(after) == Op("(")
            }
            if (aliasIdx >= 0 && !hasColList) {
              val alias = ts(aliasIdx).text
              val from = if (hasAsKw) aStart else aliasIdx
              ts = splice(ts, from, aliasIdx, Vector[Tok](Ident("AS"), Ws(" "),
                Ident(alias), Op("("), Ident(alias), Op(")")))
            }
            if (needsLateral) {
              // prepend LATERAL (after alias splice so indices stay valid)
              ts = splice(ts, i, i - 1, Vector[Tok](Ident("LATERAL"), Ws(" ")))
              i = i + 2 // skip past the inserted tokens
            }
          }
        case _ =>
      }
      i += 1
    }
    ts
  }
}
