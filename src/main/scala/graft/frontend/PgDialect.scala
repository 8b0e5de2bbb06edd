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
  *      [[graft.codec.GraftFunctions.registerGenerateSeries]]. A
  *      set-returning function OUTSIDE a FROM item (SELECT list,
  *      expression position) is REJECTED loudly — Spark has no
  *      SRF-in-expression semantics to map it onto.
  *   7. `E'...'` escape-string literals: decoded with PG's escape rules
  *      (\n \t \r \b \f, octal \o[oo], hex \x[h]h, \uXXXX, \UXXXXXXXX,
  *      backslash-any = any) and re-encoded as a Spark literal.
  *   8. Dollar-quoted literals (`$$...$$`, `$tag$...$tag$`): raw body,
  *      no escape processing, re-encoded as a Spark literal.
  *   9. `SELECT DISTINCT ON (p…) list FROM … ORDER BY p…, o…` → a
  *      ROW_NUMBER() window over (PARTITION BY p… ORDER BY the query's
  *      own ORDER BY items) + rk=1 filter — Spark has no DISTINCT ON.
  *      Strict preconditions, each rejected loudly when unmet: a FROM
  *      clause and a same-level ORDER BY must exist, no set operation
  *      at that level, every select item must carry a determinable
  *      output name, and every ORDER BY item must be a (qualified)
  *      column resolvable against those names.
  *  10. Implicit null ordering: PG sorts ASC→NULLS LAST / DESC→NULLS
  *      FIRST; Spark defaults to the MIRROR IMAGE. Every ORDER BY item
  *      (query-level, window-spec, and synthesized) without an explicit
  *      NULLS spec gets PG's default spelled out — without this, every
  *      null-bearing sort silently reorders.
  *
  * Constructs with IDENTICAL semantics pass through untranslated:
  * `FILTER (WHERE …)` aggregate suffixes (the operand scanners treat
  * them as part of the aggregate primary), `ILIKE`, `IS DISTINCT
  * FROM`, `||` concatenation, `%` modulo.
  *
  *  11. Double-quoted identifiers → backticks (Spark parses `"…"` as a
  *      STRING literal), case preserved — PG quoted-identifier
  *      semantics.
  *  12. PG regex surface (round-14 agenda #3): `a ~ p` →
  *      `regexp_like(a, p)` (both partial-match), `~*` via an embedded
  *      `(?iu)` flag (UNICODE_CASE — PG folds per locale, Java's bare
  *      `(?i)` is ASCII-only, so 'Ä' ~* 'ä' would silently stop
  *      matching), `!~`/`!~*` the NOT forms; `[NOT] SIMILAR TO
  *      'pat'` → whole-string-anchored `regexp_like` (`\A(?:…)\z` —
  *      Java's `$` also matches before a final newline, PG's SIMILAR TO
  *      does not) with the SQL pattern dialect (`%`/`_`, literal `.`)
  *      translated to Java regex. LITERAL patterns carrying POSIX
  *      bracket classes ([[:alpha:]] style) translate to the exact
  *      `\p{…}` Java equivalent; the PG-only escapes `\m`/`\M`/`\y`,
  *      computed SIMILAR TO patterns and explicit ESCAPE REJECT loudly.
  *      PG compiles POSIX ERE and Spark Java regex — the translated
  *      subset is the shared core.
  *
  * Documented non-goals — [[translate]] REJECTS each loudly rather than
  * mistranslating: operators outside the arithmetic/comparison/regex
  * set (array `@>`/`[…]`, factorial, …), positional parameters
  * (`$1`), `COLLATE`, and set-returning functions outside
  * FROM. PG exact-NUMERIC arithmetic for `^`/`/` on two decimals stays
  * a documented semantic trade (float8 semantics apply, the same trade
  * the three reviewed hand ports make — every rewrite is oracle-covered
  * by the `assets_per_type*` and `pg_*` gates).
  */
object PgDialect {

  /** Translate PG-dialect SQL text to Spark SQL text. Pure function. */
  def translate(pgSql: String): String = {
    var ts = lex(pgSql)
    // loud-rejection scan FIRST, over the raw tokens, so unsupported PG
    // surface can never reach a rewrite (silent mistranslation is the
    // risk class; a raised error names the construct)
    rejectUnsupported(ts)
    // rule 12b: SIMILAR TO runs BEFORE literal re-encoding — it needs the
    // pattern's PG VALUE to translate the %/_ dialect into a Java regex
    ts = rewriteSimilarTo(ts)
    ts = ts.map {
      case Lit(t) => Lit(escapeLiteral(t))
      case RawLit(v) => Lit(sparkLiteral(v)) // E'…' / $$…$$, already decoded
      // rule 11: PG double-quoted identifiers → Spark backticks. Spark
      // parses "..." as a STRING LITERAL by default, so passing the PG
      // quoting through would silently turn a column reference into a
      // constant — exactly the mistranslation class this dialect rejects
      case Ident(t) if t.startsWith("\"") => Ident(quotedToBacktick(t))
      case t => t
    }
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
    // rule 12a: regex match operators, AFTER ^ and / (their operands are
    // call primaries by now) — PG's ~ family binds below arithmetic and
    // above comparison, so the left operand is the full arithmetic/concat
    // chain
    ts = rewriteRegexOps(ts)
    // DISTINCT ON before the lateral/nulls passes: it synthesizes an
    // OVER (... ORDER BY ...) clause that the nulls pass must also see
    ts = rewriteDistinctOn(ts)
    ts = rewriteLateralTvfs(ts)
    ts = normalizeNullsOrdering(ts)
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
  /** A literal whose VALUE is already decoded (E'…' escape strings,
    * dollar-quoted bodies); converted to a Spark-encoded [[Lit]] before
    * any operand scan runs, so the scans only ever see Lit. */
  private[frontend] case class RawLit(value: String) extends Tok {
    def text: String = sparkLiteral(value)
  }

  private val twoCharOps = Set("::", "<>", "<=", ">=", "!=", "||", "~*", "!~")
  private val threeCharOps = Set("!~*")

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
      } else if ((c == 'E' || c == 'e') && i + 1 < n && s.charAt(i + 1) == '\'') {
        // rule 7: E'...' escape string — decode PG escapes to the VALUE
        val (v, end) = lexEString(s, i + 1)
        out += RawLit(v); i = end
      } else if (c == '$') {
        // rule 8: dollar-quoted literal ($$...$$ / $tag$...$tag$); a $
        // that opens no quote is either a positional parameter (rejected
        // here, by name) or a stray operator (rejected by the op scan)
        lexDollar(s, i) match {
          case Some((v, end)) => out += RawLit(v); i = end
          case None =>
            require(!(i + 1 < n && s.charAt(i + 1).isDigit),
              "PgDialect: positional parameter placeholders ($1, $2, …) " +
                "are unsupported — inline the values")
            out += Op("$"); i += 1
        }
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
        if (i + 2 < n && threeCharOps.contains(s.substring(i, i + 3))) {
          out += Op(s.substring(i, i + 3)); i += 3
        } else if (i + 1 < n && twoCharOps.contains(s.substring(i, i + 2))) {
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

  /** Rule 11: `"Quoted Name"` → `` `Quoted Name` `` (undouble PG's ""
    * escape, double any literal backtick) — case is PRESERVED, matching
    * PG's quoted-identifier semantics. */
  private[frontend] def quotedToBacktick(q: String): String =
    "`" + q.substring(1, q.length - 1).replace("\"\"", "\"")
      .replace("`", "``") + "`"

  /** Encode a decoded string VALUE as a Spark SQL literal: backslash and
    * quote escaped, common control chars as named escapes, the rest of
    * the control range as \\uXXXX (all understood by Spark's
    * unescapeSQLString). */
  private[frontend] def sparkLiteral(v: String): String =
    "'" + v.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' || c.toInt == 0x7f => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "'"

  /** Decode a PG `E'...'` escape string starting at the opening quote;
    * returns (value, index past the closing quote). PG rules: \b \f \n
    * \r \t, \o up to \ooo octal, \x[h]h hex, \uXXXX, \UXXXXXXXX,
    * backslash before anything else is that character; '' doubles a
    * quote. */
  private def lexEString(s: String, start: Int): (String, Int) = {
    val n = s.length
    val sb = new StringBuilder
    var i = start + 1
    var closed = false
    def hexAt(j: Int) = j < n && Character.digit(s.charAt(j), 16) >= 0
    while (i < n && !closed) {
      val c = s.charAt(i)
      if (c == '\'') {
        if (i + 1 < n && s.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
        else { closed = true; i += 1 }
      } else if (c == '\\') {
        require(i + 1 < n, "PgDialect: unterminated escape in E'...' string")
        s.charAt(i + 1) match {
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'x' =>
            var j = i + 2
            while (j < n && j < i + 4 && hexAt(j)) j += 1
            require(j > i + 2, "PgDialect: \\x escape with no hex digits")
            sb.append(Integer.parseInt(s.substring(i + 2, j), 16).toChar)
            i = j
          case 'u' =>
            require(i + 6 <= n && (i + 2 until i + 6).forall(hexAt),
              "PgDialect: \\u escape needs 4 hex digits")
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' =>
            require(i + 10 <= n && (i + 2 until i + 10).forall(hexAt),
              "PgDialect: \\U escape needs 8 hex digits")
            sb.appendAll(Character.toChars(
              Integer.parseInt(s.substring(i + 2, i + 10), 16)))
            i += 10
          case o if o >= '0' && o <= '7' =>
            var j = i + 1
            while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') j += 1
            sb.append(Integer.parseInt(s.substring(i + 1, j), 8).toChar)
            i = j
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    require(closed, "PgDialect: unterminated E'...' string")
    (sb.toString, i)
  }

  /** Try to lex a dollar-quoted literal at `i` (which holds '$'):
    * Some((raw body, index past the closing tag)) when `$tag$` opens
    * here (tag = [A-Za-z_][A-Za-z0-9_]* or empty), None otherwise. An
    * OPENED quote with no closing tag is an error, not a fallthrough. */
  private def lexDollar(s: String, i: Int): Option[(String, Int)] = {
    val n = s.length
    var j = i + 1
    while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
    if (j >= n || s.charAt(j) != '$') return None
    if (j > i + 1 && !(s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_'))
      return None // $1$ etc: not a valid tag — positional-param path
    val tag = s.substring(i, j + 1)
    val close = s.indexOf(tag, j + 1)
    require(close >= 0, s"PgDialect: unterminated dollar-quoted string $tag")
    Some((s.substring(j + 1, close), close + tag.length))
  }

  /** The loud-rejection scan (documented non-goals must RAISE, never
    * mistranslate): any operator outside the translated/shared set, and
    * keyword-led constructs with no Spark mapping. */
  private val allowedOps = Set("(", ")", ",", ".", ";", "+", "-", "*", "/",
    "%", "^", "<", ">", "=", "<>", "<=", ">=", "!=", "::", "||",
    "~", "~*", "!~", "!~*")

  private def rejectUnsupported(ts: Vector[Tok]): Unit = ts.foreach {
    case Op(o) if !allowedOps.contains(o) =>
      throw new IllegalArgumentException(
        s"PgDialect: unsupported operator '$o' — only arithmetic, " +
          "comparison, regex matches (~, ~*, !~, !~*), '::' casts and " +
          "'||' translate; PG array/geometric operators have no faithful " +
          "Spark mapping")
    case Ident(k) if k.equalsIgnoreCase("collate") =>
      throw new IllegalArgumentException(
        "PgDialect: COLLATE is unsupported — Spark string comparison is " +
          "binary; a PG collation cannot be honored silently")
    case _ =>
  }

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
        case Ident(name) if name.equalsIgnoreCase("over") ||
          name.equalsIgnoreCase("filter") =>
          // window / FILTER (WHERE …) suffix: the operand is the whole
          // `agg(...) [filter (...)] [over (...)]` — chains recurse
          val q = prevIdx(ts, p)
          require(q >= 0, s"PgDialect: ${ts(p).text} with no preceding aggregate")
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
    case Ident(_) =>
      val s = qualStart(ts, end)
      val p = prevIdx(ts, s)
      // named-window suffix `agg(...) over w`: the operand is the whole
      // suffixed aggregate (the forward twin already supports `over w`;
      // without this, the LEFT operand of / or ^ scanned as just `w`)
      if (s == end && p >= 0 && ts(p).text.equalsIgnoreCase("over")) {
        val q = prevIdx(ts, p)
        require(q >= 0, "PgDialect: OVER with no preceding aggregate")
        primaryBack(ts, q)
      } else s
    case Num(_) | Lit(_) | RawLit(_) => end
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
    case Num(_) | Lit(_) | RawLit(_) => start
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
      if (p >= 0 && ts(p) == Op("(") && !keywords.contains(name.toLowerCase)) {
        // absorb FILTER (WHERE …) / OVER (…) / OVER w suffixes: they are
        // part of the aggregate primary, so a binary operator whose RIGHT
        // operand is a suffixed aggregate takes the whole thing
        var end = matchFwd(ts, p)
        var done = false
        while (!done) {
          val nx = nextIdx(ts, end)
          val kw = if (nx >= 0) ts(nx) match {
            case Ident(k) => k.toLowerCase
            case _ => ""
          } else ""
          if (kw == "filter" || kw == "over") {
            val arg = nextIdx(ts, nx)
            if (arg >= 0 && ts(arg) == Op("(")) end = matchFwd(ts, arg)
            else if (kw == "over" && arg >= 0 && ts(arg).isInstanceOf[Ident])
              end = arg // named window: `over w`
            else done = true
          } else done = true
        }
        end
      } else last
    case t => throw new IllegalArgumentException(
      s"PgDialect: cannot scan operand starting at '${t.text}'")
  }

  /** Keywords that END an operand when read backwards: a `-`/`*`/`%`
    * after one of these is binary arithmetic on that operand, not a
    * unary sign or a SELECT star (END closes a CASE primary; NULL,
    * TRUE, FALSE are literals). Every other keyword (WHEN, THEN, AND,
    * SELECT, ',', ...) cannot end an operand. */
  private def endsOperand(t: Tok): Boolean = t match {
    case Op(")") | Num(_) | Lit(_) | RawLit(_) => true
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

  // --------------------------------------------------- rule 12: PG regex

  /** Left-operand start for the `~` family: PG's regex operators sit at
    * the "any other operator" precedence — below `+`/`-`/`*`/`/`/`%`
    * and at the same (left-associative) level as `||` — so the left
    * operand is the full arithmetic/concatenation chain (`a || b ~ 'x'`
    * = `(a || b) ~ 'x'`). `^` and `/` are already rewritten into call
    * primaries when this runs. */
  private def regexLeftStart(ts: Vector[Tok], end: Int): Int = {
    var start = absorbUnary(ts, primaryBack(ts, end))
    var done = false
    while (!done) {
      val p = prevIdx(ts, start)
      val chainOp = p >= 0 && (ts(p) == Op("*") || ts(p) == Op("%") ||
        ts(p) == Op("+") || ts(p) == Op("-") || ts(p) == Op("||"))
      if (chainOp) {
        val q = prevIdx(ts, p)
        if (q >= 0 && endsOperand(ts(q)))
          start = absorbUnary(ts, primaryBack(ts, q))
        else done = true // a sign/star here is unary/SELECT-star context
      } else done = true
    }
    start
  }

  /** PG regex constructs with NO Java-regex equivalent: translating them
    * silently would change match semantics, so a LITERAL pattern
    * carrying one rejects loudly (the dialect's never-silent contract).
    * Non-literal patterns can't be checked and translate as-is —
    * documented. Used only for literals EMBEDDED in a computed pattern
    * expression (a sole literal pattern gets the full translation in
    * [[translatePgRegex]] instead). */
  private def rejectPosixOnly(pat: String, op: String): Unit = {
    require(!pat.contains("[["),
      s"PgDialect: '$op' computed pattern embeds a POSIX bracket class " +
        "([[:alpha:]] style) — translation needs a sole literal pattern")
    val posixEsc = Seq("\\m", "\\M", "\\y", "\\Y")
    posixEsc.find(pat.contains).foreach { e =>
      throw new IllegalArgumentException(
        s"PgDialect: '$op' pattern uses the PG-only escape '$e' — use \\b")
    }
  }

  /** POSIX bracket class → the exact Java `\p{…}` equivalent. PG's
    * classes in the C locale are the same ASCII sets Java's US-ASCII
    * POSIX classes define, so the rewrite is value-exact; an unknown
    * class name rejects loudly (never-silent contract). */
  private val posixClassJava = Map(
    "alnum" -> "\\p{Alnum}", "alpha" -> "\\p{Alpha}",
    "blank" -> "\\p{Blank}", "cntrl" -> "\\p{Cntrl}",
    "digit" -> "\\p{Digit}", "graph" -> "\\p{Graph}",
    "lower" -> "\\p{Lower}", "print" -> "\\p{Print}",
    "punct" -> "\\p{Punct}", "space" -> "\\p{Space}",
    "upper" -> "\\p{Upper}", "xdigit" -> "\\p{XDigit}",
    "word" -> "\\w")

  private def posixClass(name: String, op: String): String =
    posixClassJava.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"PgDialect: '$op' pattern uses POSIX class [:$name:] with no " +
          "Java-regex equivalent"))

  /** Translate a LITERAL PG `~`-family regex to Java regex (round-15
    * agenda #7). PG compiles POSIX ARE and Spark compiles Java regex;
    * the shared core passes through verbatim, and the constructs that
    * DIFFER are rewritten exactly:
    *
    *  - `[[:alpha:]]`-style POSIX classes inside brackets → `\p{Alpha}`
    *    (the Java US-ASCII POSIX classes are the same sets as PG's C
    *    locale; unknown names reject loudly);
    *  - a leading `]` after `[` or `[^` is POSIX-literal but a Java
    *    syntax error → `\]`;
    *  - a bare `[` inside a bracket is POSIX-literal but opens a Java
    *    NESTED class (char-class union) → `\[`;
    *  - `&` inside a bracket is POSIX-literal but `&&` is Java class
    *    INTERSECTION → `\&`;
    *  - collating `[.x.]` / equivalence `[=x=]` classes and the PG-only
    *    word-boundary escapes `\m \M \y \Y` have no Java counterpart
    *    and reject loudly.
    *
    * Backslash escapes INSIDE brackets pass through: PG ARE (unlike
    * plain POSIX) honors class escapes within bracket expressions
    * exactly as Java does. */
  private[graft] def translatePgRegex(pat: String, op: String): String = {
    Seq("\\m", "\\M", "\\y", "\\Y").find(pat.contains).foreach { e =>
      throw new IllegalArgumentException(
        s"PgDialect: '$op' pattern uses the PG-only escape '$e' — use \\b")
    }
    val sb = new StringBuilder
    val n = pat.length
    var i = 0
    while (i < n) {
      pat.charAt(i) match {
        case '\\' if i + 1 < n =>
          sb.append('\\').append(pat.charAt(i + 1)); i += 2
        case '[' =>
          sb.append('[')
          i += 1
          if (i < n && pat.charAt(i) == '^') { sb.append('^'); i += 1 }
          if (i < n && pat.charAt(i) == ']') { sb.append("\\]"); i += 1 }
          var closed = false
          while (!closed) {
            require(i < n,
              s"PgDialect: '$op' pattern has an unterminated bracket expression")
            pat.charAt(i) match {
              case ']' => sb.append(']'); closed = true; i += 1
              case '[' if i + 1 < n && pat.charAt(i + 1) == ':' =>
                val close = pat.indexOf(":]", i + 2)
                require(close >= 0,
                  s"PgDialect: '$op' pattern has an unterminated POSIX class")
                sb.append(posixClass(pat.substring(i + 2, close), op))
                i = close + 2
              case '[' if i + 1 < n &&
                  (pat.charAt(i + 1) == '.' || pat.charAt(i + 1) == '=') =>
                throw new IllegalArgumentException(
                  s"PgDialect: '$op' pattern uses a POSIX collating/" +
                    "equivalence class — no Java-regex equivalent")
              case '[' => sb.append("\\["); i += 1
              case '&' => sb.append("\\&"); i += 1
              case '\\' if i + 1 < n =>
                sb.append('\\').append(pat.charAt(i + 1)); i += 2
              case c => sb.append(c); i += 1
            }
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Rule 12a: `a ~ p` → `regexp_like(a, p)` (PG partial-match semantics
    * = Spark's), `a ~* p` → case-insensitive via an embedded `(?iu)`
    * flag, `!~`/`!~*` → the NOT forms, parenthesized so the result is a
    * primary in any surrounding context. */
  private def rewriteRegexOps(ts0: Vector[Tok]): Vector[Tok] = {
    val ops = Seq("~", "~*", "!~", "!~*")
    var ts = ts0
    var i = ts.indexWhere(t => ops.contains(t.text) && t.isInstanceOf[Op])
    while (i >= 0) {
      val op = ts(i).text
      val le = prevIdx(ts, i)
      require(le >= 0, s"PgDialect: '$op' with no left operand")
      val ls = regexLeftStart(ts, le)
      val rs = nextIdx(ts, i)
      require(rs >= 0, s"PgDialect: '$op' with no right operand")
      val re = primaryFwd(ts, rs)
      val neg = op.startsWith("!")
      val ci = op.endsWith("*")
      val left = ts.slice(ls, le + 1)
      // a SOLE literal pattern gets the full POSIX→Java translation
      // ([[:class:]] → \p{…}, bracket fixups); literals embedded in a
      // COMPUTED pattern can only be screened, not rewritten (the
      // surrounding expression decides the final pattern at runtime)
      val right: Vector[Tok] =
        if (re == rs) ts(rs) match {
          case Lit(t) =>
            Vector(RawLit(translatePgRegex(pgLitValue(t), op)))
          case RawLit(v) => Vector(RawLit(translatePgRegex(v, op)))
          case _ => ts.slice(rs, re + 1)
        } else {
          ts.slice(rs, re + 1).foreach {
            case Lit(t) => rejectPosixOnly(pgLitValue(t), op)
            case RawLit(v) => rejectPosixOnly(v, op)
            case _ =>
          }
          ts.slice(rs, re + 1)
        }
      // `(?iu)` not `(?i)`: PG `~*` case-folds per locale; Java's bare
      // `(?i)` is ASCII-only, so 'Ä' ~* 'ä' would silently stop
      // matching (round-14 ADVICE #1). UNICODE_CASE restores the fold.
      val call = Vector[Tok](Ident("regexp_like"), Op("(")) ++ left ++
        Vector[Tok](Op(","), Ws(" ")) ++
        (if (ci) Vector[Tok](Ident("CONCAT"), Op("("), Lit("'(?iu)'"),
          Op(","), Ws(" ")) ++ right :+ Op(")")
         else right) :+ Op(")")
      val repl =
        if (neg) Vector[Tok](Op("("), Ident("NOT"), Ws(" ")) ++ call :+ Op(")")
        else call
      ts = splice(ts, ls, re, repl)
      i = ts.indexWhere(t => ops.contains(t.text) && t.isInstanceOf[Op])
    }
    ts
  }

  /** Decode an ordinary PG literal's VALUE (strip quotes, undouble '';
    * standard_conforming_strings: backslash is a plain character). */
  private def pgLitValue(withQuotes: String): String =
    withQuotes.substring(1, withQuotes.length - 1).replace("''", "'")

  /** Rule 12b: `expr [NOT] SIMILAR TO 'pattern'` → whole-string-anchored
    * `regexp_like(expr, '\A(?:regex)\z')` with the SQL pattern dialect
    * translated: `%`→`.*`, `_`→`.`, the shared metacharacters
    * (`| * + ? ( ) { }`) pass through, `.`/`^`/`$` (literals in SIMILAR
    * TO) are escaped, `\x` escapes its character, bracket expressions
    * translate item-by-item (POSIX classes → `\p{…}`, Java-special
    * POSIX-literals escaped; collating classes and in-bracket
    * backslashes reject loudly). The pattern must be a LITERAL — a
    * computed pattern cannot be dialect-translated at plan time and
    * rejects rather than mistranslates; an explicit ESCAPE clause
    * likewise. */
  private[graft] def similarToRegex(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = p.length
    while (i < n) {
      p.charAt(i) match {
        case '%' => sb.append(".*"); i += 1
        case '_' => sb.append('.'); i += 1
        case '\\' =>
          require(i + 1 < n,
            "PgDialect: SIMILAR TO pattern ends in a dangling escape")
          val c = p.charAt(i + 1)
          if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) sb.append('\\').append(c)
          else sb.append(c)
          i += 2
        case '[' =>
          // a bracket expression translates item by item: POSIX classes
          // → `\p{…}` (exact ASCII-set match), POSIX-literal characters
          // that are Java-special inside a class (`leading ]`, nested
          // `[`, `&`) get escaped; collating/equivalence classes have
          // no Java counterpart and reject loudly
          sb.append('[')
          var j = i + 1
          if (j < n && p.charAt(j) == '^') { sb.append('^'); j += 1 }
          if (j < n && p.charAt(j) == ']') { sb.append("\\]"); j += 1 }
          var closed = false
          while (!closed) {
            require(j < n,
              "PgDialect: unterminated bracket expression in SIMILAR TO pattern")
            p.charAt(j) match {
              case ']' => sb.append(']'); closed = true; j += 1
              case '[' if j + 1 < n && p.charAt(j + 1) == ':' =>
                val close = p.indexOf(":]", j + 2)
                require(close >= 0,
                  "PgDialect: unterminated POSIX class in SIMILAR TO pattern")
                sb.append(posixClass(p.substring(j + 2, close), "SIMILAR TO"))
                j = close + 2
              case '[' if j + 1 < n &&
                  (p.charAt(j + 1) == '.' || p.charAt(j + 1) == '=') =>
                throw new IllegalArgumentException(
                  "PgDialect: POSIX collating/equivalence classes in " +
                    "SIMILAR TO have no Java-regex equivalent")
              case '[' => sb.append("\\["); j += 1
              case '&' => sb.append("\\&"); j += 1
              case '\\' =>
                // inside a SIMILAR TO bracket a backslash is a LITERAL
                // character; Java reads it as an escape ([\d] would
                // become the digit class) — no silent translation
                // exists, reject loudly
                throw new IllegalArgumentException(
                  "PgDialect: backslash inside a SIMILAR TO bracket " +
                    "expression is POSIX-literal but a Java-regex " +
                    "escape — rewrite the pattern without it")
              case c => sb.append(c); j += 1
            }
          }
          i = j
        case '.' => sb.append("\\."); i += 1
        case '^' => sb.append("\\^"); i += 1
        case '$' => sb.append("\\$"); i += 1
        case c if "|*+?(){}".indexOf(c) >= 0 => sb.append(c); i += 1
        case ']' => sb.append("\\]"); i += 1
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def rewriteSimilarTo(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var hit = true
    while (hit) {
      hit = false
      val si = ts.indices.find { i =>
        ts(i) match {
          case Ident(s) if s.equalsIgnoreCase("similar") =>
            val nx = nextIdx(ts, i)
            nx >= 0 && ts(nx).text.equalsIgnoreCase("to")
          case _ => false
        }
      }
      si.foreach { i => ts = rewriteOneSimilarTo(ts, i); hit = true }
    }
    ts
  }

  private def rewriteOneSimilarTo(ts: Vector[Tok], si: Int): Vector[Tok] = {
    val ti = nextIdx(ts, si) // TO
    val pi = nextIdx(ts, ti)
    require(pi >= 0, "PgDialect: SIMILAR TO with no pattern")
    val pat = ts(pi) match {
      case Lit(t) => pgLitValue(t)
      case RawLit(v) => v
      case t => throw new IllegalArgumentException(
        "PgDialect: SIMILAR TO needs a LITERAL pattern (its %/_ dialect " +
          s"is translated at plan time) — got '${t.text}'")
    }
    val after = nextIdx(ts, pi)
    require(after < 0 || !ts(after).text.equalsIgnoreCase("escape"),
      "PgDialect: SIMILAR TO ... ESCAPE is unsupported — the default " +
        "backslash escape translates; rewrite the pattern with it")
    val np = prevIdx(ts, si)
    val neg = np >= 0 && ts(np).text.equalsIgnoreCase("not")
    val le = if (neg) prevIdx(ts, np) else np
    require(le >= 0, "PgDialect: SIMILAR TO with no left operand")
    val ls = regexLeftStart(ts, le)
    // this pass runs BEFORE the '^'/'/' binop rewrites (it needs raw
    // literal values), so regexLeftStart cannot absorb those operators
    // yet — a '/' or '^' immediately left of the scanned operand would
    // mis-scope silently (a / b SIMILAR TO p ⇒ pg_div(a, rlike(b, p))).
    // No sane query applies SIMILAR TO to arithmetic; reject loudly.
    val before = prevIdx(ts, ls)
    require(before < 0 ||
      (ts(before) != Op("/") && ts(before) != Op("^") && ts(before) != Op("::")),
      "PgDialect: SIMILAR TO left operand adjoins '/', '^' or '::' — " +
        "parenthesize the operand")
    // \A…\z, not ^…$: Java's `$` also matches BEFORE a final line
    // terminator, so 'AUTO\n' SIMILAR TO 'AUTO' would match after a
    // ^…$ translation but not in PG, which requires a whole-string
    // match (round-14 ADVICE #3)
    val anchored = "\\A(?:" + similarToRegex(pat) + ")\\z"
    val left = ts.slice(ls, le + 1)
    val call = Vector[Tok](Ident("regexp_like"), Op("(")) ++ left ++
      Vector[Tok](Op(","), Ws(" "), RawLit(anchored), Op(")"))
    val repl =
      if (neg) Vector[Tok](Op("("), Ident("NOT"), Ws(" ")) ++ call :+ Op(")")
      else call
    splice(ts, ls, pi, repl)
  }

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

  // ------------------------------------------------------- DISTINCT ON

  /** Top-level comma split of [from, to) as (start, endExclusive) pairs. */
  private def splitTopLevel(ts: Vector[Tok], from: Int, to: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var depth = 0
    var start = from
    var j = from
    while (j < to) {
      ts(j) match {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1
        case Op(",") if depth == 0 => out += ((start, j)); start = j + 1
        case _ =>
      }
      j += 1
    }
    out += ((start, to))
    out.result()
  }

  /** Trailing `[ASC|DESC] [NULLS FIRST|LAST]` token count of a ws-free
    * sort item. */
  private def suffixLen(core: Vector[Tok]): Int = {
    def lc(i: Int) = core(core.length - 1 - i) match {
      case Ident(x) => x.toLowerCase
      case _ => ""
    }
    var n = 0
    if (core.length >= 2 && (lc(0) == "first" || lc(0) == "last") &&
      lc(1) == "nulls") n = 2
    if (core.length > n && (lc(n) == "asc" || lc(n) == "desc")) n += 1
    n
  }

  /** Output name of a select-list item: bare/qualified column, `AS x`,
    * or implicit trailing alias. Loud when undeterminable (DISTINCT ON
    * needs it for the outer projection). */
  private def outName(ts: Vector[Tok], range: (Int, Int)): String = {
    val toks = ts.slice(range._1, range._2).filterNot(isWsTok)
    require(toks.nonEmpty, "PgDialect: empty select item")
    toks.last match {
      case Ident(n) if toks.length == 1 || !keywords.contains(n.toLowerCase) => n
      case _ => throw new IllegalArgumentException(
        "PgDialect: DISTINCT ON needs a determinable output name for every " +
          s"select item — add AS to '${toks.map(_.text).mkString(" ")}'")
    }
  }

  /** Rule 9: rewrite every `SELECT DISTINCT ON (…) … ORDER BY …` into a
    * ROW_NUMBER window + rk=1 filter, leftmost-first (a nested one inside
    * a subquery is found on the next iteration). */
  private def rewriteDistinctOn(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var hit = true
    while (hit) {
      hit = false
      val di = ts.indices.find { i =>
        ts(i) match {
          case Ident(d) if d.equalsIgnoreCase("distinct") =>
            val nx = nextIdx(ts, i)
            nx >= 0 && (ts(nx) match {
              case Ident(o) => o.equalsIgnoreCase("on")
              case _ => false
            })
          case _ => false
        }
      }
      di.foreach { i => ts = rewriteOneDistinctOn(ts, i); hit = true }
    }
    ts
  }

  private def rewriteOneDistinctOn(ts: Vector[Tok], di: Int): Vector[Tok] = {
    val si = prevIdx(ts, di)
    require(si >= 0 && ts(si).text.equalsIgnoreCase("select"),
      "PgDialect: DISTINCT ON outside a SELECT head")
    val onIdx = nextIdx(ts, di)
    val open = nextIdx(ts, onIdx)
    require(open >= 0 && ts(open) == Op("("),
      "PgDialect: DISTINCT ON needs a parenthesized expression list")
    val close = matchFwd(ts, open)
    val partToks = ts.slice(open + 1, close)
    val listStart = close + 1
    // clause boundaries at THIS select's nesting level
    var j = listStart
    var depth = 0
    var fromIdx = -1
    var orderIdx = -1
    var tailIdx = -1
    var endIdx = ts.length
    while (j < ts.length && endIdx == ts.length) {
      ts(j) match {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1; if (depth < 0) endIdx = j
        case Op(";") if depth == 0 => endIdx = j
        case Ident(k) if depth == 0 =>
          k.toLowerCase match {
            case "from" if fromIdx < 0 =>
              // not the FROM clause when it is the tail of
              // `IS [NOT] DISTINCT FROM` in a select-list expression
              val pv = prevIdx(ts, j)
              if (!(pv >= 0 && ts(pv).text.equalsIgnoreCase("distinct")))
                fromIdx = j
            case "union" | "intersect" | "except" =>
              throw new IllegalArgumentException(
                "PgDialect: DISTINCT ON combined with a set operation at " +
                  "the same level is unsupported — wrap it in a subquery")
            case "order" if orderIdx < 0 && nextIdx(ts, j) >= 0 &&
              ts(nextIdx(ts, j)).text.equalsIgnoreCase("by") => orderIdx = j
            case "limit" | "offset" | "fetch" if tailIdx < 0 => tailIdx = j
            case _ =>
          }
        case _ =>
      }
      if (endIdx == ts.length) j += 1
    }
    require(fromIdx > 0, "PgDialect: DISTINCT ON without FROM is unsupported")
    require(orderIdx > fromIdx,
      "PgDialect: DISTINCT ON requires a same-level ORDER BY starting " +
        "with the ON expressions (PG's own precondition)")
    if (tailIdx < 0) tailIdx = endIdx
    val names = splitTopLevel(ts, listStart, fromIdx).map(outName(ts, _))
    // duplicate output names would make the outer projection silently
    // resolve both to the same inner column (an unaliased expression
    // ending in a column name is the typical collision) — the dialect's
    // contract is never-silent mistranslation, so reject loudly
    // PG name semantics for the collision key: an UNQUOTED identifier
    // folds to lowercase; a QUOTED one keeps its case — so "A" and "a"
    // are distinct outputs and must not be rejected as duplicates (r13
    // ADVICE #5), while bare A vs bare a (and bare v vs quoted "v")
    // still collide. Quoted idents arrive here already backtick-form
    // (rule 11 runs first).
    def nameKey(n: String): String =
      if (n.startsWith("`") && n.length >= 2)
        n.substring(1, n.length - 1).replace("``", "`")
      else n.toLowerCase
    val dupNames = names.groupBy(nameKey)
      .collect { case (_, vs) if vs.size > 1 => vs.head }
    require(dupNames.isEmpty,
      "PgDialect: DISTINCT ON select items produce duplicate output " +
        s"names (${dupNames.mkString(", ")}) — add distinct AS aliases")
    val obStart = nextIdx(ts, nextIdx(ts, orderIdx)) // first item after BY
    val orderToks = ts.slice(obStart, tailIdx)
    // outer ORDER BY re-sorts the survivors; every item must resolve
    // against the projected output names
    val outerOrder: Vector[Tok] =
      splitTopLevel(ts, obStart, tailIdx).map { r =>
        val core = ts.slice(r._1, r._2).filterNot(isWsTok)
        val sl = suffixLen(core)
        val expr = core.dropRight(sl)
        val nm = expr match {
          case Vector(Ident(n)) => n
          case v if v.length >= 3 && v(v.length - 2) == Op(".") =>
            v.last match { case Ident(n) => n; case _ => null }
          case _ => null
        }
        require(nm != null && names.exists(_.equalsIgnoreCase(nm)),
          "PgDialect: DISTINCT ON outer ORDER BY item '" +
            core.map(_.text).mkString(" ") + "' is not a named output column")
        Vector[Tok](Ident(nm)) ++ core.takeRight(sl).flatMap(t =>
          Vector[Tok](Ws(" "), t))
      }.reduce((a, b) => a ++ Vector[Tok](Op(","), Ws(" ")) ++ b)
    val repl = Vector.newBuilder[Tok]
    def id(s: String): Unit = { repl += Ident(s); repl += Ws(" ") }
    repl += Ident("SELECT"); repl += Ws(" ")
    names.zipWithIndex.foreach { case (nm, k) =>
      if (k > 0) { repl += Op(","); repl += Ws(" ") }
      repl += Ident(nm)
    }
    repl += Ws(" "); id("FROM"); repl += Op("(")
    id("SELECT")
    repl ++= ts.slice(listStart, fromIdx) // original select list, verbatim
    repl += Op(","); repl += Ws(" ")
    repl += Ident("ROW_NUMBER"); repl += Op("("); repl += Op(")")
    repl += Ws(" "); id("OVER"); repl += Op("(")
    id("PARTITION"); id("BY")
    repl ++= partToks
    repl += Ws(" "); id("ORDER"); id("BY")
    repl ++= orderToks
    repl += Op(")"); repl += Ws(" "); id("AS"); repl += Ident("__rn")
    repl += Ws(" ")
    repl ++= ts.slice(fromIdx, orderIdx) // FROM … WHERE … GROUP BY …
    repl += Op(")"); repl += Ws(" "); repl += Ident("__distinct_on")
    repl += Ws(" "); id("WHERE"); repl += Ident("__rn"); repl += Ws(" ")
    repl += Op("="); repl += Ws(" "); repl += Num("1"); repl += Ws(" ")
    id("ORDER"); id("BY")
    repl ++= outerOrder
    if (tailIdx < endIdx) { repl += Ws(" "); repl ++= ts.slice(tailIdx, endIdx) }
    splice(ts, si, endIdx - 1, repl.result())
  }

  // ------------------------------------------------- implicit null order

  /** Sort-item terminators: keywords that can follow the last ORDER BY
    * item at its own nesting level. */
  private val orderEnders = Set("limit", "offset", "fetch", "for", "union",
    "intersect", "except", "rows", "range", "groups", "window")

  private def findOrderBy(ts: Vector[Tok], from: Int): Int =
    (from until ts.length).find { i =>
      ts(i) match {
        case Ident(o) if o.equalsIgnoreCase("order") =>
          val nx = nextIdx(ts, i)
          nx >= 0 && (ts(nx) match {
            case Ident(b) => b.equalsIgnoreCase("by")
            case _ => false
          })
        case _ => false
      }
    }.getOrElse(-1)

  /** Rule 10: append PG's implicit null ordering (ASC→NULLS LAST,
    * DESC→NULLS FIRST) to every ORDER BY item without an explicit NULLS
    * spec — Spark's defaults are the mirror image, so leaving it
    * implicit silently reorders every null-bearing sort. */
  private def normalizeNullsOrdering(ts0: Vector[Tok]): Vector[Tok] = {
    var ts = ts0
    var from = 0
    var ob = findOrderBy(ts, from)
    while (ob >= 0) {
      val byIdx = nextIdx(ts, ob)
      val start = nextIdx(ts, byIdx)
      var itemStart = start
      var j = start
      var depth = 0
      var endIdx = -1
      val inserts = Vector.newBuilder[(Int, String)]
      def finish(endEx: Int): Unit = {
        var last = endEx - 1
        while (last >= itemStart && isWsTok(ts(last))) last -= 1
        if (last >= itemStart) {
          val core = ts.slice(itemStart, last + 1).filterNot(isWsTok)
          val sl = suffixLen(core)
          if (sl < 2) { // no explicit NULLS spec on this item
            val dir = core.takeRight(sl).headOption.collect {
              case Ident(d) => d.toLowerCase
            }.getOrElse("asc")
            inserts += ((last + 1,
              if (dir == "desc") "NULLS FIRST" else "NULLS LAST"))
          }
        }
      }
      while (j < ts.length && endIdx < 0) {
        ts(j) match {
          case Op("(") => depth += 1
          case Op(")") => depth -= 1; if (depth < 0) endIdx = j
          case Op(";") if depth == 0 => endIdx = j
          case Op(",") if depth == 0 => finish(j); itemStart = j + 1
          case Ident(k) if depth == 0 && orderEnders.contains(k.toLowerCase) =>
            endIdx = j
          case _ =>
        }
        if (endIdx < 0) j += 1
      }
      finish(if (endIdx < 0) ts.length else endIdx)
      inserts.result().sortBy(-_._1).foreach { case (pos, spec) =>
        val words = spec.split(' ')
        ts = ts.take(pos) ++ Vector[Tok](Ws(" "), Ident(words(0)), Ws(" "),
          Ident(words(1))) ++ ts.drop(pos)
      }
      from = byIdx + 1
      ob = findOrderBy(ts, from)
    }
    ts
  }

  /** Table functions PG lets stand as (implicitly lateral) FROM items. */
  private val lateralTvfs = Set("generate_series")

  /** Nearest enclosing clause keyword at `i`'s own nesting level,
    * scanning backward: Some("from"), Some("select"), …; None when the
    * scan leaves the current parenthesized expression first (function
    * argument / scalar-expression context). */
  private def clauseContext(ts: Vector[Tok], i: Int): Option[String] = {
    val clauses = Set("select", "from", "where", "having", "values", "by",
      "on", "when", "then", "set")
    var depth = 0
    var j = i - 1
    while (j >= 0) {
      ts(j) match {
        case Op(")") => depth += 1
        case Op("(") =>
          depth -= 1
          if (depth < 0) return None
        case Ident(w) if depth == 0 && clauses.contains(w.toLowerCase) =>
          // `from` as the tail of IS [NOT] DISTINCT FROM is an operator,
          // not the FROM clause — keep scanning past it
          val pv = prevIdx(ts, j)
          if (!(w.equalsIgnoreCase("from") && pv >= 0 &&
              ts(pv).text.equalsIgnoreCase("distinct")))
            return Some(w.toLowerCase)
        case _ =>
      }
      j -= 1
    }
    None
  }

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
          // an SRF CALL is translatable ONLY as a FROM item: directly
          // after FROM / JOIN / LATERAL, or comma-separated while the
          // nearest enclosing clause is FROM. EVERY other call position
          // (select head, after an operator, in WHERE/HAVING, …) is
          // PG's SRF-in-expression semantics, which has no Spark
          // mapping and must reject loudly, not mistranslate
          val isCall = { val c = nextIdx(ts, i); c >= 0 && ts(c) == Op("(") }
          val fromItem = p >= 0 && (ts(p) match {
            case Op(",") => clauseContext(ts, i).contains("from")
            case Ident(w) => Seq("from", "join", "lateral")
              .contains(w.toLowerCase)
            case _ => false
          })
          if (isCall && !fromItem)
            throw new IllegalArgumentException(
              s"PgDialect: set-returning function '$n' outside a FROM " +
                "item (SELECT-list/expression SRFs are unsupported) — " +
                "move it to a LATERAL FROM item")
          // a join operand can (and in Spark must) take LATERAL; a
          // leading `FROM tvf(...)` item (or one already marked
          // LATERAL) is/stays uncorrelated-or-marked and only needs
          // the alias column list
          val needsLateral = p >= 0 && (ts(p) == Op(",") ||
            (ts(p) match {
              case Ident(w) => w.equalsIgnoreCase("join")
              case _ => false
            }))
          val isFromItem = fromItem
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
