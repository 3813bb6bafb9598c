package graft.dsl

/** The painless-SUBSET → Spark-SQL compiler shared by every script
  * context (script_fields, `script` query, script_score, `_script` sort,
  * metric / terms-key scripts, scripted_metric map expressions,
  * bucket_script / bucket_selector, `_update_by_query` assignments).
  *
  * Supported — the constructs an ES 6.5 painless user actually writes
  * (reference surface: the delegated scripting language of the ES the
  * reference pins, `pom.xml:25-26,52-56`):
  *   - `doc['f'].value` refs, optionally with ONE string method:
  *     `.length()` `.contains(x)` `.startsWith(x)` `.endsWith(x)`
  *     `.indexOf(x)` `.substring(a[, b])` `.toLowerCase()`
  *     `.toUpperCase()` (painless = Java strings: 0-based offsets,
  *     end-exclusive substring, indexOf −1 when absent — each mapped to
  *     the 1-based SQL form so both engines agree value-for-value);
  *   - arithmetic `+ - * / %`, comparisons `> >= < <= == !=`,
  *     boolean `&& ||`;
  *   - the ternary `c ? a : b`, nested, including inside call arguments;
  *   - `Math.min/max/abs/log/sqrt/floor/ceil/pow` (→ least/greatest/
  *     abs/ln/sqrt/floor/ceil/power — log is the NATURAL log in Java);
  *   - single-quoted string literals and numeric literals;
  *   - `params.<name>` references, bound from the request's `"params"`
  *     object in EVERY context (unbound refs reject loudly);
  *   - local declarations before the final expression —
  *     `def x = ...; double y = ...; [return] <expr>` — inlined
  *     textually (SQL has no bindings; a local may reference priors);
  *   - `.equals(x)` / `.isEmpty()` on a ref;
  *   - Joda date accessors on a date-typed ref: `.millis` property,
  *     `.getMillis()/.getYear()/.getMonthOfYear()/.getDayOfMonth()/
  *     .getHourOfDay()/.getMinuteOfHour()/.getSecondOfMinute()/
  *     .getDayOfWeek()/.getDayOfYear()` (Joda bases: months 1-12,
  *     Monday=1 weekdays — mapped where SQL differs).
  *
  * Everything else rejects LOUDLY (unknown method, unknown identifier,
  * unterminated ref, leftover `?`/`!`) — the subset never silently
  * misinterprets a construct it does not model.
  *
  * Documented deviations from painless (both SQL-semantics, both pinned
  * by EsPainlessDifferentialSpec's twin): `/` over two integer operands
  * is SQL division (double), not Java's truncating long division —
  * divide by a float literal (`/ 2.0`) where the distinction matters;
  * out-of-range `substring` offsets truncate instead of throwing
  * StringIndexOutOfBounds. Float literals ARE IEEE doubles as in
  * painless (compiled with the D suffix — the SQL parser's DECIMAL
  * reading rounds mid-computation; differential find).
  *
  * Compilation is textual — painless's operators spell SQL's after
  * normalization — and the result goes through the SQL parser into a
  * codegen'd expression: no per-row interpreter in any script context.
  */
object Painless {

  /** Function / keyword tokens the compiled SQL may contain. */
  private val allowedTokens = Set(
    "least", "greatest", "abs", "ln", "sqrt", "floor", "ceil", "power",
    "length", "contains", "startswith", "endswith", "substring", "instr",
    "lower", "upper", "if", "and", "or", "not", "true", "false",
    // the Joda date-accessor family compiles to these
    "unix_millis", "cast", "as", "timestamp", "year", "month", "day",
    "hour", "minute", "second", "weekday", "dayofyear")

  /** Compile a painless-subset source string to a Spark-SQL expression
    * string. `extraIds` are identifiers bound by the CALLING context
    * (bucket_script params already substituted to column names,
    * `ctx._source.<f>` targets, scripted_metric state columns);
    * `stringConcat` turns painless's string `+` into SQL `||` (the terms
    * `value_type: "string"` computed-key form). */
  def compile(raw: String, extraIds: Set[String] = Set.empty,
              stringConcat: Boolean = false,
              params: Map[String, Any] = Map.empty): String = {
    val withParams = substituteParams(raw.trim, params)
    val single = inlineLocals(withParams)
    val (bound, cols) = bindRefs(single)
    val math = bindMath(bound)
    val tern = rewriteTernaries(math)
    var sql = replaceOutsideQuotes(tern, "&&", " AND ")
    sql = replaceOutsideQuotes(sql, "||", " OR ")
    sql = replaceOutsideQuotes(sql, "!=", " <> ")
    sql = replaceOutsideQuotes(sql, "==", " = ")
    if (stringConcat) sql = replaceOutsideQuotes(sql, "+", "||")
    // restore the compiler's OWN offset arithmetic (substring begin+1 etc.),
    // emitted as a sentinel so the stringConcat '+'→'||' rewrite cannot turn
    // generated numeric '+' into string concat (substring(f, (2) || 1) would
    // silently concat '21' — the reject-loudly contract forbids silent wrong)
    sql = sql.replace(GenPlus, "+")
    validate(sql, cols ++ extraIds, raw)
    // LAST (the D suffix would read as an identifier to the validator):
    // painless float literals are IEEE doubles, but the SQL parser reads
    // `6.0` as DECIMAL(2,1) — and decimal division then ROUNDS at scale 6
    // mid-computation (7 / 6.0 = 1.166667, visibly wrong after a sqrt).
    // Differential find (EsPainlessDifferentialSpec); the D suffix pins
    // every float literal to DoubleType.
    doubleLiterals(sql)
  }

  /** Bind `params.<name>` references to the request's params map as SQL
    * literals (every script context carries the same `"params": {...}`
    * object in ES). Unbound `params.*` references reject loudly. */
  private def substituteParams(s: String, params: Map[String, Any]): String = {
    val afterSub = params.foldLeft(s) { case (acc, (k, v)) =>
      mapOutsideQuotes(acc)(_.replaceAll(
        "params\\." + java.util.regex.Pattern.quote(k) + "(?![A-Za-z0-9_])",
        java.util.regex.Matcher.quoteReplacement(literal(v))))
    }
    var unbound = false
    mapOutsideQuotes(afterSub) { seg =>
      if (seg.contains("params.")) unbound = true; seg
    }
    require(!unbound,
      s"unbound params.* reference in painless source (params: " +
        s"${params.keys.toSeq.sorted.mkString(",")}): $s")
    afterSub
  }

  /** A param value as a SQL literal. Doubles render as plain decimal text
    * (never scientific notation — the validator would see the exponent's
    * E as an identifier); the final [[doubleLiterals]] pass then pins them
    * to DoubleType with the D suffix like any float literal. */
  private def literal(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: Double =>
      val plain = if (d.toString.exists(c => c == 'E' || c == 'e'))
        BigDecimal(d).bigDecimal.toPlainString else d.toString
      if (plain.contains('.')) plain else plain + ".0"
    case f: Float => literal(f.toDouble)
    case b: Boolean => b.toString
    case n: Number => n.toString
    case other => throw new IllegalArgumentException(
      s"unsupported painless param type: ${other.getClass.getSimpleName}")
  }

  /** Local-variable statements: `def x = <expr>; [def y = ...;] <result>`
    * (painless-style typed declarations too — `double x = ...`), with the
    * result optionally spelled `return <expr>;`. SQL has no local
    * bindings, so each local is inlined textually (token-boundary, outside
    * string literals) into everything after it — earlier locals first, so
    * a local may reference prior locals. Anything before the final
    * expression that is NOT a declaration rejects loudly (loops and
    * mutation stay outside the subset). */
  private def inlineLocals(s: String): String = {
    val stmts = splitTopLevel(s, ';').map(_.trim).filter(_.nonEmpty)
    require(stmts.nonEmpty, s"empty painless source: $s")
    if (stmts.size == 1 && !stmts.head.startsWith("return "))
      return stmts.head
    val declRe = "(?s)^(?:def|int|long|float|double|boolean|String)\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.+)$".r
    var bindings = Seq.empty[(String, String)]
    stmts.init.foreach {
      case declRe(name, rhs) =>
        bindings :+= (name -> ("(" + substLocals(rhs, bindings) + ")"))
      case other => throw new IllegalArgumentException(
        s"only local declarations (def x = ...) may precede the final expression " +
          s"in the painless subset, got: $other")
    }
    val last = stmts.last
    val result = declRe.findFirstIn(last) match {
      case Some(_) => throw new IllegalArgumentException(
        s"painless source ends on a declaration with no result expression: $s")
      case None => if (last.startsWith("return ")) last.stripPrefix("return ").trim else last
    }
    substLocals(result, bindings)
  }

  private def substLocals(s: String, bindings: Seq[(String, String)]): String =
    bindings.foldLeft(s) { case (acc, (name, repl)) =>
      mapOutsideQuotes(acc)(_.replaceAll(
        "(?<![A-Za-z0-9_.'])" + java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_(])",
        java.util.regex.Matcher.quoteReplacement(repl)))
    }

  /** Apply `f` to every segment of `s` outside single-quoted literals. */
  private def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val end = s.indexOf('\'', i + 1)
        require(end > 0, s"unterminated literal: $s")
        out.append(s, i, end + 1); i = end + 1
      } else {
        val next = s.indexOf('\'', i)
        val seg = if (next < 0) s.substring(i) else s.substring(i, next)
        out.append(f(seg)); i += seg.length
      }
    }
    out.toString
  }

  private val floatLit = "(?<![A-Za-z0-9_.])(\\d+\\.\\d+)(?![A-Za-z0-9_.D])".r
  private def doubleLiterals(s: String): String = {
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val end = s.indexOf('\'', i + 1)
        out.append(s, i, end + 1); i = end + 1
      } else {
        val next = s.indexOf('\'', i)
        val seg = if (next < 0) s.substring(i) else s.substring(i, next)
        out.append(floatLit.replaceAllIn(seg, m => m.group(1) + "D"))
        i += seg.length
      }
    }
    out.toString
  }

  /** Bind every `doc['f'].value[.method(args)]` ref; returns the rewritten
    * string and the bound column names. Method arguments are compiled
    * recursively (they may themselves contain refs / Math calls). */
  private def bindRefs(s: String): (String, Set[String]) = {
    val out = new java.lang.StringBuilder
    var cols = Set.empty[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { // copy string literals verbatim
        val end = s.indexOf('\'', i + 1)
        require(end > 0, s"unterminated string literal in painless source: $s")
        out.append(s, i, end + 1); i = end + 1
      } else if (s.startsWith("doc['", i)) {
        val end = s.indexOf("']", i + 5)
        require(end > 0, s"unterminated doc[...] ref in painless source: $s")
        val f = s.substring(i + 5, end)
        require(f.matches("[A-Za-z0-9_.]+"), s"unsupported doc ref field name: $f")
        cols += f
        var j = end + 2
        require(s.startsWith(".value", j),
          s"doc['$f'] must be followed by .value (painless subset)")
        j += ".value".length
        if (s.startsWith(".millis", j) &&
            (j + 7 >= s.length || !s.charAt(j + 7).isLetterOrDigit && s.charAt(j + 7) != '(' && s.charAt(j + 7) != '_')) {
          // Joda property access (no parens): doc['ts'].value.millis
          out.append(s"unix_millis(cast($f as timestamp))")
          i = j + ".millis".length
        } else if (j < s.length && s.charAt(j) == '.') {
          // ONE string-method call on the ref
          val open = s.indexOf('(', j + 1)
          require(open > 0, s"expected a method call after doc['$f'].value. " +
            s"(or the .millis property)")
          val name = s.substring(j + 1, open)
          val close = matchingParen(s, open)
          val rawArgs = s.substring(open + 1, close).trim
          val (argSql, argCols) =
            if (rawArgs.isEmpty) ("", Set.empty[String]) else bindRefs(rawArgs)
          cols ++= argCols
          out.append(method(f, name, argSql))
          i = close + 1
        } else { out.append(f); i = j }
      } else { out.append(c); i += 1 }
    }
    (out.toString, cols)
  }

  /** Sentinel for '+' signs the COMPILER generates (offset-base shifts):
    * exempt from the stringConcat '+'→'||' rewrite, restored at the end. */
  private val GenPlus = "\u0001"

  /** Painless (Java) string method → the SQL spelling with the SAME
    * value semantics (offset bases shifted textually). */
  private def method(col: String, name: String, args: String): String = name match {
    case "length" =>
      require(args.isEmpty, "length() takes no arguments"); s"length($col)"
    case "toLowerCase" =>
      require(args.isEmpty, "toLowerCase() takes no arguments"); s"lower($col)"
    case "toUpperCase" =>
      require(args.isEmpty, "toUpperCase() takes no arguments"); s"upper($col)"
    case "contains" => s"contains($col, $args)"
    case "startsWith" => s"startswith($col, $args)"
    case "endsWith" => s"endswith($col, $args)"
    // Java indexOf is 0-based with −1 absent; instr is 1-based with 0
    // absent — the shift makes them equal everywhere
    case "indexOf" => s"(instr($col, $args) - 1)"
    case "substring" =>
      splitTopLevel(args, ',') match {
        // Java substring(begin) / substring(begin, end): 0-based,
        // end-exclusive → SQL substring(col, begin+1[, end−begin])
        case Seq(a) => s"substring($col, ($a) $GenPlus 1)"
        case Seq(a, b) => s"substring($col, ($a) $GenPlus 1, ($b) - ($a))"
        case other => throw new IllegalArgumentException(
          s"substring takes 1 or 2 arguments, got ${other.size}")
      }
    // Java Object.equals / String.isEmpty — value equality either way in
    // the subset's types (painless strings compare by value with == too,
    // but 6.5 users write .equals out of Java habit)
    case "equals" => s"($col = $args)"
    case "isEmpty" =>
      require(args.isEmpty, "isEmpty() takes no arguments"); s"(length($col) = 0)"
    // the Joda accessors an ES 6.5 date doc-value exposes
    // (doc['ts'].value is a ReadableDateTime; UTC, matching the engine's
    // pinned session timezone)
    case "getMillis" =>
      require(args.isEmpty, "getMillis() takes no arguments")
      s"unix_millis(cast($col as timestamp))"
    case "getYear" =>
      require(args.isEmpty, "getYear() takes no arguments"); s"year($col)"
    case "getMonthOfYear" => // Joda months are 1-12, same as SQL month()
      require(args.isEmpty, "getMonthOfYear() takes no arguments"); s"month($col)"
    case "getDayOfMonth" =>
      require(args.isEmpty, "getDayOfMonth() takes no arguments"); s"day($col)"
    case "getHourOfDay" =>
      require(args.isEmpty, "getHourOfDay() takes no arguments"); s"hour($col)"
    case "getMinuteOfHour" =>
      require(args.isEmpty, "getMinuteOfHour() takes no arguments"); s"minute($col)"
    case "getSecondOfMinute" =>
      require(args.isEmpty, "getSecondOfMinute() takes no arguments"); s"second($col)"
    case "getDayOfWeek" => // Joda: Monday=1..Sunday=7; weekday(): Monday=0
      require(args.isEmpty, "getDayOfWeek() takes no arguments")
      s"(weekday($col) $GenPlus 1)"
    case "getDayOfYear" =>
      require(args.isEmpty, "getDayOfYear() takes no arguments"); s"dayofyear($col)"
    case other => throw new IllegalArgumentException(
      s"unsupported painless string method: .$other(...) " +
        "(subset: length/contains/startsWith/endsWith/indexOf/substring/" +
        "toLowerCase/toUpperCase/equals/isEmpty, date: millis/getMillis/" +
        "getYear/getMonthOfYear/getDayOfMonth/getHourOfDay/getMinuteOfHour/" +
        "getSecondOfMinute/getDayOfWeek/getDayOfYear)")
  }

  private def bindMath(s: String): String = {
    val mapped = Seq(
      "Math.min(" -> "least(", "Math.max(" -> "greatest(",
      "Math.abs(" -> "abs(", "Math.log(" -> "ln(", "Math.sqrt(" -> "sqrt(",
      "Math.floor(" -> "floor(", "Math.ceil(" -> "ceil(", "Math.pow(" -> "power(")
      .foldLeft(s) { case (acc, (from, to)) => replaceOutsideQuotes(acc, from, to) }
    require(!mapped.contains("Math."),
      s"unsupported Math.* call in painless subset (have min/max/abs/log/sqrt/floor/ceil/pow): $s")
    mapped
  }

  /** Rewrite every ternary `c ? a : b` to `IF(c, a, b)`, respecting
    * nesting, parentheses, call-argument commas, and string literals. */
  private def rewriteTernaries(s: String): String = {
    // argument lists first: a ternary binds tighter than the comma
    val parts = splitTopLevel(s, ',')
    if (parts.length > 1) return parts.map(rewriteTernaries).mkString(", ")
    val q = indexOfTopLevel(s, '?')
    if (q >= 0) {
      // find the matching ':' (skip nested ternaries)
      var depth = 0; var nested = 0; var i = q + 1; var colon = -1
      while (i < s.length && colon < 0) {
        s.charAt(i) match {
          case '\'' => i = s.indexOf('\'', i + 1); require(i > 0, s"unterminated literal: $s")
          case '(' => depth += 1
          case ')' => depth -= 1
          case '?' if depth == 0 => nested += 1
          case ':' if depth == 0 => if (nested == 0) colon = i else nested -= 1
          case _ =>
        }
        i += 1
      }
      require(colon > 0, s"ternary '?' without matching ':' in: $s")
      val (c, a, b) = (s.substring(0, q).trim, s.substring(q + 1, colon).trim,
        s.substring(colon + 1).trim)
      require(c.nonEmpty && a.nonEmpty && b.nonEmpty, s"empty ternary arm in: $s")
      s"IF(${rewriteTernaries(c)}, ${rewriteTernaries(a)}, ${rewriteTernaries(b)})"
    } else {
      // no top-level ternary: recurse into parenthesized groups
      val out = new java.lang.StringBuilder
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' =>
            val end = s.indexOf('\'', i + 1)
            require(end > 0, s"unterminated literal: $s")
            out.append(s, i, end + 1); i = end + 1
          case '(' =>
            val close = matchingParen(s, i)
            out.append('(').append(rewriteTernaries(s.substring(i + 1, close))).append(')')
            i = close + 1
          case c => out.append(c); i += 1
        }
      }
      out.toString
    }
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = s.indexOf('\'', i + 1); require(i > 0, s"unterminated literal: $s")
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in painless source: $s")
  }

  private def indexOfTopLevel(s: String, ch: Char): Int = {
    var depth = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = s.indexOf('\'', i + 1); require(i > 0, s"unterminated literal: $s")
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == ch && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = s.indexOf('\'', i + 1); require(i > 0, s"unterminated literal: $s")
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == sep && depth == 0 =>
          parts += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += s.substring(start).trim
    parts.result()
  }

  private def replaceOutsideQuotes(s: String, from: String, to: String): String = {
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val end = s.indexOf('\'', i + 1)
        require(end > 0, s"unterminated literal: $s")
        out.append(s, i, end + 1); i = end + 1
      } else if (s.startsWith(from, i)) { out.append(to); i += from.length }
      else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def stripQuoted(s: String): String =
    replaceOutsideQuotesKeep(s)
  private def replaceOutsideQuotesKeep(s: String): String = {
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val end = s.indexOf('\'', i + 1)
        require(end > 0, s"unterminated literal: $s")
        out.append("''"); i = end + 1
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Loud-reject gate: charset whitelist over the literal-stripped SQL,
    * plus EVERY identifier must be a bound column, a caller-bound id, or
    * an allow-listed function/keyword — `bogus(f)` cannot ride a charset
    * check through to the SQL parser. */
  private def validate(sql: String, ids: Set[String], raw: String): Unit = {
    val bare = stripQuoted(sql)
    require(bare.matches("[A-Za-z0-9_.+\\-*/%()<>=,|' ]*"),
      s"unsupported characters in painless subset after binding: $sql (from: $raw)")
    require(!bare.contains("?"), s"unrewritten '?' in painless source: $raw")
    "[A-Za-z_][A-Za-z0-9_.]*".r.findAllIn(bare).foreach { tok =>
      require(allowedTokens.contains(tok.toLowerCase) || ids.contains(tok),
        s"unknown identifier '$tok' in painless subset " +
          s"(bind fields as doc['$tok'].value): $raw")
    }
  }
}
