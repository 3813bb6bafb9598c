package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `query_string` / `simple_query_string` — the Lucene-syntax query bar
  * (the single most-typed ES query body; the reference delegates its whole
  * query surface to ES 6.5, `/root/reference/pom.xml:25-26`). A conservative
  * subset compiled to the SAME predicates as the structured DSL — this is a
  * parser front-end, not a second engine:
  *
  *   - `field:value`, `field:"a phrase"`, bare terms over the default
  *     field(s) (OR across fields, multi_match-style)
  *   - `AND`/`&&`, `OR`/`||`, `NOT` (plus `-term` prefix negation, `+term`
  *     accepted as a plain term), parentheses; adjacency = default_operator
  *   - `"quoted phrases"` → consecutive-token match_phrase
  *   - `*`/`?` wildcards → `like` over the raw field value (keyword
  *     semantics — analyzed-term wildcards need an inverted index)
  *   - `f:[a TO b]` / `f:{a TO b}` ranges (mixed brackets, `*` unbounded)
  *     and `f:>=v` / `f:>v` / `f:<=v` / `f:<v` comparisons
  *   - `f:(a b "p q")` field grouping — unfielded atoms inside the group
  *     rebind to the field, nested groups allowed
  *   - `term~` / `term~N` fuzzy (edit distance, default 2)
  *
  * Value semantics without a mapping: a numeric-looking value compiles to
  * typed equality (numeric/keyword fields); anything else to a one-term
  * analyzed match (`EsDsl.matchQuery`), which equals term-equality for
  * single-token values like `lang:en`.
  *
  * `simple_query_string` uses the simplified operators (`+` AND, `|` OR,
  * `-` NOT, quotes, parens, trailing `*`), has no `field:` syntax (fields
  * come from the `fields` parameter), and NEVER throws: input that fails to
  * parse degrades to its bare terms combined with the default operator —
  * ES's documented leniency.
  */
object QueryString {

  // ---- AST -------------------------------------------------------------
  sealed trait Node
  final case class Term(field: Option[String], text: String) extends Node
  /** `"a b"` exact, `"a b"~N` sloppy proximity (Lucene slop, out-of-order within budget) */
  final case class Phrase(field: Option[String], words: Seq[String],
                          slop: Int = 0) extends Node
  final case class Wild(field: Option[String], pattern: String) extends Node
  /** `f:[a TO b]` / `f:{a TO b}` (mixed brackets allowed; `*` = unbounded) */
  final case class Rng(field: String, lo: Option[String], hi: Option[String],
                       loInc: Boolean, hiInc: Boolean) extends Node
  /** `f:>=v`, `f:>v`, `f:<=v`, `f:<v` */
  final case class Cmp(field: String, op: String, v: String) extends Node
  /** `term~` / `term~N` (Damerau-ish edit distance, default 2) */
  final case class Fuzzy(field: Option[String], text: String, maxEdits: Int) extends Node
  /** `_exists_:f` — the Lucene field-presence atom */
  final case class Exists(field: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node

  private val FuzzyRe = "(.+)~([0-9]*)".r

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndT extends Tok
  private case object OrT extends Tok
  private case object NotT extends Tok
  private final case class Atom(n: Node) extends Tok

  private def phraseWords(s: String): Seq[String] =
    s.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  // ---- tokenizers ------------------------------------------------------
  private def luceneToks(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def quoted(from: Int): (String, Int) = {
      val j = q.indexOf('"', from + 1)
      require(j > 0, s"unterminated phrase in query string: $q")
      (q.substring(from + 1, j), j + 1)
    }
    // Lucene proximity suffix on a closed phrase: `"a b"~2`
    def slopSuffix(j: Int): (Int, Int) = {
      if (j < q.length && q(j) == '~') {
        var k = j + 1
        while (k < q.length && q(k).isDigit) k += 1
        if (k > j + 1) (q.substring(j + 1, k).toInt, k) else (0, j)
      } else (0, j)
    }
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '"') {
        val (s, j0) = quoted(i); val (sl, j) = slopSuffix(j0)
        out += Atom(Phrase(None, phraseWords(s), sl)); i = j
      }
      else {
        val start = i
        while (i < q.length && !q(i).isWhitespace && "()\"[{".indexOf(q(i)) < 0) i += 1
        var w = q.substring(start, i)
        w match {
          case "AND" | "&&" => out += AndT
          case "OR" | "||" => out += OrT
          case "NOT" | "!" => out += NotT
          case _ =>
            if (w.startsWith("-") && w.length > 1) { out += NotT; w = w.substring(1) }
            else if (w.startsWith("+") && w.length > 1) w = w.substring(1)
            val (fld, rest) = w.indexOf(':') match {
              case k if k > 0 => (Some(w.substring(0, k)), w.substring(k + 1))
              case _ => (None, w)
            }
            if (rest.isEmpty && fld.isDefined && i < q.length && q(i) == '"') {
              val (s, j0) = quoted(i); val (sl, j) = slopSuffix(j0)
              out += Atom(Phrase(fld, phraseWords(s), sl)); i = j
            } else if (rest.isEmpty && fld.isDefined && i < q.length && (q(i) == '[' || q(i) == '{')) {
              // `f:[a TO b]` / `f:{a TO b}` — mixed brackets allowed
              val loInc = q(i) == '['
              val close = q.indexWhere(c => c == ']' || c == '}', i + 1)
              require(close > 0, s"unterminated range in query string: $q")
              val hiInc = q(close) == ']'
              val parts = q.substring(i + 1, close).trim.split("\\s+TO\\s+")
              require(parts.length == 2, s"range must be '<lo> TO <hi>': $q")
              def bound(s: String) = if (s == "*") None else Some(s)
              out += Atom(Rng(fld.get, bound(parts(0)), bound(parts(1)), loInc, hiInc))
              i = close + 1
            } else if (rest.isEmpty && fld.isDefined && i < q.length && q(i) == '(') {
              // `f:(a b "p q" ...)` field grouping: tokenize the group and
              // rebind its unfielded atoms to the field (Lucene semantics —
              // explicitly-fielded atoms inside the group keep their own)
              // depth scan mirrors the tokenizer's phrase handling: parens
              // inside double quotes don't open/close groups
              var depth = 1; var j = i + 1; var inQuote = false
              while (depth > 0) {
                require(j < q.length, s"unterminated field group in query string: $q")
                if (q(j) == '"') inQuote = !inQuote
                else if (!inQuote) {
                  if (q(j) == '(') depth += 1 else if (q(j) == ')') depth -= 1
                }
                if (depth > 0) j += 1
              }
              out += LP
              luceneToks(q.substring(i + 1, j)).foreach {
                case Atom(Term(None, t)) => out += Atom(Term(fld, t))
                case Atom(Phrase(None, ws, sl)) => out += Atom(Phrase(fld, ws, sl))
                case Atom(Wild(None, p)) => out += Atom(Wild(fld, p))
                case Atom(Fuzzy(None, t, n)) => out += Atom(Fuzzy(fld, t, n))
                case other => out += other
              }
              out += RP
              i = j + 1
            } else if (rest.isEmpty && fld.isDefined)
              throw new IllegalArgumentException(
                s"dangling field '${fld.get}:' with no value in query string: $q")
            else if (fld.isDefined && (rest.startsWith(">") || rest.startsWith("<"))) {
              val opLen = if (rest.length > 1 && rest(1) == '=') 2 else 1
              require(rest.length > opLen, s"empty comparison value: $w")
              out += Atom(Cmp(fld.get, rest.substring(0, opLen), rest.substring(opLen)))
            } else if (fld.contains("_exists_")) {
              out += Atom(Exists(rest))
            } else rest match {
              case FuzzyRe(base, n) if !base.exists(ch => ch == '*' || ch == '?') =>
                out += Atom(Fuzzy(fld, base, if (n.isEmpty) 2 else n.toInt))
              case _ =>
                if (rest.exists(ch => ch == '*' || ch == '?')) out += Atom(Wild(fld, rest))
                else if (rest.nonEmpty) out += Atom(Term(fld, rest))
            }
        }
      }
    }
    out.result()
  }

  private def simpleToks(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '|') { out += OrT; i += 1 }
      else if (c == '+') { out += AndT; i += 1 }
      else if (c == '-') { out += NotT; i += 1 }
      else if (c == '"') {
        val j = q.indexOf('"', i + 1)
        require(j > 0, s"unterminated phrase: $q")
        // simple_query_string NEAR operator: `"a b"~N`
        var j2 = j + 1; var sl = 0
        if (j2 < q.length && q(j2) == '~') {
          var k = j2 + 1
          while (k < q.length && q(k).isDigit) k += 1
          if (k > j2 + 1) { sl = q.substring(j2 + 1, k).toInt; j2 = k }
        }
        out += Atom(Phrase(None, phraseWords(q.substring(i + 1, j)), sl)); i = j2
      } else {
        val start = i
        while (i < q.length && !q(i).isWhitespace && "()|+\"".indexOf(q(i)) < 0) i += 1
        val w = q.substring(start, i)
        if (w.nonEmpty) out += Atom(w match {
          case FuzzyRe(base, n) if !base.exists(ch => ch == '*' || ch == '?') =>
            Fuzzy(None, base, if (n.isEmpty) 2 else n.toInt)
          case _ if w.exists(ch => ch == '*' || ch == '?') => Wild(None, w)
          case _ => Term(None, w)
        })
      }
    }
    out.result()
  }

  // ---- parser (precedence NOT > AND > OR; adjacency = defaultOp) -------
  private final class P(toks: Vector[Tok], defaultAnd: Boolean) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def parse(): Node = {
      val n = expr()
      require(i == toks.length, s"trailing tokens at $i")
      n
    }
    private def expr(): Node = {
      var l = andExpr()
      var more = true
      while (more) peek match {
        case Some(OrT) => i += 1; l = Or(l, andExpr())
        case Some(NotT) =>
          // Lucene: an adjacent negated clause is exclusionary (MUST_NOT)
          // regardless of the default operator — `foo -bar` filters bar out
          l = And(l, andExpr())
        case Some(LP) | Some(Atom(_)) => // implicit adjacency
          val r = andExpr(); l = if (defaultAnd) And(l, r) else Or(l, r)
        case _ => more = false
      }
      l
    }
    private def andExpr(): Node = {
      var l = notExpr()
      while (peek.contains(AndT)) { i += 1; l = And(l, notExpr()) }
      l
    }
    private def notExpr(): Node = peek match {
      case Some(NotT) => i += 1; Not(notExpr())
      case _ => primary()
    }
    private def primary(): Node = peek match {
      case Some(LP) =>
        i += 1; val e = expr()
        require(peek.contains(RP), "missing closing paren"); i += 1; e
      case Some(Atom(n)) => i += 1; n
      case t => throw new IllegalArgumentException(s"unexpected token: $t")
    }
  }

  def parseLucene(q: String, defaultAnd: Boolean = false): Node =
    new P(luceneToks(q), defaultAnd).parse()

  def parseSimple(q: String, defaultAnd: Boolean = false): Node =
    new P(simpleToks(q), defaultAnd).parse()

  // ---- compile to Catalyst predicates ----------------------------------
  private def numericLit(v: String): Option[Column] =
    v.toLongOption.map(lit(_)).orElse(v.toDoubleOption.map(lit(_)))

  /** AST → predicate Column. `fld` is the caller's field resolver (so
    * `nested` rebinding and `info.*` map access work unchanged);
    * `defaultFields` serve unfielded terms, OR across fields. */
  def compile(n: Node, fld: String => Column, defaultFields: Seq[String]): Column = {
    def overDefaults(f: Column => Column): Column = {
      require(defaultFields.nonEmpty,
        "unfielded term requires default_field/fields in the query-string body")
      defaultFields.map(d => f(fld(d))).reduce(_ || _)
    }
    def go(n: Node): Column = n match {
      case And(l, r) => go(l) && go(r)
      case Or(l, r) => go(l) || go(r)
      // ES must_not semantics: NULL predicate (missing field) != match
      case Not(x) => !coalesce(go(x), lit(false))
      case Exists(f) => EsDsl.exists(fld(f))
      case Term(Some(f), v) =>
        numericLit(v).map(fld(f) === _).getOrElse(EsDsl.matchQuery(fld(f), Seq(v)))
      case Term(None, v) => overDefaults(EsDsl.matchQuery(_, Seq(v)))
      case Phrase(Some(f), ws, 0) => EsDsl.matchPhrase(fld(f), ws)
      case Phrase(None, ws, 0) => overDefaults(EsDsl.matchPhrase(_, ws))
      case Phrase(Some(f), ws, sl) => graft.functions.Spans.phraseSlop(fld(f), ws, sl)
      case Phrase(None, ws, sl) => overDefaults(graft.functions.Spans.phraseSlop(_, ws, sl))
      case Wild(Some(f), p) => EsDsl.wildcard(fld(f), p)
      case Wild(None, p) => overDefaults(EsDsl.wildcard(_, p))
      case Rng(f, lo, hi, loInc, hiInc) =>
        def b(s: String): Column = numericLit(s).getOrElse(lit(s))
        val c = fld(f)
        // `f:[* TO *]`: a range query with both bounds open is still a
        // range query ON THE FIELD — Lucene matches only docs that HAVE
        // it (the `_exists_:f` equivalence), not every doc (query_string
        // differential find, round-15 second front; a225 pins it)
        Seq(lo.map(v => if (loInc) c >= b(v) else c > b(v)),
            hi.map(v => if (hiInc) c <= b(v) else c < b(v)))
          .flatten.reduceOption(_ && _).getOrElse(c.isNotNull)
      case Cmp(f, op, v) =>
        val b = numericLit(v).getOrElse(lit(v))
        op match {
          case ">=" => fld(f) >= b
          case ">" => fld(f) > b
          case "<=" => fld(f) <= b
          case "<" => fld(f) < b
        }
      // Lucene's `~` fuzzy defaults to transpositions (Damerau), same as
      // the fuzzy query's ES-6.5 default
      case Fuzzy(Some(f), t, n) =>
        graft.functions.EditDistance.fuzzyLev(fld(f), lit(t)) <= n
      case Fuzzy(None, t, n) =>
        overDefaults(graft.functions.EditDistance.fuzzyLev(_, lit(t)) <= n)
    }
    go(n)
  }

  /** `query_string` entry point (strict: malformed syntax throws). */
  def lucene(q: String, fld: String => Column, defaultFields: Seq[String],
             defaultAnd: Boolean = false): Column =
    compile(parseLucene(q, defaultAnd), fld, defaultFields)

  /** `simple_query_string` entry point (lenient: malformed syntax degrades
    * to the bare terms combined with the default operator, never throws). */
  def simple(q: String, fld: String => Column, defaultFields: Seq[String],
             defaultAnd: Boolean = false): Column =
    try compile(parseSimple(q, defaultAnd), fld, defaultFields)
    catch {
      case _: IllegalArgumentException =>
        val terms = q.split("[\\s()|+\"-]+").filter(_.nonEmpty).toSeq
        require(terms.nonEmpty, s"no terms in simple_query_string: $q")
        val preds = terms.map(t => compile(Term(None, t), fld, defaultFields))
        if (defaultAnd) preds.reduce(_ && _) else preds.reduce(_ || _)
    }
}
