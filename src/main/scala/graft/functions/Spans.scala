package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.util.regex.Pattern

/** ES span queries (`span_near`, `span_first`) as one-pass positional
  * kernels. ES evaluates spans by walking postings lists with positions;
  * here the positions come from a single tokenize pass per document — a
  * narrow boolean predicate (no explode, no join, no shuffle) that pushes
  * into any `bool` combinator like every other query predicate.
  *
  * Positions are 1-indexed (matching the DuckDB oracle's
  * `generate_subscripts`). `slop` = max intervening tokens between the two
  * spans, ES semantics: in_order requires p2 > p1 with p2 − p1 − 1 ≤ slop;
  * unordered allows either direction (distinct positions). */
object Spans {

  private val splitter = Pattern.compile("\\W+")

  private def tokenize(text: UTF8String): Array[String] =
    splitter.split(text.toLowerCase.toString, -1).filter(_.nonEmpty)

  /** True iff `t1` and `t2` occur within `slop` intervening tokens
    * (ordered or not). One pass: track the most recent position of each
    * term; every occurrence closes the smallest gap with the other term's
    * latest position, so the running minimum is exact. */
  case class SpanNearMatch(child: Expression, t1: String, t2: String,
                           slop: Int, inOrder: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(in: Any): Any = {
      val toks = tokenize(in.asInstanceOf[UTF8String])
      var last1 = -1; var last2 = -1
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        val isT1 = t == t1; val isT2 = t == t2
        // check against positions BEFORE this token, then update — so a
        // token matching both terms (t1 == t2) never pairs with itself
        if (isT2 && last1 >= 0 && i - last1 - 1 <= slop) return true
        if (!inOrder && isT1 && last2 >= 0 && i - last2 - 1 <= slop) return true
        if (isT1) last1 = i
        if (isT2) last2 = i
        i += 1
      }
      false
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `span_not`: true iff SOME occurrence of `incl` has NO occurrence of
    * `excl` within `pre` positions before or `post` after it (ES's dilated
    * overlap test). One tokenize pass + a bounded window scan per
    * include-occurrence. */
  case class SpanNotMatch(child: Expression, incl: String, excl: String,
                          pre: Int, post: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(in: Any): Any = {
      val toks = tokenize(in.asInstanceOf[UTF8String])
      var i = 0
      while (i < toks.length) {
        if (toks(i) == incl) {
          var clean = true
          var q = math.max(i - pre, 0)
          val hi = math.min(i + post, toks.length - 1)
          while (clean && q <= hi) {
            if (toks(q) == excl) clean = false
            q += 1
          }
          if (clean) return true
        }
        i += 1
      }
      false
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `span_containing`: true iff some `big` span — an in-order (t1, t2)
    * pair within `slop` intervening tokens — CONTAINS an occurrence of the
    * `little` term (t1-pos ≤ q ≤ t2-pos). One tokenize pass; the pair scan
    * is bounded by the slop window. */
  case class SpanContainingMatch(child: Expression, t1: String, t2: String,
                                 slop: Int, little: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(in: Any): Any = {
      val toks = tokenize(in.asInstanceOf[UTF8String])
      var i = 0
      while (i < toks.length) {
        if (toks(i) == t1) {
          // candidate big spans starting here end within the slop window
          var j = i + 1
          val hi = math.min(i + slop + 1, toks.length - 1)
          while (j <= hi) {
            if (toks(j) == t2) {
              var q = i
              while (q <= j) {
                if (toks(q) == little) return true
                q += 1
              }
            }
            j += 1
          }
        }
        i += 1
      }
      false
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Token matcher for a `span_multi` side: exact term, prefix, ES
    * wildcard (`*`/`?`, whole-token), or anchored regexp (whole-token, as
    * ES anchors `regexp`). Compiled once per expression instance. */
  private[graft] def tokenMatcher(kind: String, value: String): String => Boolean =
    kind match {
      case "term" => _ == value
      case "prefix" => _.startsWith(value)
      case "wildcard" =>
        val sb = new StringBuilder
        value.foreach {
          case '*' => sb.append(".*")
          case '?' => sb.append('.')
          case c => sb.append(Pattern.quote(c.toString))
        }
        val p = Pattern.compile(sb.toString)
        t => p.matcher(t).matches()
      case "regexp" =>
        val p = Pattern.compile(value)
        t => p.matcher(t).matches()
      case other => throw new IllegalArgumentException(s"unsupported span_multi kind: $other")
    }

  /** [[SpanNearMatch]] generalized so each side is a token MATCHER rather
    * than an exact term — the `span_multi` wrapper inside `span_near`
    * (prefix/wildcard/regexp sides). Same one-pass latest-position
    * algorithm, same self-pairing guard. */
  case class SpanNearMultiMatch(child: Expression, k1: String, v1: String,
                                k2: String, v2: String, slop: Int, inOrder: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    @transient private lazy val p1 = tokenMatcher(k1, v1)
    @transient private lazy val p2 = tokenMatcher(k2, v2)
    override def nullSafeEval(in: Any): Any = {
      val toks = tokenize(in.asInstanceOf[UTF8String])
      var last1 = -1; var last2 = -1
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        val is1 = p1(t); val is2 = p2(t)
        if (is2 && last1 >= 0 && i - last1 - 1 <= slop) return true
        if (!inOrder && is1 && last2 >= 0 && i - last2 - 1 <= slop) return true
        if (is1) last1 = i
        if (is2) last2 = i
        i += 1
      }
      false
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** True iff `term` occurs at 1-indexed position ≤ `end`. */
  case class SpanFirstMatch(child: Expression, term: String, end: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(in: Any): Any = {
      val toks = tokenize(in.asInstanceOf[UTF8String])
      val n = math.min(end, toks.length)
      var i = 0
      while (i < n) {
        if (toks(i) == term) return true
        i += 1
      }
      false
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `match_phrase_prefix`: consecutive exact terms with the LAST a
    * prefix — one tokenize pass, a rolling window compare per position
    * (the search-as-you-type query; the HOF formulation re-interpreted
    * per-position lambdas and was ~6× slower at sf0.1). */
  case class PhrasePrefixMatch(child: Expression, terms: Seq[String], prefix: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(in: Any): Any = {
      val toks = tokenize(in.asInstanceOf[UTF8String])
      val n = terms.length + 1
      if (toks.length < n) return false
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        var ok = true
        var o = 0
        while (ok && o < terms.length) {
          if (toks(i + o) != terms(o)) ok = false
          o += 1
        }
        if (ok && toks(i + terms.length).startsWith(prefix)) return true
        i += 1
      }
      false
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `match_phrase` with `slop` — Lucene SloppyPhraseScorer semantics:
    * true iff there is an injective assignment of phrase terms to token
    * positions (a repeated phrase term needs distinct tokens) whose
    * SHIFTED positions s_k = p_k − k span at most `slop`
    * (max s − min s ≤ slop). This is PhraseQuery's "edit distance in term
    * moves" model: each slop unit moves one term one position out of its
    * query slot, so a transposed adjacent pair costs 2 and OUT-OF-ORDER
    * arrangements match once the budget covers them. An in-order match
    * reduces to the familiar (q_n − q_1) − (n−1) ≤ slop window.
    *
    * One tokenize pass collects occurrences (s, k, p); sorted by shift, a
    * two-pointer window of span ≤ slop slides over them, and coverage
    * inside a window is an augmenting-path bipartite matching — n is a
    * handful and a window holds O(slop·dup) entries, so per-doc cost stays
    * ~O(T log T) with T = phrase-term occurrences. */
  case class PhraseSlopMatch(child: Expression, terms: Seq[String], slop: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(in: Any): Any = {
      val toks = tokenize(in.asInstanceOf[UTF8String])
      val n = terms.length
      if (n == 1) return toks.contains(terms.head)
      val occ = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var i = 0
      while (i < toks.length) {
        var k = 0
        while (k < n) {
          if (toks(i) == terms(k)) occ += ((i - k, k, i))
          k += 1
        }
        i += 1
      }
      if (occ.length < n) return false
      val arr = occ.sortBy(_._1).toArray
      var lo = 0
      var hi = 0
      while (hi < arr.length) {
        while (arr(hi)._1 - arr(lo)._1 > slop) lo += 1
        if (hi - lo + 1 >= n && covers(arr, lo, hi, n)) return true
        hi += 1
      }
      false
    }
    /** Injective term→position matching within the window. */
    private def covers(arr: Array[(Int, Int, Int)], lo: Int, hi: Int, n: Int): Boolean = {
      val byTerm = Array.fill(n)(List.empty[Int])
      var j = lo
      while (j <= hi) { val (_, k, p) = arr(j); byTerm(k) ::= p; j += 1 }
      val owner = scala.collection.mutable.HashMap.empty[Int, Int] // pos → term
      def augment(k: Int, seen: scala.collection.mutable.HashSet[Int]): Boolean =
        byTerm(k).exists { p =>
          seen.add(p) && (owner.get(p) match {
            case None => owner(p) = k; true
            case Some(o) if augment(o, seen) => owner(p) = k; true
            case _ => false
          })
        }
      (0 until n).forall(k =>
        byTerm(k).nonEmpty && augment(k, new scala.collection.mutable.HashSet[Int]))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def phraseSlop(text: Column, terms: Seq[String], slop: Int): Column =
    column(PhraseSlopMatch(expression(text), terms.map(_.toLowerCase), slop))

  def phrasePrefix(text: Column, terms: Seq[String], prefix: String): Column =
    column(PhrasePrefixMatch(expression(text), terms, prefix))

  def spanNearMulti(text: Column, k1: String, v1: String, k2: String, v2: String,
                    slop: Int, inOrder: Boolean): Column =
    column(SpanNearMultiMatch(expression(text), k1, v1, k2, v2, slop, inOrder))
  def spanNear(text: Column, t1: String, t2: String, slop: Int, inOrder: Boolean): Column =
    column(SpanNearMatch(expression(text), t1, t2, slop, inOrder))

  def spanFirst(text: Column, term: String, end: Int): Column =
    column(SpanFirstMatch(expression(text), term, end))

  def spanNot(text: Column, incl: String, excl: String, pre: Int, post: Int): Column =
    column(SpanNotMatch(expression(text), incl, excl, pre, post))

  def spanContaining(text: Column, t1: String, t2: String, slop: Int, little: String): Column =
    column(SpanContainingMatch(expression(text), t1, t2, slop, little))
}
