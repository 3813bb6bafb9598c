package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property checks of the round-10 text kernels against independent
  * brute-force references:
  *  - [[graft.functions.EditDistance.damerauStr]] vs a BFS over actual
  *    edit sequences (insert / delete / substitute / transpose-adjacent
  *    as unit operations on the evolving string). With unit costs the
  *    minimal edit-sequence length IS the unrestricted (Lowrance-Wagner)
  *    Damerau distance — the variant DuckDB's `damerau_levenshtein`
  *    implements ("ca"→"abc" = 2: transpose, then insert between);
  *  - [[graft.functions.Spans]].PhraseSlopMatch vs exhaustive enumeration
  *    of every in-order position assignment.
  */
class EditDistanceModelSpec extends AnyFunSuite {

  /** Reference true-DL: BFS from `a` applying every unit edit until `b`
    * is reached. Strings are ≤ 4 chars over a 3-letter alphabet, so the
    * reachable state space is tiny. */
  private def refDamerau(a: String, b: String): Int = {
    if (a == b) return 0
    val alphabet = "abc"
    val bound = math.max(a.length, b.length) // substitutions + indels
    var frontier = Set(a)
    val visited = scala.collection.mutable.Set(a)
    var depth = 0
    while (depth < bound) {
      depth += 1
      val next = scala.collection.mutable.Set[String]()
      for (s <- frontier) {
        val edits = scala.collection.mutable.Buffer[String]()
        for (i <- 0 to s.length; c <- alphabet)
          edits += s.substring(0, i) + c + s.substring(i)       // insert
        for (i <- 0 until s.length)
          edits += s.substring(0, i) + s.substring(i + 1)       // delete
        for (i <- 0 until s.length; c <- alphabet if c != s(i))
          edits += s.substring(0, i) + c + s.substring(i + 1)   // substitute
        for (i <- 0 until s.length - 1 if s(i) != s(i + 1))
          edits += s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2) // transpose
        for (e <- edits if !visited.contains(e) && e.length <= b.length + bound) {
          if (e == b) return depth
          visited += e
          next += e
        }
      }
      frontier = next.toSet
    }
    bound
  }

  test("damerau kernel == BFS edit-sequence reference on short strings") {
    val genStr = for {
      n <- Gen.choose(0, 4)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val prop = Prop.forAll(genStr, genStr) { (a, b) =>
      graft.functions.EditDistance.damerauStr(a, b) == refDamerau(a, b)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, res.status.toString)
  }

  test("damerau kernel: metric axioms on random strings") {
    val genStr = for {
      n <- Gen.choose(0, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    import graft.functions.EditDistance.damerauStr
    val prop = Prop.forAll(genStr, genStr, genStr) { (a, b, c) =>
      val ab = damerauStr(a, b)
      ab == damerauStr(b, a) &&                       // symmetry
      (ab == 0) == (a == b) &&                        // identity
      ab <= damerauStr(a, c) + damerauStr(c, b) &&    // triangle
      ab <= math.max(a.length, b.length)              // trivial upper bound
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  /** Reference OSA: the textbook O(n·m) DP with the adjacent-transpose
    * edge gated on d[i−2][j−2] — written as a full matrix (no rolling
    * rows), independently of the kernel's implementation. */
  private def refOsa(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    val d = Array.tabulate(n + 1, m + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(n)(m)
  }

  /** Plain Levenshtein (no transpositions) for the ordering bound. */
  private def lev(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    val d = Array.tabulate(n + 1, m + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
    }
    d(n)(m)
  }

  test("osa kernel == independent DP; true-DL <= OSA <= Levenshtein") {
    val genStr = for {
      n <- Gen.choose(0, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    import graft.functions.EditDistance.{damerauStr, osaStr}
    val prop = Prop.forAll(genStr, genStr) { (a, b) =>
      val o = osaStr(a, b)
      o == refOsa(a, b) &&
      o == osaStr(b, a) &&                  // symmetry
      (o == 0) == (a == b) &&               // identity
      damerauStr(a, b) <= o && o <= lev(a, b) // variant ordering
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(600), prop)
    assert(res.passed, res.status.toString)
    // the documented Lucene divergence: true-DL admits "ca"→"abc" at 2,
    // OSA (ES 6.5's automata) does not
    assert(damerauStr("ca", "abc") == 2 && osaStr("ca", "abc") == 3)
  }

  /** Brute Lucene sloppy phrase: every INJECTIVE assignment of phrase
    * terms to matching token positions (any order, distinct tokens);
    * matches when the shifted positions pᵏ − k span ≤ slop — the
    * SloppyPhraseScorer edit-distance-in-term-moves model the kernel
    * implements. */
  private def refPhraseSlop(toks: Seq[String], terms: Seq[String], slop: Int): Boolean = {
    def choose(k: Int, used: Set[Int], shifts: List[Int]): Boolean =
      if (k == terms.length) shifts.max - shifts.min <= slop
      else toks.indices.exists(i =>
        toks(i) == terms(k) && !used(i) && choose(k + 1, used + i, (i - k) :: shifts))
    choose(0, Set.empty, Nil)
  }

  test("phrase slop kernel == brute enumeration on random token streams") {
    val vocab = Seq("a", "b", "c")
    val genToks = for {
      n <- Gen.choose(0, 9)
      ts <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ts
    val genPhrase = for {
      n <- Gen.choose(1, 3)
      ts <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ts
    val prop = Prop.forAll(genToks, genPhrase, Gen.choose(0, 3)) { (toks, phrase, slop) =>
      val text = toks.mkString(" ")
      val got = graft.functions.Spans.PhraseSlopMatch(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(text)),
        phrase, slop).eval(null).asInstanceOf[Boolean]
      got == refPhraseSlop(toks, phrase, slop)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
