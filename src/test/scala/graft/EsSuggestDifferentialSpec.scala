package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 8 — the suggester family (term / phrase /
  * completion), previously hand-pinned only (SuggestSpec + a41/a42/a43/
  * a146/a158 oracle rows). Seeded typo'd inputs run through the engine
  * and an independent plain-Scala twin: own tokenizer, own vocabulary
  * fold, own OSA (restricted-Damerau) DP — the `string_distance:
  * internal` ES 6.5 ships — own ranking. The term-suggest twin skips the
  * engine's length PRE-FILTER entirely, so it also adjudicates the claim
  * that |len(term) − len(token)| ≤ maxEdits is implied by OSA ≤ maxEdits.
  *
  * Engine calls run inside [[graft.functions.EditDistance.withLuceneParity]]
  * (= OSA, the twin's DP). The engine DEFAULT is true-DL (the
  * DuckDB-mirrorable variant the oracle rows pin); the two diverge
  * exactly on the a196 family — the first fresh-seed sweep surfaced
  * osa("stream","setam")=3 vs DL=2 (delete the interleaved 'r', THEN
  * transpose) before this scoping, confirming the routed modes differ
  * where documented.
  */
class EsSuggestDifferentialSpec extends AnyFunSuite with SparkTestBase {

  // independent OSA (one transposition = one edit, no substring reuse)
  private def osa(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(a.length)(b.length)
  }

  private val vocabWords = Seq("spark", "sparse", "spare", "share", "shard",
    "table", "cable", "stable", "stream", "steam", "scan", "scans", "plan",
    "query", "quest", "merge", "marge", "batch", "match", "watch", "index")

  private def corpus: Seq[(Long, String)] = {
    val rnd = new Random(314159L)
    (1L to 80L).map { i =>
      val k = 3 + rnd.nextInt(8)
      // skewed draw → meaningfully different doc/term frequencies
      val words = (1 to k).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 5) vocabWords(rnd.nextInt(5))
        else vocabWords(rnd.nextInt(vocabWords.size))
      }
      (i, words.mkString(" "))
    }
  }

  // independent vocabulary fold
  private def toks(t: String) = t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
  private lazy val docs = corpus
  private lazy val vocab: Map[String, (Long, Long)] = {
    val all = docs.flatMap { case (id, t) => toks(t).map(id -> _) }
    all.groupBy(_._2).map { case (term, occ) =>
      term -> (occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }
  }

  private def df = {
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "text")
  }

  private def typo(w: String, edits: Int, rnd: Random): String = {
    var s = w
    (1 to edits).foreach { _ =>
      if (s.length < 2) s = s + "x"
      else rnd.nextInt(4) match {
        case 0 => val i = rnd.nextInt(s.length) // substitute
          s = s.updated(i, ('a' + rnd.nextInt(26)).toChar)
        case 1 => val i = rnd.nextInt(s.length) // delete
          s = s.take(i) + s.drop(i + 1)
        case 2 => val i = rnd.nextInt(s.length + 1) // insert
          s = s.take(i) + ('a' + rnd.nextInt(26)).toChar + s.drop(i)
        case _ => val i = rnd.nextInt(s.length - 1) // transpose
          s = s.take(i) + s(i + 1) + s(i) + s.drop(i + 2)
      }
    }
    s
  }

  test("term suggester matches the twin across modes (30 seeded inputs)") {
    val rnd = new Random(8086L)
    val d = df
    (0 until 30).foreach { ci =>
      val nTok = 1 + rnd.nextInt(2)
      val text = (1 to nTok).map(_ =>
        typo(vocabWords(rnd.nextInt(vocabWords.size)), rnd.nextInt(3), rnd)).mkString(" ")
      val mode = Seq("always", "missing", "popular")(ci % 3)
      val maxEdits = 1 + rnd.nextInt(2)
      val size = 3 + rnd.nextInt(3)
      val got = graft.functions.EditDistance.withLuceneParity {
        graft.dsl.Suggest.termSuggest(d, col("doc_id"), col("text"),
          text, size = size, maxEdits = maxEdits, mode = mode)
      }.collect().map(r => (r.getAs[String]("token"), r.getAs[Int]("rank"),
          r.getAs[String]("suggestion"), r.getAs[Int]("distance"),
          r.getAs[Long]("doc_freq"))).toSet
      val want = toks(text).distinct.flatMap { tok =>
        val inDf = vocab.get(tok).map(_._1).getOrElse(0L)
        vocab.toSeq
          .map { case (term, (dfq, _)) => (term, osa(term, tok), dfq) }
          .filter { case (_, dist, dfq) =>
            dist > 0 && dist <= maxEdits && (mode match {
              case "always" => true
              case "missing" => inDf == 0
              case _ => dfq > inDf
            })
          }
          .sortBy { case (term, dist, dfq) => (-dfq, dist, term) }
          .take(size).zipWithIndex
          .map { case ((term, dist, dfq), i) => (tok, i + 1, term, dist, dfq) }
      }.toSet
      assert(got == want,
        s"term-suggest divergence (case $ci, text='$text', mode=$mode, " +
          s"maxEdits=$maxEdits, size=$size):\n engine-only=${got -- want}\n twin-only=${want -- got}")
    }
  }

  test("completion suggester matches the twin incl. fuzzy prefixes (24 inputs)") {
    val rnd = new Random(40961L)
    val d = df
    (0 until 24).foreach { ci =>
      val base = vocabWords(rnd.nextInt(vocabWords.size))
      val fuzz = ci % 3 // 0, 1, 2
      val p0 = base.take(2 + rnd.nextInt(3))
      val prefix = if (fuzz == 0) p0 else typo(p0, 1, rnd)
      val fpl = 1 + rnd.nextInt(2)
      val size = 4
      val got = graft.functions.EditDistance.withLuceneParity {
        graft.dsl.Suggest.completionSuggest(d, col("doc_id"), col("text"),
          prefix, size = size, fuzziness = fuzz, fuzzyPrefixLength = fpl)
      }.collect().map(r => (r.getAs[String]("suggestion"), r.getAs[Long]("weight"))).toSeq
      val p = prefix.toLowerCase
      def matches(term: String): Boolean =
        if (fuzz == 0) term.startsWith(p)
        else {
          val lens = math.max(fpl, p.length - fuzz) to (p.length + fuzz)
          term.take(fpl) == p.take(fpl) &&
            (if (lens.isEmpty) term.startsWith(p)
             else lens.exists(j => osa(term.take(j), p) <= fuzz))
        }
      val want = vocab.toSeq.collect { case (term, (_, tf)) if matches(term) => (term, tf) }
        .sortBy { case (term, tf) => (-tf, term) }.take(size)
      assert(got == want,
        s"completion divergence (case $ci, prefix='$prefix', fuzz=$fuzz, fpl=$fpl):\n" +
          s" engine=$got\n twin  =$want")
    }
  }

  test("phrase suggester matches the bigram-LM twin (12 inputs)") {
    val rnd = new Random(65537L)
    val d = df
    // independent bigram counter over the corpus
    def bigramCount(g: String): Long =
      docs.map { case (_, t) =>
        toks(t).sliding(2).count(w => w.length == 2 && w.mkString(" ") == g).toLong
      }.sum
    (0 until 12).foreach { ci =>
      val n = if (ci % 4 == 0) 1 else 2
      val text = (1 to n).map(_ =>
        typo(vocabWords(rnd.nextInt(vocabWords.size)), rnd.nextInt(2), rnd)).mkString(" ")
      val shardSize = 3 + rnd.nextInt(3)
      val size = 3
      val got = graft.functions.EditDistance.withLuceneParity {
        graft.dsl.Suggest.phraseSuggest(d, col("doc_id"), col("text"),
          text, size = size, shardSize = shardSize, maxEdits = 1)
      }.collect().map(r => (r.getAs[String]("suggestion"), r.getAs[Long]("score"))).toSeq
      val ts = toks(text)
      val byPos: Seq[Seq[(String, Long, Long)]] = ts.map { tok =>
        vocab.toSeq.map { case (term, (dfq, tf)) => (term, dfq, tf) }
          .filter { case (term, _, _) => osa(term, tok) <= 1 }
          .sortBy { case (term, dfq, _) => (-dfq, term) }.take(shardSize)
      }
      val want =
        if (ts.length == 1)
          byPos.head.map { case (term, _, tf) => (term, tf) }
            .sortBy { case (term, tf) => (-tf, term) }.take(size)
        else {
          val phrases = byPos.map(_.map(_._1)).foldLeft(Seq(Seq.empty[String])) {
            (acc, cs) => for (a <- acc; c <- cs) yield a :+ c
          }.filter(_.length == ts.length)
          phrases.map { ph =>
            (ph.mkString(" "), ph.sliding(2).map(_.mkString(" ")).map(bigramCount).sum)
          }.sortBy { case (ph, sc) => (-sc, ph) }.take(size)
        }
      assert(got == want,
        s"phrase divergence (case $ci, text='$text', shardSize=$shardSize):\n" +
          s" engine=$got\n twin  =$want")
    }
  }
}
