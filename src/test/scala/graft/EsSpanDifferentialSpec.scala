package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 9 — the span family (span_near with term / multi /
  * mixed sides, span_first, span_not, span_containing / span_within,
  * span_or, standalone span_multi): seeded bodies over a dense
  * small-alphabet corpus vs a BRUTE-FORCE twin that enumerates all
  * position pairs (the engine's kernels are one-pass latest-position
  * scans — the twin adjudicates that the scan equals the existential).
  * Token alphabet is small so spans hit and miss in roughly equal
  * measure; equal-term pairs exercise the self-pairing guard.
  */
class EsSpanDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private val alphabet = Seq("ab", "ac", "ba", "bc", "ca", "cb", "aa")

  private lazy val docs: Seq[(Long, String)] = {
    val rnd = new Random(271828L)
    (1L to 100L).map { i =>
      val k = 3 + rnd.nextInt(13)
      (i, (1 to k).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
  }

  private def df = {
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "text")
  }

  private def toks(t: String): Array[String] =
    t.toLowerCase.split("\\W+").filter(_.nonEmpty)

  // independent matcher twins (wildcard/regexp re-derived, whole-token)
  private def matcher(kind: String, v: String): String => Boolean = kind match {
    case "term" => _ == v
    case "prefix" => _.startsWith(v)
    case "wildcard" =>
      val re = v.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      }
      t => t.matches(re)
    case "regexp" => t => t.matches(v)
  }

  private def positions(ts: Array[String], m: String => Boolean): Seq[Int] =
    ts.zipWithIndex.collect { case (t, i) if m(t) => i }.toSeq

  private def run(body: String): Set[Long] =
    graft.dsl.EsQueryJson.search(df,
      s"""{"query": {"bool": {"filter": [$body]}}, "sort": ["doc_id"], "size": 200}""")
      .collect().map(_.getAs[Long]("doc_id")).toSet

  private def compare(ci: Int, body: String, twin: Array[String] => Boolean): Unit = {
    val got = run(body)
    val want = docs.collect { case (id, t) if twin(toks(t)) => id }.toSet
    assert(got == want, s"span divergence (case $ci): $body\n" +
      s" engine-only=${(got -- want).toSeq.sorted.take(5)} twin-only=${(want -- got).toSeq.sorted.take(5)}")
  }

  test("span_near: term/multi/mixed sides, both orders, equal terms (60 cases)") {
    val rnd = new Random(1009L)
    (0 until 60).foreach { ci =>
      def side(): (String, String, String) = rnd.nextInt(5) match {
        case 0 | 1 | 2 =>
          val t = alphabet(rnd.nextInt(alphabet.size))
          ("term", t, s"""{"span_term": {"text": "$t"}}""")
        case 3 =>
          val p = Seq("a", "b", "c", "aa")(rnd.nextInt(4))
          ("prefix", p, s"""{"span_multi": {"match": {"prefix": {"text": "$p"}}}}""")
        case _ =>
          if (rnd.nextBoolean()) {
            val w = Seq("a*", "?b", "a?", "*c")(rnd.nextInt(4))
            ("wildcard", w, s"""{"span_multi": {"match": {"wildcard": {"text": "$w"}}}}""")
          } else {
            val r = Seq("[ab]+", "a.", "(ab|ca)", "c.*")(rnd.nextInt(4))
            ("regexp", r, s"""{"span_multi": {"match": {"regexp": {"text": "$r"}}}}""")
          }
      }
      val (k1, v1, j1) = side(); val (k2, v2, j2) = side()
      val slop = rnd.nextInt(4)
      val inOrder = rnd.nextBoolean()
      val body =
        s"""{"span_near": {"clauses": [$j1, $j2], "slop": $slop, "in_order": $inOrder}}"""
      val (m1, m2) = (matcher(k1, v1), matcher(k2, v2))
      compare(ci, body, ts => {
        val (p1, p2) = (positions(ts, m1), positions(ts, m2))
        p1.exists(p => p2.exists(q => q != p &&
          (if (inOrder) q > p && q - p - 1 <= slop
           else math.max(p, q) - math.min(p, q) - 1 <= slop)))
      })
    }
  }

  test("span_first / span_not / span_containing / span_within / span_or / span_multi (70 cases)") {
    val rnd = new Random(2003L)
    (0 until 15).foreach { ci =>
      val t = alphabet(rnd.nextInt(alphabet.size))
      val end = 1 + rnd.nextInt(5)
      compare(ci, s"""{"span_first": {"match": {"span_term": {"text": "$t"}}, "end": $end}}""",
        ts => positions(ts, _ == t).exists(_ < end))
    }
    (0 until 15).foreach { ci =>
      val incl = alphabet(rnd.nextInt(alphabet.size))
      val excl = alphabet(rnd.nextInt(alphabet.size))
      val pre = rnd.nextInt(3); val post = rnd.nextInt(3)
      compare(100 + ci,
        s"""{"span_not": {"include": {"span_term": {"text": "$incl"}},
           | "exclude": {"span_term": {"text": "$excl"}}, "pre": $pre, "post": $post}}""".stripMargin,
        ts => {
          val ep = positions(ts, _ == excl).toSet
          positions(ts, _ == incl).exists(p =>
            !(math.max(p - pre, 0) to (p + post)).exists(ep))
        })
    }
    (0 until 15).foreach { ci =>
      val t1 = alphabet(rnd.nextInt(alphabet.size))
      val t2 = alphabet(rnd.nextInt(alphabet.size))
      val little = alphabet(rnd.nextInt(alphabet.size))
      val slop = rnd.nextInt(4)
      val kind = if (ci % 2 == 0) "span_containing" else "span_within"
      compare(200 + ci,
        s"""{"$kind": {"big": {"span_near": {"clauses": [
           |  {"span_term": {"text": "$t1"}}, {"span_term": {"text": "$t2"}}],
           |  "slop": $slop, "in_order": true}},
           | "little": {"span_term": {"text": "$little"}}}}""".stripMargin,
        ts => {
          val lp = positions(ts, _ == little)
          positions(ts, _ == t1).exists(p => positions(ts, _ == t2).exists(j =>
            j > p && j - p - 1 <= slop && lp.exists(q => p <= q && q <= j)))
        })
    }
    (0 until 10).foreach { ci =>
      val terms = rnd.shuffle(alphabet).take(2 + rnd.nextInt(2))
      val clauses = terms.map(t => s"""{"span_term": {"text": "$t"}}""").mkString(", ")
      compare(300 + ci, s"""{"span_or": {"clauses": [$clauses]}}""",
        ts => ts.exists(terms.contains))
    }
    (0 until 15).foreach { ci =>
      val (kind, v) =
        if (ci % 3 == 0) ("prefix", Seq("a", "c", "aa")(rnd.nextInt(3)))
        else if (ci % 3 == 1) ("wildcard", Seq("a*", "?a", "b?")(rnd.nextInt(3)))
        else ("regexp", Seq("[bc]+", ".a", "(aa|bc)")(rnd.nextInt(3)))
      compare(400 + ci, s"""{"span_multi": {"match": {"$kind": {"text": "$v"}}}}""",
        ts => ts.exists(matcher(kind, v)))
    }
  }
}
