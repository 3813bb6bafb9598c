package graft

import graft.functions.Spans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpansSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sp = spark

  private def matches(text: String, c: org.apache.spark.sql.Column): Boolean = {
    import sp.implicits._
    Seq(text).toDF("text").select(c.as("m")).collect().head.getBoolean(0)
  }

  test("span_near in_order: gap boundary at slop") {
    val q = (slop: Int) => Spans.spanNear(col("text"), "a", "b", slop, inOrder = true)
    assert(matches("a x x b", q(2)))      // 2 intervening == slop
    assert(!matches("a x x x b", q(2)))   // 3 intervening > slop
    assert(matches("a b", q(0)))          // adjacent, slop 0
    assert(!matches("b x a", q(2)))       // wrong order
  }

  test("span_near unordered matches either direction") {
    val q = Spans.spanNear(col("text"), "a", "b", 1, inOrder = false)
    assert(matches("b x a", q))
    assert(matches("a x b", q))
    assert(!matches("b x x a", q))
  }

  test("span_near with identical terms needs two occurrences") {
    val q = Spans.spanNear(col("text"), "a", "a", 5, inOrder = true)
    assert(!matches("a x y z", q))
    assert(matches("a x a", q))
  }

  test("span_near picks the closest pair, not the first") {
    // first 'a' is far from 'b'; the second 'a' is close enough
    val q = Spans.spanNear(col("text"), "a", "b", 0, inOrder = true)
    assert(matches("a x x x a b", q))
  }

  test("span_first: position boundary") {
    val q = (end: Int) => Spans.spanFirst(col("text"), "spark", end)
    assert(matches("x x spark y", q(3)))
    assert(!matches("x x spark y", q(2)))
    assert(!matches("x x x x", q(10)))
  }

  test("span_not: include occurrence must be clear of exclude in the window") {
    val q = (pre: Int, post: Int) => Spans.spanNot(col("text"), "a", "b", pre, post)
    assert(!matches("a b", q(0, 1)))      // b at +1 inside post window
    assert(matches("a b", q(0, 0)))       // window excludes +1
    assert(!matches("b a", q(1, 0)))      // b at -1 inside pre window
    assert(matches("b a", q(0, 0)))
    assert(matches("a b x x a", q(0, 1))) // second occurrence is clear
    assert(!matches("x y z", q(2, 2)))    // no include occurrence at all
  }

  test("span_or / span_not via the ES-JSON front-end") {
    import sp.implicits._
    val df = Seq((1L, "spark big table"), (2L, "flink stream"), (3L, "spark value"))
      .toDF("doc_id", "text")
    val or = graft.dsl.EsQueryJson.search(df,
      """{"query": {"span_or": {"clauses": [
        |  {"span_term": {"text": "spark"}}, {"span_term": {"text": "flink"}}]}},
        | "sort": ["doc_id"]}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(or == Seq(1L, 2L, 3L))
    val not = graft.dsl.EsQueryJson.search(df,
      """{"query": {"span_not": {
        |  "include": {"span_term": {"text": "spark"}},
        |  "exclude": {"span_term": {"text": "table"}}, "post": 2}},
        | "sort": ["doc_id"]}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(not == Seq(3L)) // doc 1's spark has table at +2
  }

  test("span_containing: little must sit inside a valid big span") {
    val q = (slop: Int, little: String) =>
      Spans.spanContaining(col("text"), "a", "b", slop, little)
    assert(matches("a x b", q(1, "x")))     // inside
    assert(!matches("a b x", q(1, "x")))    // after the span
    assert(!matches("x a b", q(1, "x")))    // before the span
    assert(matches("a x b", q(1, "a")))     // endpoint counts (ES containment)
    assert(!matches("a x x b", q(1, "x")))  // no valid big span at slop 1
    // the CLOSER big span decides: (a y b) has no x, but (a x b) does
    assert(matches("a y b a x b", q(1, "x")))
  }

  test("span predicates compose inside bool via the ES-JSON front-end") {
    import sp.implicits._
    val df = Seq((1L, "spark big table"), (2L, "table spark"), (3L, "spark value"))
      .toDF("doc_id", "text")
    val out = graft.dsl.EsQueryJson.search(df,
      """{"query": {"bool": {"must": [
        |  {"span_near": {"clauses": [{"span_term": {"text": "spark"}},
        |                             {"span_term": {"text": "table"}}],
        |                 "slop": 1, "in_order": true}}],
        |  "must_not": [{"term": {"doc_id": 3}}]}},
        | "sort": ["doc_id"], "size": 10}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
  }

  test("span_multi: prefix/wildcard/regexp standalone and inside span_near") {
    import sp.implicits._
    val df = Seq(
      (1L, "spark writes table rows"),
      (2L, "spark scans a big index table"),   // 'table' 4 past 'spark' (slop 4)
      (3L, "tablet spark"),                    // prefix hit but wrong order
      (4L, "spark query fast"))
      .toDF("doc_id", "text")
    def ids(body: String): Seq[Long] =
      graft.dsl.EsQueryJson.search(df, body)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    // standalone prefix: any token starting 'tab'
    assert(ids("""{"query": {"span_multi": {"match": {"prefix": {"text": {"value": "tab"}}}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(1L, 2L, 3L))
    // standalone wildcard: whole-token match ('quer?' hits 'query' only)
    assert(ids("""{"query": {"span_multi": {"match": {"wildcard": {"text": {"value": "quer?"}}}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(4L))
    // standalone regexp, anchored to the whole token
    assert(ids("""{"query": {"span_multi": {"match": {"regexp": {"text": {"value": "tab(le|let)"}}}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(1L, 2L, 3L))
    // the regexp is whole-token anchored (ES semantics): a mid-token match
    // like 'able' inside 'table' does NOT fire
    assert(ids("""{"query": {"span_multi": {"match": {"regexp": {"text": {"value": "able"}}}}},
                 | "sort": ["doc_id"]}""".stripMargin).isEmpty)
    // inside span_near: in_order + slop bound the prefix side
    assert(ids("""{"query": {"span_near": {
                 |   "clauses": [{"span_term": {"text": "spark"}},
                 |               {"span_multi": {"match": {"prefix": {"text": {"value": "tab"}}}}}],
                 |   "slop": 1, "in_order": true}}, "sort": ["doc_id"]}""".stripMargin)
      == Seq(1L)) // doc 2 needs slop 4, doc 3 is out of order
    assert(ids("""{"query": {"span_near": {
                 |   "clauses": [{"span_term": {"text": "spark"}},
                 |               {"span_multi": {"match": {"prefix": {"text": {"value": "tab"}}}}}],
                 |   "slop": 4, "in_order": false}}, "sort": ["doc_id"]}""".stripMargin)
      == Seq(1L, 2L, 3L))
  }

  test("phrase slop: Lucene sloppy semantics, duplicate terms, slop budget") {
    val sp = spark
    import sp.implicits._
    def hit(text: String, phrase: String, slop: Int): Boolean = {
      val df = Seq(Tuple1(text)).toDF("t")
      df.filter(graft.functions.Spans.phraseSlop(
        org.apache.spark.sql.functions.col("t"),
        phrase.split(" ").toSeq, slop)).count() == 1
    }
    assert(hit("the data merge runs", "the data merge", 0))
    assert(!hit("the data lake merge", "the data merge", 0))
    assert(hit("the data lake merge", "the data merge", 1))      // 1 gap
    assert(!hit("the data lake house merge", "the data merge", 1))
    assert(hit("the data lake house merge", "the data merge", 2))
    // out-of-order arrangements: full reversal of 3 terms needs slop 4
    // (shifts 2,0,-2), a transposed adjacent pair exactly 2
    assert(!hit("merge data the", "the data merge", 3))
    assert(hit("merge data the", "the data merge", 4))
    assert(hit("data the merge", "the data merge", 2))
    assert(!hit("data the merge", "the data merge", 1))
    // duplicate phrase terms cannot reuse one token
    assert(!hit("a b", "a a", 1) && hit("a x a", "a a", 1) && !hit("a x a", "a a", 0))
    // later restart beats stale earlier start
    assert(hit("the x x x x the data merge", "the data merge", 0))
  }
}
