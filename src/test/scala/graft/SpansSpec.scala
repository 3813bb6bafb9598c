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
}
