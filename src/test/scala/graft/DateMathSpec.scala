package graft

import graft.dsl.{DateMath, QueryString}
import java.time.Instant
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DateMathSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sp = spark
  private val now = Instant.parse("1996-06-15T08:30:45Z")

  test("date math: steps and chaining") {
    assert(DateMath.literal("now", now) == "1996-06-15 08:30:45")
    assert(DateMath.literal("now-400d", now) == "1995-05-12 08:30:45")
    assert(DateMath.literal("now-1M+3d", now) == "1996-05-18 08:30:45")
    assert(DateMath.literal("now+1y", now) == "1997-06-15 08:30:45")
    assert(DateMath.literal("now-90m", now) == "1996-06-15 07:00:45")
  }

  test("date math: rounding floors (ES semantics, /w to Monday)") {
    assert(DateMath.literal("now/d", now) == "1996-06-15 00:00:00")
    assert(DateMath.literal("now/M", now) == "1996-06-01 00:00:00")
    assert(DateMath.literal("now/y", now) == "1996-01-01 00:00:00")
    // 1996-06-15 was a Saturday; its week's Monday is 06-10
    assert(DateMath.literal("now/w", now) == "1996-06-10 00:00:00")
    assert(DateMath.literal("now-1M/h", now) == "1996-05-15 08:00:00")
  }

  test("date math: malformed input throws, never mis-parses") {
    intercept[IllegalArgumentException](DateMath.resolve("now-7q", now))
    intercept[IllegalArgumentException](DateMath.resolve("now-7", now))
    intercept[IllegalArgumentException](DateMath.resolve("yesterday", now))
    intercept[IllegalArgumentException](DateMath.resolve("now/x", now))
  }

  test("range date math requires an injected clock") {
    import sp.implicits._
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.search(df,
        """{"query": {"range": {"x": {"gte": "now-1d"}}}}""")
    }
  }

  test("query_string field grouping rebinds unfielded atoms only") {
    import sp.implicits._
    val df = Seq(
      (1L, "zh", "spark stuff"), (2L, "es", "other"), (3L, "en", "spark"),
      (4L, "zh", "nothing")).toDF("doc_id", "lang", "text")
    val pred = QueryString.lucene("lang:(zh es) AND text:spark",
      org.apache.spark.sql.functions.col, Seq("text"))
    val got = df.filter(pred).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    // a fielded atom inside the group keeps its own field
    val pred2 = QueryString.lucene("lang:(zh text:spark)",
      org.apache.spark.sql.functions.col, Seq("text"))
    val got2 = df.filter(pred2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 3L, 4L)) // lang=zh OR text contains spark
    // nested groups
    val pred3 = QueryString.lucene("lang:((zh) (es))",
      org.apache.spark.sql.functions.col, Seq("text"))
    val got3 = df.filter(pred3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got3 == Set(1L, 2L, 4L))
    // dangling field still rejected loudly
    intercept[IllegalArgumentException](QueryString.parseLucene("lang: spark"))
  }
}
