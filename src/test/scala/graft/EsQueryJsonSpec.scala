package graft

import graft.dsl.EsQueryJson
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ES-JSON front-end == typed DSL on the same data. */
class EsQueryJsonSpec extends AnyFunSuite with SparkTestBase {

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("bool/term/range/sort/from/size body") {
    val body =
      """{"query": {"bool": {
        |   "must": [{"term": {"o_orderstatus": "F"}},
        |            {"range": {"o_totalprice": {"gte": 1000, "lt": 200000}}}],
        |   "must_not": [{"terms": {"o_orderpriority": ["5-LOW"]}}]}},
        | "sort": [{"o_totalprice": {"order": "desc"}}, "o_orderkey"],
        | "from": 5, "size": 10}""".stripMargin
    val got = EsQueryJson.search(orders, body)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val want = orders.filter(col("o_orderstatus") === "F" &&
        col("o_totalprice") >= 1000 && col("o_totalprice") < 200000 &&
        !col("o_orderpriority").isin("5-LOW"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .offset(5).limit(10)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.size == 10)
  }

  test("query over the materialized index with info.* fields") {
    val index = Merge.fold(mutDf(Seq(
      mut("k1", "U", "2024-01-01 00:00:00", 1, ("f", "etype", "purchase"), ("f", "val", "31")),
      mut("k2", "U", "2024-01-01 00:00:01", 2, ("f", "etype", "view")),
      mut("k3", "U", "2024-01-01 00:00:02", 3, ("f", "etype", "purchase")))))
    val body =
      """{"query": {"bool": {
        |  "must": [{"term": {"info.etype": "purchase"}}, {"exists": {"field": "info.val"}}]}},
        | "sort": ["id"]}""".stripMargin
    val got = EsQueryJson.search(index, body).select("id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("k1"))
    // ids query
    val got2 = EsQueryJson.search(index, """{"query": {"ids": {"values": ["k2", "k3"]}}, "sort": ["id"]}""")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(got2 == Seq("k2", "k3"))
  }

  test("terms aggregation with metric sub-aggs") {
    val body =
      """{"aggs": {"by_status": {"terms": {"field": "o_orderstatus", "size": 3},
        |  "aggs": {"avg_price": {"avg": {"field": "o_totalprice"}},
        |           "n_cust": {"cardinality": {"field": "o_custkey"}}}}}}""".stripMargin
    val out = EsQueryJson.aggregations(orders, body)("by_status")
    val rows = out.collect()
    assert(rows.length == 3 && out.columns.toSeq ==
      Seq("key", "doc_count", "avg_price", "n_cust"))
    val want = orders.groupBy(col("o_orderstatus")).count()
      .orderBy(desc("count"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("date_histogram and bare metric aggs") {
    val dh = EsQueryJson.aggregations(orders,
      """{"aggs": {"by_month": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"}}}}""")("by_month")
    assert(dh.count() > 12)
    val m = EsQueryJson.aggregations(orders,
      """{"aggs": {"total": {"sum": {"field": "o_totalprice"}}}}""")("total")
    assert(m.collect().head.getDouble(0) > 0)
  }

  test("query scopes aggregations in the same body (ES behavior)") {
    val body =
      """{"query": {"term": {"o_orderstatus": "F"}},
        | "aggs": {"by_pri": {"terms": {"field": "o_orderpriority", "size": 10}}}}""".stripMargin
    val got = EsQueryJson.aggregations(orders, body)("by_pri")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = orders.filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("match query on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = EsQueryJson.search(docs,
      """{"query": {"match": {"text": {"query": "spark query join", "minimum_should_match": 2}}}, "sort": ["doc_id"]}""")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val want = docs.filter(graft.dsl.EsDsl.matchQuery(col("text"), Seq("spark", "query", "join"), 2))
      .orderBy("doc_id").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.nonEmpty)
  }
}
