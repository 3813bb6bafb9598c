package graft

import graft.dsl.Percolator
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PercolatorSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sp = spark

  private val stored = Seq(
    "q_a" -> """{"query": {"match": {"text": "alert"}}}""",
    "q_b" -> """{"query": {"range": {"n": {"gte": 10}}}}""",
    "q_c" -> """{"query": {"bool": {"must": [{"term": {"kind": "err"}}],
               |  "must_not": [{"term": {"n": 0}}]}}}""".stripMargin)

  test("percolate: every stored query matched independently, one row per hit") {
    import sp.implicits._
    val docs = Seq(
      (1L, "alert fired", 3L, "err"),
      (2L, "all quiet", 20L, "info"),
      (3L, "alert again", 15L, "err"),
      (4L, "nothing", 0L, "err")).toDF("doc_id", "text", "n", "kind")
    val out = Percolator.percolate(docs, col("doc_id"), stored)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (1L, "q_a"), (1L, "q_c"),
      (2L, "q_b"),
      (3L, "q_a"), (3L, "q_b"), (3L, "q_c")))
  }

  test("percolate plan is narrow: no exchange, no join") {
    import sp.implicits._
    val docs = Seq((1L, "x", 1L, "k")).toDF("doc_id", "text", "n", "kind")
    val plan = Percolator.percolate(docs, col("doc_id"), stored)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"percolate must stay narrow:\n$plan")
  }

  test("percolate over a stream: the alerting shape") {
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val ms = MemoryStream[(Long, String, Long, String)]
    val docs = ms.toDF().toDF("doc_id", "text", "n", "kind")
    val q = Percolator.percolate(docs, col("doc_id"), stored)
      .writeStream.format("memory").queryName("percolated").outputMode("append").start()
    ms.addData((1L, "alert fired", 3L, "err"), (2L, "quiet", 0L, "info"))
    q.processAllAvailable()
    ms.addData((5L, "alert late", 99L, "info"))
    q.processAllAvailable()
    q.stop()
    val got = sp.table("percolated").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "q_a"), (1L, "q_c"), (5L, "q_a"), (5L, "q_b")))
  }
}
