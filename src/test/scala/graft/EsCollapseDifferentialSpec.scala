package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 12 — field collapsing: representative selection,
  * parent pagination, and collapse `inner_hits` (top-k group members
  * exploded AFTER parent from/size) vs an independent twin that
  * re-derives the whole response shape from the raw rows. Group-crossing
  * sort ties stress the representative pick; from/size offsets stress the
  * "inner hits ride pagination" contract (a150's shape, fuzzed).
  */
class EsCollapseDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private lazy val rows: Seq[(Long, String, Long)] = {
    val rnd = new Random(515151L)
    (1L to 120L).map { i =>
      (i, s"g${rnd.nextInt(15)}", (i * 7) % 30) // ties within and across groups
    }
  }

  private def df = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "grp", "v")
  }

  test("collapse representatives + pagination match the twin (15 cases)") {
    val rnd = new Random(6007L)
    val d = df
    (0 until 15).foreach { ci =>
      val desc0 = rnd.nextBoolean()
      val from = rnd.nextInt(4)
      val size = 3 + rnd.nextInt(8)
      val lo = rnd.nextInt(15)
      val body =
        s"""{"query": {"range": {"v": {"gte": $lo}}},
           | "collapse": {"field": "grp"},
           | "sort": [{"v": {"order": "${if (desc0) "desc" else "asc"}"}}, "doc_id"],
           | "from": $from, "size": $size}""".stripMargin
      val got = graft.dsl.EsQueryJson.search(d, body)
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      val filtered = rows.filter(_._3 >= lo)
      val ord = Ordering.by[(Long, String, Long), (Long, Long)] {
        case (id, _, v) => (if (desc0) -v else v, id) }
      val reps = filtered.groupBy(_._2).values.map(_.min(ord)).toSeq
      val want = reps.sorted(ord).slice(from, from + size).map(_._1)
      assert(got == want, s"collapse divergence (case $ci): $body\n engine=$got\n twin  =$want")
    }
  }

  test("collapse inner_hits explode after pagination and match the twin (15 cases)") {
    val rnd = new Random(6011L)
    val d = df
    (0 until 15).foreach { ci =>
      val descOuter = rnd.nextBoolean()
      val descInner = rnd.nextBoolean()
      val from = rnd.nextInt(3)
      val size = 2 + rnd.nextInt(5)
      val ihSize = 1 + rnd.nextInt(4)
      val body =
        s"""{"query": {"match_all": {}},
           | "collapse": {"field": "grp", "inner_hits": {
           |   "size": $ihSize,
           |   "sort": [{"v": {"order": "${if (descInner) "desc" else "asc"}"}}, "doc_id"],
           |   "_source": ["doc_id", "v"]}},
           | "sort": [{"v": {"order": "${if (descOuter) "desc" else "asc"}"}}, "doc_id"],
           | "from": $from, "size": $size}""".stripMargin
      val got = graft.dsl.EsQueryJson.search(d, body)
        .collect().map { r =>
          val inner = r.getAs[org.apache.spark.sql.Row]("_inner")
          (r.getAs[Long]("doc_id"), inner.getAs[Int]("_rank"),
            inner.getAs[Long]("doc_id"), inner.getAs[Long]("v"))
        }.toSeq
      val outerOrd = Ordering.by[(Long, String, Long), (Long, Long)] {
        case (id, _, v) => (if (descOuter) -v else v, id) }
      val innerOrd = Ordering.by[(Long, String, Long), (Long, Long)] {
        case (id, _, v) => (if (descInner) -v else v, id) }
      val reps = rows.groupBy(_._2).values.map(_.min(outerOrd)).toSeq
        .sorted(outerOrd).slice(from, from + size)
      val want = reps.flatMap { case rep @ (_, grp, _) =>
        rows.filter(_._2 == grp).sorted(innerOrd).take(ihSize).zipWithIndex
          .map { case ((iid, _, iv), k) => (rep._1, k + 1, iid, iv) }
      }
      assert(got == want, s"collapse inner_hits divergence (case $ci): $body\n" +
        s" engine=${got.take(8)}\n twin  =${want.take(8)}")
    }
  }
}
