package graft

import graft.dsl.EsScroll
import graft.streaming.BucketedIndex
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.util.Random

class EsScrollSpec extends AnyFunSuite with SparkTestBase {

  private def tmp() = Files.createTempDirectory("graft-scroll").toString

  private def randomLog(n: Int, seed: Int): Seq[Mutation] = {
    val rnd = new Random(seed)
    val keys = (1 to 40).map(i => f"k$i%02d")
    (1 to n).map { seq =>
      val key = keys(rnd.nextInt(keys.size))
      if (rnd.nextDouble() < 0.15) mut(key, "D", f"2024-01-01 00:${seq / 60}%02d:${seq % 60}%02d", seq)
      else mut(key, "U", f"2024-01-01 00:${seq / 60}%02d:${seq % 60}%02d", seq,
        ("f", Seq("a", "b")(rnd.nextInt(2)), f"v$seq%04d"))
    }
  }

  test("scroll walk races live ingest + vacuum: pages reassemble the pinned snapshot") {
    val dir = tmp()
    val log = randomLog(240, seed = 41)
    val chunks = log.grouped(40).toSeq // 6 batches
    chunks.take(3).zipWithIndex.foreach { case (c, i) =>
      BucketedIndex.applyBatch(spark, dir, mutDf(c), i, nBuckets = 8)
    }
    val pinnedState = BucketedIndex.read(spark, dir)
      .selectExpr("id", "element_at(info, 'a') AS a")
      .where("a IS NOT NULL").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // expected order: a DESC then id ASC (the appended tiebreak)
    val want = pinnedState.toSeq
      .sortWith((x, y) => x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))

    val (sid, first) = EsScroll.open(spark, dir,
      """{"query": {"exists": {"field": "info.a"}},
        | "sort": [{"info.a": {"order": "desc"}}], "size": 7}""".stripMargin)
    var pages = Seq(first.selectExpr("id", "element_at(info, 'a') AS a").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq)
    var i = 0
    while (pages.last.nonEmpty) {
      // live ingest + grace-windowed vacuum land BETWEEN pages
      if (i < 3)
        BucketedIndex.applyBatch(spark, dir, mutDf(chunks(3 + i)), 3 + i, nBuckets = 8)
      BucketedIndex.vacuum(dir, keepLast = 4)
      pages :+= EsScroll.next(spark, sid)
        .selectExpr("id", "element_at(info, 'a') AS a").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      i += 1
      assert(i < 60, "scroll never exhausted")
    }
    val walked = pages.flatten
    assert(walked == want,
      s"scroll pages drifted off the pinned snapshot\n got=$walked\n want=$want")
    assert(pages.dropRight(1).forall(_.size <= 7))
    // the live read moved on past the pinned snapshot
    assert(indexMap(BucketedIndex.read(spark, dir)) == indexMap(Merge.fold(mutDf(log))))
    EsScroll.clear(sid)
  }

  test("sliced scroll: slices partition the pinned export exactly") {
    val dir = tmp()
    val log = randomLog(200, seed = 87)
    log.grouped(50).toSeq.zipWithIndex.foreach { case (c, i) =>
      BucketedIndex.applyBatch(spark, dir, mutDf(c), i, nBuckets = 8)
    }
    val all = BucketedIndex.read(spark, dir).select("id").collect()
      .map(_.getString(0)).toSet
    val max = 3
    val slices = (0 until max).map { s =>
      val (sid, first) = EsScroll.open(spark, dir,
        s"""{"query": {"match_all": {}}, "slice": {"id": $s, "max": $max}, "size": 5}""")
      var ids = first.select("id").collect().map(_.getString(0)).toSeq
      var page = ids
      while (page.nonEmpty) {
        page = EsScroll.next(spark, sid).select("id").collect().map(_.getString(0)).toSeq
        ids ++= page
      }
      EsScroll.clear(sid)
      ids
    }
    // within-slice pages are cursor-ordered and duplicate-free
    slices.foreach(s => assert(s.distinct == s))
    assert(slices.map(_.toSet).reduce(_ ++ _) == all, "slices lost docs")
    assert(slices.map(_.size).sum == all.size, "slices overlapped")
  }

  test("keepAlive: touch refreshes; expiry and clear fail with the ES message") {
    val dir = tmp()
    BucketedIndex.applyBatch(spark, dir,
      mutDf((1 to 30).map(i => mut(f"k$i%02d", "U", "2024-01-01 00:00:01", i, ("f", "a", s"$i")))),
      0, nBuckets = 4)
    @volatile var now = 1000000L
    val saved = EsScroll.clock
    EsScroll.clock = () => now
    try {
      val (sid, _) = EsScroll.open(spark, dir,
        """{"query": {"match_all": {}}, "size": 6}""", scroll = "1m")
      now += 50000L // 50 s < 1 m: alive, and the touch refreshes
      EsScroll.next(spark, sid)
      now += 50000L // would be 100 s past open, but only 50 s past the touch
      EsScroll.next(spark, sid)
      now += 61000L // past the refreshed window
      val e = intercept[IllegalArgumentException] { EsScroll.next(spark, sid) }
      assert(e.getMessage.contains("No search context found"))
      // clear: immediate loud miss
      val (sid2, _) = EsScroll.open(spark, dir,
        """{"query": {"match_all": {}}, "size": 6}""", scroll = "1m")
      EsScroll.clear(sid2)
      intercept[IllegalArgumentException] { EsScroll.next(spark, sid2) }
      // per-call scroll param overrides the keepAlive (ES shape)
      val (sid3, _) = EsScroll.open(spark, dir,
        """{"query": {"match_all": {}}, "size": 6}""", scroll = "1m")
      EsScroll.next(spark, sid3, scroll = Some("10m"))
      now += 300000L // 5 m: dead under 1 m, alive under the 10 m override
      EsScroll.next(spark, sid3)
      EsScroll.clear(sid3)
      // from / search_after in the body reject loudly
      intercept[IllegalArgumentException] {
        EsScroll.open(spark, dir, """{"query": {"match_all": {}}, "from": 3}""")
      }
      intercept[IllegalArgumentException] {
        EsScroll.open(spark, dir, """{"query": {"match_all": {}}, "search_after": [1]}""")
      }
    } finally EsScroll.clock = saved
  }
}
