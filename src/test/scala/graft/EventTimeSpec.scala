package graft

import graft.streaming.EventTime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

class EventTimeSpec extends AnyFunSuite with SparkTestBase {

  private def ev(id: Long, t: String, u: Long, v: Double) = Ev(id, ts(t), u, v)

  test("streaming tumbling window with watermark drops late data") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val ms = MemoryStream[Ev]
    val agg = EventTime.windowedAgg(ms.toDF(), "ts", "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode("append").format("memory").queryName("win_out").start()

    ms.addData(ev(1, "2024-01-01 00:05:00", 1, 1.0), ev(2, "2024-01-01 00:55:00", 1, 2.0))
    q.processAllAvailable()
    // advance watermark far past hour 0 so its window finalizes
    ms.addData(ev(3, "2024-01-01 03:00:00", 2, 4.0))
    q.processAllAvailable()
    // this is now too late: hour-0 window already emitted + evicted
    ms.addData(ev(4, "2024-01-01 00:10:00", 3, 8.0))
    q.processAllAvailable()
    q.stop()

    val rows = sp.table("win_out").orderBy("wstart").collect()
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3))).toSeq ==
      Seq(("2024-01-01 00:00:00.0", 2L, 3.0)))
  }

  test("streaming session windows merge within gap") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val ms = MemoryStream[Ev]
    val agg = EventTime.sessionAgg(ms.toDF(), "ts", "10 minutes", "30 minutes", Seq(col("user_id")))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("sess_out").start()

    ms.addData(
      ev(1, "2024-01-01 00:00:00", 1, 1), ev(2, "2024-01-01 00:10:00", 1, 1), // session A
      ev(3, "2024-01-01 02:00:00", 1, 1)) // session B
    q.processAllAvailable()
    ms.addData(ev(4, "2024-01-01 06:00:00", 9, 1)) // push watermark, finalize all
    q.processAllAvailable()
    q.stop()

    val rows = sp.table("sess_out").filter(col("user_id") === 1)
      .orderBy("sstart").collect()
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getLong(3))).toSeq ==
      Seq(("2024-01-01 00:00:00.0", 2L), ("2024-01-01 02:00:00.0", 1L)))
    // batch twin agrees on session structure
    val batch = ext.Sessionize.userStats(
      mutDf(Seq()).sparkSession.createDataFrame(Seq(
        (1L, ts("2024-01-01 00:00:00"), 1L), (2L, ts("2024-01-01 00:10:00"), 1L),
        (3L, ts("2024-01-01 02:00:00"), 1L))).toDF("event_id", "ts", "user_id"),
      gapMinutes = 30).collect()
    assert(batch.head.getAs[Long]("n_sessions") == 2)
  }

  test("stream-stream interval join within lookback") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val out = EventTime.intervalJoin(
      purchases.toDF().select(col("event_id").as("pid"), col("user_id"), col("ts")),
      signups.toDF().select(col("event_id").as("sid"), col("user_id"), col("ts").as("sts")),
      key = "user_id", leftTs = "ts", rightTs = "sts",
      watermark = "10 minutes", lookback = "1 HOUR")
      .select(col("pid"), col("sid"))
    val query = out.writeStream.outputMode("append").format("memory").queryName("ij_out").start()
    signups.addData(ev(10, "2024-01-01 00:00:00", 1, 0), ev(11, "2024-01-01 02:00:00", 1, 0))
    purchases.addData(ev(1, "2024-01-01 00:30:00", 1, 5), ev(2, "2024-01-01 02:30:00", 1, 5))
    query.processAllAvailable()
    query.stop()
    val rows = sp.table("ij_out").orderBy("pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 11L))) // each purchase matches only the signup within 1h
  }

  test("streaming dedup within watermark") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val ms = MemoryStream[Ev]
    val dd = EventTime.dedupWithinWatermark(ms.toDF(), "ts", "1 hour", Seq("user_id"))
    val q = dd.writeStream.outputMode("append").format("memory").queryName("dd_out").start()
    ms.addData(ev(1, "2024-01-01 00:00:00", 1, 1), ev(2, "2024-01-01 00:01:00", 1, 2),
      ev(3, "2024-01-01 00:02:00", 2, 3))
    q.processAllAvailable()
    q.stop()
    assert(sp.table("dd_out").count() == 2)
  }

  test("corpus ops run unchanged on a stream: stratified sample + chunking") {
    // both are stateless narrow transforms, so the SAME operator code
    // drives batch and streaming — and the streaming sample equals the
    // batch sample on the same rows (hash determinism, no RNG state)
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.ext.Corpus
    val docs = Seq(
      (1L, "en", (0 until 90).map(i => s"w$i").mkString(" ")),
      (2L, "zh", "spark join merge"),
      (3L, "de", "der die das"),
      (4L, "en", "the a of and"))
    val rates = Map("en" -> 1.0, "zh" -> 1.0)
    val ms = MemoryStream[(Long, String, String)]
    val streamDf = ms.toDF().toDF("doc_id", "lang", "text")
    val sampled = Corpus.stratifiedSample(streamDf, col("doc_id"), col("lang"), rates, 0.0)
    val chunked = Corpus.chunkTokens(sampled, col("doc_id"), col("text"), 50, 40)
    val q = chunked.writeStream.outputMode("append").format("memory").queryName("corpus_out").start()
    ms.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val got = sp.table("corpus_out")
      .select("doc_id", "chunk_idx", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val batch = Corpus.chunkTokens(
      Corpus.stratifiedSample(docs.toDF("doc_id", "lang", "text"),
        col("doc_id"), col("lang"), rates, 0.0),
      col("doc_id"), col("text"), 50, 40)
      .select("doc_id", "chunk_idx", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == batch)
    // rate-1.0 strata kept in full, rate-0.0 stratum dropped entirely
    assert(got.map(_._1) == Set(1L, 2L, 4L))
    // doc 1 (90 tokens) chunks as 50/50-overlap windows: 50, 50, 10
    assert(got.filter(_._1 == 1L).map(c => (c._2, c._3)) == Set((0, 50), (1, 50), (2, 10)))
  }

  test("round-6 narrow corpus ops run unchanged on a stream: gopher filter + pii redact") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.ext.{Corpus, Redact}
    val docs = Seq(
      (1L, "the cat sat on a mat with the dog mail x@y.io"),
      (2L, "spam spam spam spam call 555-9999"))
    val ms = MemoryStream[(Long, String)]
    val streamDf = ms.toDF().toDF("doc_id", "text")
    val narrow = Redact.redactPii(streamDf, col("doc_id"), col("text"))
    val q = narrow.writeStream.outputMode("append").format("memory")
      .queryName("r6_out").start()
    ms.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val got = sp.table("r6_out").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batch = Redact.redactPii(docs.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == batch)
    assert(got(0)._2.endsWith("mail <EMAIL>"))
    assert(got(1)._2.endsWith("call <PHONE>"))
    // the filter verdict is likewise stateless: same rows pass on stream
    // and batch (asserted via the batch API on the same data)
    val passed = Corpus.gopherFilter(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
      minWords = 3, maxWords = 100, minMeanLen = 1.0, maxMeanLen = 10.0,
      minStopwords = 1, maxTopTokFrac = 0.6)
      .filter(col("pass")).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(passed == Seq(1L))
  }

  test("streaming decontamination: bench gram set inlined, one narrow filter") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.ext.Corpus
    val bench = Seq((100L, "zz beta gamma delta yy")).toDF("doc_id", "text")
    val hashes = Corpus.benchGramHashes(bench, col("text"), nGram = 3)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "beta gamma delta" -> dropped
      (2L, "one two three four five"))        // clean -> kept
    val ms = MemoryStream[(Long, String)]
    val streamDf = ms.toDF().toDF("doc_id", "text")
    val q = Corpus.decontaminateWithGramSet(streamDf, col("doc_id"), col("text"), hashes, nGram = 3)
      .writeStream.outputMode("append").format("memory").queryName("decon_out").start()
    ms.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val kept = sp.table("decon_out").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L))
    // equals both the batch gram-set form and the batch agg/anti-join form
    val batchSet = Corpus.decontaminateWithGramSet(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), hashes, nGram = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val batchJoin = Corpus.decontaminate(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), bench, col("text"), nGram = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(batchSet == kept && batchJoin == kept)
  }

  test("streaming Bloom scrub: the constant-size filter probes inside a stream") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.ext.Sketch
    // the Bloom twin of the gram-set test: the filter is the CDC-ingest
    // scale path (words array constant in the benchmark size), and the
    // probe kernel is narrow, so it drops into a streaming plan unchanged
    val bench = Seq((100L, "zz beta gamma delta yy")).toDF("doc_id", "text")
    val words = Sketch.bloomBuild(bench, col("text"), nGram = 3, mBits = 4096, k = 3)
    val ms = MemoryStream[(Long, String)]
    val streamDf = ms.toDF().toDF("doc_id", "text")
    val q = Sketch.bloomContamination(streamDf, col("doc_id"), col("text"),
        words, nGram = 3, k = 3)
      .filter(!col("flagged"))
      .writeStream.outputMode("append").format("memory").queryName("bloom_out").start()
    ms.addData(
      (1L, "alpha beta gamma delta epsilon"), // contaminated (no false negatives)
      (2L, "one two three four five"))        // clean
    q.processAllAvailable()
    q.stop()
    val kept = sp.table("bloom_out").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L))
  }

  test("stateful sessionize: in-batch close, event-time-timeout flush, batch twin agrees") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.streaming.StatefulSessionize
    val ms = MemoryStream[Ev]
    val src = ms.toDF().withWatermark("ts", "0 seconds")
      .as[StatefulSessionize.SessEvent]
    val q = StatefulSessionize.sessions(src, gapSeconds = 1800)
      .writeStream.outputMode("append").format("memory").queryName("ss_out").start()

    // user 1: two sessions — the 02:00 event closes session A IN-BATCH
    ms.addData(
      ev(1, "2024-01-01 00:00:00", 1, 1.5), ev(2, "2024-01-01 00:10:00", 1, 2.5),
      ev(3, "2024-01-01 02:00:00", 1, 4.0))
    q.processAllAvailable()
    val afterBatch1 = sp.table("ss_out").collect()
    assert(afterBatch1.map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getDouble(6))).toSeq ==
      Seq((1L, 1L, 2L, 2L, 4.0)), "session A closes in-batch with its stats")

    // watermark to 06:00 → session B's timeout (02:00 + 30 min) fires
    ms.addData(ev(9, "2024-01-01 06:00:00", 9, 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = sp.table("ss_out").filter(col("user_id") === 1)
      .orderBy("sstart").collect()
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(5), r.getDouble(6))).toSeq
    assert(rows == Seq(
      ("2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0", 2L, 4.0),
      ("2024-01-01 02:00:00.0", "2024-01-01 02:00:00.0", 1L, 4.0)))
    // user 9's session is still open (watermark never passed its gap) —
    // nothing emitted for it
    assert(sp.table("ss_out").filter(col("user_id") === 9).isEmpty)
    // batch twin: same session structure from ext.Sessionize
    val batch = ext.Sessionize.userStats(sp.createDataFrame(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L), (2L, ts("2024-01-01 00:10:00"), 1L),
      (3L, ts("2024-01-01 02:00:00"), 1L))).toDF("event_id", "ts", "user_id"),
      gapMinutes = 30).collect()
    assert(batch.head.getAs[Long]("n_sessions") == 2 &&
      batch.head.getAs[Long]("max_sess_events") == 2)
  }

  test("streaming cohort retention == batch twin across batch splits") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.streaming.StatefulSessionize
    import StatefulSessionize.UserStamp
    val rnd = new scala.util.Random(21)
    val base = ts("2024-01-01 00:00:00").getTime
    // 40 users, events spread over ~8 weeks, time-sorted then split into
    // 3 arbitrary batches (the StatefulSessionize protocol)
    val evs = (1 to 300).map { i =>
      UserStamp(i.toLong, new Timestamp(base + rnd.nextInt(8 * 7 * 24) * 3600000L),
        rnd.nextInt(40).toLong)
    }.sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[UserStamp]
    val q = StatefulSessionize.cohortStream(ms.toDS())
      .writeStream.outputMode("append").format("memory").queryName("coh_out").start()
    for (b <- Seq(evs.take(90), evs.slice(90, 201), evs.drop(201))) {
      ms.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = sp.table("coh_out")
      .groupBy("cohort", "week_offset").agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    val batch = graft.ext.Sessionize.cohortRetention(
        evs.toDF())
      .collect().map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
  }

  test("streaming last-touch attribution == batch twin across batch splits") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.streaming.StatefulSessionize
    import StatefulSessionize.TypedEvent
    val rnd = new scala.util.Random(22)
    val base = ts("2024-01-01 00:00:00").getTime
    val types = Seq("ad", "email", "search", "purchase")
    val evs = (1 to 400).map { i =>
      TypedEvent(i.toLong, new Timestamp(base + rnd.nextInt(50000) * 1000L),
        rnd.nextInt(25).toLong, types(rnd.nextInt(types.size)))
    }.sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[TypedEvent]
    val q = StatefulSessionize.attributionStream(ms.toDS(), "purchase", 3600L)
      .writeStream.outputMode("append").format("memory").queryName("att_out").start()
    for (b <- Seq(evs.take(133), evs.slice(133, 307), evs.drop(307))) {
      ms.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = sp.table("att_out")
      .groupBy("credit").agg(count(lit(1)).as("n_conversions"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.ext.Sessionize.lastTouchAttribution(
        evs.toDF(), "purchase", 3600L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
  }

  test("streaming funnel: converts across batches, dead funnel stays dead") {
    val sp = spark
    import sp.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.streaming.StatefulSessionize
    import StatefulSessionize.TypedEvent
    def te(id: Long, m: Int, u: Long, t: String) =
      TypedEvent(id, new Timestamp(m * 60000L), u, t)
    val ms = MemoryStream[TypedEvent]
    val q = StatefulSessionize.funnelStream(ms.toDS(),
        Seq("signup", "view", "purchase"), withinSeconds = Some(3600L))
      .writeStream.outputMode("append").format("memory").queryName("fn_out").start()
    // batch 1: u1 partway through; u2 signs up
    ms.addData(te(1, 0, 1, "signup"), te(2, 5, 1, "view"), te(3, 0, 2, "signup"))
    q.processAllAvailable()
    assert(sp.table("fn_out").isEmpty, "no conversion before the last stage")
    // batch 2: u1 completes (span 10 min); u2's first view is LATE ->
    // dead, and the on-time-looking purchase right after must not emit
    ms.addData(te(4, 10, 1, "purchase"), te(5, 120, 2, "view"), te(6, 125, 2, "purchase"))
    q.processAllAvailable()
    // batch 3: u2 stays dead even given a perfect in-window sequence tail
    ms.addData(te(7, 126, 2, "view"), te(8, 127, 2, "purchase"))
    q.processAllAvailable()
    q.stop()
    val rows = sp.table("fn_out").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(rows == Seq((1L, 600L)), s"got ${rows.toList}")
  }
}
