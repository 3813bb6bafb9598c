package graft

import graft.streaming.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** §5.4 streaming equivalence: the real foreachBatch pipeline over varying
  * micro-batch splits must equal the batch fold of the same mutation log —
  * the reference's observable contract (ES state at batch granularity). */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir(prefix: String) = Files.createTempDirectory(prefix).toString

  test("MemoryStream pipeline == batch fold, including quarantine") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val log = Seq(
      mut("u1", "U", "2024-01-01 00:00:00", 1, ("f", "a", "1")),
      mut("u2", "U", "2024-01-01 00:00:01", 2, ("f", "a", "2")),
      mut("u1", "D", "2024-01-01 00:00:02", 3),
      mut("u3", "U", "2024-01-01 00:00:03", 4, ("f", "b", "3"), ("f", "c", "4")),
      mut("u1", "U", "2024-01-01 00:00:04", 5, ("f", "z", "9")),
      Mutation(null, "U", ts("2024-01-01 00:00:05"), 6, Seq(Cell("f", "bad", "x"))), // quarantined
      mut("u2", "X", "2024-01-01 00:00:06", 7, ("f", "bad", "y"))) // bad op → quarantined

    val indexDir = tmpDir("graft-index")
    val qDir = tmpDir("graft-quarantine")
    val ms = MemoryStream[Mutation]
    val q = ms.toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Pipeline.applyBatch(b.sparkSession, b, indexDir, id, Some(qDir))
      }
      .start()

    // three uneven micro-batches
    ms.addData(log.slice(0, 2)); q.processAllAvailable()
    ms.addData(log.slice(2, 3)); q.processAllAvailable()
    ms.addData(log.slice(3, 7)); q.processAllAvailable()
    q.stop()

    val streamed = indexMap(Pipeline.readCurrent(spark, indexDir))
    val batch = indexMap(Merge.fold(mutDf(log).filter(!Pipeline.isMalformed)))
    assert(streamed == batch)
    assert(streamed == Map(
      "u1" -> Map("z" -> "9"),
      "u2" -> Map("a" -> "2"),
      "u3" -> Map("b" -> "3", "c" -> "4")))

    val quarantined = spark.read.parquet(s"$qDir/*").count()
    assert(quarantined == 2)
  }

  test("streaming sketch tables == one-shot batch sketches, across batch splits") {
    import graft.streaming.SketchTable
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    // three days, repeated keys within/across days, a delete, a large
    // payload (bucket width > 1 at k=8), and a malformed row (must be
    // excluded from the sketches like it is from the index)
    val log = Seq(
      mut("u1", "U", "2024-01-01 08:00:00", 1, ("f", "a", "x" * 12)),
      mut("u2", "U", "2024-01-01 09:00:00", 2, ("f", "a", "y" * 40)),
      mut("u1", "U", "2024-01-01 10:00:00", 3, ("f", "b", "z" * 7)),
      mut("u1", "D", "2024-01-02 08:00:00", 4),
      mut("u3", "U", "2024-01-02 09:00:00", 5, ("f", "a", "w" * 300)),
      mut("u2", "U", "2024-01-03 08:00:00", 6, ("f", "a", "q" * 5), ("f", "b", "r" * 9)),
      mut("u4", "U", "2024-01-03 09:00:00", 7),
      mut(null, "U", "2024-01-03 10:00:00", 8, ("f", "bad", "nope"))) // quarantined
    def hdrRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def hllEst(df: org.apache.spark.sql.DataFrame) =
      df.select(col("day"), hll_sketch_estimate(col("sk")))
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    def runSplit(splits: Seq[Seq[Int]]): (String, String) = {
      val indexDir = tmpDir("graft-sk-index")
      val sketchDir = tmpDir("graft-sk-sketch")
      val ms = MemoryStream[Mutation]
      val q = ms.toDF().writeStream
        .outputMode("update")
        .option("checkpointLocation", tmpDir("graft-sk-ckpt"))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          Pipeline.applyBatch(b.sparkSession, b, indexDir, id,
            quarantineDir = None, sketchDir = Some(sketchDir))
        }
        .start()
      splits.foreach { ix => ms.addData(ix.map(log)); q.processAllAvailable() }
      q.stop()
      (indexDir, sketchDir)
    }
    val (_, skA) = runSplit(Seq(Seq(0, 1), Seq(2, 3, 4), Seq(5, 6, 7)))
    val (_, skB) = runSplit(Seq(Seq(0), Seq(1, 2, 3, 4, 5), Seq(6), Seq(7)))
    val (bHdr, bHll) = SketchTable.oneShot(mutDf(log).filter(!Pipeline.isMalformed))
    // HDR: integer buckets union losslessly — EXACT row equality with the
    // one-shot twin, independent of the split
    assert(hdrRows(SketchTable.readHdr(spark, skA)) == hdrRows(bHdr))
    assert(hdrRows(SketchTable.readHdr(spark, skB)) == hdrRows(bHdr))
    // HLL: per-day distinct-key estimates match the one-shot sketch on
    // both splits (register-max union; exact at this cardinality)
    val exp = hllEst(bHll)
    assert(hllEst(SketchTable.readHll(spark, skA)) == exp)
    assert(hllEst(SketchTable.readHll(spark, skB)) == exp)
    assert(exp == Map("2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-03" -> 2L))
    // the serving views
    val dk = SketchTable.distinctKeysByDay(spark, skA).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(dk == exp)
    val p = SketchTable.payloadPercentiles(spark, skA, "2024-01-01", "2024-01-02",
      Seq(0.5)).collect().head
    // day-1+2 payloads: {12, 40, 7, 300}; p50 -> first bucket with cum >= 2
    assert(p.getAs[Long]("v_bmin") <= 12L && p.getAs[Long]("v_est") >= 12L)
    // retry idempotence: replaying the last batch id changes nothing
    val before = hdrRows(SketchTable.readHdr(spark, skA))
    SketchTable.updateForBatch(spark, skA, mutDf(log.slice(5, 8)).filter(!Pipeline.isMalformed), 2L)
    assert(hdrRows(SketchTable.readHdr(spark, skA)) == before)
    // vacuum removes superseded versions, keeps _CURRENT intact
    def versions(dir: String) = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("v")).toSet
    assert(versions(skA) == Set("v0", "v1", "v2"))
    SketchTable.vacuum(skA)
    assert(versions(skA) == Set("v2"))
    assert(hdrRows(SketchTable.readHdr(spark, skA)) == before, "vacuum must not touch _CURRENT")
  }

  test("applyBatch retry after publish is a no-op (stream can recover)") {
    // Crash between publish and checkpoint commit → the stream re-runs the
    // same batch id. Re-merging would read v<id> and overwrite the same
    // path (Spark refuses); the retry must instead skip.
    val indexDir = tmpDir("graft-index-retry")
    val b0 = mutDf(Seq(mut("u1", "U", "2024-01-01 00:00:00", 1, ("f", "a", "1"))))
    val b1 = mutDf(Seq(mut("u2", "U", "2024-01-01 00:00:01", 2, ("f", "a", "2"))))
    Pipeline.applyBatch(spark, b0, indexDir, 0)
    Pipeline.applyBatch(spark, b1, indexDir, 1)
    val once = indexMap(Pipeline.readCurrent(spark, indexDir))
    def partFiles() = java.nio.file.Files.list(java.nio.file.Paths.get(indexDir, "v1"))
      .iterator().asScala.map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    val filesBefore = partFiles()
    Pipeline.applyBatch(spark, b1, indexDir, 1) // retry — must not throw or rewrite
    assert(partFiles() == filesBefore, "retry rewrote the published snapshot")
    assert(indexMap(Pipeline.readCurrent(spark, indexDir)) == once)
    assert(once == Map("u1" -> Map("a" -> "1"), "u2" -> Map("a" -> "2")))
  }

  test("flatMapGroupsWithState fold == batch fold under shuffled arrival and uneven batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.streaming.StatefulFold
    val rnd = new scala.util.Random(11)
    val keys = (1 to 12).map(i => s"k$i")
    val log = (1 to 300).map { seq =>
      val key = keys(rnd.nextInt(keys.size))
      if (rnd.nextDouble() < 0.25) mut(key, "D", f"2024-01-01 00:${seq / 60}%02d:${seq % 60}%02d", seq)
      else mut(key, "U", f"2024-01-01 00:${seq / 60}%02d:${seq % 60}%02d", seq,
        ("f", Seq("a", "b", "c")(rnd.nextInt(3)), s"v$seq"))
    }
    val arrival = rnd.shuffle(log) // late/duplicate-order delivery across batches
    val ms = MemoryStream[Mutation]
    val last = scala.collection.mutable.Map[String, StatefulFold.DocUpdate]()
    val q = StatefulFold.updates(ms.toDS()).writeStream
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-sfold-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StatefulFold.DocUpdate], _: Long) =>
        b.collect().foreach(u => last(u.id) = u)
      }
      .start()
    Seq(arrival.slice(0, 40), arrival.slice(40, 45), arrival.slice(45, 300)).foreach { chunk =>
      ms.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val expected = indexMap(Merge.fold(mutDf(log))) // alive docs only
    val aliveGot = last.collect { case (id, u) if u.alive => id -> u.info }.toMap
    assert(aliveGot == expected)
    // every key that ever appeared has an emission; dead ones are tombstones
    assert(last.keySet == log.map(_.row_key).toSet)
    last.values.filterNot(_.alive).foreach(u => assert(!expected.contains(u.id)))
  }

  test("incremental stream vacuums superseded bucket versions on schedule") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.BucketedIndex
    val cfg = Pipeline.Config(
      changeLogDir = "unused", indexDir = tmpDir("graft-vac-idx"),
      checkpointDir = tmpDir("graft-vac-ckpt"), vacuumEveryBatches = 2)
    // drive applyBatch + vacuum the way startIncremental's foreachBatch does
    (0 to 4).foreach { i =>
      BucketedIndex.applyBatch(spark,
        cfg.indexDir, mutDf(Seq(mut("k1", "U", s"2024-01-01 00:00:0$i", i, ("f", "a", s"$i")))),
        batchId = i, nBuckets = 4)
      if (cfg.vacuumEveryBatches > 0 && i > 0 && i % cfg.vacuumEveryBatches == 0)
        BucketedIndex.vacuum(cfg.indexDir)
    }
    // every batch rewrote k1's bucket; after the last vacuum at batch 4
    // only the live bucket version remains and fully-superseded batch dirs
    // are gone entirely (markers included)
    val batchDirs = java.nio.file.Files.list(java.nio.file.Paths.get(cfg.indexDir, "batches"))
      .iterator().asScala.toSeq
    assert(batchDirs.size == 1, s"superseded batch dirs survived: $batchDirs")
    val buckets = batchDirs.flatMap(b => java.nio.file.Files.list(b).iterator().asScala)
      .filter(_.getFileName.toString.startsWith("bucket="))
    assert(buckets.size == 1)
    assert(indexMap(BucketedIndex.read(spark, cfg.indexDir)) == Map("k1" -> Map("a" -> "4")))
  }

  test("concurrent reader during ingest sees only complete manifest states") {
    // Round-15 task: a 100 TB operator serves DURING ingest, not just
    // between batches. The _MANIFEST swap is a single atomic file move, so
    // any reader must observe a complete post-batch state — never a torn
    // one. A reader thread hammers the index (raw read + an ES-JSON term
    // query) while the writer publishes 25 batches; each batch writes a
    // marker doc plus 10 data docs, so "complete" is checkable: if marker
    // B is visible, every doc of batches 0..B must be too, with final
    // values. Vacuum runs every 3 batches — a reader that raced a vacuum
    // into deleted files retries (the documented grace-window contract);
    // what it must NEVER see is a SUCCESSFUL read of a torn state.
    import graft.streaming.BucketedIndex
    val dir = tmpDir("graft-concread-idx")
    val nBatches = 25
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val complete = new java.util.concurrent.atomic.AtomicInteger(0)
    val transient0 = new java.util.concurrent.atomic.AtomicInteger(0)
    val esServed = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var writing = true
    val sp = spark
    val reader = new Thread(() => {
      while (writing || complete.get() < 5) {
        try {
          val st = indexMap(BucketedIndex.read(sp, dir))
          val markers = st.keys.filter(_.startsWith("batch_"))
            .map(_.stripPrefix("batch_").toInt)
          if (markers.nonEmpty) {
            val b = markers.max
            val ok = (0 to b).forall { i =>
              st.contains(s"batch_$i") &&
                (0 until 10).forall(j => st.get(s"k${i}_$j").exists(_.get("b").contains(i.toString)))
            }
            if (ok) complete.incrementAndGet() else torn.incrementAndGet()
            // the ES-JSON battery rides the same snapshot frame — but only
            // while ingest runs (post-ingest laps just need the complete
            // count; skipping the extra jobs keeps the drain fast when the
            // machine is loaded — this test once hit the join timeout
            // during a round-16 full-suite run under ambient load)
            if (writing) {
              val hits = graft.dsl.EsQueryJson.search(
                BucketedIndex.read(sp, dir),
                s"""{"query": {"term": {"info.b": "${b}"}},
                   | "sort": ["id"], "size": 100}""".stripMargin).count()
              if (hits >= 1) esServed.incrementAndGet()
            }
          }
        } catch { case _: Throwable => transient0.incrementAndGet() }
      }
    })
    reader.start()
    (0 until nBatches).foreach { i =>
      val docs = (0 until 10).map(j =>
        mut(s"k${i}_$j", "U", f"2024-01-01 00:${i}%02d:${j}%02d", i.toLong * 100 + j,
          ("f", "b", i.toString))) :+
        mut(s"batch_$i", "U", f"2024-01-01 00:${i}%02d:59", i.toLong * 100 + 99,
          ("f", "m", "1"))
      BucketedIndex.applyBatch(spark, dir, mutDf(docs), batchId = i, nBuckets = 8)
      if (i > 0 && i % 3 == 0) BucketedIndex.vacuum(dir)
    }
    writing = false
    reader.join(300000)
    assert(!reader.isAlive, "reader thread wedged")
    assert(torn.get() == 0, s"reader observed ${torn.get()} torn states")
    assert(complete.get() >= 5, s"too few complete reads: ${complete.get()}")
    assert(esServed.get() >= 1, "ES-JSON battery never served during ingest")
    // final state is the full fold
    val fin = indexMap(BucketedIndex.read(spark, dir))
    assert((0 until nBatches).forall(i => fin.contains(s"batch_$i")))
  }

  test("pinned reader inside the vacuum grace window: zero retries, stable pages") {
    // The round-16 contract upgrade over catch-and-retry: a cursor walk
    // pins the manifest once (readAt) and every page comes from that
    // snapshot; vacuum(keepLast) guarantees the pinned version's dirs
    // survive the next keepLast−1 publishes. Maximal delete pressure —
    // vacuum after EVERY batch — with keepLast=8 while a reader thread
    // loops pin → 3 page reads → verify stability. ANY exception in the
    // reader is a failed contract (the old reader needed catch-and-retry
    // here; StreamingSpec's concread test shows those retries firing).
    import graft.streaming.BucketedIndex
    val dir = tmpDir("graft-grace-idx")
    val nBatches = 25
    val retries = new java.util.concurrent.atomic.AtomicInteger(0)
    val drift = new java.util.concurrent.atomic.AtomicInteger(0)
    val walks = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var writing = true
    val sp = spark
    BucketedIndex.applyBatch(spark, dir,
      mutDf(Seq(mut("seed", "U", "2024-01-01 00:00:00", 0, ("f", "b", "s")))),
      batchId = 0, nBuckets = 8)
    val reader = new Thread(() => {
      while (writing || walks.get() < 3) {
        try {
          val pinned = BucketedIndex.readManifest(dir)
          val first = indexMap(BucketedIndex.readAt(sp, dir, pinned))
          (1 to 2).foreach { _ =>
            val page = indexMap(BucketedIndex.readAt(sp, dir, pinned))
            if (page != first) drift.incrementAndGet()
          }
          walks.incrementAndGet()
        } catch { case _: Throwable => retries.incrementAndGet() }
      }
    })
    reader.start()
    (1 until nBatches).foreach { i =>
      val docs = (0 until 8).map(j =>
        mut(s"g${i}_$j", "U", f"2024-01-01 00:${i}%02d:${j}%02d", i.toLong * 100 + j,
          ("f", "b", i.toString)))
      BucketedIndex.applyBatch(spark, dir, mutDf(docs), batchId = i, nBuckets = 8)
      BucketedIndex.vacuum(dir, keepLast = 8) // delete pressure every publish
    }
    writing = false
    reader.join(300000)
    assert(!reader.isAlive, "pinned reader wedged")
    assert(retries.get() == 0,
      s"pinned reader inside the grace window hit ${retries.get()} vacuumed files")
    assert(drift.get() == 0, s"${drift.get()} pages drifted off their pinned snapshot")
    assert(walks.get() >= 3, s"too few completed walks: ${walks.get()}")
    // the window is a GRACE, not a leak: only the retained manifests'
    // dirs survive on disk (25 publishes, far fewer batch dirs left)
    BucketedIndex.vacuum(dir, keepLast = 1)
    val left = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "batches"))
      .iterator().asScala.size
    assert(left <= 8, s"vacuum leaked $left batch dirs")
  }

  test("streaming incremental dedup: standing corpus grows per batch, later dups rejected") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val corpusDir = tmpDir("graft-dedup-corpus")
    // seed the standing corpus with one already-admitted doc
    Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpusDir)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .outputMode("update")
      .option("checkpointLocation", tmpDir("graft-dedup-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val standing = b.sparkSession.read.parquet(corpusDir)
        val admitted = graft.ext.Dedup.dedupIncremental(standing, b,
            col("doc_id"), col("text"))
          .filter(col("admitted"))
          .collect().map(_.getLong(0)).toSeq
        if (admitted.nonEmpty)
          b.filter(col("doc_id").isin(admitted: _*))
            .write.mode("append").parquet(corpusDir)
      }
      .start()
    ms.addData((2L, "alpha beta gamma delta epsilon zeta")) // dup of seeded 1 → out
    ms.addData((3L, "one two three four five six"))          // fresh → admitted
    q.processAllAvailable()
    ms.addData((4L, "one two three four five six"))          // dup of batch-1's 3 → out
    ms.addData((5L, "seven eight nine ten eleven twelve"))   // fresh → admitted
    q.processAllAvailable()
    q.stop()
    val ids = spark.read.parquet(corpusDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 5L))
  }

  test("restart from checkpoint continues exactly-once") {
    val sp = spark
    val changeDir = tmpDir("graft-changes-r")
    val indexDir = tmpDir("graft-index-r")
    val ckpt = tmpDir("graft-ckpt-r")
    mutDf(Seq(
      mut("a", "U", "2024-01-01 00:00:00", 1, ("f", "x", "1")),
      mut("b", "U", "2024-01-01 00:00:01", 2, ("f", "y", "2"))))
      .write.mode("append").parquet(changeDir)
    val q1 = Pipeline.start(sp, changeDir, indexDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(indexMap(Pipeline.readCurrent(sp, indexDir)) ==
      Map("a" -> Map("x" -> "1"), "b" -> Map("y" -> "2")))
    // new files arrive while the stream is DOWN; restart picks up only them
    mutDf(Seq(
      mut("a", "D", "2024-01-01 00:00:02", 3),
      mut("c", "U", "2024-01-01 00:00:03", 4, ("f", "z", "9"))))
      .write.mode("append").parquet(changeDir)
    val q2 = Pipeline.start(sp, changeDir, indexDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(indexMap(Pipeline.readCurrent(sp, indexDir)) ==
      Map("b" -> Map("y" -> "2"), "c" -> Map("z" -> "9")))
  }

  test("restart from checkpoint continues sketch tables exactly-once") {
    // the sketch twin of the restart test: a stop/restart (including the
    // replay of any batch id whose checkpoint commit was lost) must leave
    // the sketch table equal to the one-shot sketch of the WHOLE log —
    // no double-counted days, no missed batches
    import graft.streaming.SketchTable
    val sp = spark
    val changeDir = tmpDir("graft-changes-skr")
    val indexDir = tmpDir("graft-index-skr")
    val sketchDir = tmpDir("graft-sketch-skr")
    val ckpt = tmpDir("graft-ckpt-skr")
    val part1 = Seq(
      mut("a", "U", "2024-01-01 00:00:00", 1, ("f", "x", "payload-one")),
      mut("b", "U", "2024-01-02 00:00:01", 2, ("f", "y", "pp")))
    val part2 = Seq(
      mut("a", "D", "2024-01-02 00:00:02", 3),
      mut("c", "U", "2024-01-03 00:00:03", 4, ("f", "z", "a-much-longer-payload")))
    mutDf(part1).write.mode("append").parquet(changeDir)
    val q1 = Pipeline.start(sp, changeDir, indexDir, ckpt, sketchDir = Some(sketchDir))
    q1.processAllAvailable(); q1.stop()
    mutDf(part2).write.mode("append").parquet(changeDir)
    val q2 = Pipeline.start(sp, changeDir, indexDir, ckpt, sketchDir = Some(sketchDir))
    q2.processAllAvailable(); q2.stop()
    // ALSO simulate the crash-replay: re-apply the last batch id manually
    // (the checkpoint-commit-lost case) — must be a no-op
    Pipeline.applyBatch(sp, mutDf(part2), indexDir,
      batchId = SketchTable.currentVersion(sketchDir).get.stripPrefix("v").toLong,
      sketchDir = Some(sketchDir))
    val (bHdr, bHll) = SketchTable.oneShot(mutDf(part1 ++ part2))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(SketchTable.readHdr(sp, sketchDir)) == rows(bHdr))
    val est = SketchTable.distinctKeysByDay(sp, sketchDir).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val expEst = bHll.select(col("day"), hll_sketch_estimate(col("sk")))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(est == expEst)
    assert(est == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L, "2024-01-03" -> 1L))
  }

  test("crash BETWEEN sketch publish and index publish: replay converges both tables") {
    // The torn-publish window SketchTable.scala documents: applyBatch
    // publishes sketches FIRST, then the index. A crash in between leaves
    // sketches at v<id> and the index one version behind. On restart the
    // stream replays the batch id: the sketch side must SKIP (already
    // published — re-unioning would double-count the batch), the index
    // side must APPLY. After replay both tables equal the one-shot fold.
    import graft.streaming.SketchTable
    val indexDir = tmpDir("graft-torn-idx")
    val sketchDir = tmpDir("graft-torn-sk")
    val b0 = Seq(
      mut("a", "U", "2024-01-01 00:00:00", 1, ("f", "x", "payload-one")),
      mut("b", "U", "2024-01-02 00:00:01", 2, ("f", "y", "pp")))
    val b1 = Seq(
      mut("a", "U", "2024-01-02 00:00:02", 3, ("f", "x", "reissued")),
      mut("c", "U", "2024-01-03 00:00:03", 4, ("f", "z", "a-much-longer-payload")),
      mut("b", "D", "2024-01-03 00:00:04", 5))
    Pipeline.applyBatch(spark, mutDf(b0), indexDir, 0, sketchDir = Some(sketchDir))
    // ---- batch 1, TORN: the sketch publish happens, then "crash" ----
    SketchTable.updateForBatch(spark, sketchDir, mutDf(b1).filter(!Pipeline.isMalformed), 1L)
    assert(SketchTable.currentVersion(sketchDir).contains("v1"))
    assert(Pipeline.currentSnapshot(indexDir).contains("v0"),
      "fixture must model the torn window: sketches ahead of the index")
    // ---- restart: the checkpoint replays batch id 1 through applyBatch ----
    Pipeline.applyBatch(spark, mutDf(b1), indexDir, 1, sketchDir = Some(sketchDir))
    assert(Pipeline.currentSnapshot(indexDir).contains("v1"))
    // index == one-shot batch fold
    assert(indexMap(Pipeline.readCurrent(spark, indexDir)) ==
      indexMap(Merge.fold(mutDf(b0 ++ b1))))
    // sketches == one-shot over the whole log (no double-counted batch 1)
    val (bHdr, bHll) = SketchTable.oneShot(mutDf(b0 ++ b1))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(SketchTable.readHdr(spark, sketchDir)) == rows(bHdr))
    val est = SketchTable.distinctKeysByDay(spark, sketchDir).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val expEst = bHll.select(col("day"), hll_sketch_estimate(col("sk")))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(est == expEst)
    // the OTHER torn shape never exists by ordering: index at v<id> with
    // sketches behind would double-apply sketches on replay — assert the
    // invariant applyBatch maintains (sketch version >= index version)
    val sv = SketchTable.currentVersion(sketchDir).get.stripPrefix("v").toLong
    val iv = Pipeline.currentSnapshot(indexDir).get.stripPrefix("v").toLong
    assert(sv >= iv)
  }

  test("JSON and CSV change-log sources fold identically to parquet") {
    val sp = spark
    val log = Seq(
      mut("j1", "U", "2024-01-01 00:00:00", 1, ("f", "a", "1"), ("f", "b", "2")),
      mut("j1", "D", "2024-01-01 00:00:01", 2),
      mut("j2", "U", "2024-01-01 00:00:02", 3, ("f", "c", "3")))
    val want = indexMap(Merge.fold(mutDf(log)))
    val jdir = tmpDir("graft-json")
    mutDf(log).write.mode("overwrite").json(jdir)
    assert(indexMap(Merge.fold(ChangeLog.readJson(sp, jdir))) == want)
    val cdir = tmpDir("graft-csv")
    mutDf(log).select(col("row_key"), col("op"), col("ts"), col("seq"),
      to_json(col("cells")).as("cells_json"))
      .write.mode("overwrite").option("header", "true").csv(cdir)
    assert(indexMap(Merge.fold(ChangeLog.readCsv(sp, cdir))) == want)
  }

  test("file-stream shell end-to-end with processing-time trigger") {
    val sp = spark
    val changeDir = tmpDir("graft-changes")
    val log = mutDf(Seq(
      mut("a", "U", "2024-01-01 00:00:00", 1, ("f", "x", "1")),
      mut("b", "U", "2024-01-01 00:00:01", 2, ("f", "y", "2")),
      mut("a", "D", "2024-01-01 00:00:02", 3)))
    log.write.mode("overwrite").parquet(changeDir)

    val indexDir = tmpDir("graft-index2")
    val q = Pipeline.start(sp, changeDir, indexDir, tmpDir("graft-ckpt2"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()
    q.stop()
    assert(indexMap(Pipeline.readCurrent(sp, indexDir)) == Map("b" -> Map("y" -> "2")))
    // snapshot vacuum keeps only the published version
    Pipeline.applyBatch(sp, mutDf(Seq(
      mut("c", "U", "2024-01-01 00:00:03", 4, ("f", "z", "3")))), indexDir, 99L)
    Pipeline.vacuumSnapshots(indexDir)
    def vdirs() = java.nio.file.Files.list(java.nio.file.Paths.get(indexDir))
      .iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("v")).toSet
    assert(vdirs() == Set("v99"))
    assert(indexMap(Pipeline.readCurrent(sp, indexDir)) ==
      Map("b" -> Map("y" -> "2"), "c" -> Map("z" -> "3")))
  }

  test("startIncremental maintains sketch tables alongside the bucketed index") {
    // the Config.sketchDir wiring through the REAL incremental stream
    // shell: sketches update in the same foreachBatch as the index, and
    // the scheduled vacuum sweeps both artifact families
    val sp = spark
    import graft.streaming.SketchTable
    val changeDir = tmpDir("graft-sk-changes")
    val log = Seq(
      mut("a", "U", "2024-01-01 00:00:00", 1, ("f", "x", "pay")),
      mut("b", "U", "2024-01-02 00:00:01", 2, ("f", "y", "load")),
      mut("a", "D", "2024-01-02 00:00:02", 3))
    mutDf(log).write.mode("overwrite").parquet(changeDir)
    val cfg = Pipeline.Config(
      changeLogDir = changeDir, indexDir = tmpDir("graft-sk-idx"),
      checkpointDir = tmpDir("graft-sk-ckpt2"), triggerSeconds = 1,
      vacuumEveryBatches = 1, sketchDir = Some(tmpDir("graft-sk-tbl")))
    val q = Pipeline.startIncremental(sp, cfg, nBuckets = 4)
    q.processAllAvailable()
    q.stop()
    val sd = cfg.sketchDir.get
    val dk = SketchTable.distinctKeysByDay(sp, sd).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(dk == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L))
    val (bHdr, _) = SketchTable.oneShot(mutDf(log))
    val got = SketchTable.readHdr(sp, sd).collect().map(_.toString).sorted.toSeq
    assert(got == bHdr.collect().map(_.toString).sorted.toSeq)
    // index state and sketch vacuum both held
    assert(indexMap(graft.streaming.BucketedIndex.read(sp, cfg.indexDir)) ==
      Map("b" -> Map("y" -> "load")))
  }

  test("composed shell: index + sketches + quarantine in one foreachBatch, ES-JSON-served") {
    // The full reference workflow in ONE stream (round-14 soak's spec
    // twin): the real startIncremental shell folds good rows into the
    // bucketed index, maintains the sketch tables, quarantines malformed
    // rows, and vacuums both artifact families — then the materialized
    // index SERVES an ES-JSON search that must equal the same body over
    // the one-shot batch fold (the a18/a19 composed-system observable).
    val sp = spark
    import graft.streaming.{BucketedIndex, SketchTable}
    val changeDir = tmpDir("graft-comp-changes")
    val log = Seq(
      mut("u1", "U", "2024-01-01 08:00:00", 1, ("f", "etype", "purchase"), ("f", "val", "45.0")),
      mut("u2", "U", "2024-01-01 09:00:00", 2, ("f", "etype", "click"), ("f", "val", "12.0")),
      mut("u3", "U", "2024-01-02 08:00:00", 3, ("f", "etype", "purchase"), ("f", "val", "19.5")),
      mut("u1", "U", "2024-01-02 09:00:00", 4, ("f", "val", "61.0")),
      mut("u4", "U", "2024-01-02 10:00:00", 5, ("f", "etype", "purchase")),
      mut("u2", "D", "2024-01-03 08:00:00", 6),
      mut(null, "U", "2024-01-03 09:00:00", 7, ("f", "bad", "x")), // → quarantine
      mut("u5", "X", "2024-01-03 10:00:00", 8, ("f", "bad", "y"))) // → quarantine
    // two file-arrival waves so the stream takes >1 micro-batch
    mutDf(log.take(4)).write.mode("append").parquet(changeDir)
    val cfg = Pipeline.Config(
      changeLogDir = changeDir, indexDir = tmpDir("graft-comp-idx"),
      checkpointDir = tmpDir("graft-comp-ckpt"), triggerSeconds = 1,
      quarantineDir = Some(tmpDir("graft-comp-q")),
      vacuumEveryBatches = 1, sketchDir = Some(tmpDir("graft-comp-sk")))
    val q1 = Pipeline.startIncremental(sp, cfg, nBuckets = 8)
    q1.processAllAvailable()
    mutDf(log.drop(4)).write.mode("append").parquet(changeDir)
    q1.processAllAvailable(); q1.stop()
    val body =
      """{"query": {"bool": {
        |  "must": [{"term": {"info.etype": "purchase"}}],
        |  "filter": [{"range": {"info.val": {"gte": "20"}}}]}},
        | "sort": ["id"]}""".stripMargin
    def serve(df: org.apache.spark.sql.DataFrame) =
      graft.dsl.EsQueryJson.search(df, body)
        .select(col("id"), element_at(col("info"), "val").as("val"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val good = mutDf(log).filter(!Pipeline.isMalformed)
    val streamed = serve(BucketedIndex.read(sp, cfg.indexDir))
    assert(streamed == serve(Merge.fold(good)), "served query must equal the batch fold")
    assert(streamed == Seq(("u1", "61.0"))) // u3 below 20? no — 19.5 < 20; u4 has no val
    // quarantine captured exactly the malformed rows
    val quarantined = sp.read.parquet(s"${cfg.quarantineDir.get}/*").count()
    assert(quarantined == 2)
    // sketch tables equal the one-shot sketches of the good log
    val (bHdr, bHll) = SketchTable.oneShot(good)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(SketchTable.readHdr(sp, cfg.sketchDir.get)) == rows(bHdr))
    val est = SketchTable.distinctKeysByDay(sp, cfg.sketchDir.get).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val expEst = bHll.select(col("day"), hll_sketch_estimate(col("sk")))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(est == expEst)
  }

  test("streaming Bloom decontamination == batch, across batch splits") {
    // the streaming twin of c83: the filter is a constant literal word
    // array and the probe a narrow codegen'd kernel, so it drops straight
    // into a streaming query — no state, no watermark; stream == batch is
    // the whole claim, proven over an arbitrary 3-way batch split
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val docs = sp.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val bench = docs.filter(_._1 % 97 == 0).toDF("doc_id", "text")
    val words = graft.ext.Sketch.bloomBuild(bench, col("text"), nGram = 8)
    val corpus = docs.filterNot(_._1 % 97 == 0)
    def report(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Sketch.bloomContamination(df, col("doc_id"), col("text"), words, nGram = 8)
    val want = report(corpus.toDF("doc_id", "text"))
      .collect().map(_.toString).sorted.toSeq
    assert(want.exists(_.contains("true"))) // fixture really flags docs
    val ms = MemoryStream[(Long, String)]
    val q = report(ms.toDF().toDF("doc_id", "text")).writeStream
      .outputMode("append").format("memory").queryName("bloom_stream")
      .option("checkpointLocation", tmpDir("graft-bloom-ckpt")).start()
    corpus.grouped(math.max(1, corpus.size / 3)).foreach { b =>
      ms.addData(b); q.processAllAvailable()
    }
    q.stop()
    val got = sp.table("bloom_stream").collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }
}
