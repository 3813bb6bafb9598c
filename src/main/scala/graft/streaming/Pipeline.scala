package graft.streaming

import graft.{ChangeLog, Merge}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The reference-parity CDC pipeline (SURVEY.md §3), Spark-native:
  *
  * reference                         → here
  * ---------------------------------------------------------------
  * postPut/postDelete hooks (A1/A2)  → readStream over a change-log dir
  * 10k-op bulk size trigger (A9)     → maxFilesPerTrigger admission
  * 30 s scheduled flush (A10)        → Trigger.ProcessingTime("30 seconds")
  * bulk upsert/delete to ES (A7/A8)  → foreachBatch MERGE into a versioned
  *                                     parquet index snapshot
  * reconnect + requeue (A11)         → checkpointed offsets + idempotent
  *                                     per-batch snapshot (effective
  *                                     exactly-once, an upgrade over the
  *                                     reference's at-least-once —
  *                                     `observer6/ElasticSearchBulkOperator.java:91-99`)
  * per-row try/catch (A17)           → quarantine side-output of malformed
  *                                     mutations (`observer6/HbaseDataSyncEsObserver.java:110-112`)
  * start/stop lifecycle (A15)        → StreamingQuery handle
  *
  * Snapshot layout: `indexDir/v<batchId>/` parquet + `indexDir/_CURRENT`
  * pointer file. A retried batch rewrites the same versioned dir and
  * pointer — idempotent, so checkpoint recovery gives exactly-once index
  * state. At scale the snapshot is bucketed by id (Merge.writeIndex) so
  * the per-batch merge join is co-partitioned; only the batch shuffles.
  */
object Pipeline {

  /** A14 — typed config, the analog of the coprocessor attach-string parse
    * (`readConfiguration(env)`, `observer6/HbaseDataSyncEsObserver.java:36-43`;
    * attach example `README_zh.md:378`). */
  case class Config(
      changeLogDir: String,
      indexDir: String,
      checkpointDir: String,
      quarantineDir: Option[String] = None,
      triggerSeconds: Int = 30, // reference flush period, `observer6/ElasticSearchBulkOperator.java:61`
      maxFilesPerTrigger: Int = 16,
      vacuumEveryBatches: Int = 0, // incremental mode: GC superseded bucket versions every N batches (0 = never)
      sketchDir: Option[String] = None, // maintain per-day HDR/HLL sketch tables ([[SketchTable]])
      vacuumKeepManifests: Int = 1, // vacuum grace window: newest N manifest versions survive (readAt pinning)
      compactAfterDirs: Int = 0) // auto-compact when the manifest fans out past N batch dirs (0 = manual only)

  object Config {
    /** Parse from string options (e.g. spark-submit --conf graft.*). */
    def fromMap(m: Map[String, String]): Config = Config(
      changeLogDir = m("graft.changelog.dir"),
      indexDir = m("graft.index.dir"),
      checkpointDir = m("graft.checkpoint.dir"),
      quarantineDir = m.get("graft.quarantine.dir"),
      triggerSeconds = m.getOrElse("graft.trigger.seconds", "30").toInt,
      maxFilesPerTrigger = m.getOrElse("graft.maxFilesPerTrigger", "16").toInt,
      vacuumEveryBatches = m.getOrElse("graft.vacuum.everyBatches", "0").toInt,
      sketchDir = m.get("graft.sketch.dir"),
      vacuumKeepManifests = m.getOrElse("graft.vacuum.keepManifests", "1").toInt,
      compactAfterDirs = m.getOrElse("graft.compact.afterDirs", "0").toInt)
  }

  def start(spark: SparkSession, cfg: Config): StreamingQuery =
    start(spark, cfg.changeLogDir, cfg.indexDir, cfg.checkpointDir, cfg.quarantineDir,
      Trigger.ProcessingTime(s"${cfg.triggerSeconds} seconds"), cfg.maxFilesPerTrigger,
      cfg.sketchDir, cfg.vacuumEveryBatches)

  def isMalformed = col("row_key").isNull || !col("op").isin("U", "D")

  /** One micro-batch: quarantine bad rows, merge good rows, publish the
    * next snapshot version. Public so batch jobs and tests drive the exact
    * code the stream runs. */
  def applyBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
                 batchId: Long, quarantineDir: Option[String] = None,
                 sketchDir: Option[String] = None): Unit = {
    // Sketch tables update FIRST (each publish is individually
    // idempotent on batchId): "index published" then implies "sketches
    // published", so a crash between the two publishes replays cleanly —
    // the sketch side skips, the index side applies.
    sketchDir.foreach(sd =>
      SketchTable.updateForBatch(spark, sd, batch.filter(!isMalformed), batchId))
    // Retry safety: _CURRENT already at this version means the previous
    // attempt published before crashing (only the checkpoint commit was
    // lost). Re-merging would read v<batchId> and overwrite the same path —
    // Spark refuses ("Cannot overwrite a path that is also being read
    // from") and the stream would never recover. Already applied: skip.
    if (currentSnapshot(indexDir).contains(s"v$batchId")) return
    val bad = batch.filter(isMalformed)
    quarantineDir.foreach { qd =>
      bad.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").parquet(s"$qd/b$batchId")
    }
    val good = batch.filter(!isMalformed)
    val index = currentSnapshot(indexDir)
      .map(v => Merge.readIndex(spark, s"$indexDir/$v"))
      .getOrElse(Merge.emptyIndex(spark))
    val merged = Merge.mergeBatch(index, good)
    Merge.writeIndex(merged, s"$indexDir/v$batchId")
    publish(indexDir, s"v$batchId")
  }

  /** A1/A2 + A9/A10: the streaming shell. */
  def start(spark: SparkSession, changeLogDir: String, indexDir: String,
            checkpointDir: String, quarantineDir: Option[String] = None,
            trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
            maxFilesPerTrigger: Int = 16,
            sketchDir: Option[String] = None,
            vacuumEveryBatches: Int = 0): StreamingQuery =
    ChangeLog.readStreamMutations(spark, changeLogDir, maxFilesPerTrigger)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, indexDir, batchId, quarantineDir, sketchDir)
        // snapshot mode accumulates one full v<id> dir per batch — GC
        // superseded versions on the same cadence the incremental shell
        // uses (same reader-race tradeoff, documented there)
        if (vacuumEveryBatches > 0 && batchId > 0 && batchId % vacuumEveryBatches == 0) {
          vacuumSnapshots(indexDir)
          sketchDir.foreach(SketchTable.vacuum)
        }
      }
      .start()

  /** Remove index snapshot versions other than `_CURRENT` (the snapshot
    * twin of [[BucketedIndex.vacuum]] / [[SketchTable.vacuum]]). */
  def vacuumSnapshots(indexDir: String): Unit = {
    val keep = currentSnapshot(indexDir).getOrElse(return)
    val root = Paths.get(indexDir)
    if (!Files.exists(root)) return
    FsOps.listDir(root)
      .filter(p => p.getFileName.toString.startsWith("v") &&
        p.getFileName.toString != keep && Files.isDirectory(p))
      .foreach(p => FsOps.walkReverse(p).foreach(Files.delete))
  }

  /** One COMPOSED incremental micro-batch — quarantine + sketch tables +
    * bucketed index + scheduled vacuum, the full 100 TB-operator shape in
    * one body. Public so the streaming shell, batch replays, and the
    * ScaleRound14 soak all drive the exact code (the [[applyBatch]]
    * discipline). Ordering is load-bearing: sketches BEFORE the index,
    * so the only torn-publish state a crash can leave is "sketches
    * ahead", which replay converges (both publishes are individually
    * idempotent on batchId — StreamingSpec's crash-window case). */
  def applyIncrementalBatch(spark: SparkSession, cfg: Config, batch: DataFrame,
                            batchId: Long, nBuckets: Int = 256): Unit = {
    val bad = batch.filter(isMalformed)
    cfg.quarantineDir.foreach { qd =>
      bad.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").parquet(s"$qd/b$batchId")
    }
    // sketches before the index (see applyBatch): idempotent pair
    cfg.sketchDir.foreach(sd => SketchTable.updateForBatch(
      spark, sd, batch.filter(!isMalformed), batchId))
    // Auto-compaction needs a compaction id FRESH against every batch id
    // (BucketedIndex.compact's lineage rule) without colliding with the
    // NEXT stream batch — a collision would trip applyBatch's retry-skip
    // guard and silently drop that batch. With compaction enabled the
    // index therefore maps stream batch N to even id 2N and compactions
    // to odd 2N+1 (both monotone, disjoint). The mapping is a property of
    // the index LINEAGE, pinned into the manifest header at first publish
    // and enforced here: flipping compactAfterDirs across 0 on a live
    // index would re-use ids from the other scheme (e.g. indexId 2N
    // colliding with an old plain batch dir) and silently skip batches.
    val scheme = if (cfg.compactAfterDirs > 0) "evenOdd" else "plain"
    val header = BucketedIndex.readHeader(cfg.indexDir)
    header.get("scheme") match {
      case Some(s) => require(s == scheme,
        s"index ${cfg.indexDir} was born with id scheme '$s' but compactAfterDirs=" +
          s"${cfg.compactAfterDirs} implies '$scheme' — the id lineages collide; " +
          "pick the scheme at index birth (fresh dir + checkpoint)")
      case None => require(
        scheme == "plain" || BucketedIndex.readManifest(cfg.indexDir).isEmpty,
        s"cannot enable compactAfterDirs on index ${cfg.indexDir}: its manifest " +
          "predates the even/odd id scheme — indexId 2N can collide with an old " +
          "plain batch id and silently skip a batch; start a fresh index dir")
    }
    val indexId = if (cfg.compactAfterDirs > 0) 2 * batchId else batchId
    BucketedIndex.applyBatch(spark, cfg.indexDir,
      batch.filter(!isMalformed), indexId, nBuckets,
      streamBatchId = batchId, scheme = scheme)
    // fan-out policy: when the manifest references more than
    // compactAfterDirs distinct batch dirs (each cold bucket pinned to
    // the batch that last touched it), fold the whole index into one
    // consolidated dir — bounds a reader's dirs-per-read at the policy
    // knob. Crash between applyBatch and compact converges: the next
    // trigger re-evaluates fan-out and the half-written odd dir is
    // vacuum garbage.
    if (cfg.compactAfterDirs > 0 &&
        BucketedIndex.readManifest(cfg.indexDir).values.toSet.size > cfg.compactAfterDirs) {
      BucketedIndex.compact(spark, cfg.indexDir, compactId = 2 * batchId + 1, nBuckets)
    }
    // periodic GC of superseded bucket versions. Vacuum keeps the newest
    // vacuumKeepManifests manifest versions (the readAt grace window); a
    // reader pinned FURTHER back than that can still race it (the
    // Delta-VACUUM-retention tradeoff) — size keepLast × trigger period
    // to exceed the longest expected cursor walk
    if (cfg.vacuumEveryBatches > 0 && batchId > 0 && batchId % cfg.vacuumEveryBatches == 0) {
      BucketedIndex.vacuum(cfg.indexDir, cfg.vacuumKeepManifests)
      cfg.sketchDir.foreach(SketchTable.vacuum)
    }
  }

  /** The 100 TB variant of [[start]]: per-batch cost O(batch + touched
    * buckets) via [[BucketedIndex]] instead of a full snapshot rewrite. */
  def startIncremental(spark: SparkSession, cfg: Config, nBuckets: Int = 256): StreamingQuery =
    ChangeLog.readStreamMutations(spark, cfg.changeLogDir, cfg.maxFilesPerTrigger)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(s"${cfg.triggerSeconds} seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIncrementalBatch(batch.sparkSession, cfg, batch, batchId, nBuckets)
      }
      .start()

  /** Read the published snapshot (the "ES index" visible to queries). */
  def readCurrent(spark: SparkSession, indexDir: String): DataFrame =
    currentSnapshot(indexDir)
      .map(v => Merge.readIndex(spark, s"$indexDir/$v"))
      .getOrElse(Merge.emptyIndex(spark))

  def currentSnapshot(indexDir: String): Option[String] = {
    val p = Paths.get(indexDir, "_CURRENT")
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  private def publish(indexDir: String, version: String): Unit = {
    Files.createDirectories(Paths.get(indexDir))
    val tmp = Paths.get(indexDir, "_CURRENT.tmp")
    Files.writeString(tmp, version)
    Files.move(tmp, Paths.get(indexDir, "_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
