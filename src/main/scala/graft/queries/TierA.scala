package graft.queries

import graft.{ChangeLog, Merge, Transform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier A (SURVEY.md §2) exercised as batch DataFrame computations over the
  * `events` table reinterpreted as a change-log, so the DuckDB oracle can
  * hash-check the reference semantics (family erasure, LWW, whole-doc
  * delete, partial-put merge).
  *
  * Output convention: map-typed docs are EXPLODED to `(id, qualifier, value)`
  * rows with a total order, because parquet map cells don't hash stably
  * across engines.
  */
object TierA {

  /** A3+A4+A5+A6: per-mutation flatten. One row per (mutation, qualifier)
    * with last-wins dedup inside the mutation; no cross-row state. */
  def flatten(spark: SparkSession, sfDir: String): DataFrame = {
    val changes = ChangeLog.readEvents(spark, sfDir)
    Transform.toDocs(changes)
      .filter(col("op") === "U")
      .select(col("row_key").as("id"), col("seq"), explode(col("doc.info")).as(Seq("qualifier", "value")))
      .orderBy("seq", "qualifier")
  }

  /** A7+A8+A13: full LWW fold of the change-log into the materialized
    * index, exploded for the oracle. The load-bearing semantics: any
    * 'error' event deletes the whole doc; later events resurrect it; per
    * qualifier the last write (by ts, seq) wins. */
  def mergeFold(spark: SparkSession, sfDir: String): DataFrame = {
    val changes = ChangeLog.readEvents(spark, sfDir)
    Merge.fold(changes)
      .select(col("id"), explode(col("info")).as(Seq("qualifier", "value")))
      .orderBy("id", "qualifier")
  }

  /** A8: keys whose final state is deleted (tombstoned) — last op is a
    * delete with no put after it. */
  def deletedKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val changes = ChangeLog.readEvents(spark, sfDir)
    Merge.foldChanges(changes)
      .filter(!col("alive"))
      .select(col("id"))
      .orderBy("id")
  }

  /** A13 incremental equivalence surface: fold first half as the standing
    * index, merge second half as a batch — must equal the one-shot fold.
    * Exposed as a query so the oracle verifies incremental == batch. */
  def mergeIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val changes = ChangeLog.readEvents(spark, sfDir).cache()
    val cut = lit(5000L)
    val index0 = Merge.fold(changes.filter(col("seq") < cut))
    val merged = Merge.mergeBatch(index0, changes.filter(col("seq") >= cut))
    merged
      .select(col("id"), explode(col("info")).as(Seq("qualifier", "value")))
      .orderBy("id", "qualifier")
  }
}
