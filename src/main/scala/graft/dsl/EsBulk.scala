package graft.dsl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The ES `_bulk` API — the reference's CORE operation: its observer
  * batches HBase mutations into bulk index/delete requests
  * (`observer6/ElasticSearchBulkOperator.java` — the bulk buffer + timed
  * flush; `observer6/HbaseDataSyncEsObserver.java:93-129` builds the
  * update/delete items). This front-end parses the bulk NDJSON wire
  * shape and applies it onto a standing index frame with ES's per-item
  * semantics:
  *
  *  - `index`  — upsert whole doc: `created` if absent, else `updated`;
  *  - `create` — insert-only: `conflict` (ES 409) if the doc EXISTS at
  *    that point in the batch, doc untouched;
  *  - `update` — partial-doc merge (`{"doc": {...}}`): new keys add,
  *    shared keys overwrite; `missing` (ES 404) if absent;
  *  - `delete` — `deleted` / `not_found`.
  *
  * Items apply in LINE ORDER per id — ES's intra-batch contract (later
  * items see earlier items' effects, `create` after `delete` succeeds).
  *
  * Scale shape: parse is narrow (from_json + a seq+1 self-join that
  * AQE broadcasts for bounded batches); apply is ONE cogroup on id —
  * the same one-shuffle-per-batch budget as the A13 merge fold, with
  * per-id state bounded by doc width. */
object EsBulk {

  case class BulkOp(seq: Long, op: String, id: Long, doc: Map[String, String],
                    upsert: Boolean = false)
  case class BulkOut(seq: Long, id: Long, op: String, result: String,
                     key: String, value: String, isState: Boolean)

  /** Parse `_bulk` NDJSON lines (`seq` = line number, `value` = raw
    * line). Action lines carry one of the four action keys; `index`/
    * `create`/`update` consume the FOLLOWING line as their doc
    * (`update` unwraps ES's `{"doc": {...}}` envelope). */
  def parse(lines: DataFrame): Dataset[BulkOp] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val act = lines.select(col("seq"), from_json(col("value"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "struct<index: struct<_id: bigint>, create: struct<_id: bigint>, " +
          "update: struct<_id: bigint>, delete: struct<_id: bigint>>"))
      .as("a"))
      .withColumn("op",
        when(col("a.index").isNotNull, "index")
          .when(col("a.create").isNotNull, "create")
          .when(col("a.update").isNotNull, "update")
          .when(col("a.delete").isNotNull, "delete"))
      .filter(col("op").isNotNull)
      .select(col("seq"), col("op"),
        coalesce(col("a.index._id"), col("a.create._id"),
          col("a.update._id"), col("a.delete._id")).as("id"))
    val docs = lines.select((col("seq") - 1).as("seq"),
      from_json(col("value"), org.apache.spark.sql.types.DataType.fromDDL(
        "map<string, string>")).as("flat"),
      from_json(col("value"), org.apache.spark.sql.types.DataType.fromDDL(
        "struct<doc: map<string, string>, doc_as_upsert: boolean>")).as("env"))
    act.join(docs, Seq("seq"), "left")
      .select(col("seq"), col("op"), col("id"),
        when(col("op") === "update", col("env.doc"))
          .when(col("op") === "delete", lit(null))
          .otherwise(col("flat")).as("doc"),
        // the reference observer emits EVERY put as
        // prepareUpdate(...).setDocAsUpsert(true)
        // (`observer6/HbaseDataSyncEsObserver.java:93-129`) — an update
        // carrying `"doc_as_upsert": true` creates on a missing id
        // instead of returning `missing` (404)
        (col("op") === "update" &&
          coalesce(col("env.doc_as_upsert"), lit(false))).as("upsert"))
      .as[BulkOp]
  }

  /** The per-id ordered fold (public: the property spec runs the same
    * transition against a reference simulation). Returns (items, final
    * doc or None). */
  def fold(standing: Option[Map[String, String]], ops: Seq[BulkOp])
      : (Seq[(Long, String, String)], Option[Map[String, String]]) = {
    var doc = standing
    val items = ops.sortBy(_.seq).map { o =>
      val result = o.op match {
        case "index" =>
          val r = if (doc.isDefined) "updated" else "created"
          doc = Some(Option(o.doc).getOrElse(Map.empty)); r
        case "create" =>
          if (doc.isDefined) "conflict"
          else { doc = Some(Option(o.doc).getOrElse(Map.empty)); "created" }
        case "update" =>
          if (doc.isEmpty) {
            // ES doc_as_upsert: the partial doc BECOMES the doc ("created")
            if (o.upsert) { doc = Some(Option(o.doc).getOrElse(Map.empty)); "created" }
            else "missing"
          } else { doc = Some(doc.get ++ Option(o.doc).getOrElse(Map.empty)); "updated" }
        case "delete" =>
          if (doc.isDefined) { doc = None; "deleted" } else "not_found"
      }
      (o.seq, o.op, result)
    }
    (items, doc)
  }

  private def applyAll(index: DataFrame, ops: Dataset[BulkOp]): Dataset[BulkOut] = {
    val spark = index.sparkSession
    import spark.implicits._
    val idx = index.select(col("id").cast("long").as("_1"), col("doc").as("_2"))
      .as[(Long, Map[String, String])]
    idx.groupByKey(_._1).cogroup(ops.groupByKey(_.id)) { (id, docs, opIt) =>
      val standing = docs.toSeq.headOption.map(_._2)
      val (items, fin) = fold(standing, opIt.toSeq)
      items.iterator.map { case (seq, op, r) =>
        BulkOut(seq, id, op, r, null, null, isState = false)
      } ++ fin.iterator.flatMap(m =>
        m.toSeq.sortBy(_._1).map { case (k, v) =>
          BulkOut(-1L, id, null, null, k, v, isState = true)
        })
    }
  }

  /** The bulk RESPONSE items: (seq, id, op, result) in line order. */
  def items(index: DataFrame, ops: Dataset[BulkOp]): DataFrame =
    applyAll(index, ops).filter(!col("isState"))
      .select(col("seq"), col("id"), col("op"), col("result"))

  /** The post-bulk index, exploded to (id, key, value) rows (map-order
    * free — the hash-stable shape). */
  def state(index: DataFrame, ops: Dataset[BulkOp]): DataFrame =
    applyAll(index, ops).filter(col("isState"))
      .select(col("id"), col("key"), col("value"))
}
