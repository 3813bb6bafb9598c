package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES percolate — reverse search: stored queries, incoming documents;
  * for each document, which queries match. The reference's ES 6.5 surface
  * ships this as the percolator field type (alerting / saved-search
  * notification being the classic use).
  *
  * Each stored ES-JSON query body compiles through [[EsQueryJson.predicate]]
  * to a boolean Column; one SELECT evaluates all of them per row and
  * explodes the matching ids. Fully narrow — no join, no shuffle, works
  * unchanged on a stream (percolation over a CDC stream = alerting). At
  * scale the stored-query set is the small side by construction (ES keeps
  * it in a single index); thousands of compiled predicates per row is the
  * same work ES does per percolate call. */
object Percolator {

  /** (doc id, matching stored-query id), one row per match. */
  def percolate(docs: DataFrame, idCol: Column,
                queries: Seq[(String, String)]): DataFrame = {
    val tagged = queries.map { case (qid, body) =>
      val q = EsQueryJson.parse(body)
      val pred = Option(q.get("query")).map(EsQueryJson.predicate).getOrElse(EsQueryJson.predicate(q))
      when(pred, lit(qid)).otherwise(lit(null).cast("string"))
    }
    docs.select(idCol.as("doc_id"), array_compact(array(tagged: _*)).as("_m"))
      .select(col("doc_id"), explode(col("_m")).as("query_id"))
  }
}
