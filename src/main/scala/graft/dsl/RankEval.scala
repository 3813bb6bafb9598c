package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES `_rank_eval` API (6.2+; the reference's ES 6.5 surface,
  * `/root/reference/pom.xml:25-26`): given ranked search hits and graded
  * relevance judgments, per-query ranking metrics —
  *
  *  - `precision@k`   relevant-in-top-k / retrieved-in-top-k (ES's
  *                    Precision metric with `ignore_unlabeled: false` —
  *                    unlabeled counts irrelevant; the denominator is the
  *                    RETRIEVED count capped at k, not k itself, so a
  *                    query returning fewer than k hits is not
  *                    underreported);
  *  - `mrr`           1 / rank of the first relevant hit (0 if none in
  *                    the top k);
  *  - `dcg@k`         Σ (2^grade − 1) / log2(rank + 1) over the top k
  *                    (ES uses the exponential-gain form);
  *  - `ndcg@k`        dcg normalized by the ideal DCG over that query's
  *                    judgment set (0 when no judged-relevant docs).
  *
  * Relevant = grade > 0, as in ES. Metrics round to 6 dp (the engine
  * determinism protocol). Also useful far beyond search: the ANN serving
  * paths (IVF / PQ / IVF-PQ) evaluate against exact kNN with the same
  * call.
  *
  * Scale shape: one left join of hits to judgments on (query_id, doc_id),
  * per-query bounded windows (top-k rows each), and the ideal-DCG rank is
  * a window over each query's judgments — everything partitions by
  * query_id; no global sort, no driver-side work. */
object RankEval {

  def rankEval(hits: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    val j = judgments.select(col("query_id"), col("doc_id"), col("grade"))
    val topk = hits.filter(col("rank") <= k)
      .join(j, Seq("query_id", "doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0)))
      .withColumn("rel", (col("grade") > 0).cast("int"))
    val perQ = topk.groupBy("query_id").agg(
      round(sum(col("rel")) / count(lit(1)).cast("double"), 6).as("precision_k"),
      round(coalesce(
        lit(1.0) / min(when(col("rel") === 1, col("rank"))), lit(0.0)), 6).as("mrr"),
      round(sum((pow(lit(2.0), col("grade")) - 1.0) /
        log2(col("rank") + 1.0)), 6).as("dcg_k"))
    // ideal DCG: that query's judgments ranked by grade desc (doc_id
    // tie-break for determinism), top k
    val iw = Window.partitionBy("query_id").orderBy(desc("grade"), col("doc_id"))
    val ideal = j.filter(col("grade") > 0)
      .withColumn("irank", row_number().over(iw))
      .filter(col("irank") <= k)
      .groupBy("query_id")
      .agg(round(sum((pow(lit(2.0), col("grade")) - 1.0) /
        log2(col("irank") + 1.0)), 6).as("idcg_k"))
    perQ.join(ideal, Seq("query_id"), "left")
      .withColumn("ndcg_k",
        when(col("idcg_k").isNull || col("idcg_k") === 0.0, lit(0.0))
          .otherwise(round(col("dcg_k") / col("idcg_k"), 6)))
      .select(col("query_id"), col("precision_k"), col("mrr"),
        col("dcg_k"), col("ndcg_k"))
  }
}
