package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C5 — event-time analytics, streaming form. The reference has NO event
  * time at all (cell timestamps are dropped,
  * `observer6/HbaseDataSyncEsObserver.java:96-102`); these are the
  * north-star extensions over the `events` stream, built on watermarks so
  * state is bounded at 100 TB: late data beyond the watermark is dropped
  * and window state evicted. */
object EventTime {

  /** Tumbling/sliding window aggregate with a watermark. */
  def windowedAgg(events: DataFrame, tsCol: String, watermark: String,
                  windowLen: String, slide: Option[String] = None,
                  keys: Seq[Column] = Nil): DataFrame = {
    val win = slide.map(s => window(col(tsCol), windowLen, s))
      .getOrElse(window(col(tsCol), windowLen))
    events.withWatermark(tsCol, watermark)
      .groupBy(win.as("win") +: keys: _*)
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
      .select((Seq(col("win.start").as("wstart"), col("win.end").as("wend"))
        ++ keys ++ Seq(col("cnt"), col("sum_v"))): _*)
  }

  /** Gap-based session windows (streaming twin of ext.Sessionize). */
  def sessionAgg(events: DataFrame, tsCol: String, watermark: String,
                 gap: String, keys: Seq[Column]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sess") +: keys: _*)
      .agg(count(lit(1)).as("n_events"))
      .select((Seq(col("sess.start").as("sstart"), col("sess.end").as("send"))
        ++ keys :+ col("n_events")): _*)

  /** Stream-stream inner interval join: right rows within `lookback` before
    * each left row, same key. Watermarks on BOTH sides bound the join state
    * (Spark evicts right-side state older than watermark + lookback). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, watermark: String,
                   lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      expr(s"l.$key = r.$key AND r.$rightTs >= l.$leftTs - INTERVAL $lookback" +
        s" AND r.$rightTs <= l.$leftTs"))
  }

  /** C1 streaming: exact dedup with bounded state. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, watermark: String,
                           keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
