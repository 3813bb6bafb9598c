package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C5 — gap-based sessionization over the events stream (batch form; the
  * streaming form uses `session_window` — see streaming.Pipeline and the
  * specs). One shuffle on user_id; the lag/cumsum windows reuse the same
  * partitioning+sort. */
object Sessionize {

  /** Assign session ids per user: a new session starts when the gap from
    * the previous event exceeds `gapMinutes`. */
  def assign(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        // second-truncated whole-second gap == DuckDB date_diff('second',…)
        // boundary count; works for TIMESTAMP and TIMESTAMP_NTZ alike
        // (a plain cast("long") breaks on NTZ inputs)
        when(col("prev_ts").isNull ||
          expr("timestampdiff(SECOND, date_trunc('second', prev_ts), date_trunc('second', ts))")
            > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats: session count, events, largest session. */
  def userStats(events: DataFrame, gapMinutes: Int): DataFrame =
    assign(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_ev"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("max_sess_events"))
}
