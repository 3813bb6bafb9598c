package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** FUNNEL analysis: how far each user progresses through an ordered
    * stage sequence (greedy earliest-match: stage k+1 matches the first
    * qualifying event strictly AFTER the stage-k match — equivalent to
    * the chained-min formulation the oracle uses; event timestamps are
    * strictly monotone in event_id, so "strictly after" is unambiguous).
    * Returns one row per reached stage: user count and the mean
    * first-to-last-match span in whole seconds.
    *
    * Scale shape: ONE shuffle (user_id) — events filter to funnel types
    * at the scan, per-user lists are bounded (a user's event count), and
    * the fold is an in-row HOF over that bounded list; the chained-min
    * SQL form would shuffle once per stage. Covers users with at least
    * one funnel-stage event. */
  def funnel(events: DataFrame, stages: Seq[String],
             withinSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty)
    val evs = events.select(col("user_id"), col("ts"), col("event_type"))
      .filter(col("event_type").isin(stages: _*))
    val perUser = evs.groupBy("user_id").agg(
      array_sort(collect_list(struct(col("ts"), col("event_type")))).as("evs"))
    val stageArr = array(stages.map(lit): _*)
    val folded = perUser.select(
      aggregate(col("evs"),
        struct(lit(0).as("stage"), lit(null).cast("timestamp").as("t0"),
          lit(null).cast("timestamp").as("tn"), lit(false).as("dead")),
        (acc, e) => {
          // least() guards ANSI element_at when the funnel is complete
          val want = element_at(stageArr,
            least(acc.getField("stage") + 1, lit(stages.size)))
          val qualifies = !acc.getField("dead") &&
            acc.getField("stage") < stages.size &&
            e.getField("event_type") === want
          // conversion window: the FIRST qualifying event decides — on
          // time advances the stage, late kills the funnel (whole-second
          // comparison, both engines truncate alike)
          val within = withinSeconds match {
            case None => lit(true)
            case Some(w) => acc.getField("tn").isNull ||
              unix_timestamp(e.getField("ts")) - unix_timestamp(acc.getField("tn")) <= w
          }
          when(coalesce(qualifies && within, lit(false)),
            struct((acc.getField("stage") + 1).as("stage"),
              coalesce(acc.getField("t0"), e.getField("ts")).as("t0"),
              e.getField("ts").as("tn"), lit(false).as("dead")))
            .when(coalesce(qualifies && !within, lit(false)),
              struct(acc.getField("stage").as("stage"), acc.getField("t0").as("t0"),
                acc.getField("tn").as("tn"), lit(true).as("dead")))
            .otherwise(acc)
        }).as("f"))
    folded.select(col("f.stage").as("stage_reached"), col("f.t0").as("t0"),
        col("f.tn").as("tn"))
      .groupBy("stage_reached")
      .agg(count(lit(1)).as("n_users"),
        round(avg(expr(
          "timestampdiff(SECOND, date_trunc('second', t0), date_trunc('second', tn))")), 6)
          .as("avg_span_secs"))
      .orderBy("stage_reached")
  }

  /** COHORT RETENTION: users cohort by the week of their FIRST event;
    * for each (cohort week, week offset) count the users active that
    * week and the share of the cohort they represent (offset 0 is the
    * cohort itself — first week is active by construction). Week
    * arithmetic is exact-integer (epoch difference / 7d of Monday-start
    * `date_trunc('week')`, identical in both engines).
    * Scale shape: one (user) agg for cohorts + one distinct over
    * (user, week) — both map-side-combining hash aggs; the cohort-size
    * join is broadcast (cohort-week cardinality). */
  def cohortRetention(events: DataFrame): DataFrame = {
    val wk = date_trunc("week", col("ts"))
    val cohorts = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val active = events.select(col("user_id"), wk.as("awk")).distinct()
    val joined = active.join(cohorts, "user_id")
      .withColumn("week_offset",
        ((unix_timestamp(col("awk")) - unix_timestamp(col("cohort"))) / (7L * 86400L))
          .cast("int"))
    val counts = joined.groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val sizes = counts.filter(col("week_offset") === 0)
      .select(col("cohort"), col("n_users").as("_size"))
    counts.join(broadcast(sizes), "cohort")
      .withColumn("retention_rate",
        round(col("n_users").cast("double") / col("_size"), 6))
      .select(col("cohort"), col("week_offset"), col("n_users"), col("retention_rate"))
      .orderBy("cohort", "week_offset")
  }

  /** Event-transition matrix (the user-journey Markov chain): per user,
    * consecutive event pairs in (ts, event_id) order; P(to|from) =
    * pair count / from-type outgoing total. One user_id window + one
    * pair agg; the outgoing totals ride a broadcast join (event-type
    * cardinality). */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .withColumn("_next", lead(col("event_type"), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = pairs.groupBy("from_type").agg(sum("n").as("_tot"))
    pairs.join(broadcast(outTotals), "from_type")
      .withColumn("p", round(col("n").cast("double") / col("_tot"), 6))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
      .orderBy("from_type", "to_type")
  }

  /** Top user PATHS: each user's first `depth` event types in
    * (ts, event_id) order joined with '>' — the entry-journey report.
    * One user shuffle (rank window) + one path agg. */
  def topPaths(events: DataFrame, depth: Int = 3, topK: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= depth)
      .groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_rn"), col("event_type")))),
        s => s.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), col("path")).limit(topK)
  }

  /** LAST-TOUCH attribution: for each conversion event, the immediately
    * preceding event type by the same user (any type, within
    * `withinSeconds` whole seconds) gets the credit; conversions with no
    * in-window predecessor attribute to '(none)'. One user window + one
    * type agg. */
  def lastTouchAttribution(events: DataFrame, conversionType: String,
                           withinSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("_prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("_prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("event_type") === conversionType)
      .withColumn("credit",
        when(col("_prev_type").isNotNull &&
          unix_timestamp(col("ts")) - unix_timestamp(col("_prev_ts")) <= withinSeconds,
          col("_prev_type")).otherwise(lit("(none)")))
      .groupBy("credit").agg(count(lit(1)).as("n_conversions"))
      .orderBy(desc("n_conversions"), col("credit"))
  }

  /** RFM segmentation (recency / frequency / monetary) by QUANTILE
    * CUTOFFS, not rank windows: per-user metrics aggregate once, the
    * four quintile cutoffs per metric come from ONE 1-row agg
    * (broadcast), and scores are value comparisons against the rounded
    * cutoffs — so no global ntile sort exists anywhere in the plan (a
    * rank-based ntile would funnel every user through one partition at
    * 100 TB; cutoff assignment is embarrassingly parallel and, unlike
    * ntile, deterministic under ties by VALUE rather than row order).
    * Score 5 = best quintile (most recent / most frequent / highest
    * spend). Returns (segment, n_users). */
  def rfmSegments(events: DataFrame, value: Column): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(
      max(unix_timestamp(col("ts"))).as("_last"),
      count(lit(1)).as("f"),
      round(sum(value), 4).as("m"))
    val asOf = perUser.agg(max(col("_last")).as("_as_of"))
    val u = perUser.crossJoin(broadcast(asOf))
      .withColumn("r", col("_as_of") - col("_last"))
    val ps = array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*)
    val cuts = u.agg(
      percentile(col("r"), ps).as("_cr"),
      percentile(col("f"), ps).as("_cf"),
      percentile(col("m"), ps).as("_cm"))
    def score(v: Column, cutArr: Column, smallerIsBetter: Boolean): Column =
      (1 to 4).map { k =>
        val c = round(element_at(cutArr, k), 6)
        when(if (smallerIsBetter) v < c else v > c, 1).otherwise(0)
      }.reduce(_ + _) + 1
    u.crossJoin(broadcast(cuts))
      .withColumn("segment",
        score(col("r").cast("double"), col("_cr"), smallerIsBetter = true) * 100 +
          score(col("f").cast("double"), col("_cf"), smallerIsBetter = false) * 10 +
          score(col("m"), col("_cm"), smallerIsBetter = false))
      .groupBy("segment").agg(count(lit(1)).as("n_users"))
      .orderBy("segment")
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
