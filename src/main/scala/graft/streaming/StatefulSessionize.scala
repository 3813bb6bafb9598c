package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** C5 streaming — gap sessionization as CUSTOM state
  * (`flatMapGroupsWithState` + event-time timeout): the
  * `session_window` form ([[EventTime.sessionAgg]]) gives windowed
  * COUNTS; this form carries arbitrary per-session state — first/last
  * event ids, value sum — and emits ONE record per closed session, the
  * shape a downstream session store ingests. Sessions close two ways,
  * both exact:
  *  - in-batch: a same-user event beyond the gap closes the previous
  *    session immediately;
  *  - by timeout: when the WATERMARK passes last-event + gap, the open
  *    session is flushed (event-time timeout — wall-clock plays no part,
  *    so replays are deterministic).
  *
  * State per user = one open session (constant size); watermark eviction
  * bounds total state by active users within the gap horizon — the
  * 100 TB shape. Within a micro-batch, events sort by (ts, event_id)
  * before folding, so intra-batch disorder is absorbed; an event older
  * than the watermark can still be misplaced (documented — the same
  * contract as every watermarked operator here).
  *
  * The reference drops event time entirely
  * (`observer6/HbaseDataSyncEsObserver.java:96-102` discards cell
  * timestamps); this is a north-star extension like [[EventTime]]. */
object StatefulSessionize {

  case class SessEvent(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

  case class OpenSession(startMs: Long, lastMs: Long, firstEv: Long,
                         lastEv: Long, n: Long, sum: Double)

  case class ClosedSession(user_id: Long, sstart: Timestamp, send: Timestamp,
                           first_event: Long, last_event: Long,
                           n_events: Long, sum_value: Double)

  private def close(u: Long, st: OpenSession): ClosedSession =
    ClosedSession(u, new Timestamp(st.startMs), new Timestamp(st.lastMs),
      st.firstEv, st.lastEv, st.n, st.sum)

  private def fresh(e: SessEvent): OpenSession =
    OpenSession(e.ts.getTime, e.ts.getTime, e.event_id, e.event_id, 1L, e.value)

  /** Caller applies `.withWatermark("ts", ...)` upstream; pair with
    * `outputMode("append")`. */
  def sessions(events: Dataset[SessEvent], gapSeconds: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(close(user, st))
          } else {
            val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            for (e <- evs) {
              cur = cur match {
                case Some(st) if e.ts.getTime - st.lastMs <= gapMs =>
                  Some(st.copy(lastMs = e.ts.getTime, lastEv = e.event_id,
                    n = st.n + 1, sum = st.sum + e.value))
                case Some(st) =>
                  closed += close(user, st)
                  Some(fresh(e))
                case None => Some(fresh(e))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  case class TypedEvent(event_id: Long, ts: Timestamp, user_id: Long,
                        event_type: String)
  case class FunnelState(stage: Int, t0Ms: Long, tnMs: Long, dead: Boolean)
  case class Conversion(user_id: Long, t_first: Timestamp, t_last: Timestamp,
                        span_secs: Long)

  case class UserStamp(event_id: Long, ts: Timestamp, user_id: Long)
  case class CohortState(cohortMs: Long, emitted: Seq[Int])
  case class CohortActive(user_id: Long, cohort: Timestamp, week_offset: Int)

  private val WeekMs = 7L * 86400000L
  /** Monday-00:00-UTC floor (Spark's `date_trunc("week")` in the pinned
    * UTC session): epoch day 4 (1970-01-05) was a Monday. */
  private def weekFloorMs(ms: Long): Long = {
    val day = Math.floorDiv(ms, 86400000L)
    (day - Math.floorMod(day - 4L, 7L)) * 86400000L
  }

  /** STREAMING cohort retention — [[graft.ext.Sessionize.cohortRetention]]
    * as per-user state: the first event pins the user's cohort week, and
    * ONE `CohortActive(user, cohort, week_offset)` record emits the first
    * time the user is active in each later week. Downstream,
    * `groupBy(cohort, week_offset).count()` IS the batch retention table
    * (the spec proves it across arbitrary batch splits). State per user =
    * cohort + the distinct offsets already emitted (bounded by the
    * campaign horizon in weeks, not by event count). Events that arrive
    * before the user's recorded cohort week (cross-batch disorder past
    * the watermark) are ignored rather than re-writing history — append
    * mode cannot retract; same contract as every watermarked op here. */
  def cohortStream(events: Dataset[UserStamp]): Dataset[CohortActive] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortActive](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          val out = Seq.newBuilder[CohortActive]
          var st = state.getOption.orNull
          for (e <- it.toArray.sortBy(e => (e.ts.getTime, e.event_id))) {
            val wk = weekFloorMs(e.ts.getTime)
            if (st == null) st = CohortState(wk, Seq.empty)
            val off = ((wk - st.cohortMs) / WeekMs).toInt
            if (wk >= st.cohortMs && !st.emitted.contains(off)) {
              st = st.copy(emitted = (st.emitted :+ off).sorted)
              out += CohortActive(user, new Timestamp(st.cohortMs), off)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class TouchState(lastType: String, lastMs: Long)
  case class Attribution(user_id: Long, ts: Timestamp, credit: String)

  /** STREAMING last-touch attribution —
    * [[graft.ext.Sessionize.lastTouchAttribution]] as per-user state: the
    * state is simply the user's most recent event (type + time, ANY type
    * — a previous conversion is a valid last touch, exactly the batch
    * lag's behavior); each conversion event emits its credit — the last
    * touch if it landed within the window (whole-second floor, the batch
    * convention), else "(none)". `groupBy(credit).count()` over the
    * emissions is the batch report. Constant-size state per user. */
  def attributionStream(events: Dataset[TypedEvent], conversionType: String,
                        withinSeconds: Long): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          val out = Seq.newBuilder[Attribution]
          var last = state.getOption.orNull
          for (e <- it.toArray.sortBy(e => (e.ts.getTime, e.event_id))) {
            if (e.event_type == conversionType) {
              val credit =
                if (last != null &&
                    e.ts.getTime / 1000 - last.lastMs / 1000 <= withinSeconds)
                  last.lastType
                else "(none)"
              out += Attribution(user, e.ts, credit)
            }
            last = TouchState(e.event_type, e.ts.getTime)
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }

  /** STREAMING funnel — [[graft.ext.Sessionize.funnel]]'s greedy
    * first-qualifying-event-decides rule carried across micro-batches as
    * per-user state: a conversion record emits the moment a user reaches
    * the final stage; a late first-match kills the funnel permanently
    * (no emission, and the state survives so later events can't
    * resurrect it — identical to the batch fold). Window comparisons use
    * whole seconds (floor), matching the batch form. State per user is
    * one constant-size struct. Within a batch events sort by
    * (ts, event_id); cross-batch disorder is the caller's watermark
    * problem, as everywhere. Pair with `outputMode("append")`. */
  def funnelStream(events: Dataset[TypedEvent], stages: Seq[String],
                   withinSeconds: Option[Long] = None): Dataset[Conversion] = {
    require(stages.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(e => stages.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, it, state) =>
          var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L, dead = false))
          val out = Seq.newBuilder[Conversion]
          for (e <- it.toArray.sortBy(e => (e.ts.getTime, e.event_id))) {
            val qualifies = !st.dead && st.stage < stages.size &&
              e.event_type == stages(st.stage)
            if (qualifies) {
              val within = withinSeconds.forall(w =>
                st.stage == 0 || e.ts.getTime / 1000 - st.tnMs / 1000 <= w)
              if (within) {
                st = FunnelState(st.stage + 1,
                  if (st.stage == 0) e.ts.getTime else st.t0Ms,
                  e.ts.getTime, dead = false)
                if (st.stage == stages.size)
                  out += Conversion(user, new Timestamp(st.t0Ms),
                    new Timestamp(st.tnMs),
                    st.tnMs / 1000 - st.t0Ms / 1000)
              } else st = st.copy(dead = true)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
