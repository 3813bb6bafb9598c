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
}
