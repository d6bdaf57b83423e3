package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState —
  * the custom-state path the DataFrame API can't express: sessions close
  * either when a gap appears inside a batch or when the event-time
  * watermark passes last_event + gap (timeout).
  *
  * Scale shape: state is one small record per active user (not per
  * event); the stream shuffles once on user_id. This is the streaming
  * twin of Telemetry.sessionize, which computes the same sessions in
  * batch via window functions.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           sum_value: Double)

  val DefaultGapMs: Long = 30L * 60 * 1000

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)

  /** Group-state transition: absorb the batch's events (sorted by event
    * time), splitting on gaps; keep the open tail in state with an
    * event-time timeout at last + gap. */
  def stateFn(gapMs: Long)(userId: Long, events: Iterator[SessionEvent],
                           state: GroupState[SessionState]): Iterator[ClosedSession] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    if (events.isEmpty) {
      // woken by timeout: watermark passed last + gap → session is closed
      if (state.hasTimedOut && state.exists) {
        out += close(userId, state.get)
        state.remove()
      }
    } else {
      var cur = if (state.exists) Some(state.get) else None
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last > gapMs =>
            out += close(userId, s)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
    }
    out.iterator
  }

  def sessionize(events: Dataset[SessionEvent],
                 gapMs: Long = DefaultGapMs): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(gapMs))
  }
}
