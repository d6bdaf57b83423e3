package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel via flatMapGroupsWithState — the
  * streaming twin of [[graft.telemetry.Telemetry.funnel]]: each user
  * carries a 3-long state (first view / first qualifying click / first
  * qualifying purchase, −1 = unreached) and a conversion event streams
  * out the moment a stage first completes, with the same strictly-after
  * semantics as the batch operator.
  *
  * Scale shape: one shuffle on user_id, 24 bytes of state per user.
  * Events are folded in event-time order within each batch (out-of-
  * order arrivals inside a batch are handled exactly); a stage reached
  * in an earlier batch is never re-emitted, so downstream consumers see
  * each (user, stage) at most once.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  /** Stage entry times in millis; −1 = stage unreached. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class Conversion(user_id: Long, stage: String, ts: Timestamp)

  def stateFn(userId: Long, events: Iterator[FunnelEvent],
              state: GroupState[FunnelState]): Iterator[Conversion] = {
    var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
    val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      e.event_type match {
        case "view" if st.t1 < 0 =>
          st = st.copy(t1 = t)
          out += Conversion(userId, "1_view", e.ts)
        case "click" if st.t2 < 0 && st.t1 >= 0 && t > st.t1 =>
          st = st.copy(t2 = t)
          out += Conversion(userId, "2_click", e.ts)
        case "purchase" if st.t3 < 0 && st.t2 >= 0 && t > st.t2 =>
          st = st.copy(t3 = t)
          out += Conversion(userId, "3_purchase", e.ts)
        case _ => // stage already reached, out of order, or unknown type
      }
    }
    state.update(st)
    out.iterator
  }

  def conversions(events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Conversion]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        stateFn)
  }
}
