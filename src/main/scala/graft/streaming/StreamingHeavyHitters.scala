package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, ValueState}

/** Streaming Misra-Gries heavy hitters — the streaming twin of
  * [[graft.functions.FrequentItems]] / `Telemetry.heavyHitters`: the
  * same k-counter summary maintained per series in a ValueState, fed
  * one micro-batch at a time. The MG invariant that matters survives
  * streaming unchanged: after ANY prefix of the stream, every item
  * with true frequency > n/(k+1) is among the counters (the candidate
  * SET guarantee; estimates undercount by ≤ n/(k+1)) — so each batch
  * can emit an always-valid candidate list and the exact second pass
  * (the batch twin's pattern) can run at any cut point.
  *
  * Determinism contract: an MG summary is arrival-order-dependent, so
  * the processor folds each batch's rows in SORTED item order — batch
  * boundaries and within-batch order are then fully specified, and the
  * spec replays the identical fold from scratch. (The GUARANTEE needs
  * no order; only bit-replayability does.)
  *
  * State: k (item, count) pairs + the processed count — O(k) longs per
  * series forever, the bounded-memory contract that lets this run on
  * an unbounded key×item stream where exact per-item counts would OOM. */
object StreamingHeavyHitters {

  case class Ev(event_type: String, item: Long)
  case class HH(event_type: String, item: Long, est: Long, n_seen: Long)

  case class St(n: Long, items: Array[Long], counts: Array[Long])

  class Processor(k: Int, ttl: java.time.Duration = null)
      extends StatefulProcessor[String, Ev, HH] {

    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[St]("mg", Encoders.product[St],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Ev],
                                 timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[HH] = {
      val s = if (state.exists()) state.get() else St(0L, Array.empty, Array.empty)
      val buf = scala.collection.mutable.LongMap.empty[Long]
      s.items.indices.foreach(i => buf(s.items(i)) = s.counts(i))
      var n = s.n
      rows.toArray.sortBy(_.item).foreach { e =>
        n += 1
        val x = e.item
        if (buf.contains(x)) buf(x) += 1L
        else if (buf.size < k) buf(x) = 1L
        else {
          val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
          buf.foreachEntry { (key, c) =>
            if (c == 1L) dead += key else buf(key) = c - 1L
          }
          dead.foreach(buf.remove)
        }
      }
      val arr = buf.toArray.sortBy { case (item, est) => (-est, item) }
      state.update(St(n, arr.map(_._1), arr.map(_._2)))
      arr.iterator.map { case (item, est) => HH(key, item, est, n) }
    }
  }

  /** Update-mode stream: each micro-batch emits the full current
    * candidate list (≤ k rows) per touched series. Requires RocksDB. */
  def hitters(events: Dataset[Ev], k: Int = 16,
              ttl: java.time.Duration = null): Dataset[HH] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.event_type)
      .transformWithState(new Processor(k, ttl), mode, OutputMode.Update())
  }
}
