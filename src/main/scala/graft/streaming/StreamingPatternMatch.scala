package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming sequence-pattern detection — the streaming twin of
  * [[graft.telemetry.Telemetry.patternMatch]] and the Flink-CEP shape
  * on Structured Streaming: per-user behavioral patterns detected
  * INCREMENTALLY with O(1) state per key, where the batch query holds
  * the user's whole ordered history.
  *
  * The three patterns compile to tiny deterministic automata whose
  * non-overlapping-count semantics equal the batch regex counts:
  *  - `vcp` (adjacent conversion): progress pointer 0→1→2, complete →
  *    count++ and reset; a mismatching char falls back to 1 if it
  *    restarts the pattern, else 0. The pattern's letters are distinct,
  *    so this literal-KMP is exact.
  *  - `v[^p]*p` (gap-tolerant conversion): one ARMED bit — `v` arms,
  *    `p` while armed counts and disarms ( `[^p]*` can never cross a
  *    `p`, which is what makes the greedy scan incremental).
  *  - `ee` (repeated failure): same progress automaton with fallback
  *    (an `e` that completes a match cannot also start the next — the
  *    regex scan resumes AFTER the match).
  *
  * This is the state-size argument for streaming analytics at 100 TB:
  * the batch twin's per-user payload grows with history; the stream
  * holds 7 longs per user, forever, with declarative TTL for idle
  * users.
  *
  * Ordering contract: rows are sorted by (ts, event_id) WITHIN each
  * micro-batch; across batches the caller replays in event-time order
  * (the spec's chronological-split harness — in production the
  * watermark + ordered replay from the durable spool provide this, the
  * same contract as [[StreamingSessions]]).
  */
object StreamingPatternMatch {

  case class Ev(user_id: Long, ts: Long, event_id: Long, event_type: String)
  case class PatternCounts(user_id: Long, n_events: Long, n_vcp: Long,
                           n_view_to_purchase: Long, n_double_error: Long)

  /** (n_events, vcpCount, vcpProgress, vpCount, armed, eeCount, eeProgress) */
  private[graft] type St = (Long, Long, Int, Long, Boolean, Long, Int)

  private val zero: St = (0L, 0L, 0, 0L, false, 0L, 0)

  /** One character through all three automata — the exact step the
    * scaladoc describes; shared by every row so stream and batch can
    * only diverge if the automaton itself is wrong (the spec's batch
    * equivalence rules that out). */
  private[graft] def step(s: St, c: Char): St = {
    var (n, vcpN, vcpP, vpN, armed, eeN, eeP) = s
    n += 1
    // vcp: literal progress with restart-on-v fallback
    vcpP = c match {
      case 'v' => 1
      case 'c' if vcpP == 1 => 2
      case 'p' if vcpP == 2 => 3
      case _ => 0
    }
    if (vcpP == 3) { vcpN += 1; vcpP = 0 }
    // v[^p]*p: armed bit
    if (c == 'v' && !armed) armed = true
    else if (c == 'p' && armed) { vpN += 1; armed = false }
    // ee: progress with the completed char consumed
    eeP = if (c == 'e') eeP + 1 else 0
    if (eeP == 2) { eeN += 1; eeP = 0 }
    (n, vcpN, vcpP, vpN, armed, eeN, eeP)
  }

  class PatternProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Ev, PatternCounts] {

    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[St]("pattern",
        Encoders.product[St],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[PatternCounts] = {
      var s = if (state.exists()) state.get() else zero
      rows.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        s = step(s, e.event_type.charAt(0))
      }
      state.update(s)
      Iterator.single(PatternCounts(userId, s._1, s._2, s._4, s._6))
    }
  }

  /** Update-mode stream of per-user pattern counters: each micro-batch
    * emits the CURRENT totals for every user it touched. Requires the
    * RocksDB state store provider. */
  def patternCounts(events: Dataset[Ev],
                    ttl: java.time.Duration = null): Dataset[PatternCounts] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)
      .transformWithState(new PatternProcessor(ttl), mode, OutputMode.Update())
  }
}
