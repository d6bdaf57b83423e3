package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming Holt-Winters — the streaming twin of
  * [[graft.telemetry.Telemetry.holtWinters]]: per-series additive
  * triple exponential smoothing maintained INCREMENTALLY. The batch
  * query re-folds the whole gap-filled hourly grid; the stream closes
  * one hour at a time and keeps only (level, trend, p seasonals) —
  * 2+p doubles per series forever, the state-size argument that makes
  * continuous forecasting viable over unbounded telemetry.
  *
  * Hour bookkeeping: state tracks the OPEN hour and its running count;
  * an event in a later hour closes every hour in between (gap hours
  * close as 0 — the stream performs the batch twin's gap-fill on the
  * fly). The first 2p closed hours buffer for initialization
  * (l₀ = mean of the first p, b₀ = (mean of the second p − l₀)/p,
  * sᵢ = xᵢ − l₀), after which the second p values fold through the
  * model — EXACTLY the batch trajectory, so the streamed model state
  * is bit-identical to the batch fold over the same closed hours
  * (proven by spec). Events before the open hour (late arrivals) are
  * dropped — the watermark/ordered-replay contract shared with
  * [[StreamingPatternMatch]].
  *
  * `startHour` anchors the grid origin (the retention-window start in
  * production; the batch twin's global min hour in the spec) so
  * series that begin late carry their leading zero hours. */
object StreamingHoltWinters {

  case class Ev(event_type: String, ts: Long)
  case class Forecast(event_type: String, n_hours: Long, level: Double,
                      trend: Double, s_next: Double, forecast: Double)

  /** lastHour = the currently-OPEN hour; model = [l, b, s₁..s_p]
    * (empty until 2p hours have closed); warm = first closed values. */
  case class St(lastHour: Long, curCount: Long, nClosed: Long,
                warm: Array[Double], model: Array[Double])

  class Processor(period: Int, startHour: Long,
                  alpha: Double = 0.3, beta: Double = 0.1,
                  gamma: Double = 0.2, ttl: java.time.Duration = null)
      extends StatefulProcessor[String, Ev, Forecast] {

    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[St]("hw", Encoders.product[St],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    private val p = period

    /** One fold step — the identical IEEE op sequence as the batch
      * aggregate expression (and its proven Scala replica). */
    private def foldStep(m: Array[Double], x: Double): Array[Double] = {
      val l = (x - m(2)) * alpha + (m(0) + m(1)) * (1.0 - alpha)
      val b = (l - m(0)) * beta + m(1) * (1.0 - beta)
      val s = (x - l) * gamma + m(2) * (1.0 - gamma)
      Array(l, b) ++ m.slice(3, 2 + p) ++ Array(s)
    }

    private def meanOf(a: Array[Double], from: Int): Double = {
      var s = 0.0
      var i = from
      while (i < from + p) { s += a(i); i += 1 }
      s / p
    }

    /** Close one hour with value x: buffer during warm-up, initialize
      * at 2p (then fold the second p through the fresh model — the
      * batch fold starts at x_{p+1}), fold directly afterwards. */
    private def close(s: St, x: Double): St =
      if (s.model.nonEmpty)
        s.copy(nClosed = s.nClosed + 1, model = foldStep(s.model, x))
      else {
        val warm = s.warm :+ x
        if (warm.length < 2 * p) s.copy(nClosed = s.nClosed + 1, warm = warm)
        else {
          val l0 = meanOf(warm, 0)
          val b0 = (meanOf(warm, p) - l0) / p
          var m = Array(l0, b0) ++ warm.take(p).map(_ - l0)
          var i = p
          while (i < 2 * p) { m = foldStep(m, warm(i)); i += 1 }
          St(s.lastHour, s.curCount, s.nClosed + 1, Array.empty, m)
        }
      }

    override def handleInputRows(key: String, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[Forecast] = {
      var s = if (state.exists()) state.get()
              else St(startHour, 0L, 0L, Array.empty, Array.empty)
      rows.toArray.sortBy(_.ts).foreach { e =>
        val h = Math.floorDiv(e.ts, 3600000000L)
        if (h >= s.lastHour) {
          while (s.lastHour < h) {
            s = close(s, s.curCount.toDouble)
              .copy(lastHour = s.lastHour + 1, curCount = 0L)
          }
          s = s.copy(curCount = s.curCount + 1)
        } // else: late event past the open hour — dropped (watermark contract)
      }
      state.update(s)
      if (s.model.isEmpty) Iterator.empty
      else Iterator.single(Forecast(key, s.nClosed, s.model(0), s.model(1),
        s.model(2), s.model(0) + s.model(1) + s.model(2)))
    }
  }

  /** Update-mode stream of per-series model states: each micro-batch
    * emits the current (level, trend, next-season, forecast) for every
    * initialized series it touched. Requires RocksDB state store. */
  def forecasts(events: Dataset[Ev], period: Int, startHour: Long,
                ttl: java.time.Duration = null): Dataset[Forecast] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.event_type)
      .transformWithState(new Processor(period, startHour, ttl = ttl),
        mode, OutputMode.Update())
  }
}
