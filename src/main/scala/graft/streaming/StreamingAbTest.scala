package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, ValueState}

/** Streaming A/B monitoring — the streaming twin of
  * [[graft.telemetry.Telemetry.abTest]]: per-experiment Welch t-test
  * maintained INCREMENTALLY from the six sufficient statistics
  * `(n, Σv100, Σv100²)` per arm — the same statistics the batch
  * aggregate computes, so after any prefix the streamed read-out is
  * IDENTICAL to the batch query over the same events (spec-proven).
  * This is the "peeking" dashboard every experimentation platform
  * ships: the t-trajectory after each micro-batch, with the fixed
  * 1.96 gate (sequential-testing corrections are a read-out concern —
  * the sufficient statistics carry any of them).
  *
  * State: 4 longs + 2 doubles per experiment forever. n and Σv100 are
  * integer counters; Σv100² accumulates IN DOUBLE exactly as the batch
  * twin does (integer-valued terms, exact — hence order- and
  * batch-boundary-independent — until the sum crosses 2⁵³, then
  * correctly-rounded instead of the silent int64 wrap a long
  * accumulator would hit; contrast with [[StreamingHeavyHitters]]
  * where order-dependence had to be pinned down). */
object StreamingAbTest {

  case class Ev(event_type: String, arm: Int, v100: Long)
  case class Read(event_type: String, n_a: Long, n_b: Long, mean_a: Double,
                  mean_b: Double, t_stat: Double, significant: Boolean)

  case class St(nA: Long, nB: Long, sA: Long, sB: Long, qA: Double, qB: Double)

  /** The identical IEEE sequence as the batch query's derived columns. */
  def readOut(key: String, s: St): Read = {
    val va = (s.qA - s.sA.toDouble * s.sA.toDouble / s.nA) / (s.nA - 1)
    val vb = (s.qB - s.sB.toDouble * s.sB.toDouble / s.nB) / (s.nB - 1)
    val varTerm = va / s.nA + vb / s.nB
    val t = (s.sA.toDouble / s.nA - s.sB.toDouble / s.nB) / math.sqrt(varTerm)
    Read(key, s.nA, s.nB, s.sA.toDouble / s.nA / 100,
      s.sB.toDouble / s.nB / 100, t, math.abs(t) > 1.96)
  }

  class Processor(ttl: java.time.Duration = null)
      extends StatefulProcessor[String, Ev, Read] {

    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[St]("ab", Encoders.product[St],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Ev],
                                 timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Read] = {
      var s = if (state.exists()) state.get() else St(0, 0, 0, 0, 0, 0)
      rows.foreach { e =>
        if (e.arm == 0)
          s = s.copy(nA = s.nA + 1, sA = s.sA + e.v100,
            qA = s.qA + e.v100.toDouble * e.v100.toDouble)
        else
          s = s.copy(nB = s.nB + 1, sB = s.sB + e.v100,
            qB = s.qB + e.v100.toDouble * e.v100.toDouble)
      }
      state.update(s)
      // a t read-out needs ≥2 samples per arm for the variances
      if (s.nA < 2 || s.nB < 2) Iterator.empty
      else Iterator.single(readOut(key, s))
    }
  }

  /** Update-mode stream of per-experiment test read-outs. Requires
    * RocksDB (transformWithState backend). */
  def reads(events: Dataset[Ev],
            ttl: java.time.Duration = null): Dataset[Read] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.event_type)
      .transformWithState(new Processor(ttl), mode, OutputMode.Update())
  }
}
