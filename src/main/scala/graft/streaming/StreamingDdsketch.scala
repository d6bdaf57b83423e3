package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode}

/** Streaming DDSketch — the streaming twin of
  * [[graft.telemetry.Telemetry.ddsketch]]: per-series log-√2 bucket
  * counts maintained INCREMENTALLY in a `MapState[idx → count]`, the
  * sketch's defining deployment mode (Masson et al. VLDB'19 built it
  * for agent-side streaming aggregation). The batch query re-scans all
  * events; the stream adds each value to its bucket in O(1) and keeps
  * ≤ ~64 longs per series forever — the same mergeable representation
  * the batch shuffle carries, so streamed state ≡ batch buckets
  * bit-for-bit over the same prefix (proven by spec).
  *
  * Each micro-batch emits the CURRENT quantile read-out (collapse to
  * `m` buckets + midpoint estimate) for every touched series — the
  * collapse is a VIEW over the full bucket map, not destructive state
  * surgery, so late mass in low buckets stays correct (batch-collapse
  * equivalence holds regardless of arrival order; destructive collapse
  * would be order-sensitive).
  *
  * State backend: MapState puts each bucket under its own state-store
  * key — RocksDB updates touch only the buckets a batch hits, not a
  * serialized whole-sketch blob (the ValueState alternative would
  * rewrite ~64 longs per event). */
object StreamingDdsketch {

  case class Ev(event_type: String, value: Double)
  case class Sketch(event_type: String, n: Long, n_buckets_raw: Long,
                    n_buckets_kept: Long, collapsed_n: Long, p50_est: Double,
                    p95_est: Double, p99_est: Double, max_idx: Long)

  /** Collapse + midpoint read-out over a bucket map — delegates to the
    * shared [[graft.functions.DdsketchKernel]], the same math the
    * native `ddsketch_agg` and the relational query run. */
  def readOut(key: String, bm: Map[Long, Long], m: Int): Sketch = {
    val s = graft.functions.DdsketchKernel.readOut(bm, m)
    Sketch(key, s.n, s.nBucketsRaw, s.nBucketsKept, s.collapsedN,
      s.p50, s.p95, s.p99, s.maxIdx)
  }

  class Processor(m: Int = 12, ttl: java.time.Duration = null)
      extends StatefulProcessor[String, Ev, Sketch] {

    @transient private var buckets: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buckets = getHandle.getMapState[Long, Long]("dd",
        Encoders.scalaLong, Encoders.scalaLong,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Ev],
                                 timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Sketch] = {
      var touched = false
      rows.foreach { e =>
        if (e.value > 0) {
          val i = graft.functions.DdsketchKernel.bucketIdx(e.value)
          val cur = if (buckets.containsKey(i)) buckets.getValue(i) else 0L
          buckets.updateValue(i, cur + 1L)
          touched = true
        }
      }
      if (!touched) Iterator.empty
      else {
        val bm = {
          val it = buckets.iterator()
          val b = Map.newBuilder[Long, Long]
          while (it.hasNext) { val kv = it.next(); b += kv._1 -> kv._2 }
          b.result()
        }
        Iterator.single(readOut(key, bm, m))
      }
    }
  }

  /** Update-mode stream of per-series sketches: each micro-batch emits
    * the current quantile read-out for every series it touched.
    * Requires RocksDB state store (transformWithState backend). */
  def sketches(events: Dataset[Ev], m: Int = 12,
               ttl: java.time.Duration = null): Dataset[Sketch] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.event_type)
      .transformWithState(new Processor(m, ttl), mode, OutputMode.Update())
  }
}
