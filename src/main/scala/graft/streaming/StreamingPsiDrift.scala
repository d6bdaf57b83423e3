package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, ValueState}

/** Streaming PSI drift detection — the streaming twin of
  * [[graft.telemetry.Telemetry.psiDrift]], in the shape production
  * drift monitors actually run: the REFERENCE distribution is frozen
  * from the first `warmN` values per series (the "training window"),
  * every later value accumulates into the CURRENT distribution, and
  * each micro-batch emits the PSI of current-so-far vs reference with
  * the 0.2 alarm. The batch query's midpoint split is a backtest; this
  * is the live monitor over the same integer-micro term math
  * (Laplace-smoothed, ln-round-4, integer sum — bit-replayable).
  *
  * State: two ≤64-entry bucket histograms per series (the ddsketch
  * log-√2 grid — drift detection composes with the sketch the
  * pipeline already keeps) — bounded regardless of stream length.
  *
  * Determinism: the warm-up cut decides WHICH events freeze into the
  * reference, and Spark does not guarantee a micro-batch's per-key
  * iterator order across partitions/reruns — so each event carries a
  * `seq` (event time / ingest sequence) and every batch is processed
  * in ascending `seq` (the [[StreamingHeavyHitters]] discipline): two
  * runs over the same input freeze the same reference histogram.
  * Batch BOUNDARIES still matter only in the one inherent way — an
  * already-committed batch cannot admit later-seq'd stragglers into
  * the warm-up — which is the at-arrival semantics every live monitor
  * has. */
object StreamingPsiDrift {

  case class Ev(event_type: String, seq: Long, value: Double)
  case class Drift(event_type: String, n_ref: Long, n_cur: Long,
                   n_bins: Long, psi: Double, drifted: Boolean)

  case class St(nRef: Long, nCur: Long,
                refIdx: Array[Long], refCnt: Array[Long],
                curIdx: Array[Long], curCnt: Array[Long])

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The batch query's term math verbatim: per-bin integer micro term,
    * summed exactly. */
  def psiOf(ref: Map[Long, Long], cur: Map[Long, Long],
            nRef: Long, nCur: Long): (Long, Double) = {
    val bins = (ref.keySet ++ cur.keySet).toSeq.sorted
    val nb = bins.size.toLong
    val termsMicro = bins.map { b =>
      val cRef = ref.getOrElse(b, 0L)
      val cCur = cur.getOrElse(b, 0L)
      val lnr = round4(math.log(
        ((cRef + 1) * (nCur + nb)).toDouble / ((cCur + 1) * (nRef + nb)).toDouble))
      val pdiff = (cRef + 1).toDouble / (nRef + nb) -
        (cCur + 1).toDouble / (nCur + nb)
      BigDecimal(1e6 * pdiff * lnr)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    (nb, termsMicro.sum.toDouble / 1e6)
  }

  class Processor(warmN: Long, alarm: Double = 0.2,
                  ttl: java.time.Duration = null)
      extends StatefulProcessor[String, Ev, Drift] {

    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[St]("psi", Encoders.product[St],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Ev],
                                 timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Drift] = {
      val s0 = if (state.exists()) state.get()
               else St(0L, 0L, Array.empty, Array.empty, Array.empty, Array.empty)
      val ref = scala.collection.mutable.Map.empty[Long, Long]
      s0.refIdx.indices.foreach(i => ref(s0.refIdx(i)) = s0.refCnt(i))
      val cur = scala.collection.mutable.Map.empty[Long, Long]
      s0.curIdx.indices.foreach(i => cur(s0.curIdx(i)) = s0.curCnt(i))
      var nRef = s0.nRef
      var nCur = s0.nCur
      rows.toArray.sortBy(_.seq).foreach { e =>
        if (e.value > 0) {
          val b = graft.functions.DdsketchKernel.bucketIdx(e.value)
          if (nRef < warmN) { ref(b) = ref.getOrElse(b, 0L) + 1; nRef += 1 }
          else { cur(b) = cur.getOrElse(b, 0L) + 1; nCur += 1 }
        }
      }
      val refA = ref.toArray.sortBy(_._1)
      val curA = cur.toArray.sortBy(_._1)
      state.update(St(nRef, nCur, refA.map(_._1), refA.map(_._2),
        curA.map(_._1), curA.map(_._2)))
      if (nRef < warmN || nCur < 2) Iterator.empty
      else {
        val (nb, psi) = psiOf(ref.toMap, cur.toMap, nRef, nCur)
        Iterator.single(Drift(key, nRef, nCur, nb, psi, psi >= alarm))
      }
    }
  }

  /** Update-mode stream of per-series drift read-outs. RocksDB. */
  def drifts(events: Dataset[Ev], warmN: Long,
             ttl: java.time.Duration = null): Dataset[Drift] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.event_type)
      .transformWithState(new Processor(warmN, ttl = ttl), mode,
        OutputMode.Update())
  }
}
