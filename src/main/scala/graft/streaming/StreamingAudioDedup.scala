package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import graft.llm.AudioOps

/** Streaming acoustic near-duplicate detection — the streaming twin of
  * [[graft.llm.AudioOps.audioFingerprint]]: clips arriving on a stream
  * are decoded through the REAL codec and fingerprinted with the EXACT
  * batch kernel ([[AudioOps.fpOfWav]] — same windows, same energy
  * deltas, so stream and batch fingerprints agree bit-for-bit), then a
  * keyed state per pigeonhole band bucket ([[AudioOps.fpBands]], the
  * batch join keys) remembers the bucket's first-seen clip. Any later
  * clip landing in an occupied bucket is reported as an acoustic
  * near-dup CANDIDATE of that first holder — the same candidate
  * criterion the batch miner verifies with Hamming distance, and for
  * Hamming ≤ 1 the 2-band pigeonhole makes a shared bucket certain, so
  * the stream can never miss a pair the batch pass would report.
  *
  * Scale shape (the [[StreamingNearDup]] discipline): the decode and
  * fingerprint run map-side (media bytes never shuffle — the exchange
  * carries (band, 8-bit key) hits); state is ONE long per occupied
  * bucket, bounded by the 2¹⁵ fingerprint domain per band and
  * optionally TTL'd so RocksDB holds only the active window.
  */
object StreamingAudioDedup {

  case class Clip(doc_id: Long, wav: Array[Byte])
  case class BandHit(key: String, doc_id: Long)
  /** doc_id collided with first_doc_id (the bucket's first holder). */
  case class DupEdge(doc_id: Long, first_doc_id: Long)

  class BandProcessor(ttl: Duration)
      extends StatefulProcessor[String, BandHit, DupEdge] {

    @transient private var holder: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      holder = getHandle.getValueState[Long]("holder", Encoders.scalaLong,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[BandHit],
                                 timers: TimerValues): Iterator[DupEdge] = {
      // same-batch determinism: the smallest doc_id claims a free
      // bucket (the batch miner's min_doc canonical pick)
      val ids = rows.map(_.doc_id).toArray.sorted
      val (first, dups) =
        if (holder.exists()) {
          if (ttl != null) holder.update(holder.get()) // keep-alive
          (holder.get(), ids)
        } else {
          holder.update(ids.head)
          (ids.head, ids.tail)
        }
      dups.iterator.filter(_ != first).map(DupEdge(_, first))
    }
  }

  /** Append-mode acoustic near-dup edge stream. A clip colliding with
    * the same holder in both bands may repeat an edge (the drop/verify
    * consumer is idempotent per (doc, holder); a global distinct would
    * add a shuffle plus unbounded dedup state for no semantic gain).
    * `ttl` bounds bucket state. Requires the RocksDB state store
    * provider. */
  def nearDups(clips: Dataset[Clip], ttl: Duration = null): Dataset[DupEdge] = {
    import clips.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    clips
      .mapPartitions(_.flatMap { c =>
        val fp = AudioOps.fpOfWav(c.wav)
        AudioOps.fpBands(fp).map { case (b, v) => BandHit(s"$b:$v", c.doc_id) }
      })
      .groupByKey(_.key)
      .transformWithState(new BandProcessor(ttl), mode, OutputMode.Append())
  }
}
