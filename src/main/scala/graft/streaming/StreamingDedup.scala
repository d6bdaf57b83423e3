package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming EXACT deduplication — the streaming twin of
  * [[graft.llm.TextOps]]' `dedup_exact` (hash-groupBy, smallest doc_id
  * canonical): an append-mode stream of FIRST-SEEN documents, keyed by
  * content md5. A duplicate arriving in the same micro-batch loses to
  * the smallest doc_id (the batch twin's canonical pick); a duplicate
  * arriving ANY number of batches later is dropped by the keyed state.
  * This is the continuous-ingest dedup a training-data pipeline runs in
  * front of its corpus store — at-least-once upstream delivery becomes
  * exactly-once corpus membership.
  *
  * State is ONE long per distinct content hash (the canonical doc_id),
  * via `transformWithState` ValueState with declarative TTL — RocksDB
  * expires idle hashes itself, so state is bounded by the distinct
  * corpus within the TTL window (pass null to keep hashes forever:
  * exact global dedup, state ∝ distinct docs — at 100 TB pair with the
  * batch reconcile for the long tail). One shuffle, on the hash key. */
object StreamingDedup {

  case class Doc(doc_id: Long, text: String)
  case class Kept(content_md5: String, doc_id: Long, n_chars: Long)

  private[graft] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  class DedupProcessor(ttl: Duration)
      extends StatefulProcessor[String, Doc, Kept] {

    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(hash: String, rows: Iterator[Doc],
                                 timers: TimerValues): Iterator[Kept] =
      if (seen.exists()) {
        // duplicate traffic on a live hash: refresh a configured TTL
        // (same keep-alive reasoning as StreamingLatest — a hash seeing
        // only duplicates must not expire and readmit the content)
        if (ttl != null) seen.update(seen.get())
        Iterator.empty
      } else {
        val first = rows.minBy(_.doc_id)
        seen.update(first.doc_id)
        Iterator.single(Kept(md5Hex(first.text), first.doc_id,
          first.text.length.toLong))
      }
  }

  /** Append-mode first-seen stream. `ttl` bounds state (processing-time
    * TTL; null = dedup forever). Requires the RocksDB state store
    * provider. TimeMode follows the TTL choice for the same reason as
    * [[StreamingLatest.latestView]]. */
  def dedupStream(docs: Dataset[Doc],
                  ttl: Duration = null): Dataset[Kept] = {
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[Kept] = Encoders.product[Kept]
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    docs
      .groupByKey(d => md5Hex(d.text))
      .transformWithState(new DedupProcessor(ttl), mode, OutputMode.Append())
  }
}
