package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

import graft.llm.Dedup

/** Streaming NEAR-duplicate detection — the streaming twin of
  * [[graft.llm.Dedup.minhashLsh]]: documents arriving on a stream are
  * MinHash-banded with the EXACT batch band computation
  * ([[graft.llm.Dedup.bandsOfText]] — same shingles, permutations, and
  * band keys, so stream and batch agree bit-for-bit), and a keyed state
  * per LSH band bucket remembers the bucket's first-seen document. Any
  * later document landing in an occupied bucket is reported as a
  * near-duplicate of that first holder — the continuous-curation
  * front-door that keeps boilerplate out of a training corpus without
  * waiting for the nightly batch LSH pass.
  *
  * Semantics: a reported edge means "collides with the bucket holder in
  * ≥1 of 16 bands" — the same candidate criterion the batch pass
  * verifies with exact Jaccard; downstream either drops on sight
  * (recall-biased) or verifies against the stored holder text
  * (precision-biased), both standard.
  *
  * Scale shape: one shuffle, keyed by band hash (uniform md5 keys — no
  * skew); state is ONE long per occupied bucket with declarative TTL so
  * RocksDB bounds it to the active window; the 64-perm MinHash runs
  * map-side in the same JIT'd kernel as batch. A doc colliding in k
  * bands emits ≤k edges — `nearDups` collapses them to the smallest
  * holder per doc within the batch output.
  */
object StreamingNearDup {

  case class Doc(doc_id: Long, text: String)
  case class BandHit(band: String, doc_id: Long)
  /** doc_id collided with first_doc_id (the bucket's first holder). */
  case class DupEdge(doc_id: Long, first_doc_id: Long)

  class BandProcessor(ttl: Duration)
      extends StatefulProcessor[String, BandHit, DupEdge] {

    @transient private var holder: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      holder = getHandle.getValueState[Long]("holder", Encoders.scalaLong,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(band: String, rows: Iterator[BandHit],
                                 timers: TimerValues): Iterator[DupEdge] = {
      // same-batch determinism: the smallest doc_id claims a free bucket
      // (the batch pass's canonical pick), everyone else is an edge
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

  /** Append-mode near-dup edge stream. A doc colliding with the same
    * holder through several bands (possibly across batches) may repeat
    * an edge — the drop/verify consumer is idempotent per (doc, holder),
    * so edges are NOT deduplicated here: a global distinct would mean a
    * second shuffle plus unbounded dedup state for no semantic gain.
    * `ttl` bounds bucket state (null = remember forever). Requires the
    * RocksDB state store provider. */
  def nearDups(docs: Dataset[Doc], ttl: Duration = null): Dataset[DupEdge] = {
    import docs.sparkSession.implicits._
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    docs
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { d =>
          Dedup.bandsOfText(md, d.text).distinct.map(BandHit(_, d.doc_id))
        }
      }
      .groupByKey(_.band)
      .transformWithState(new BandProcessor(ttl), mode, OutputMode.Append())
  }
}
