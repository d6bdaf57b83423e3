package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods.parse

/** Spool GARBAGE COLLECTION — the drain half of the receivers'
  * bounded-queue story. [[SpoolLimits]] makes a stalled downstream
  * shed instead of filling the disk; this sweeps the other direction:
  * once the consuming stream has COMMITTED a spool file (it is in the
  * checkpoint's file-source metadata log — the same exactly-once
  * ledger the source resumes from), the spool copy is dead weight and
  * can be deleted, re-opening admission. Together they give the
  * reference's `sending_queue` lifecycle (config.go:25-27): bounded,
  * shedding when full, draining as the consumer makes progress.
  *
  * Reading the source log (not just "delete old files") means a file
  * the stream has NOT yet processed is never deleted — at-least-once
  * survives any GC schedule. The log's on-disk shape is the file
  * source's public checkpoint format: `<checkpoint>/sources/<id>/<batch>`
  * text files, a `v1` version header then one JSON entry per line
  * with the file's `path`. Compaction suffixes (`N.compact`) hold the
  * full history and parse identically.
  *
  * COMMIT-gated: the source log entry for batch N is written at
  * batch-PLANNING time (`latestOffset`), before the batch executes —
  * a file can sit in `sources/<id>/N` while the batch that reads it is
  * still in flight (or will be replayed after a crash). Deleting it
  * then would make the replay fail, so the sweep first reads the
  * checkpoint's `commits/` log (written only after a batch completes)
  * and collects paths only from source-log batches `<= lastCommitted`.
  * A compact file `N.compact` folds the history of every batch
  * `<= N` without per-line batch ids, so it is used only when
  * `N <= lastCommitted`; otherwise the sweep falls back to the plain
  * per-batch files that are committed (under-deleting, never
  * over-deleting — the leftovers drain on the next sweep once the
  * commit lands).
  *
  * Scale: the sweep is metadata-only (log read + directory listing +
  * deletes) and runs wherever maintenance jobs run; spool directories
  * are flat and bounded by the backpressure cap itself. */
/** When a receiver should run [[SpoolGc]] on its own — parity with the
  * reference deployment's `file_storage` compaction triggers
  * (`/root/reference/example/otel-config.yaml:8-15`: `on_start: true`,
  * `on_rebound: true` with a threshold): sweep once at receiver start
  * (adopt + drain a prior incarnation's backlog) and again whenever the
  * gauge crosses `reboundFraction` of its configured limit, so a capped
  * spool drains as the consumer commits without any manual
  * `sweepSpool` call. `checkpoint` is the consuming stream's
  * checkpoint location (the commit ledger the sweep is gated on). */
final case class SpoolGcTriggers(checkpoint: String,
                                 onStart: Boolean = true,
                                 reboundFraction: Double = 0.8) {
  require(reboundFraction > 0.0 && reboundFraction <= 1.0,
    s"reboundFraction must be in (0, 1] (got $reboundFraction)")
}

/** Receiver-side auto-GC: single-flight wrapper the receivers call on
  * start and around every admission decision. The sweep is metadata
  * only (commit-log read + bounded directory walk), so running it
  * inline on the admission path is cheap; `inFlight` keeps concurrent
  * handlers from stampeding it. */
final class SpoolAutoGc(triggers: SpoolGcTriggers, spoolDir: String,
                        gauge: SpoolGauge) {
  private val inFlight = new java.util.concurrent.atomic.AtomicBoolean(false)

  def sweepOnStart(): Unit =
    if (triggers.onStart) {
      SpoolGc.sweepSpool(triggers.checkpoint, spoolDir, Some(gauge))
      ()
    }

  /** Sweep iff the gauge sits at or above the rebound threshold on
    * either axis (bytes or files) of a BOUNDED limit. */
  def maybeRebound(): Unit = {
    val l = gauge.limits
    if (!l.bounded) return
    val over =
      (l.maxBytes != Long.MaxValue &&
        gauge.currentBytes.toDouble >= l.maxBytes * triggers.reboundFraction) ||
      (l.maxFiles != Long.MaxValue &&
        gauge.currentFiles.toDouble >= l.maxFiles * triggers.reboundFraction)
    if (over && inFlight.compareAndSet(false, true))
      try { SpoolGc.sweepSpool(triggers.checkpoint, spoolDir, Some(gauge)); () }
      finally inFlight.set(false)
  }
}

object SpoolGc {

  /** Canonical form both sides compare under: the URI path with any
    * scheme stripped (the source log records `file:/...` URIs, the
    * spool walk yields local paths). */
  private def canon(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Highest batch id in the checkpoint's `commits/` log — the last
    * micro-batch that finished END TO END (offset logs are written at
    * planning time; the commit log only after execution). None when no
    * batch has committed. */
  def lastCommittedBatch(checkpoint: String): Option[Long] = {
    val commits = Paths.get(checkpoint, "commits")
    if (!Files.isDirectory(commits)) return None
    var max = -1L
    val it = Files.newDirectoryStream(commits)
    try it.forEach { f: Path =>
      val name = f.getFileName.toString
      if (Files.isRegularFile(f) && name.forall(_.isDigit)) {
        val b = name.toLong
        if (b > max) max = b
      }
    } finally it.close()
    if (max < 0) None else Some(max)
  }

  /** Files the consuming stream has COMMITTED — read from the
    * checkpoint's file-source metadata log, restricted to batches the
    * `commits/` log proves complete. Absent/empty checkpoint, or no
    * committed batch yet → empty set (nothing is safe to delete). */
  def processedFiles(checkpoint: String, sourceId: Int = 0): Set[String] = {
    val logDir = Paths.get(checkpoint, "sources", sourceId.toString)
    if (!Files.isDirectory(logDir)) return Set.empty
    val committed = lastCommittedBatch(checkpoint).getOrElse(return Set.empty)
    val entries = scala.collection.mutable.Set.empty[String]
    // log batch files are named `<n>` or `<n>.compact`; skip everything
    // else (Hadoop's local-FS `.crc` siblings are binary). A compact at
    // batch n folds every batch <= n, so its entries are committed only
    // when n itself is; a plain batch file is committed iff n is.
    val batchName = """(\d+)(\.compact)?""".r
    val it = Files.newDirectoryStream(logDir)
    try it.forEach { f: Path =>
      if (Files.isRegularFile(f)) {
        f.getFileName.toString match {
          case batchName(n, _) if n.toLong <= committed =>
            val lines = Files.readAllLines(f)
            lines.forEach { line =>
              if (line.startsWith("{")) {
                (parse(line) \ "path").toOption.collect {
                  case JString(p) => entries += canon(p)
                }
                ()
              }
            }
          case _ => ()
        }
      }
    } finally it.close()
    entries.toSet
  }

  /** Delete spool files already committed by the consuming stream and
    * refresh `gauge` so admission re-opens immediately (without it,
    * the gauge's periodic rescan picks the drain up within its
    * interval). Returns (filesDeleted, bytesFreed). `spoolDirs` are
    * the signal subdirectories to sweep (e.g.
    * `Seq("<spool>/traces", "<spool>/logs")`). */
  def sweep(checkpoint: String, spoolDirs: Seq[String],
            gauge: Option[SpoolGauge] = None): (Long, Long) = {
    val done = processedFiles(checkpoint)
    if (done.isEmpty) return (0L, 0L)
    var n = 0L
    var bytes = 0L
    spoolDirs.foreach { d =>
      val dir = Paths.get(d)
      if (Files.isDirectory(dir)) {
        val it = Files.newDirectoryStream(dir)
        try it.forEach { f: Path =>
          if (Files.isRegularFile(f) && done(canon(f.toString))) {
            val sz = Files.size(f)
            Files.delete(f)
            n += 1
            bytes += sz
          }
        } finally it.close()
      }
    }
    gauge.foreach(_.refresh())
    (n, bytes)
  }

  /** Convenience: sweep every signal subdirectory of a receiver spool
    * root (the layout both OTLP receivers write). */
  def sweepSpool(checkpoint: String, spoolDir: String,
                 gauge: Option[SpoolGauge] = None): (Long, Long) = {
    val root = Paths.get(spoolDir)
    val dirs =
      if (!Files.isDirectory(root)) Nil
      else {
        val b = Seq.newBuilder[String]
        val it = Files.newDirectoryStream(root)
        try it.forEach { f: Path =>
          if (Files.isDirectory(f) && f.getFileName.toString != ".inflight")
            b += f.toString
        } finally it.close()
        b.result()
      }
    sweep(checkpoint, dirs, gauge)
  }
}
