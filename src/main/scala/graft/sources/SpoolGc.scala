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
  * Scale: the sweep is metadata-only (log read + directory listing +
  * deletes) and runs wherever maintenance jobs run; spool directories
  * are flat and bounded by the backpressure cap itself. */
object SpoolGc {

  /** Canonical form both sides compare under: the URI path with any
    * scheme stripped (the source log records `file:/...` URIs, the
    * spool walk yields local paths). */
  private def canon(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Files the consuming stream has committed, read from the
    * checkpoint's file-source metadata log. Absent/empty checkpoint →
    * empty set (nothing is safe to delete). */
  def processedFiles(checkpoint: String, sourceId: Int = 0): Set[String] = {
    val logDir = Paths.get(checkpoint, "sources", sourceId.toString)
    if (!Files.isDirectory(logDir)) return Set.empty
    val entries = scala.collection.mutable.Set.empty[String]
    // log batch files are named `<n>` or `<n>.compact`; skip everything
    // else (Hadoop's local-FS `.crc` siblings are binary)
    val batchName = """\d+(\.compact)?""".r
    val it = Files.newDirectoryStream(logDir)
    try it.forEach { f: Path =>
      if (Files.isRegularFile(f) &&
          batchName.pattern.matcher(f.getFileName.toString).matches()) {
        val lines = Files.readAllLines(f)
        lines.forEach { line =>
          if (line.startsWith("{")) {
            (parse(line) \ "path").toOption.collect {
              case JString(p) => entries += canon(p)
            }
            ()
          }
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
