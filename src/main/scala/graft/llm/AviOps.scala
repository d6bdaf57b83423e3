package graft.llm

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** MJPEG-in-AVI — a video CONTAINER a crawler actually yields (r13;
  * the GIF arm of [[ImageOps.videoSceneCuts]] proves the pipeline on a
  * stock demux, but real video corpora arrive as RIFF containers).
  * Both sides are hand-rolled from the PUBLIC RIFF/AVI spec — the same
  * discipline as the WAV reader in [[AudioOps]], RIFF one level
  * deeper: the WRITER emits `RIFF('AVI ')` with the canonical
  * `LIST(hdrl){avih, LIST(strl){strh('vids'/'MJPG'), strf}}` header
  * and a `LIST(movi)` of `00dc` chunks, each chunk one complete
  * baseline JFIF frame from [[JpegOps.writeGrayJpeg]]; the DEMUXER
  * walks RIFF chunks (little-endian sizes, even padding) collecting
  * `00dc` payloads and hands each to the stock `ImageIO` JPEG decoder.
  *
  * Exactness chain: frame f's 64 block values are the SAME analytic
  * plane the GIF fixture paints as pixels
  * ([[ImageOps.videoPixelsFor]]); the constant-block JPEG decodes
  * losslessly (see [[JpegOps]]), the 8×8 block-mean downsample lands
  * exactly on that plane, so frame-pair SADs — and therefore the
  * scene-cut verdicts — are IDENTICAL to `mm_video_scenecut`'s and
  * share its codec-free DuckDB oracle.
  *
  * Scale shape: container bytes never shuffle — demux, decode,
  * downsample, SAD are one narrow executor-side pass; one row per
  * frame transition leaves the executor. */
object AviOps {

  private val FW = 64
  private val FH = 64
  private val Fps = 10

  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def fourcc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** One chunk: fourcc, LE size, payload, even padding (RIFF rule). */
  private def chunk(out: ByteArrayOutputStream, id: String,
                    payload: Array[Byte]): Unit = {
    fourcc(out, id); u32(out, payload.length.toLong)
    out.write(payload)
    if (payload.length % 2 == 1) out.write(0)
  }

  private def list(out: ByteArrayOutputStream, kind: String,
                   body: Array[Byte]): Unit = {
    fourcc(out, "LIST"); u32(out, (body.length + 4).toLong)
    fourcc(out, kind); out.write(body)
  }

  /** A complete RIFF/AVI container holding `frames` MJPEG frames. */
  private[graft] def writeAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val usecPerFrame = 1000000L / Fps
    val maxBytes = frames.map(_.length).max.toLong

    val avih = new ByteArrayOutputStream() // 56-byte main header
    u32(avih, usecPerFrame); u32(avih, maxBytes * Fps); u32(avih, 0)
    u32(avih, 0x10) // AVIF_HASINDEX
    u32(avih, frames.size.toLong); u32(avih, 0); u32(avih, 1)
    u32(avih, maxBytes); u32(avih, FW.toLong); u32(avih, FH.toLong)
    (0 until 4).foreach(_ => u32(avih, 0)) // reserved

    val strh = new ByteArrayOutputStream() // 56-byte stream header
    fourcc(strh, "vids"); fourcc(strh, "MJPG")
    u32(strh, 0); u32(strh, 0); u32(strh, 0)
    u32(strh, 1); u32(strh, Fps.toLong) // scale/rate = 1/fps
    u32(strh, 0); u32(strh, frames.size.toLong); u32(strh, maxBytes)
    u32(strh, 0xffffffffL); u32(strh, 0) // quality -1, samplesize 0
    u32(strh, 0); u32(strh, (FW.toLong << 16) | FH.toLong) // rcFrame

    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    u32(strf, 40); u32(strf, FW.toLong); u32(strf, FH.toLong)
    strf.write(1); strf.write(0) // planes = 1
    strf.write(24); strf.write(0) // bit count
    fourcc(strf, "MJPG") // biCompression
    u32(strf, FW.toLong * FH * 3); u32(strf, 0); u32(strf, 0)
    u32(strf, 0); u32(strf, 0)

    val strl = new ByteArrayOutputStream()
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)
    val hdrlBody = new ByteArrayOutputStream()
    chunk(hdrlBody, "avih", avih.toByteArray)
    list(hdrlBody, "strl", strl.toByteArray)

    val moviBody = new ByteArrayOutputStream()
    val offsets = frames.map { f =>
      val off = moviBody.size() + 4 // offset from 'movi' fourcc
      chunk(moviBody, "00dc", f)
      off
    }
    val idx1 = new ByteArrayOutputStream()
    frames.zip(offsets).foreach { case (f, off) =>
      fourcc(idx1, "00dc"); u32(idx1, 0x10) // AVIIF_KEYFRAME
      u32(idx1, off.toLong); u32(idx1, f.length.toLong)
    }

    val riffBody = new ByteArrayOutputStream()
    list(riffBody, "hdrl", hdrlBody.toByteArray)
    list(riffBody, "movi", moviBody.toByteArray)
    chunk(riffBody, "idx1", idx1.toByteArray)

    val out = new ByteArrayOutputStream()
    fourcc(out, "RIFF"); u32(out, (riffBody.size() + 4).toLong)
    fourcc(out, "AVI "); out.write(riffBody.toByteArray)
    out.toByteArray
  }

  /** RIFF walk collecting the video-stream `00dc` payloads — the
    * demux half, written against the container spec (LE sizes, even
    * padding, LIST recursion), not against our writer. */
  private[graft] def demuxFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def le32(p: Int): Long =
      ((bytes(p) & 0xffL)) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def cc(p: Int): String =
      new String(bytes, p, 4, "US-ASCII")
    require(cc(0) == "RIFF" && cc(8) == "AVI ",
      s"not a RIFF/AVI container: ${cc(0)}/${cc(8)}")
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = cc(p)
        val sz = le32(p + 4).toInt
        // a corrupt/truncated size (negative after .toInt, or running
        // past the buffer) must fail loudly, not loop or index OOB
        if (sz < 0 || p + 8 + sz > end)
          throw new IllegalArgumentException(
            s"corrupt RIFF container: chunk '$id' at offset $p declares " +
              s"size $sz but only ${end - p - 8} bytes remain")
        if (id == "LIST") walk(p + 12, p + 8 + sz)
        else if (id == "00dc" && sz > 0)
          frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)
        p += 8 + sz + (sz & 1) // even padding
      }
    }
    val declared = le32(4).toInt
    require(declared >= 4 && 8 + declared <= bytes.length,
      s"corrupt RIFF container: declared size $declared vs ${bytes.length} bytes")
    walk(12, 8 + declared)
    frames.result()
  }

  case class AviRow(doc_id: Long, avi: Array[Byte])

  /** Deterministic real AVIs: 8 MJPEG frames per document, frame f's
    * block grid = the analytic scene plane (3-frame scenes with
    * 2-value intra-scene jitter — the GIF fixture's exact function). */
  def videos(spark: SparkSession, sfDir: String): Dataset[AviRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select($"doc_id").as[Long])
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { docId =>
          val frames = (0 until ImageOps.VFrames).map(f =>
            JpegOps.writeGrayJpeg(ImageOps.videoPixelsFor(md, docId, f)))
          AviRow(docId, writeAvi(frames))
        }
      }
  }

  /** Scene-cut detection over the REALLY-demuxed, REALLY-decoded AVI:
    * RIFF walk → stock JPEG decode per frame → 8×8 block means →
    * integer SAD between consecutive frames, cut iff above `tauX64` —
    * the [[ImageOps.videoSceneCuts]] twin on the container real
    * corpora use, sharing its codec-free oracle. */
  def aviSceneCuts(spark: SparkSession, sfDir: String,
                   tauX64: Long = 40 * 64): DataFrame = {
    import spark.implicits._
    videos(spark, sfDir).mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = demuxFrames(r.avi).map(JpegOps.blockMeans)
        (1 until frames.size).iterator.map { f =>
          var sad = 0L
          var i = 0
          while (i < 64) {
            sad += math.abs(frames(f)(i) - frames(f - 1)(i))
            i += 1
          }
          (r.doc_id, f.toLong, sad, sad > tauX64)
        }
      }
    }.toDF("doc_id", "frame_idx", "sad_x64", "is_cut")
  }
}
