package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3): treat media as opaque
  * `binary` columns with typed metadata extracted by a per-partition
  * decoder.
  *
  * The Spark-side plumbing is real — binary column, typed Dataset,
  * mapPartitions batch shape, schema — while the actual media decode is
  * STUBBED (this container has no image/audio codecs): `stubDecode`
  * derives deterministic fake dimensions from the bytes. Swapping in a
  * real decoder (e.g. TwelveMonkeys/JavaCV on the executor classpath)
  * changes only that one function.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, magic_hex: String,
                       fake_width: Long, fake_height: Long, fake_channels: Long)

  /** STUB decoder — deterministic fake in place of a real image decode.
    * Real implementation would parse the container header / decode the
    * frame; here we derive stable pseudo-metadata from the first bytes. */
  def stubDecode(bytes: Array[Byte]): (Long, Long, Long) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (64L + b0 % 192, 64L + b1 % 192, 1L + (bytes.length % 4))
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_len: Long,
                      frame_md5: String)
  case class ResizedMeta(doc_id: Long, src_width: Long, src_height: Long,
                         out_width: Long, out_height: Long, out_bytes: Long)

  /** "Video" frame sampling: split the binary payload into fixed-size
    * frame chunks (STUB for container demux) and keep every `stride`-th
    * frame. Shows the explode/one-to-many batch shape a real frame
    * sampler has — per input row, a variable number of typed frame rows. */
  def frameSample(spark: SparkSession, sfDir: String,
                  frameBytes: Int = 64, stride: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
      .as[MediaRow])
      .mapPartitions { rows =>
        // md5 frame digests: content-addressable AND oracle-checkable —
        // DuckDB's md5 over the same byte slice yields the same hex
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val nFrames = (r.media.length + frameBytes - 1) / frameBytes
          (0 until nFrames by stride).iterator.map { i =>
            val frame = r.media.slice(i * frameBytes, (i + 1) * frameBytes)
            val d = md.digest(frame)
            val sb = new java.lang.StringBuilder(32)
            d.foreach { b =>
              sb.append(Character.forDigit((b >> 4) & 0xf, 16))
              sb.append(Character.forDigit(b & 0xf, 16))
            }
            FrameRow(r.doc_id, i.toLong, frame.length.toLong, sb.toString)
          }
        }
      }
  }

  case class AudioWindow(doc_id: Long, win_off: Long, win_len: Long,
                         win_md5: String)

  /** "Audio" windowing: OVERLAPPING fixed-size windows with a hop
    * (stride < window — the STFT/feature-extraction batch shape, as
    * opposed to [[frameSample]]'s disjoint frames). Decode is stubbed
    * like the other media ops; the window geometry, per-window digests
    * and the one-to-many typed output are real. */
  def audioWindows(spark: SparkSession, sfDir: String,
                   winBytes: Int = 64, hopBytes: Int = 32): Dataset[AudioWindow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
      .as[MediaRow])
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          Iterator.range(0, math.max(r.media.length, 0), hopBytes).map { off =>
            val w = r.media.slice(off, off + winBytes)
            val d = md.digest(w)
            val sb = new java.lang.StringBuilder(32)
            d.foreach { b =>
              sb.append(Character.forDigit((b >> 4) & 0xf, 16))
              sb.append(Character.forDigit(b & 0xf, 16))
            }
            AudioWindow(r.doc_id, off.toLong, w.length.toLong, sb.toString)
          }
        }
      }
  }

  /** STUB resize: computes the output geometry + byte size a real
    * resizer would produce, preserving aspect ratio against a target
    * box. The decode is [[stubDecode]]; only the math is real. */
  def resizeMeta(spark: SparkSession, sfDir: String,
                 maxW: Long = 128, maxH: Long = 128): Dataset[ResizedMeta] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
      .as[MediaRow])
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, c) = stubDecode(r.media)
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val ow = math.max(1L, math.round(w * scale))
          val oh = math.max(1L, math.round(h * scale))
          ResizedMeta(r.doc_id, w, h, ow, oh, ow * oh * c)
        }
      }
  }

  /** Binary metadata pipeline: documents' text re-encoded as a stand-in
    * binary media column, then decoded per-partition. mapPartitions (not
    * map) so a real decoder could amortize codec init per batch — the
    * same batch shape `mapInPandas`/Arrow would give a Python decoder. */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.spread(Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
      .as[MediaRow])
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = stubDecode(r.media)
        val magic = r.media.take(4).map(b => f"${b & 0xff}%02x").mkString
        MediaMeta(r.doc_id, r.media.length.toLong, magic, w, h, c)
      }
    }.toDF()
  }

  /** Cross-video duplicate-frame detection: demux every "video" into
    * frames ([[frameSample]]'s stub demux), then group by content
    * digest — frames appearing in more than one place are exact visual
    * duplicates (the frame-level dedup pass a video-training pipeline
    * runs before feature extraction).
    *
    * The digest IS the shuffle key: 16-byte md5 instead of raw frame
    * bytes, so the exchange carries hashes + ids, never media. One hash
    * agg; at 100 TB the dup-cluster table is bounded by the number of
    * DISTINCT duplicated frames, not total frames. min/max doc ids +
    * spread make the output deterministic without collecting lists. */
  def frameDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val frames = frameSample(spark, sfDir).toDF()
    frames.groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("n_frames"),
           countDistinct(col("doc_id")).as("n_videos"),
           min(col("doc_id")).as("min_doc"),
           max(col("doc_id")).as("max_doc"))
      .filter(col("n_frames") > 1)
  }

  /** PERCEPTUAL near-dup frames via average-hash (r8): per full frame, a
    * 63-bit aHash — bit j set iff pixel j is above the frame's mean
    * (pixels = the frame's first 63 byte values under the stub decode;
    * a real decoder swaps in luma samples, the hash math is identical;
    * 63 bits keeps the packed hash positive in engines whose BIGINT
    * addition traps on overflow, and gives the band join 16-bit bands —
    * an 8-bit-band first cut collapsed to 256 bucket values and ground
    * D²/256 candidates).
    * Near-dup pairs are mined with the [[Dedup]] simhash band trick:
    * distance ≤ 3 guarantees one of four 8-bit bands is EQUAL
    * (pigeonhole), so candidates come from a band equi-join — never
    * all-pairs — and bit_count verifies exactly. This is the perceptual
    * complement to [[frameDedup]]'s md5: robust to small pixel
    * perturbations where the digest only catches exact copies.
    * Integer-only math (px·32 > Σpx avoids the mean division), so the
    * SQL oracle reproduces every bit.
    *
    * Scale shape (r8, learned from the sf0.1 bench): media corpora are
    * dominated by REPEATED frames, so per-frame pair enumeration is
    * quadratic in every identical-frame group (38 s at sf0.1 — the
    * first cut did exactly that). The mining therefore runs at the
    * DISTINCT-HASH level: frames collapse to (ahash, n_frames) groups
    * first — the same hash agg as [[frameDedup]] — and the band join
    * pairs distinct hash VALUES (hamming ∈ [1, tau]; hamming-0 pairs
    * are [[frameDedup]]'s exact-dup job). Output carries the group
    * sizes and the implied frame-pair count, so candidate volume is
    * bounded by distinct-hash pairs, never frame pairs. */
  def ahashPairs(spark: SparkSession, sfDir: String, tau: Int = 3,
                 frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    // JIT'd per-partition hash kernel (the first cut built the hash from
    // interpreted transform/aggregate lambdas — 63 substrings per frame
    // under expression interpretation was 9 s of the query's cost at
    // sf0.1; this loop is the same integer math at memory speed, and the
    // same boundary where a real decoder would hand over luma planes)
    val frames = Tables.spread(Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
      .as[MediaRow])
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val nFrames = (r.media.length + frameBytes - 1) / frameBytes
          (0 until nFrames by stride).iterator
            .filter(i => (i + 1) * frameBytes <= r.media.length) // full frames
            .map { i =>
              val base = i * frameBytes
              var sum = 0
              var j = 0
              while (j < 63) { sum += r.media(base + j) & 0xff; j += 1 }
              var h = 0L
              j = 0
              while (j < 63) {
                if ((r.media(base + j) & 0xff) * 63 > sum) h |= 1L << j
                j += 1
              }
              (r.doc_id, base.toLong, h)
            }
        }
      }.toDF("doc_id", "off", "ahash")
    val groups = frames.groupBy($"ahash")
      .agg(count(lit(1)).as("n_frames"), min($"doc_id").as("min_doc"))
    val banded = groups
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("band_val",
        expr("shiftright(ahash, band * 16) & 65535"))
    val a = banded.select($"band", $"band_val", $"ahash".as("ha"),
      $"n_frames".as("n_a"), $"min_doc".as("doc_a"))
    val b = banded.select($"band", $"band_val", $"ahash".as("hb"),
      $"n_frames".as("n_b"), $"min_doc".as("doc_b"))
    a.join(b, Seq("band", "band_val"))
      .filter($"ha" < $"hb")
      .select($"ha", $"hb", $"n_a", $"n_b", $"doc_a", $"doc_b")
      .distinct() // a close pair can collide in several bands
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter($"hamming" <= tau) // ha < hb already excludes hamming 0
      .withColumn("frame_pairs", $"n_a" * $"n_b")
      .select($"ha", $"hb", $"hamming", $"n_a", $"n_b", $"frame_pairs",
              $"doc_a", $"doc_b")
  }

  /** Perceptual frame CLUSTERS (r8): [[ahashPairs]]' near-dup hash
    * pairs fed through the shared pointer-jumping connected-components
    * solve ([[Dedup.adaptiveComponents]]) — each cluster is a visually
    * similar frame family, sized in both distinct hashes and total
    * frames. The video-frame twin of [[graft.llm.Dedup.dedupClusters]]:
    * the label graph holds only near-dup hash values, orders of
    * magnitude below frame count. */
  def ahashClusters(spark: SparkSession, sfDir: String,
                    tau: Int = 3): DataFrame = {
    import spark.implicits._
    val pairs = ahashPairs(spark, sfDir, tau)
      .select($"ha", $"hb").localCheckpoint()
    val labels = Dedup.adaptiveComponents(pairs)
      .select($"doc_id".as("ahash"), $"label")
    // re-derive group sizes for the member hashes (narrow passes)
    val frames = Tables.spread(Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
      .as[MediaRow])
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val nFrames = (r.media.length + 63) / 64
          (0 until nFrames by 4).iterator
            .filter(i => (i + 1) * 64 <= r.media.length)
            .map { i =>
              val base = i * 64
              var sum = 0
              var j = 0
              while (j < 63) { sum += r.media(base + j) & 0xff; j += 1 }
              var h = 0L
              j = 0
              while (j < 63) {
                if ((r.media(base + j) & 0xff) * 63 > sum) h |= 1L << j
                j += 1
              }
              (h, 1L)
            }
        }
      }.toDF("ahash", "one")
      .groupBy($"ahash").agg(count(lit(1)).as("n_frames"))
    labels.join(frames, Seq("ahash"))
      .groupBy($"label".as("cluster_id"))
      .agg(count(lit(1)).as("n_hashes"),
           sum($"n_frames").as("n_frames"),
           max($"ahash").as("max_hash"))
  }

  /** Stub scene-cut detection: a cut wherever consecutive sampled
    * frames change content digest (a real pipeline compares feature
    * distances; the Spark plumbing — per-video ordered scan, digest
    * lag, cut aggregation — is identical). One shuffle on doc_id for
    * the lag window; per-video cut summaries aggregate on the same
    * key, so the exchange is reused. */
  def sceneCuts(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameSample(spark, sfDir).toDF()
      .withColumn("prev_md5", lag(col("frame_md5"), 1).over(byDoc))
      .withColumn("is_cut",
        when(col("prev_md5").isNotNull &&
             col("prev_md5") =!= col("frame_md5"), 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
           sum(col("is_cut")).as("n_cuts"),
           min(when(col("is_cut") === 1L, col("frame_idx"))).as("first_cut_idx"))
  }
}
