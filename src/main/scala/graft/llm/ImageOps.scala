package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL image decode for the multimodal family (r8): the [[Multimodal]]
  * pipelines prove the Spark plumbing over a stub demux; this module
  * runs the same perceptual-hash / metadata / feature-extract shapes
  * over genuinely-decoded PNG bytes using the JDK's `ImageIO` — zero
  * new dependencies, executor-side, codec state amortized per
  * partition (the `mapPartitions` boundary a JavaCV/TwelveMonkeys
  * decoder would also use).
  *
  * The oracle trick: images are GENERATED from an analytic pixel
  * function — `px(g, i)` = first byte of `md5("g:i")` (the engine's
  * md5-prefix idiom), with a per-doc perturbation — encoded to real
  * PNG bytes with `ImageIO.write`, then every query DECODES those
  * bytes with `ImageIO.read` and computes from the decoded samples.
  * PNG is lossless, so the DuckDB oracle reproduces the identical
  * integers straight from the pixel function WITHOUT any codec: a
  * hash-green run proves decode∘encode = id on real bytes — the
  * byte-level oracle pattern of `mm_binary_meta`, upgraded from
  * header bytes to full pixel content.
  *
  * Near-dup structure is injected deterministically: docs share a base
  * image per 3-doc group (`g = doc_id div 3`) and `doc_id % 3` leading
  * pixels are flipped by +128 — so groups carry exact and near dups
  * for the banded Hamming join to find.
  *
  * Scale shape: media bytes never shuffle — generation, decode, hash
  * are one narrow pass; pairs are mined at the DISTINCT-HASH level via
  * the same 16-bit-band pigeonhole equi-join as [[Multimodal.ahashPairs]].
  */
object ImageOps {

  private val W = 8
  private val H = 8
  private val GROUP = 3

  /** Analytic pixel value BEFORE perturbation: first md5 byte of
    * `"<group>:<i>"` — identical to DuckDB
    * `('0x'||substr(md5(g||':'||i),1,2))::INT`. */
  private def basePixel(md: java.security.MessageDigest,
                        group: Long, i: Int): Int =
    md.digest(s"$group:$i".getBytes("UTF-8"))(0) & 0xff

  /** The full 64-pixel luma plane for a doc (row-major, i = y·8+x). */
  private[graft] def pixelsFor(md: java.security.MessageDigest, docId: Long): Array[Int] = {
    val g = docId / GROUP
    val r = (docId % GROUP).toInt
    Array.tabulate(W * H) { i =>
      val b = basePixel(md, g, i)
      if (i < r) (b + 128) % 256 else b
    }
  }

  // ImageIO wraps every OutputStream/InputStream it is handed in a
  // stream cache, and the DEFAULT cache is disk-backed: one temp file
  // created and deleted per encode/decode call. For in-memory
  // byte-array codecs that is pure overhead — and once the kernels run
  // on every core it becomes a /tmp create/unlink contention point
  // that can erase the parallelism win. Memory-cached streams are
  // strictly faster here (images are a few KB). JVM-wide, set when
  // this object first loads on driver or executor.
  javax.imageio.ImageIO.setUseCache(false)

  case class ImgRow(doc_id: Long, png: Array[Byte])

  /** Deterministic REAL PNGs: one 8×8 grayscale image per document,
    * `ImageIO.write`-encoded executor-side. Only `doc_id` is read —
    * the media column is the generated binary. */
  def images(spark: SparkSession, sfDir: String): Dataset[ImgRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select($"doc_id").as[Long])
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { docId =>
          val img = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          val px = pixelsFor(md, docId)
          var i = 0
          while (i < px.length) {
            raster.setSample(i % W, i / W, 0, px(i))
            i += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          ImgRow(docId, out.toByteArray)
        }
      }
  }

  /** Decode PNG bytes back to the luma plane via the REAL codec path.
    * Raster samples, not getRGB — no color-management rewrite of the
    * stored gray values. */
  private[graft] def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = raster.getSample(i % w, i / w, 0)
      i += 1
    }
    (w, h, px)
  }

  /** Really-decoded image metadata: PNG magic from the container bytes,
    * dimensions and exact luma sum from the DECODED samples. The oracle
    * hard-codes the PNG signature and derives the luma sum analytically
    * — equality proves real PNG bytes round-tripped the codec. */
  def imgMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val magic = r.png.take(4).map(b => f"${b & 0xff}%02x").mkString
        val (w, h, px) = decode(r.png)
        (r.doc_id, magic, w.toLong, h.toLong, r.png.length.toLong,
          px.map(_.toLong).sum)
      }
    }.toDF("doc_id", "magic_hex", "width", "height", "png_bytes", "sum_luma")
      // png_bytes is codec-implementation-defined (compression level) —
      // report a stable floor instead: the fixed 8-byte signature + IHDR
      // presence is asserted via magic; size itself stays informational
      .drop("png_bytes")
  }

  /** aHash per image, computed from the REALLY-decoded luma plane. */
  private[llm] def hashed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (_, _, px) = decode(r.png)
        var sum = 0
        var j = 0
        while (j < 63) { sum += px(j); j += 1 }
        var h = 0L
        j = 0
        while (j < 63) {
          if (px(j) * 63 > sum) h |= 1L << j
          j += 1
        }
        (r.doc_id, h)
      }
    }.toDF("doc_id", "ahash")
  }

  /** Perceptual average-hash over REALLY-decoded pixels: bit j set iff
    * px_j·63 > Σpx_{0..62} (the integer-exact mean criterion shared
    * with [[Multimodal.ahashPairs]]), then the same distinct-hash
    * 16-bit-band pigeonhole join mines hamming ≤ τ pairs — never
    * all-pairs. */
  def imgAhashPairs(spark: SparkSession, sfDir: String,
                    tau: Int = 3): DataFrame =
    pairsFromHashes(hashed(spark, sfDir), tau)

  /** The banded pair mine over an explicit (doc_id, ahash) table —
    * split out so [[imgAhashClusters]] can reuse ONE decode pass for
    * both the pair mine and the per-hash counts (the
    * dedup_source_impact / mm_audio_fingerprint double-compute
    * lesson). */
  private def pairsFromHashes(hx: DataFrame, tau: Int): DataFrame = {
    val spark = hx.sparkSession
    import spark.implicits._
    val groups = hx.groupBy($"ahash")
      .agg(count(lit(1)).as("n_imgs"), min($"doc_id").as("min_doc"))
    val banded = groups
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("band_val", expr("shiftright(ahash, band * 16) & 65535"))
    val a = banded.select($"band", $"band_val", $"ahash".as("ha"),
      $"n_imgs".as("n_a"), $"min_doc".as("doc_a"))
    val b = banded.select($"band", $"band_val", $"ahash".as("hb"),
      $"n_imgs".as("n_b"), $"min_doc".as("doc_b"))
    a.join(b, Seq("band", "band_val"))
      .filter($"ha" < $"hb")
      .select($"ha", $"hb", $"n_a", $"n_b", $"doc_a", $"doc_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter($"hamming" <= tau)
      .select($"ha", $"hb", $"hamming", $"n_a", $"n_b", $"doc_a", $"doc_b")
  }

  /** Visually-similar image FAMILIES over really-decoded pixels:
    * [[imgAhashPairs]]' near-dup hash pairs through the shared
    * pointer-jumping connected-components solve
    * ([[Dedup.adaptiveComponents]]) — the real-decode twin of
    * [[Multimodal.ahashClusters]]. The label graph holds only near-dup
    * hash values, orders of magnitude below image count. */
  def imgAhashClusters(spark: SparkSession, sfDir: String,
                       tau: Int = 3): DataFrame = {
    import spark.implicits._
    // ONE decode pass feeds both the pair mine and the counts — the
    // pinned frame is bounded by image count (one narrow row each)
    val hx = hashed(spark, sfDir).localCheckpoint()
    val pairs = pairsFromHashes(hx, tau)
      .select($"ha", $"hb").localCheckpoint()
    val labels = Dedup.adaptiveComponents(pairs)
      .select($"doc_id".as("ahash"), $"label")
    val counts = hx
      .groupBy($"ahash").agg(count(lit(1)).as("n_imgs"))
    labels.join(counts, Seq("ahash"))
      .groupBy($"label".as("cluster_id"))
      .agg(count(lit(1)).as("n_hashes"),
           sum($"n_imgs").as("n_imgs"),
           max($"ahash").as("max_hash"))
  }

  /** Difference-hash (dHash) per image from the REALLY-decoded luma
    * plane: bit `y·7+x` is set iff the right neighbor is strictly
    * brighter — `px[y·8+x+1] > px[y·8+x]` — giving 8 rows × 7
    * comparisons = 56 gradient bits. dHash is the perceptual hash
    * robust to global brightness/contrast shifts that defeat aHash
    * (a uniform offset flips NO gradient sign but moves every
    * mean-comparison bit), so real curation stacks keep both. */
  private def dhashed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (w, _, px) = decode(r.png)
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 7) {
            if (px(y * w + x + 1) > px(y * w + x)) h |= 1L << (y * 7 + x)
            x += 1
          }
          y += 1
        }
        (r.doc_id, h)
      }
    }.toDF("doc_id", "dhash")
  }

  /** Gradient-hash near-dup pairs over really-decoded pixels: the
    * [[imgAhashPairs]] distinct-hash pigeonhole play on the 56-bit
    * dHash — 4 bands × 14 bits guarantee every hamming ≤ 3 pair
    * shares a band (never all-pairs; candidate volume is bounded by
    * band-bucket collision counts, not image pairs). */
  def imgDhashPairs(spark: SparkSession, sfDir: String,
                    tau: Int = 3): DataFrame = {
    import spark.implicits._
    val groups = dhashed(spark, sfDir).groupBy($"dhash")
      .agg(count(lit(1)).as("n_imgs"), min($"doc_id").as("min_doc"))
    val banded = groups
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("band_val", expr("shiftright(dhash, band * 14) & 16383"))
    val a = banded.select($"band", $"band_val", $"dhash".as("ha"),
      $"n_imgs".as("n_a"), $"min_doc".as("doc_a"))
    val b = banded.select($"band", $"band_val", $"dhash".as("hb"),
      $"n_imgs".as("n_b"), $"min_doc".as("doc_b"))
    a.join(b, Seq("band", "band_val"))
      .filter($"ha" < $"hb")
      .select($"ha", $"hb", $"n_a", $"n_b", $"doc_a", $"doc_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter($"hamming" <= tau)
      .select($"ha", $"hb", $"hamming", $"n_a", $"n_b", $"doc_a", $"doc_b")
  }

  /** Luma-histogram Shannon entropy per REALLY-decoded image — the
    * cheap flat/blank/synthetic-image filter every vision curation
    * stack runs before spending on embeddings (a near-constant image
    * has entropy ≈ 0; natural 8-bit content sits near the top of the
    * 6-bit ceiling here). `H = (1/64)·Σ_v c_v·(6 − log2 c_v)` over the
    * 64-pixel luma counts.
    *
    * Engine-exactness: per-count terms are ln-computed once, rounded
    * to 4 decimals and scaled to integers (the bigram-surprisal
    * discipline), so each image's entropy numerator is an INTEGER sum;
    * display is two exact IEEE divisions. The executor-side Scala uses
    * the same BigDecimal HALF_UP rounding Spark SQL's `round` performs,
    * so the DuckDB oracle (analytic pixels, no codec) reproduces it
    * bit-for-bit — decode∘encode = id checked through a nonlinear
    * statistic this time.
    *
    * Scale shape: one narrow decode pass, no shuffle at all. */
  def imgEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (_, _, px) = decode(r.png)
        val counts = px.groupBy(identity).map(_._2.length)
        val hMicro = counts.map { c =>
          val t = BigDecimal(1e4 * (6.0 - math.log(c.toDouble) / math.log(2.0)))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          c.toLong * t
        }.sum
        (r.doc_id, counts.size.toLong, hMicro,
          hMicro.toDouble / 64 / 1e4)
      }
    }.toDF("doc_id", "n_distinct_lumas", "h_micro", "entropy_bits")
      .withColumn("flat", $"n_distinct_lumas" < 8)
  }

  /** REAL-frame video (r12): the container is bespoke (the JDK ships
    * no video demuxer — honest limitation, documented), but every
    * frame inside is a REAL PNG: `GVID | n_frames | [len | png]…`,
    * 8 frames of 8×8 gray per doc, scene id = frame div 3 (frames
    * share a scene's analytic plane with a per-frame 2-pixel jitter;
    * scene boundaries are ~random-vs-random). */
  private[graft] val VFrames = 8
  private val VScene = 3

  private[graft] def videoPixelsFor(md: java.security.MessageDigest,
                             docId: Long, frame: Int): Array[Int] = {
    val scene = frame / VScene
    Array.tabulate(W * H) { i =>
      val b = md.digest(s"v:$docId:$scene:$i".getBytes("UTF-8"))(0) & 0xff
      // per-frame jitter on 2 leading pixels — intra-scene MAD small
      // but nonzero, inter-scene MAD large
      if (i < 2) (b + frame % VScene) % 256 else b
    }
  }

  case class VidRow(doc_id: Long, vid: Array[Byte])

  /** 256-entry gray-ramp palette: index i → color (i, i, i), so a
    * frame's raster index IS its gray value and the GIF round-trip is
    * pixel-lossless by construction. */
  private def grayRamp: java.awt.image.IndexColorModel = {
    val r = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, r, r, r)
  }

  /** Deterministic real videos, one per document, in a STOCK container:
    * multi-frame ANIMATED GIF written by the JDK's own ImageIO GIF
    * writer (`writeToSequence`). GIF is lossless for ≤256-color frames,
    * so the analytic luma planes survive the encode exactly — which is
    * what lets the scene-cut oracle reproduce the MADs with no codec —
    * and ANY stock GIF tool can demux the fixture (the bespoke `GVID`
    * framing this replaces could only be parsed by its own reader). */
  def videos(spark: SparkSession, sfDir: String): Dataset[VidRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select($"doc_id").as[Long])
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val cm = grayRamp
        ids.map { docId =>
          val bos = new ByteArrayOutputStream()
          val ios = ImageIO.createImageOutputStream(bos)
          val writer = ImageIO.getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          (0 until VFrames).foreach { f =>
            val img = new BufferedImage(W, H,
              BufferedImage.TYPE_BYTE_INDEXED, cm)
            val raster = img.getRaster
            val px = videoPixelsFor(md, docId, f)
            var i = 0
            while (i < px.length) {
              raster.setSample(i % W, i / W, 0, px(i))
              i += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
          writer.dispose()
          ios.close()
          VidRow(docId, bos.toByteArray)
        }
      }
  }

  /** Scene-cut detection over REALLY-demuxed frames — the shot-boundary
    * pass every video curation pipeline runs before frame sampling:
    * the JDK's stock GIF ImageReader demuxes the container
    * (`getNumImages` + per-frame `read` — no bespoke parsing anywhere),
    * consecutive frames score by integer sum-of-absolute-differences
    * (mean×64 — no division), cut iff above `tauX64`. Gray values come
    * back through the palette (`getRGB & 0xff`; ramp palette ⇒ blue
    * channel == gray). The real-decode twin of the stub
    * [[Multimodal.sceneCuts]]; the oracle reproduces the MADs from the
    * analytic planes with no codec. */
  def videoSceneCuts(spark: SparkSession, sfDir: String,
                     tauX64: Long = 40 * 64): DataFrame = {
    import spark.implicits._
    videos(spark, sfDir).mapPartitions { rows =>
      rows.flatMap { r =>
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.vid))
        val reader = ImageIO.getImageReadersByFormatName("gif").next()
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val frames = (0 until n).map { f =>
          val img = reader.read(f)
          Array.tabulate(64)(i => img.getRGB(i % 8, i / 8) & 0xff)
        }
        reader.dispose()
        iis.close()
        (1 until n).iterator.map { f =>
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

  /** Feature extraction on decoded pixels: 2×2 integer box downsample
    * (the first pyramid level every vision pipeline builds), reported
    * as a position-weighted checksum so the oracle verifies every
    * output pixel and its ORDER, not just a sum. */
  def imgDownsample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decode(r.png)
        val (ow, oh) = (w / 2, h / 2)
        var checksum = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val base = (2 * y) * w + 2 * x
            val m = (px(base) + px(base + 1) + px(base + w) + px(base + w + 1)) / 4
            checksum += (y * ow + x + 1).toLong * m
            x += 1
          }
          y += 1
        }
        (r.doc_id, ow.toLong, oh.toLong, checksum)
      }
    }.toDF("doc_id", "out_width", "out_height", "checksum")
  }
}
