package graft.llm

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL JPEG decode for the multimodal family (r13) — the codec real
  * image corpora actually use ([[ImageOps]] proves decode∘encode = id
  * on PNG, but a crawler's images are overwhelmingly JPEG). The
  * decoder is the stock JDK `ImageIO` reader; the FIXTURE BYTES are a
  * hand-rolled baseline JFIF encoder written from the public JPEG
  * spec (ITU-T T.81 Annex B marker syntax, Annex K.3.1 DC Huffman
  * table) — the same hand-rolled-public-spec discipline as the RIFF/
  * WAV reader, the proto3 wire decoder, and the Avro OCF codec.
  * Encoding ourselves is what makes the bytes deterministic: stock
  * JPEG ENCODERS are implementation-defined (sampling, tables,
  * optimization), but DECODE of these particular bytes is exact.
  *
  * The exactness trick: every 8×8 block is CONSTANT. A constant block
  * has ONLY a DC coefficient — for samples v, DC = 8·(v−128); with DC
  * quant step 8 the quantized coefficient is exactly v−128, and any
  * conformant IDCT reproduces the flat value v with zero rounding
  * error (all AC terms are zero, so the IDCT of the block is a
  * constant and its rounding is exact). Lossy codec, losslessly
  * decodable fixture — so the DuckDB oracle reproduces the decoded
  * plane analytically with no codec, and a hash-green run proves the
  * STOCK DECODER agreed with the spec arithmetic bit-for-bit.
  *
  * Each document's image is 64×64 = an 8×8 grid of constant blocks
  * whose values are the SAME analytic function as the PNG fixture
  * ([[ImageOps.pixelsFor]]: md5-derived base per 3-doc group, leading
  * `doc_id % 3` values perturbed +128) — so the 8×8 block-mean
  * DOWNSAMPLE of the decoded JPEG equals the PNG fixture's pixel
  * plane exactly, and the aHash twin reuses the identical oracle.
  * That downsample IS the real-world perceptual-hash pipeline (resize
  * to 8×8, threshold against the mean).
  *
  * Scale shape: unchanged from the PNG family — media bytes never
  * shuffle; generate, decode, hash are one narrow executor-side pass;
  * pairs mine at the distinct-hash level. */
object JpegOps {

  private val BlocksW = 8
  private val BlocksH = 8
  private val W = 8 * BlocksW
  private val H = 8 * BlocksH

  /** Annex K.3.1 luminance DC Huffman table, canonically expanded:
    * category c → (code, length). */
  private val DcCodes: Array[(Int, Int)] = {
    val bits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val codes = Array.newBuilder[(Int, Int)]
    var code = 0
    var len = 1
    var v = 0
    while (len <= 16) {
      var n = bits(len - 1)
      while (n > 0) { codes += ((code, len)); code += 1; v += 1; n -= 1 }
      code <<= 1
      len += 1
    }
    codes.result()
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing (B.1.1.5)
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits)
  }

  /** Baseline JFIF bytes for a grid of constant 8×8 blocks (values in
    * raster block order). Grayscale, one scan, quant table all-8s,
    * Annex K DC table, minimal one-code AC table (only EOB is ever
    * emitted — every AC coefficient is zero by construction). */
  private[graft] def writeGrayJpeg(blockVals: Array[Int]): Array[Byte] = {
    require(blockVals.length == BlocksW * BlocksH)
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // no density units, 1:1
    out.write(0); out.write(0) // no thumbnail
    marker(0xdb); u16(67); out.write(0x00) // DQT, Pq=0 Tq=0
    (0 until 64).foreach(_ => out.write(8)) // uniform step 8
    marker(0xc0); u16(11) // SOF0 baseline
    out.write(8); u16(H); u16(W); out.write(1) // 8-bit, 1 component
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1, quant 0
    marker(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00) // DHT DC
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 to 11).foreach(out.write)
    marker(0xc4); u16(2 + 1 + 16 + 1); out.write(0x10) // DHT AC: EOB only
    out.write(1); (2 to 16).foreach(_ => out.write(0))
    out.write(0x00)
    marker(0xda); u16(8) // SOS
    out.write(1); out.write(1); out.write(0x00) // comp 1, DC 0 / AC 0
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al
    val bw = new BitWriter(out)
    var prevDc = 0
    blockVals.foreach { v =>
      val dcq = v - 128 // quantized DC: 8·(v−128) / step 8
      val diff = dcq - prevDc
      prevDc = dcq
      val mag = math.abs(diff)
      val cat = 32 - Integer.numberOfLeadingZeros(mag) // 0 when diff=0
      val (code, len) = DcCodes(cat)
      bw.put(code, len)
      if (cat > 0) {
        val amp = if (diff > 0) diff else diff + (1 << cat) - 1
        bw.put(amp, cat)
      }
      bw.put(0, 1) // EOB ('0' in the one-code AC table)
    }
    bw.flushWithOnes()
    marker(0xd9) // EOI
    out.toByteArray
  }

  case class JpgRow(doc_id: Long, jpg: Array[Byte])

  /** Deterministic real JPEGs: one 64×64 grayscale baseline JFIF per
    * document, block values = the PNG fixture's analytic pixel plane
    * ([[ImageOps.pixelsFor]]). */
  def images(spark: SparkSession, sfDir: String): Dataset[JpgRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select($"doc_id").as[Long])
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { docId =>
          JpgRow(docId, writeGrayJpeg(ImageOps.pixelsFor(md, docId)))
        }
      }
  }

  /** 8×8 block means of the really-decoded luma plane — integer-exact
    * here because each block is constant (the real-world aHash resize
    * step, landing exactly on the analytic 64-value plane). */
  private[graft] def blockMeans(bytes: Array[Byte]): Array[Int] = {
    val (w, _, px) = ImageOps.decode(bytes)
    Array.tabulate(BlocksW * BlocksH) { b =>
      val (bx, by) = (b % BlocksW, b / BlocksW)
      var sum = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { sum += px((by * 8 + y) * w + bx * 8 + x); x += 1 }
        y += 1
      }
      sum / 64
    }
  }

  /** Really-decoded JPEG metadata: SOI/APP0 magic from the container
    * bytes, dimensions and exact luma sum from the DECODED samples —
    * the [[ImageOps.imgMeta]] twin on the lossy codec (sum is 64× the
    * analytic plane's sum: every block is 64 samples of its value). */
  def jpegMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val magic = r.jpg.take(4).map(b => f"${b & 0xff}%02x").mkString
        val (w, h, px) = ImageOps.decode(r.jpg)
        (r.doc_id, magic, w.toLong, h.toLong, px.map(_.toLong).sum)
      }
    }.toDF("doc_id", "magic_hex", "width", "height", "sum_luma")
  }

  /** Perceptual aHash near-dup pairs over really-decoded JPEG: decode
    * → 8×8 block-mean downsample → the exact [[ImageOps.imgAhashPairs]]
    * criterion and banded join — same hashes, same oracle, proving the
    * lossy-codec path feeds the dedup family identically. */
  def jpegAhashPairs(spark: SparkSession, sfDir: String,
                     tau: Int = 3): DataFrame = {
    import spark.implicits._
    val hashed = images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val m = blockMeans(r.jpg)
        var sum = 0
        var j = 0
        while (j < 63) { sum += m(j); j += 1 }
        var h = 0L
        j = 0
        while (j < 63) {
          if (m(j) * 63 > sum) h |= 1L << j
          j += 1
        }
        (r.doc_id, h)
      }
    }.toDF("doc_id", "ahash")
    bandedPairs(hashed, "ahash", bandBits = 16, nBands = 4, tau)
  }

  /** Gradient-hash (dHash) near-dup pairs over really-decoded JPEG:
    * the same right-neighbor-brighter criterion as
    * [[ImageOps.imgDhashPairs]] over the 8×8 block-mean plane — the
    * perceptual hash robust to the global brightness/contrast shifts
    * JPEG re-encodes introduce in real corpora, now proven on the
    * codec those corpora use (oracle shared with the PNG family). */
  def jpegDhashPairs(spark: SparkSession, sfDir: String,
                     tau: Int = 3): DataFrame = {
    import spark.implicits._
    val hashed = images(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val m = blockMeans(r.jpg)
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 7) {
            if (m(y * 8 + x + 1) > m(y * 8 + x)) h |= 1L << (y * 7 + x)
            x += 1
          }
          y += 1
        }
        (r.doc_id, h)
      }
    }.toDF("doc_id", "dhash")
    bandedPairs(hashed, "dhash", bandBits = 14, nBands = 4, tau)
  }

  /** The distinct-hash pigeonhole pair mine shared by both hash
    * families (never all-pairs; `nBands` bands of `bandBits` bits
    * guarantee every hamming ≤ nBands−1 pair shares a band). */
  private def bandedPairs(hashed: DataFrame, hashCol: String,
                          bandBits: Int, nBands: Int,
                          tau: Int): DataFrame = {
    val spark = hashed.sparkSession
    import spark.implicits._
    val mask = (1 << bandBits) - 1
    val groups = hashed.groupBy(col(hashCol))
      .agg(count(lit(1)).as("n_imgs"), min($"doc_id").as("min_doc"))
    val banded = groups
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("band_val",
        expr(s"shiftright($hashCol, band * $bandBits) & $mask"))
    val a = banded.select($"band", $"band_val", col(hashCol).as("ha"),
      $"n_imgs".as("n_a"), $"min_doc".as("doc_a"))
    val b = banded.select($"band", $"band_val", col(hashCol).as("hb"),
      $"n_imgs".as("n_b"), $"min_doc".as("doc_b"))
    a.join(b, Seq("band", "band_val"))
      .filter($"ha" < $"hb")
      .select($"ha", $"hb", $"n_a", $"n_b", $"doc_a", $"doc_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter($"hamming" <= tau)
      .select($"ha", $"hb", $"hamming", $"n_a", $"n_b", $"doc_a", $"doc_b")
  }
}
