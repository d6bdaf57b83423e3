package graft

import graft.llm.{ImageOps, JpegOps}

/** Hand-rolled baseline JFIF vs the STOCK JDK decoder: the constant-
  * block fixture must decode bit-exactly (DC-only blocks with quant
  * step 8 reproduce their value with zero IDCT rounding), which is
  * what licenses the analytic (codec-free) DuckDB oracles of the
  * mm_jpeg_* queries. */
class JpegSpec extends SparkSpec {

  test("stock ImageIO decodes the hand-rolled JPEG to the exact analytic plane") {
    val md = java.security.MessageDigest.getInstance("MD5")
    // a spread of doc ids exercising all 3 perturbation phases and
    // DC diffs of both signs across the full [0,255] range
    Seq(0L, 1L, 2L, 3L, 17L, 100L).foreach { docId =>
      val vals = ImageOps.pixelsFor(md, docId)
      val jpg = JpegOps.writeGrayJpeg(vals)
      assert(jpg.take(2).map(_ & 0xff).toSeq === Seq(0xff, 0xd8), "SOI")
      val (w, h, px) = ImageOps.decode(jpg)
      assert(w === 64 && h === 64, s"doc $docId dims")
      // EVERY pixel of every constant block equals its analytic value
      var b = 0
      while (b < 64) {
        val (bx, by) = (b % 8, b / 8)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val got = px((by * 8 + y) * w + bx * 8 + x)
            assert(got === vals(b),
              s"doc $docId block $b px($x,$y): got $got want ${vals(b)}")
            x += 1
          }
          y += 1
        }
        b += 1
      }
      // and the block-mean downsample lands exactly on the plane
      assert(JpegOps.blockMeans(jpg).toSeq === vals.toSeq)
    }
  }

  test("jpeg aHash pairs equal the PNG family's pairs (same analytic plane)") {
    val viaJpeg = JpegOps.jpegAhashPairs(spark, sf)
      .collect().map(_.toString).sorted
    val viaPng = ImageOps.imgAhashPairs(spark, sf)
      .collect().map(_.toString).sorted
    assert(viaJpeg === viaPng)
    assert(viaJpeg.nonEmpty, "fixture must contain near-dup pairs")
  }

  test("jpeg dHash pairs equal the PNG family's pairs (same analytic plane)") {
    val viaJpeg = JpegOps.jpegDhashPairs(spark, sf)
      .collect().map(_.toString).sorted
    val viaPng = ImageOps.imgDhashPairs(spark, sf)
      .collect().map(_.toString).sorted
    assert(viaJpeg === viaPng)
    assert(viaJpeg.nonEmpty, "fixture must contain near-dup pairs")
  }
}
