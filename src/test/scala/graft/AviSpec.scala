package graft

import graft.llm.{AviOps, ImageOps, JpegOps}

/** Hand-rolled RIFF/AVI (MJPEG) container: writer↔demux round-trip,
  * stock-decoder frame exactness, and scene-cut parity with the GIF
  * arm (same analytic planes ⇒ same SADs ⇒ same cuts). */
class AviSpec extends SparkSpec {

  test("container round-trip: demux returns every MJPEG frame intact") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val frames = (0 until ImageOps.VFrames).map(f =>
      JpegOps.writeGrayJpeg(ImageOps.videoPixelsFor(md, 7L, f)))
    val avi = AviOps.writeAvi(frames)
    // container magic per the RIFF spec
    assert(new String(avi.take(4), "US-ASCII") === "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    val back = AviOps.demuxFrames(avi)
    assert(back.size === frames.size)
    back.zip(frames).zipWithIndex.foreach { case ((b, f), i) =>
      assert(b.toSeq === f.toSeq, s"frame $i bytes diverged")
    }
    // and each demuxed frame block-means to its analytic plane via the
    // STOCK decoder (odd-length frames exercise the even-padding rule)
    back.zipWithIndex.foreach { case (b, f) =>
      assert(JpegOps.blockMeans(b).toSeq ===
        ImageOps.videoPixelsFor(md, 7L, f).toSeq, s"frame $f plane")
    }
  }

  test("avi scene cuts equal the GIF family's (same analytic planes)") {
    val viaAvi = AviOps.aviSceneCuts(spark, sf)
      .collect().map(_.toString).sorted
    val viaGif = ImageOps.videoSceneCuts(spark, sf)
      .collect().map(_.toString).sorted
    assert(viaAvi === viaGif)
    assert(viaAvi.nonEmpty)
  }
}
