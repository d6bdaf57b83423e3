package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** The REAL-decode multimodal family (r8): images are genuine PNG bytes
  * (ImageIO-encoded), every query computes from ImageIO-DECODED
  * samples, and the oracle knows the pixels analytically. These tests
  * verify the codec-facing half the SQL oracle can't see: the payloads
  * are well-formed PNGs a stock decoder accepts, and the pair mining
  * equals a from-scratch brute-force over independently decoded
  * pixels. */
class ImageOpsSpec extends SparkSpec {

  private def analyticPixels(docId: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val g = docId / 3
    val r = (docId % 3).toInt
    Array.tabulate(64) { i =>
      val b = md.digest(s"$g:$i".getBytes("UTF-8"))(0) & 0xff
      if (i < r) (b + 128) % 256 else b
    }
  }

  test("generated payloads are real PNGs and decode to the analytic pixels") {
    val imgs = graft.llm.ImageOps.images(spark, sf).collect()
    assert(imgs.length === 500)
    imgs.take(50).foreach { row =>
      // PNG signature — these are container bytes, not a blob format
      assert(row.png.take(8).map(_ & 0xff).toSeq ===
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
      // a STOCK ImageIO.read (independent of the operator's decode
      // helper) recovers exactly the analytic plane — lossless round-trip
      val img = ImageIO.read(new ByteArrayInputStream(row.png))
      assert(img.getWidth === 8 && img.getHeight === 8)
      val got = Array.tabulate(64)(i => img.getRaster.getSample(i % 8, i / 8, 0))
      assert(got.toSeq === analyticPixels(row.doc_id).toSeq,
        s"decoded pixels differ for doc ${row.doc_id}")
    }
  }

  test("ahash pairs equal brute-force over independently decoded images") {
    val imgs = graft.llm.ImageOps.images(spark, sf).collect()
    def ahash(px: Array[Int]): Long = {
      val sum = px.take(63).sum
      (0 until 63).foldLeft(0L) { (h, j) =>
        if (px(j) * 63 > sum) h | (1L << j) else h
      }
    }
    val hashes = imgs.map { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.png))
      val px = Array.tabulate(64)(i => img.getRaster.getSample(i % 8, i / 8, 0))
      r.doc_id -> ahash(px)
    }
    val groups = hashes.groupBy(_._2).map { case (h, ms) =>
      h -> (ms.length.toLong, ms.map(_._1).min)
    }
    val want = (for {
      (ha, (na, da)) <- groups
      (hb, (nb, db)) <- groups
      if ha < hb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ha, hb, java.lang.Long.bitCount(ha ^ hb).toLong, na, nb, da, db)).toSet
    val got = graft.llm.ImageOps.imgAhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture produced no near-dup pairs")
    // the injected structure exists: some pairs are true near dups
    // (hamming in [1,3]) from the per-group pixel perturbation
    assert(want.exists(_._3 >= 1L))
  }

  test("downsample checksum matches a from-scratch 2x2 box mean") {
    val got = graft.llm.ImageOps.imgDownsample(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got.toSeq.sortBy(_._1).take(50).foreach { case (docId, (ow, oh, cs)) =>
      assert(ow === 4L && oh === 4L)
      val px = analyticPixels(docId)
      var want = 0L
      for (y <- 0 until 4; x <- 0 until 4) {
        val base = 2 * y * 8 + 2 * x
        val m = (px(base) + px(base + 1) + px(base + 8) + px(base + 9)) / 4
        want += (y * 4 + x + 1).toLong * m
      }
      assert(cs === want, s"checksum mismatch for doc $docId")
    }
  }

  test("dhash pairs equal brute-force over independently decoded images") {
    val imgs = graft.llm.ImageOps.images(spark, sf).collect()
    def dhash(px: Array[Int]): Long = {
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (px(y * 8 + x + 1) > px(y * 8 + x)) h |= 1L << (y * 7 + x)
      h
    }
    val hashes = imgs.map { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.png))
      val px = Array.tabulate(64)(i => img.getRaster.getSample(i % 8, i / 8, 0))
      r.doc_id -> dhash(px)
    }
    val groups = hashes.groupBy(_._2).map { case (h, ms) =>
      h -> (ms.length.toLong, ms.map(_._1).min)
    }
    val want = (for {
      (ha, (na, da)) <- groups
      (hb, (nb, db)) <- groups
      if ha < hb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ha, hb, java.lang.Long.bitCount(ha ^ hb).toLong, na, nb, da, db)).toSet
    val got = graft.llm.ImageOps.imgDhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture produced no near-dup dhash pairs")
    // a uniform +128 brightness shift mod 256 is NOT gradient-preserving,
    // but the injected leading-pixel perturbation still yields true
    // near-dups (small positive hamming) for the band join to find
    assert(want.exists(_._3 >= 1L))
  }

  test("video scene cuts: stock GIF container, SADs match, cuts at scene edges") {
    val vids = graft.llm.ImageOps.videos(spark, sf).collect()
    assert(vids.length === 500)
    // demux with the STOCK JDK GIF reader, independently of the
    // engine's own demux path, and compare against the analytic planes
    val md = java.security.MessageDigest.getInstance("MD5")
    def analyticFrame(docId: Long, f: Int): Array[Int] =
      Array.tabulate(64) { i =>
        val b = md.digest(s"v:$docId:${f / 3}:$i".getBytes("UTF-8"))(0) & 0xff
        if (i < 2) (b + f % 3) % 256 else b
      }
    vids.take(20).foreach { row =>
      // a real GIF89a container, stock-parseable end to end
      assert(new String(row.vid.take(6), "US-ASCII") === "GIF89a")
      val iis = ImageIO.createImageInputStream(
        new ByteArrayInputStream(row.vid))
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      assert(n === 8)
      (0 until n).foreach { f =>
        val img = reader.read(f)
        val got = Array.tabulate(64)(i => img.getRGB(i % 8, i / 8) & 0xff)
        assert(got.toSeq === analyticFrame(row.doc_id, f).toSeq,
          s"doc ${row.doc_id} frame $f: GIF round-trip must be lossless")
      }
      reader.dispose()
      iis.close()
    }
    val cuts = graft.llm.ImageOps.videoSceneCuts(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) ->
        ((r.getAs[Long]("sad_x64"), r.getAs[Boolean]("is_cut")))).toMap
    assert(cuts.size === 3500) // 500 docs × 7 transitions
    // scene boundaries are at frames 3 and 6 (scene = f div 3): cuts
    // exactly there, never inside a scene. Intra-scene SAD is the
    // 2-pixel jitter — usually ≤ 4 but up to 2·255 when the %256
    // wraps (b=254: +1→255, +2→0) — still far below the 2560 threshold
    cuts.foreach { case ((_, f), (sad, cut)) =>
      if (f == 3L || f == 6L) assert(cut, s"missed cut at frame $f (sad $sad)")
      else assert(!cut && sad <= 512L, s"false cut at frame $f (sad $sad)")
    }
  }

  test("entropy matches a from-scratch histogram fold over analytic pixels") {
    val got = graft.llm.ImageOps.imgEntropy(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_distinct_lumas"), r.getAs[Long]("h_micro"),
          r.getAs[Double]("entropy_bits"), r.getAs[Boolean]("flat"))))
      .toMap
    assert(got.size === 500)
    got.keys.toSeq.sorted.take(50).foreach { docId =>
      val counts = analyticPixels(docId).groupBy(identity).map(_._2.length)
      val hMicro = counts.map { c =>
        c.toLong * BigDecimal(1e4 * (6.0 - math.log(c.toDouble) / math.log(2.0)))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      assert(got(docId) === ((counts.size.toLong, hMicro,
        hMicro.toDouble / 64 / 1e4, counts.size < 8)))
      // md5-random 8x8 planes are high-entropy: nothing flat by accident
      assert(!got(docId)._4)
    }
  }
}
