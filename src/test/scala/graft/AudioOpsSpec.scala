package graft

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** The REAL-decode audio family (r12): clips are genuine RIFF/WAV
  * containers a stock `AudioSystem` accepts, decoded samples equal the
  * analytic PCM, and the window features match a from-scratch fold —
  * the codec-facing half the SQL oracle can't see. */
class AudioOpsSpec extends SparkSpec {

  private def analyticSamples(docId: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(512) { i =>
      val d = md.digest(s"a:$docId:$i".getBytes("UTF-8"))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toShort.toInt
    }
  }

  test("payloads are real WAVs a stock decoder accepts, PCM matches") {
    val clips = graft.llm.AudioOps.wavs(spark, sf).collect()
    assert(clips.length === 500)
    clips.take(50).foreach { row =>
      assert(new String(row.wav.take(4), "US-ASCII") === "RIFF")
      assert(new String(row.wav.slice(8, 12), "US-ASCII") === "WAVE")
      // an INDEPENDENT AudioSystem decode (not the operator's helper)
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(row.wav))
      val fmt = in.getFormat
      assert(fmt.getSampleRate === 8000f)
      assert(fmt.getChannels === 1)
      assert(fmt.getSampleSizeInBits === 16)
      val raw = in.readAllBytes()
      assert(raw.length === 1024)
      val got = Array.tabulate(512)(i =>
        (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort.toInt)
      assert(got.toSeq === analyticSamples(row.doc_id).toSeq,
        s"decoded PCM differs for doc ${row.doc_id}")
    }
  }

  test("window features match a from-scratch fold over analytic PCM") {
    val got = graft.llm.AudioOps.wavWindows(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("win")) ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("energy_q"),
          r.getAs[Double]("rms"), r.getAs[Long]("zcr"))))
      .toMap
    assert(got.size === 2000) // 500 docs × 4 windows
    got.keys.map(_._1).toSeq.distinct.sorted.take(25).foreach { docId =>
      val s = analyticSamples(docId)
      (0 until 4).foreach { w =>
        val win = s.slice(w * 128, (w + 1) * 128)
        val q = win.map(v => v.toLong * v).sum
        val zc = (1 until 128).count(i => (win(i) >= 0) != (win(i - 1) >= 0))
        assert(got((docId, w.toLong)) ===
          ((128L, q, math.sqrt(q.toDouble / 128), zc.toLong)))
      }
    }
    // md5-noise PCM has rich sign structure: every window crosses zero
    assert(got.values.forall(_._4 > 0L))
  }
}
