package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFormat, AudioSystem}

import graft.llm.AudioOps

/** G.711 µ-law decode: the STOCK JDK conversion chain must agree with
  * the public-spec expansion formula for every one of the 256 code
  * bytes — the agreement that licenses mm_wav_ulaw's codec-free
  * integer oracle. */
class UlawSpec extends SparkSpec {

  test("stock AudioSystem expands all 256 mu-law codes per the G.711 formula") {
    val n = 256
    val out = new ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + n)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(7); w16(1); w32(8000); w32(8000); w16(1); w16(8)
    out.write("data".getBytes("US-ASCII")); w32(n)
    (0 until n).foreach(out.write)
    val src = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(out.toByteArray))
    val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val dec = AudioSystem.getAudioInputStream(pcm, src)
    val raw = dec.readAllBytes()
    assert(raw.length === n * 2)
    (0 until n).foreach { code =>
      val jdk = (((raw(2 * code + 1) & 0xff) << 8) |
        (raw(2 * code) & 0xff)).toShort.toInt
      assert(jdk === AudioOps.ulaw2linear(code), s"code $code")
    }
  }

  test("mm_wav_ulaw decodes through the real chain (spot row)") {
    import org.apache.spark.sql.functions._
    val row = AudioOps.ulawMeta(spark, sf).filter(col("doc_id") === 0L).head
    assert(row.getLong(1) === 512L) // n_samples
    // peak of |G.711| is bounded by full-scale 32124
    assert(row.getLong(4) <= 32124L && row.getLong(4) > 0L)
  }
}
