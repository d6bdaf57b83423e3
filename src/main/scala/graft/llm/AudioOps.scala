package graft.llm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL audio decode for the multimodal family (r12) — the
  * [[ImageOps]] play applied to audio: [[Multimodal.audioWindows]]
  * proves the window-geometry plumbing over a stub demux; this module
  * writes genuine RIFF/WAV containers (hand-rolled 44-byte header +
  * 16-bit PCM, the public WAVE spec) and DECODES them with the JDK's
  * `javax.sound.sampled.AudioSystem` — zero new dependencies, executor
  * side, one decoder per partition.
  *
  * The oracle trick, again: samples are GENERATED from an analytic
  * function — int16 from the first two md5 bytes of `"a:<doc>:<i>"` —
  * encoded to real WAV bytes, then every query decodes those bytes
  * through the REAL codec and computes from the decoded PCM. WAV PCM
  * is lossless, so the DuckDB oracle reproduces the identical integers
  * straight from the md5 function with NO codec: hash-green proves
  * decode∘encode = id on real audio bytes.
  *
  * Scale shape: media bytes never shuffle — generate, decode, window,
  * aggregate is one narrow pass; the only exchange carries per-window
  * integer features. */
object AudioOps {

  private val SampleRate = 8000
  private val NSamples = 512
  private val Win = 128

  /** Analytic int16 sample: big-endian first two md5 bytes of
    * `"a:<doc>:<i>"`, two's-complement — identical to DuckDB
    * `('0x'||substr(md5(...),1,4))::BIGINT` minus 65536 when ≥ 32768. */
  private def sampleFor(md: java.security.MessageDigest,
                        docId: Long, i: Int): Int = {
    val d = md.digest(s"a:$docId:$i".getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toShort.toInt
  }

  case class WavRow(doc_id: Long, wav: Array[Byte])

  /** Deterministic REAL WAVs: one mono 16-bit little-endian PCM clip
    * per document behind a hand-written RIFF header (the 44-byte
    * canonical layout every decoder accepts). */
  def wavs(spark: SparkSession, sfDir: String): Dataset[WavRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select($"doc_id").as[Long])
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { docId =>
          val out = new ByteArrayOutputStream()
          def w32(v: Int): Unit = {
            out.write(v & 0xff); out.write((v >> 8) & 0xff)
            out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
          }
          def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
          val dataLen = NSamples * 2
          out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
          out.write("WAVE".getBytes("US-ASCII"))
          out.write("fmt ".getBytes("US-ASCII")); w32(16)
          w16(1); w16(1); w32(SampleRate); w32(SampleRate * 2); w16(2); w16(16)
          out.write("data".getBytes("US-ASCII")); w32(dataLen)
          var i = 0
          while (i < NSamples) {
            val s = sampleFor(md, docId, i)
            out.write(s & 0xff); out.write((s >> 8) & 0xff)
            i += 1
          }
          WavRow(docId, out.toByteArray)
        }
      }
  }

  /** Decode WAV bytes back to int16 samples via the REAL codec path
    * (AudioSystem parses the RIFF/fmt chunks, not our writer). */
  private def decode(bytes: Array[Byte]): (Float, Array[Int]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    val raw = in.readAllBytes()
    val n = raw.length / 2
    val px = new Array[Int](n)
    var i = 0
    while (i < n) {
      px(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
      i += 1
    }
    (fmt.getSampleRate, px)
  }

  /** Really-decoded clip metadata: container-parsed sample rate,
    * decoded sample count, exact duration in µs (n·125 at 8 kHz), peak
    * absolute amplitude and total absolute energy — all integers the
    * analytic oracle derives without the codec. */
  def wavMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavs(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (sr, s) = decode(r.wav)
        (r.doc_id, sr.toLong, s.length.toLong, s.length.toLong * 125L,
          s.map(v => math.abs(v).toLong).max,
          s.map(v => math.abs(v).toLong).sum)
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "duration_us",
      "peak_abs", "sum_abs")
  }

  /** Analytic µ-law CODE byte: first md5 byte of `"u:<doc>:<i>"` — the
    * fixture stores the wire byte itself, so decode (not encode) is
    * the path under test. */
  private def ulawCodeFor(md: java.security.MessageDigest,
                          docId: Long, i: Int): Int =
    md.digest(s"u:$docId:$i".getBytes("UTF-8"))(0) & 0xff

  /** Deterministic REAL µ-law WAVs (G.711, WAVE format tag 7) — the
    * telephony codec: 8-bit companded code bytes behind the same
    * hand-written RIFF layout, one clip per document. */
  def ulawWavs(spark: SparkSession, sfDir: String): Dataset[WavRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select($"doc_id").as[Long])
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { docId =>
          val out = new ByteArrayOutputStream()
          def w32(v: Int): Unit = {
            out.write(v & 0xff); out.write((v >> 8) & 0xff)
            out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
          }
          def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
          out.write("RIFF".getBytes("US-ASCII")); w32(36 + NSamples)
          out.write("WAVE".getBytes("US-ASCII"))
          out.write("fmt ".getBytes("US-ASCII")); w32(16)
          w16(7); w16(1); w32(SampleRate); w32(SampleRate); w16(1); w16(8)
          out.write("data".getBytes("US-ASCII")); w32(NSamples)
          var i = 0
          while (i < NSamples) { out.write(ulawCodeFor(md, docId, i)); i += 1 }
          WavRow(docId, out.toByteArray)
        }
      }
  }

  /** The G.711 µ-law expansion itself (CCITT reference shape, 16-bit
    * aligned): the JDK decoder reproduces this bit-for-bit for all 256
    * codes (UlawSpec pins it), and the DuckDB oracle computes the same
    * integers — both engines against the public spec, no shared
    * tables. */
  private[graft] def ulaw2linear(code: Int): Int = {
    val u = ~code & 0xff
    val e = (u >> 4) & 7
    val m = u & 0x0f
    val mag = ((m * 8 + 132) << e) - 132
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Decode a µ-law WAV through the STOCK chain: AudioSystem parses
    * the container, the format-conversion path expands G.711 to
    * 16-bit signed PCM. */
  private def decodeUlaw(bytes: Array[Byte]): Array[Int] = {
    val src = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val pcm = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      src.getFormat.getSampleRate, 16, 1, 2,
      src.getFormat.getSampleRate, false)
    val dec = AudioSystem.getAudioInputStream(pcm, src)
    val raw = dec.readAllBytes()
    val n = raw.length / 2
    Array.tabulate(n)(i =>
      (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort.toInt)
  }

  /** `mm_wav_ulaw`: really-decoded G.711 clip statistics — sample
    * count, exact signed sum, absolute energy and peak of the
    * EXPANDED PCM. The oracle re-derives every sample from the µ-law
    * formula over the analytic code bytes (integer-only), so a hash
    * match proves the stock telephony decode path end to end. */
  def ulawMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ulawWavs(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val s = decodeUlaw(r.wav)
        (r.doc_id, s.length.toLong,
          s.map(_.toLong).sum,
          s.map(v => math.abs(v).toLong).sum,
          s.map(v => math.abs(v).toLong).max)
      }
    }.toDF("doc_id", "n_samples", "sum_pcm", "sum_abs", "peak_abs")
  }

  /** Clipping / silence QA from really-decoded PCM (r12) — the audio
    * curation gate run before any transcription or embedding spend:
    * count samples saturating the int16 range (|s| ≥ `clipAbs`,
    * default within ~1% of full scale — a recording chain driven past
    * its headroom) and near-silent samples (|s| ≤ `silentAbs`, ~1% of
    * full scale — dead air), report both as exact integer basis
    * points plus the peak. The analytic samples are ~uniform int16,
    * so both detectors fire at a realistic ~1% rate on this corpus.
    * Same scale shape as [[wavMeta]]: decode + count is one narrow
    * executor-side pass; media bytes never shuffle. */
  def wavClipping(spark: SparkSession, sfDir: String,
                  clipAbs: Int = 32440, silentAbs: Int = 327): DataFrame = {
    import spark.implicits._
    wavs(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (_, s) = decode(r.wav)
        var nClip = 0L
        var nSil = 0L
        var peak = 0L
        var i = 0
        while (i < s.length) {
          val a = math.abs(s(i)).toLong
          if (a >= clipAbs) nClip += 1
          if (a <= silentAbs) nSil += 1
          if (a > peak) peak = a
          i += 1
        }
        val n = s.length.toLong
        (r.doc_id, n, nClip, nSil,
          nClip * 10000L / n, nSil * 10000L / n, peak)
      }
    }.toDF("doc_id", "n_samples", "n_clipped", "n_silent",
      "clipped_bp", "silent_bp", "peak_abs")
  }

  /** Per-window audio features from really-decoded PCM: RMS energy
    * (`sqrt(Σs²/n)` — integer sum, one division, one sqrt: bit-exact
    * cross-engine) and zero-crossing rate (sign flips, the classic
    * voiced/unvoiced discriminator) over disjoint 128-sample windows —
    * the feature-extraction shape every audio curation pipeline runs
    * before embedding. */
  def wavWindows(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavs(spark, sfDir).mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, s) = decode(r.wav)
        Iterator.range(0, s.length / Win).map { w =>
          val from = w * Win
          var q = 0L
          var zc = 0L
          var i = from
          while (i < from + Win) {
            q += s(i).toLong * s(i)
            if (i > from && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
            i += 1
          }
          (r.doc_id, w.toLong, Win.toLong, q,
            math.sqrt(q.toDouble / Win), zc)
        }
      }
    }.toDF("doc_id", "win", "n_samples", "energy_q", "rms", "zcr")
  }

  private val FpWin = 32 // fingerprint window: 16 windows per clip

  /** RIFF/WAV container for int16 mono PCM — the same hand-rolled
    * 44-byte header [[wavs]] writes, factored for the fingerprint
    * generator. */
  private def pcmWav(samples: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    val dataLen = samples.length * 2
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(SampleRate); w32(SampleRate * 2); w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    samples.foreach { s => out.write(s & 0xff); out.write((s >> 8) & 0xff) }
    out.toByteArray
  }

  /** Clips with PLANTED near-duplicates (the [[ImageOps]] `doc_id/3`
    * seed discipline): three docs share each seed's audio, perturbed
    * by +1000 (int16 wraparound — exact in modular arithmetic) on the
    * first `(doc_id%3)·16` samples — a re-encode/level-tweak stand-in
    * that moves only window 0's energy, so variant fingerprints sit
    * within Hamming 1 of the original. */
  private[graft] def fpWavs(spark: SparkSession, sfDir: String): Dataset[WavRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select($"doc_id").as[Long])
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { docId =>
          val seed = docId / 3
          val cut = (docId % 3).toInt * 16
          val samples = Array.tabulate(NSamples) { i =>
            val d = md.digest(s"af:$seed:$i".getBytes("UTF-8"))
            val u = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
            val u2 = if (i < cut) (u + 1000) % 65536 else u
            u2.toShort.toInt
          }
          WavRow(docId, pcmWav(samples))
        }
      }
  }

  /** Per-clip acoustic fingerprints from really-decoded PCM: 16
    * disjoint 32-sample windows, bit `w` = 1 iff `E_w > E_{w−1}` (15
    * bits of energy deltas — level-invariant, the property that makes
    * it a fingerprint and not a checksum). */
  /** The per-clip kernel on raw WAV bytes — decode through the REAL
    * codec, window energies, delta bits. Shared verbatim by the batch
    * queries and [[graft.streaming.StreamingAudioDedup]] so stream and
    * batch fingerprints agree bit-for-bit. */
  private[graft] def fpOfWav(bytes: Array[Byte]): Long = {
    val (_, s) = decode(bytes)
    val e = Array.tabulate(s.length / FpWin) { w =>
      var acc = 0L
      var i = w * FpWin
      while (i < (w + 1) * FpWin) { acc += math.abs(s(i)); i += 1 }
      acc
    }
    var fp = 0L
    var w = 1
    while (w < e.length) {
      if (e(w) > e(w - 1)) fp |= 1L << (w - 1)
      w += 1
    }
    fp
  }

  /** The 2-band pigeonhole keys of a fingerprint (8 + 7 bits) — a
    * Hamming-1 pair always shares one. Shared by the batch band join
    * and the streaming bucket state. */
  private[graft] def fpBands(fp: Long): Seq[(Int, Long)] =
    Seq(0 -> (fp & 255L), 1 -> (fp >> 8))

  private[graft] def fingerprints(spark: SparkSession,
                                  sfDir: String): DataFrame = {
    import spark.implicits._
    fpWavs(spark, sfDir).mapPartitions { rows =>
      rows.map(r => (r.doc_id, fpOfWav(r.wav)))
    }.toDF("doc_id", "fp")
  }

  /** Acoustic-fingerprint near-duplicate mining (r18) — the
    * Haitsma–Kalker energy-delta scheme (ISMIR'02, the public method
    * behind broadcast-monitoring fingerprints) over REALLY-decoded
    * PCM, mined at the DISTINCT-FINGERPRINT level (the
    * [[Multimodal.ahashPairs]] discipline): clips group by their
    * 15-bit fingerprint first, the 2-band pigeonhole LSH (8+7 bits —
    * Hamming ≤ 1 is NEVER missed) joins distinct fingerprints, and
    * clip multiplicities ride as counts. Candidate volume is thereby
    * bounded by the 2¹⁵ fingerprint domain, NOT the corpus square —
    * identical-fingerprint families collapse to one row each (their
    * expansion is the exact-dup grouping's job, as with md5 frame
    * dedup). Same-seed planted variants differ in window 0's energy
    * alone → their fingerprints are equal (same group) or Hamming 1
    * apart (always surfaced). Scale shape: media bytes never shuffle —
    * decode → 15-bit fp is one narrow pass; the exchange carries one
    * row per distinct fingerprint. At longer clip durations the
    * fingerprint widens (more windows) and bands widen with it, which
    * is what keeps bucket occupancy bounded on a real corpus. */
  /** Distinct-fingerprint group table (fp → clip count, min doc),
    * pinned AND cached per corpus: both band-join sides of the pair
    * miner reuse it (without the checkpoint each side re-decodes the
    * whole corpus — the dedup_source_impact double-compute lesson),
    * and the clusters query reuses the same decode instead of its own
    * pass (the persisted-ANN-index per-corpus cache pattern; the
    * frame is bounded by the 2¹⁵ fp domain). */
  /** Keyed by (session, path) and self-evicting on stopped sessions:
    * a path-only key would serve a DataFrame bound to a dead
    * SparkSession after a stop/recreate in the same JVM, and would
    * silently serve stale groups if the source parquet were
    * regenerated under a fresh session. */
  private val fpGroupsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def fpGroups(spark: SparkSession, sfDir: String): DataFrame = {
    fpGroupsCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    fpGroupsCache.computeIfAbsent((spark, sfDir), _ => {
      import spark.implicits._
      fingerprints(spark, sfDir)
        .groupBy($"fp")
        .agg(count(lit(1)).as("n_clips"), min($"doc_id").as("min_doc"))
        .localCheckpoint()
    })
  }

  def audioFingerprint(spark: SparkSession, sfDir: String,
                       maxHamming: Int = 1): DataFrame = {
    import spark.implicits._
    val groups = fpGroups(spark, sfDir)
    val banded = groups
      .withColumn("band", explode(sequence(lit(0), lit(1))))
      .withColumn("band_val", expr("shiftright(fp, band * 8) & 255"))
    val a = banded.select($"band", $"band_val", $"fp".as("fa"),
      $"n_clips".as("n_a"), $"min_doc".as("doc_a"))
    val b = banded.select($"band", $"band_val", $"fp".as("fb"),
      $"n_clips".as("n_b"), $"min_doc".as("doc_b"))
    a.join(b, Seq("band", "band_val"))
      .filter($"fa" < $"fb")
      .select($"fa", $"fb", $"n_a", $"n_b", $"doc_a", $"doc_b")
      .distinct() // a close pair can collide in both bands
      .withColumn("hamming", expr("bit_count(fa ^ fb)").cast("long"))
      .filter($"hamming" <= maxHamming) // fa < fb excludes hamming 0
      .withColumn("clip_pairs", $"n_a" * $"n_b")
      .select($"fa", $"fb", $"hamming", $"n_a", $"n_b", $"clip_pairs",
              $"doc_a", $"doc_b")
  }

  /** Acoustically-similar clip FAMILIES (r18): [[audioFingerprint]]'s
    * near-dup fingerprint pairs fed through the shared pointer-jumping
    * connected-components solve ([[Dedup.adaptiveComponents]]) — each
    * cluster is a family of clips whose fingerprints chain within
    * Hamming 1, sized in both distinct fingerprints and total clips.
    * The audio twin of [[Multimodal.ahashClusters]]: the label graph
    * holds only near-dup fingerprint values (bounded by the 2¹⁵
    * domain), orders of magnitude below clip count. */
  def audioClusters(spark: SparkSession, sfDir: String,
                    maxHamming: Int = 1): DataFrame = {
    import spark.implicits._
    val pairs = audioFingerprint(spark, sfDir, maxHamming)
      .select($"fa", $"fb").localCheckpoint()
    val labels = Dedup.adaptiveComponents(pairs)
      .select($"doc_id".as("fp"), $"label")
    val groups = fpGroups(spark, sfDir).select($"fp", $"n_clips")
    labels.join(groups, Seq("fp"))
      .groupBy($"label".as("cluster_id"))
      .agg(count(lit(1)).as("n_fps"),
           sum($"n_clips").as("n_clips"),
           max($"fp").as("max_fp"))
  }
}
