package graft

import org.apache.spark.sql.SparkSession

/** MEASURED decode-vs-pipeline split for the media sf1 tails (round-9
  * verdict #7): the 10× sweep showed `mm_wav_windows` 5.57×,
  * `mm_img_entropy` 4.52×, `mm_video_scenecut` 4.04× — sub-linear but
  * above the ~2–3× of the relational families. This main separates each
  * query's cost into its FIXTURE-SYNTHESIS phase (encoding synthetic
  * PNG/GIF/WAV bytes — work a production deployment never does, since
  * real media arrives as stored bytes) and the decode+analytics
  * remainder (the part that represents the production pipeline), at
  * both sweep sizes. Prints one JSON line per query:
  * `{"query":…,"n_small":…,"gen_s":…,"full_s":…,"gen_b":…,"full_b":…,
  *   "ratio_full":…,"ratio_gen":…,"ratio_rest":…,"gen_share_big":…}`
  * where `rest = full − gen` approximates decode+analytics (the
  * generator runs inside the full query too, same code path, so the
  * subtraction is apples-to-apples).
  *
  * Reproduces with:
  *   sbt "runMain graft.MediaSplitBench"
  */
object MediaSplitBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm-up

    val nSmall = 2000
    val nBig = 20000
    val dirS = Sf1Scale.genDocCorpus(spark, nSmall)
    val dirB = Sf1Scale.genDocCorpus(spark, nBig)

    def best2(f: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // (query name, fixture-synthesis-only action, full-query action)
    val cases: Seq[(String, String => Unit, String => Unit)] = Seq(
      ("mm_img_entropy",
        d => { graft.llm.ImageOps.images(spark, d).count(); () },
        d => { graft.llm.ImageOps.imgEntropy(spark, d).count(); () }),
      ("mm_wav_windows",
        d => { graft.llm.AudioOps.wavs(spark, d).count(); () },
        d => { graft.llm.AudioOps.wavWindows(spark, d).count(); () }),
      ("mm_video_scenecut",
        d => { graft.llm.ImageOps.videos(spark, d).count(); () },
        d => { graft.llm.ImageOps.videoSceneCuts(spark, d).count(); () }))

    def r3(v: Double): String = f"$v%.3f"
    cases.foreach { case (name, gen, full) =>
      val genS = best2(gen(dirS))
      val fullS = best2(full(dirS))
      val genB = best2(gen(dirB))
      val fullB = best2(full(dirB))
      val restS = math.max(fullS - genS, 1e-9)
      val restB = math.max(fullB - genB, 1e-9)
      println(s"""{"query":"$name","n_small":$nSmall,"n_big":$nBig,""" +
        s""""gen_s":${r3(genS)},"full_s":${r3(fullS)},""" +
        s""""gen_b":${r3(genB)},"full_b":${r3(fullB)},""" +
        s""""ratio_full":${r3(fullB / fullS)},"ratio_gen":${r3(genB / genS)},""" +
        s""""ratio_rest":${r3(restB / restS)},""" +
        s""""gen_share_big":${r3(genB / fullB)}}""")
    }
    spark.stop()
  }
}
