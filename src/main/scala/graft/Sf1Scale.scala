package graft

import org.apache.spark.sql.SparkSession

/** Opt-in 10× SCALE DEMONSTRATION (`SPARK_GRAFT_SF1=1`): the dedup/ANN
  * scale claims measured, not argued. Two deterministic uniform-random
  * embedding corpora with the testdata schema — N=2,000 (sf0.1's
  * embeddings size) and N=20,000 (10×) — are generated into temp dirs,
  * the heaviest embeddings-only dedup/sim queries run on both
  * (best-of-2), and the observed big/small time ratio is emitted.
  *
  * What the ratio proves: with [[graft.llm.SimOps.autoK]] (r6) the
  * within-cluster candidate volume is O(N·cap), so a 10× corpus should
  * cost ~10× plus amortized fixed overhead — observed ratios well under
  * ~20 are linear-ish scaling; a fixed-k quadratic would show ~100× on
  * the pair-bound queries (`dedup_semantic`, `sim_knn_graph`). The
  * corpus is GENERATED (same uniform statistics as the driver's
  * embeddings table) because the driver materializes no sf1 parquet;
  * both sizes use the same generator so the comparison is apples to
  * apples.
  *
  * Results go into BENCH_full.json's `sf1` field and to
  * `BENCH_sf1.json` at the working directory.
  */
object Sf1Scale {

  private val MIX = 2654435761L

  /** Uniform in [-1, 1) with 2^11 levels, from an integer mix —
    * deterministic, no RNG state, parallelizable per element. */
  private def coord(i: Long, d: Int): Float = {
    val h = java.lang.Math.floorMod((i * 64 + d + 1) * MIX, 4096L)
    ((h - 2048L) / 2048.0).toFloat
  }

  private def genCorpus(spark: SparkSession, n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-sf1-$n").toString
    spark.range(n.toLong).as[Long]
      .mapPartitions(_.map(i =>
        (i, Array.tabulate(64)(d => coord(i, d)), (i % 20).toInt)))
      .toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The heaviest embeddings-only queries: the two autoK fix targets
    * plus the linear-scan and bucketed-ANN scale paths for contrast. */
  private val queries: Seq[String] = Seq(
    "dedup_semantic", "sim_knn_graph", "sim_topk_bruteforce", "sim_lsh_ann",
    "sim_ivf_kmeans", "sim_kmeans_centroids", "sim_int8_topk",
    "sim_range_search")

  def maybeRun(spark: SparkSession): Option[String] =
    if (!sys.env.get("SPARK_GRAFT_SF1").exists(_.nonEmpty)) None
    else Some(run(spark))

  def run(spark: SparkSession): String = {
    val nSmall = 2000
    val nBig = 20000
    val dirSmall = genCorpus(spark, nSmall)
    val dirBig = genCorpus(spark, nBig)
    def time(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def r3(v: Double): String = f"$v%.3f"
    val rows = queries.map { q =>
      val s = time(q, dirSmall)
      val b = time(q, dirBig)
      q -> ((s, b, b / math.max(s, 1e-9)))
    }
    val json = rows.map { case (q, (s, b, r)) =>
      s""""$q":{"small":${r3(s)},"big":${r3(b)},"ratio":${r3(r)}}"""
    }.mkString(
      s"""{"n_small":$nSmall,"n_big":$nBig,"factor":10,"queries":{""",
      ",", "}}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_sf1.json"),
      json.getBytes("UTF-8")) catch { case _: Throwable => () }
    json
  }
}
