package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over embedding columns (SURVEY.md §2.3).
  *
  * `simTopkBruteforce` is the correctness baseline: exact cosine top-k
  * with the (small) query set broadcast against the full corpus — one
  * pass over the data, no shuffle of the big side. `lshAnn` is the scale
  * path: random-hyperplane buckets turn the cross product into an
  * equi-join on bucket id.
  *
  * Cosines run through the native codegen expression
  * [[graft.functions.CosineSim]] — one fused loop inside whole-stage
  * codegen, no UDF serialization.
  */
object SimOps {

  /** Exact cosine top-k: queries (vec_id < nQueries) broadcast against
    * every candidate — one codegen'd pass over the corpus, no shuffle of
    * the big side. Ranking uses the 6-decimal-rounded cosine with vec_id
    * tie-break so ordering is engine-stable. */
  def simTopkBruteforce(spark: SparkSession, sfDir: String,
                        nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    val q = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"vec".as("qvec"))
    val ranked = emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos6", round(call_function("cosine_sim", $"vec", $"qvec"), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos6".desc, $"vec_id".asc)))
    ranked.filter($"rnk" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cos6".as("cosine"),
              $"rnk".cast("long").as("rnk"))
  }

  /** IVF-style ANN: partition the corpus into inverted lists by nearest
    * centroid (deterministic centroid set: the first `nCentroids`
    * vectors stand in for a k-means codebook), then each query probes
    * only its own centroid's list (nprobe=1) with exact re-ranking
    * inside. The scale shape of FAISS-IVF on Spark: assignment is one
    * broadcast pass, the probe is an equi-join on centroid id — the
    * corpus is never cross-joined. Argmax assignment runs through
    * [[graft.functions.TopKStructs]] k=1 (hash agg, no sort). */
  def ivfAnn(spark: SparkSession, sfDir: String, nCentroids: Int = 4,
             nQueries: Int = 8, k: Int = 5, nprobe: Int = 1): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    val cents = emb.filter($"vec_id" < nCentroids)
      .select($"vec_id".as("cid"), $"vec".as("cvec"))
    val scored = emb.filter($"vec_id" >= nCentroids)
      .crossJoin(broadcast(cents))
      .withColumn("cos6", round(call_function("cosine_sim", $"vec", $"cvec"), 6))
    val assign = scored
      .groupBy($"vec_id")
      .agg(element_at(call_function("top_k_structs",
        struct($"cos6", (-$"cid").as("ncid"), $"cid"), lit(1)), 1)
        .getField("cid").as("cid"))
    val indexed = assign.join(emb, "vec_id")
    // queries probe their top-`nprobe` centroid lists (the FAISS recall
    // knob): inverted lists are disjoint, so probing more lists only
    // adds candidates — no dedup needed
    val q = scored.filter($"vec_id" < nCentroids + nQueries)
      .groupBy($"vec_id")
      .agg(call_function("top_k_structs",
        struct($"cos6", (-$"cid").as("ncid"), $"cid"), lit(nprobe)).as("top"))
      .select($"vec_id".as("query_id"), explode($"top.cid").as("cid"))
      .join(emb.select($"vec_id".as("query_id"), $"vec".as("qvec")), "query_id")
    indexed.join(broadcast(q), Seq("cid"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos6", round(call_function("cosine_sim", $"vec", $"qvec"), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos6".desc, $"vec_id".asc)))
      .filter($"rnk" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cos6".as("cosine"),
              $"rnk".cast("long").as("rnk"))
  }

  private val MIX = 2654435761L

  /** Deterministic pseudo-random hyperplane coefficient for (plane j,
    * dim d): integer mix → value in [-1, 1]. Pure arithmetic so the
    * whole signature stays a codegen-friendly expression. */
  private def coef(j: Column, d: Column): Column =
    (pmod((j * 64 + d + 1) * lit(MIX), lit(97L)) - 48L) / 48.0

  /** Hyperplane signature in plain JIT'd Scala — the 16×dim dot-product
    * loop is exactly the hot per-row math that typed mapPartitions beats
    * interpreted higher-order expressions at. Same formula as [[coef]]. */
  private def bucketOf(vec: Array[Double]): Long = {
    var bucket = 0L
    var j = 0
    while (j < 16) {
      var dotJ = 0.0
      var d = 0
      while (d < vec.length) {
        val c = (java.lang.Math.floorMod((j * 64L + d + 1) * MIX, 97L) - 48L) / 48.0
        dotJ += vec(d) * c
        d += 1
      }
      if (dotJ > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Random-hyperplane LSH ANN: 16 sign bits → bucket id; query joins
    * its bucket only (equi-join replaces the cross product at scale).
    * Exact cosine re-ranking within the bucket. */
  def lshAnn(spark: SparkSession, sfDir: String,
             nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        rows.map { case (id, e) =>
          val vec = e.map(_.toDouble)
          (id, vec, bucketOf(vec))
        }
      }
      .toDF("vec_id", "vec", "bucket")
    val q = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"vec".as("qvec"), $"bucket")
    val ranked = emb.select($"vec_id", $"vec", $"bucket")
      .join(broadcast(q), "bucket")
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos6", round(call_function("cosine_sim", $"vec", $"qvec"), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos6".desc, $"vec_id".asc)))
    ranked.filter($"rnk" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cos6".as("cosine"),
              $"rnk".cast("long").as("rnk"))
  }

  /** Int8-quantized cosine top-k — the storage/bandwidth scale path
    * (at 100 TB the embedding column is the bulk of the bytes; int8
    * cuts the scan 4-8× and SIMD dot products run on the quantized
    * codes, exactly FAISS's SQ8). Per-vector symmetric quantization
    * q_i = round(x_i·127/max|x|); the quantized cosine is an ALL-EXACT
    * computation (integer products summed far below 2^53, IEEE sqrt and
    * divide correctly rounded), so the approximation is reproducible
    * bit-for-bit in any engine — unlike libm-dependent float kernels.
    * Re-uses the codegen'd [[graft.functions.CosineSim]] over the
    * integer-valued arrays. */
  /** Product-quantization ANN (PQ + asymmetric distance computation —
    * FAISS's memory-compression workhorse): vectors compress to M=4
    * subspace codes (here 3 bits each against an 8-entry codebook built
    * from the first 8 vectors' subvectors), queries stay raw, and the
    * approximate L2² is the sum of M lookup-table entries. At 100 TB
    * the index is M bytes per vector instead of 4·D — the candidate
    * scan reads codes, not floats. Every arithmetic step is an ORDERED
    * fold of IEEE basic ops (no aggregation-order dependence: the four
    * subspace terms come back as conditional single-element sums and
    * add in fixed order), so the scores reproduce bit-for-bit in the
    * oracle.
    *
    * Honesty note: the codebook is UNTRAINED (first-nTrain subvectors —
    * k-means iterations would make centroid means aggregation-order-
    * dependent and break reproducibility), and the synthetic embeddings
    * are uniform-random — PQ's worst case (pairwise distances
    * concentrate, so coarse codes barely order candidates; measured
    * recall@5 ≈ 0.1-0.3 at any codebook size). This entry demonstrates
    * the compression/ADC MACHINERY exactly; ranking quality on real
    * clustered embeddings needs trained codebooks. */
  def pqAnn(spark: SparkSession, sfDir: String, nTrain: Int = 8,
            nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val subDim = 16 // 64 dims / M=4 subspaces
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    val train = emb.filter($"vec_id" < nTrain)
      .select($"vec_id".as("cid"), $"vec".as("cvec"))
    // per-subspace L2², folded left in dim order (deterministic)
    def subDists(a: Column, b: Column): Column =
      transform(sequence(lit(0), lit(3)), s =>
        aggregate(sequence(s * subDim, s * subDim + (subDim - 1)), lit(0.0),
          (acc, i) => acc +
            (element_at(a, i + 1) - element_at(b, i + 1)) *
            (element_at(a, i + 1) - element_at(b, i + 1))))
    val scored = emb.filter($"vec_id" >= nTrain)
      .crossJoin(broadcast(train))
      .withColumn("ds", subDists($"vec", $"cvec"))
      .select($"vec_id", $"cid", posexplode($"ds").as(Seq("s", "dist")))
    val codes = scored.groupBy($"vec_id", $"s")
      .agg(element_at(call_function("top_k_structs",
        struct($"dist", $"cid"), lit(1),
        array(lit(true), lit(true)), array(lit(false), lit(false))), 1)
        .getField("cid").as("code"))
    // query lookup tables: raw subvector → every codebook entry
    val lut = scored.filter($"vec_id" < nTrain + nQueries)
      .select($"vec_id".as("query_id"), $"s", $"cid".as("code"),
              $"dist".as("qdist"))
    codes.join(broadcast(lut), Seq("s", "code"))
      .filter($"vec_id" =!= $"query_id")
      .groupBy($"query_id", $"vec_id")
      .agg(
        sum(when($"s" === 0, $"qdist").otherwise(0.0)).as("d0"),
        sum(when($"s" === 1, $"qdist").otherwise(0.0)).as("d1"),
        sum(when($"s" === 2, $"qdist").otherwise(0.0)).as("d2"),
        sum(when($"s" === 3, $"qdist").otherwise(0.0)).as("d3"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id")
          .orderBy(($"d0" + $"d1" + $"d2" + $"d3").asc, $"vec_id".asc)))
      .filter($"rnk" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"),
              round($"d0" + $"d1" + $"d2" + $"d3", 6).as("adist"),
              $"rnk".cast("long").as("rnk"))
  }

  def int8Topk(spark: SparkSession, sfDir: String,
               nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
      .withColumn("m", array_max(transform($"vec", x => abs(x))))
      .filter($"m" > 0)
      .withColumn("q", transform($"vec",
        x => round(x * lit(127) / $"m", 0).cast("long").cast("double")))
      .select($"vec_id", $"q")
    val q = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"q".as("qq"))
    emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos6", round(call_function("cosine_sim", $"q", $"qq"), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos6".desc, $"vec_id".asc)))
      .filter($"rnk" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cos6".as("cosine"),
              $"rnk".cast("long").as("rnk"))
  }

  /** Range search (radius query): ALL neighbors with cosine ≥ `tau`,
    * not a fixed k — the dedup-oriented sibling of top-k (near-dup
    * mining wants "everything above the threshold", however many). Same
    * broadcast-queries shape as [[simTopkBruteforce]]: one codegen'd
    * pass, result size data-dependent. No window/sort at all — the
    * filter replaces ranking, so this is strictly cheaper than top-k. */
  def rangeSearch(spark: SparkSession, sfDir: String,
                  nQueries: Int = 8, tau: Double = 0.3): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    val q = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"vec".as("qvec"))
    emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos6", round(call_function("cosine_sim", $"vec", $"qvec"), 6))
      .filter($"cos6" >= tau)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cos6".as("cosine"))
  }
}
