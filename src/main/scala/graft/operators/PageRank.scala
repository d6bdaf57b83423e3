package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over an arbitrary (src, dst) edge DataFrame — dependency
  * ranking for the service graph (which service's failure hurts most)
  * and, in the training-data world, link-based document quality à la
  * the original web-corpus filters.
  *
  * Shape per iteration: contributions = ranks ⋈ edges on src (both
  * sides hash-partitioned on the join key — one co-located join), then
  * groupBy dst. Dangling mass (nodes without out-edges) is a scalar
  * aggregate redistributed uniformly, keeping Σrank = 1 exactly.
  * Iterative-loop hygiene follows connectedComponents: localCheckpoint
  * every round so Catalyst never re-optimizes an N-deep plan, and the
  * per-round lineage stays constant-size — the property that lets the
  * same loop run 20 rounds over 10^10 edges.
  */
object PageRank {

  /** `edges` needs string/long columns `src`, `dst`; multi-edges are
    * allowed and weigh contributions naturally. Returns (vertex, rank)
    * after `iters` damped iterations from the uniform start. */
  def run(spark: SparkSession, edges: DataFrame, iters: Int = 10,
          damping: Double = 0.85): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val vertices = e.select($"src".as("vertex"))
      .union(e.select($"dst".as("vertex"))).distinct().localCheckpoint()
    val n = vertices.count()
    val outDeg = e.groupBy($"src".as("vertex")).agg(count(lit(1)).as("deg"))
    var ranks = vertices.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outDeg, Seq("vertex"), "left")
      // dangling nodes: no out-edges, their whole rank spreads uniformly
      val danglingMass = withDeg.filter($"deg".isNull)
        .agg(coalesce(sum($"rank"), lit(0.0))).collect()(0).getDouble(0)
      val contribs = withDeg.filter($"deg".isNotNull)
        .select($"vertex".as("src"), ($"rank" / $"deg").as("c"))
        .join(e, "src")
        .groupBy($"dst".as("vertex"))
        .agg(sum($"c").as("in_mass"))
      ranks = vertices
        .join(contribs, Seq("vertex"), "left")
        .select($"vertex",
          (lit((1.0 - damping) / n) +
           lit(damping) * (coalesce($"in_mass", lit(0.0)) + lit(danglingMass / n)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
