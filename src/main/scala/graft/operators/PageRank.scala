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

  /** Oracle-exact PageRank over the supplier–part bipartite graph:
    * lineitem's (supplier, part) co-occurrence counts become weighted
    * edges in BOTH directions (so every vertex has out-degree — no
    * dangling mass), and `iters` damped power iterations run in integer
    * MICRO-units: each per-edge contribution is
    * `round(0.85 * rank_micro * w / out_w)` quantized to a long BEFORE
    * the per-vertex sum, so the fixpoint is bit-identical in any engine
    * regardless of aggregation order (same trick as BM25 / RRF).
    *
    * Scale shape: the heavy lift is the one-pass edge aggregation over
    * lineitem (hash agg with map-side combine); the iteration then runs
    * on #vertices + #distinct-pairs rows. Per round: ranks ⋈ edges on
    * src (both hash-partitioned on the key), groupBy dst — the
    * constant-lineage `localCheckpoint` loop proven by [[run]]. Output
    * is the top-25 vertices with a vertex-id tie-break. */
  def bipartiteExact(spark: SparkSession, sfDir: String, iters: Int = 6,
                     topK: Int = 25,
                     broadcastVertexLimit: Long = 8000000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // The loop keys on packed LONG ids (supplier → 2k, part → 2k+1):
    // long hash-joins and aggregates are markedly cheaper than string
    // keys over millions of edges; the human-readable "s#"/"p#" form is
    // rendered only in the final |V|-row projection.
    val le = graft.Tables.lineitem(spark, sfDir)
      .groupBy(($"l_suppkey" * 2).as("src"),
               ($"l_partkey" * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    // out-degrees from the HALF-SIZE directed frame (a vertex's
    // out-edges under the both-directions construction are its le rows
    // seen from either end), and the out-degree BAKED INTO the one
    // materialized edge list — so no iteration re-joins the degree
    // table: the broadcast arm saves a broadcast-hash probe per edge
    // per round, the co-partitioned arm a whole join per round (r15,
    // guide §2.4 "remove shuffles outright").
    val out = le.groupBy($"src").agg(sum($"w").as("out_w"))
      .union(le.groupBy($"dst").agg(sum($"w").as("out_w"))
        .select($"dst".as("src"), $"out_w"))
      .localCheckpoint()
    val e = le.select($"src", $"dst", $"w")
      .union(le.select($"dst".as("src"), $"src".as("dst"), $"w"))
      .join(broadcast(out), "src")
      .localCheckpoint()
    val n = out.count() // both-direction edges ⇒ every vertex has out-edges
    val base = math.round(0.15 * 1e6 / n) // same round-half-up as the oracle
    // Size-gated iteration strategy (the adaptiveComponents escape-hatch
    // discipline, Dedup.scala): both arms compute the identical integer
    // fixpoint, they differ only in how the |V|-row state meets the
    // edge scan each round.
    val ranks =
      if (n <= broadcastVertexLimit) {
        // BROADCAST arm — ranks and out-degrees are VERTEX-dimension
        // tables (parts + suppliers — bounded, unlike the edge set), so
        // each iteration broadcasts them into the one big-edge scan:
        // `e` is never shuffled, and map-side combine collapses the
        // per-edge contributions to ≤|V| rows before the only (tiny)
        // exchange. Because every vertex here has in-edges (each edge
        // carries its reverse), the new rank frame needs no re-join
        // against a vertex list. The short fixed loop stays ONE
        // executed plan — identical broadcast(out) subtrees collapse
        // via ReusedExchange and each rank level is computed exactly
        // once; [[run]]'s localCheckpoint pattern is for
        // long/unbounded loops.
        var r = out.select($"src".as("vertex"),
          round(lit(1e6) / lit(n.toDouble)).cast("long").as("rm"))
        for (_ <- 1 to iters) {
          r = e
            .join(broadcast(r.withColumnRenamed("vertex", "src")), "src")
            .select($"dst".as("vertex"),
              round(lit(0.85) * $"rm" * $"w" / $"out_w").cast("long").as("c"))
            .groupBy($"vertex").agg((lit(base) + sum($"c")).as("rm"))
        }
        r
      } else {
        // CO-PARTITIONED arm — past broadcast scale (the 100 TB
        // bipartite graph has ~2×10⁹ part vertices; a per-iteration
        // rank broadcast there is an executor OOM, not a slowdown).
        // `e` is hash-partitioned on src ONCE (localCheckpoint
        // preserves the partitioning) and carries the out-degree on
        // each edge row, so each round shuffles only the |V|-row rank
        // state into the edges' layout — the edges never move again
        // and no round joins a degree table. shuffle_hash hints pin
        // the strategy so AQE can't re-introduce a rank broadcast
        // behind our back; each round is exactly one state-shuffle
        // join + one groupBy(dst) (all hash exchanges, no sorts).
        val eP = e.repartition($"src").localCheckpoint()
        var state = out.repartition($"src")
          .select($"src",
            round(lit(1e6) / lit(n.toDouble)).cast("long").as("rm"))
          .localCheckpoint()
        for (_ <- 1 to iters) {
          // constant lineage across the long loop
          state = copartStep(eP, state, base).localCheckpoint()
        }
        state.select($"src".as("vertex"), $"rm")
      }
    ranks
      // integer `div`, not `/`: long `/` is double division in Spark,
      // exact only below 2^53 — extreme packed ids would silently
      // corrupt labels (same fix as Tables.events `ts div 1000`)
      .select(when($"vertex" % 2 === 0,
                   concat(lit("s"), expr("vertex div 2")))
                .otherwise(concat(lit("p"), expr("(vertex - 1) div 2")))
                .as("vertex"),
              $"rm")
      .withColumn("rnk", row_number().over(
        Window.orderBy($"rm".desc, $"vertex".asc)).cast("long"))
      .filter($"rnk" <= topK)
      .select($"vertex", $"rm".as("rank_micro"), $"rnk")
  }

  /** ONE co-partitioned iteration of [[bipartiteExact]]'s over-threshold
    * arm — extracted so PageRankScaleSpec can audit the exact production
    * plan (no BroadcastExchange, shuffle-hash joins pinned by hint)
    * before the loop's localCheckpoint hides it. `eP` carries
    * (src, dst, w, out_w) — the out-degree rides on the edge row — and
    * `state` is just (src, rm), so each round is one state-shuffle
    * join against the pre-partitioned edges + one groupBy(dst); the
    * former per-round join back onto the out-degree table is gone
    * (every vertex has in-edges under the both-directions
    * construction, so the contribution frame already covers the full
    * vertex set). */
  private[graft] def copartStep(eP: DataFrame, state: DataFrame,
                                base: Long): DataFrame = {
    import eP.sparkSession.implicits._
    eP.join(state.hint("shuffle_hash"), "src")
      .select($"dst".as("vertex"),
        round(lit(0.85) * $"rm" * $"w" / $"out_w").cast("long").as("c"))
      .groupBy($"vertex").agg((lit(base) + sum($"c")).as("rm"))
      .withColumnRenamed("vertex", "src")
  }

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
      // dangling nodes: no out-edges, their whole rank spreads
      // uniformly. The mass stays IN the plan as a broadcast 1-row
      // aggregate (not a driver collect()) so each iteration is a
      // single job — over N iterations that halves the blocking
      // driver round-trips of the loop.
      val dangling = withDeg.filter($"deg".isNull)
        .agg(coalesce(sum($"rank"), lit(0.0)).as("dmass"))
      val contribs = withDeg.filter($"deg".isNotNull)
        .select($"vertex".as("src"), ($"rank" / $"deg").as("c"))
        .join(e, "src")
        .groupBy($"dst".as("vertex"))
        .agg(sum($"c").as("in_mass"))
      ranks = vertices
        .join(contribs, Seq("vertex"), "left")
        .crossJoin(broadcast(dangling))
        .select($"vertex",
          (lit((1.0 - damping) / n) +
           lit(damping) * (coalesce($"in_mass", lit(0.0)) + $"dmass" / n))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
