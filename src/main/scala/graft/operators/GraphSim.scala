package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Node-similarity graph kernels (SURVEY.md §2.1).
  *
  * [[jaccardNeighbors]] is the common-neighbor similarity query every
  * graph stack ships (Neo4j GDS nodeSimilarity, GraphFrames' overlap
  * metrics): rank node pairs by the Jaccard of their neighbor sets.
  * Semantics mirror the reference's downstream analytics role — the
  * engine computes it over the supplier–part co-purchase bipartite
  * graph derived from `lineitem` (reference parquet surface,
  * `internal/arrow/schema.go`'s flat tables are the telemetry analog).
  */
object GraphSim {

  /** Supplier–supplier neighbor-set Jaccard over shared parts, top-k.
    *
    * Physical shape is the [[graft.llm.Dedup.ngramJaccard]] in-place
    * posting-list pair expansion transplanted to a graph: ONE shuffle
    * groups the distinct (part → suppliers) adjacency lists, pairs
    * expand inside each list (nested Generates — no self-join, no
    * second shuffle of the edge table), and one hash agg counts
    * common neighbors. |N(a) ∪ N(b)| = deg(a)+deg(b)−common by
    * inclusion–exclusion, so degrees ride alongside the expansion and
    * the final ranking is `orderBy().limit(k)` —
    * TakeOrderedAndProject, never a global window.
    *
    * `maxPartDegree` is the hot-vertex valve (same trade-off as the
    * shingle doc-frequency cap): a part bought from f suppliers
    * expands O(f²) pairs; capping drops only near-universal parts,
    * which carry no similarity signal but all the quadratic cost.
    * ON by default — this kernel is advertised as the generic
    * node-similarity operator, and on a power-law graph an uncapped
    * expansion is quadratic on the hottest vertex. The default (1024)
    * is far above any TPC-H part degree (≈4), so the oracle stays
    * exact on the fixture (GraphSimCapSpec proves cap-on ≡ cap-off
    * there); pass None for the exact-everywhere form.
    *
    * API NOTE (intentional behavior change): the default flipped from
    * exact (`None`) to capped (`Some(1024)`) — on graphs with a vertex
    * degree above 1024 the default result is now approximate (hot
    * vertices dropped); callers needing exactness at any degree must
    * opt in with `maxPartDegree = None`. */
  def jaccardNeighbors(spark: SparkSession, sfDir: String, topK: Int = 20,
                       maxPartDegree: Option[Int] = Some(1024)): DataFrame = {
    import spark.implicits._
    val edges = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey".as("s"), $"l_partkey".as("p"))
      .distinct()
    val deg = edges.groupBy($"s").agg(count(lit(1)).as("deg"))
    val lists = edges.join(deg, "s")
      .groupBy($"p")
      .agg(collect_list(struct($"s", $"deg")).as("ns"))
      .filter(size($"ns") > 1)
    val capped = maxPartDegree.fold(lists)(cap => lists.filter(size($"ns") <= cap))
    capped
      .select(explode($"ns").as("a"), $"ns")
      .select($"a", explode($"ns").as("b"))
      .filter($"a.s" < $"b.s")
      .groupBy($"a.s".as("supp_a"), $"b.s".as("supp_b"),
               $"a.deg".as("deg_a"), $"b.deg".as("deg_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        round($"common" / ($"deg_a" + $"deg_b" - $"common"), 6))
      .orderBy($"jaccard".desc, $"supp_a".asc, $"supp_b".asc)
      .limit(topK)
      .select($"supp_a", $"supp_b", $"deg_a", $"deg_b", $"common", $"jaccard")
  }
}
