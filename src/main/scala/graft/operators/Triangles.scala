package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact triangle counting / edge support — the second classic
  * distributed graph kernel (alongside [[PageRank]]), over the
  * parts-co-purchased graph derived from lineitem. */
object Triangles {

  /** Exact triangle counting / edge support over the parts-co-purchased
    * graph (parts sharing an order), via the DEGREE-ORDERED edge
    * iterator — the formulation that scales: nodes are relabeled by
    * degree rank, edges orient low→high rank, and an edge's support is
    * `|N_out(s) ∩ N_out(t)|` — each triangle counted exactly once at
    * its lowest-rank edge, total work O(E^1.5) regardless of hub skew
    * (a rank-oriented out-neighborhood is O(√E)). Support is the
    * k-truss building block; the output is the top-`topK` edges by
    * support (part keys, deterministic tie-break) with the global
    * triangle count alongside.
    *
    * Scale shape: the quadratic-looking wedge set is NEVER
    * materialized — out-adjacency lists (a vertex-dimension table,
    * sorted arrays) broadcast into one scan of the oriented edge list,
    * and the codegen'd [[graft.functions.SortedIntersectCount]]
    * two-pointer merge computes each edge's support in place. The only
    * exchanges are the per-order self-join behind the edge list and
    * vertex-dimension aggregates. Degree ranks come from one
    * row_number over the vertex table (zipWithIndex territory at
    * extreme vertex counts; the ORDER is what matters, any total
    * order by (degree, id) works). The DuckDB oracle runs the same
    * algorithm relationally (wedge join) — identical integer results. */
  def triangleSupport(spark: SparkSession, sfDir: String,
                      topK: Int = 20): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val e = li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" < $"b.l_partkey")
      .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .distinct()
      .localCheckpoint()
    val deg = e.select($"u".as("node")).union(e.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val rk = deg.select($"node",
      row_number().over(Window.orderBy($"d", $"node")).cast("long").as("r"))
      .localCheckpoint()
    val eo = e
      .join(broadcast(rk.select($"node".as("u"), $"r".as("ru"))), "u")
      .join(broadcast(rk.select($"node".as("v"), $"r".as("rv"))), "v")
      .select(least($"ru", $"rv").as("s"), greatest($"ru", $"rv").as("t"))
      .localCheckpoint()
    val adj = eo.groupBy($"s").agg(sort_array(collect_list($"t")).as("nbrs"))
    val sup = eo
      .join(broadcast(adj.select($"s", $"nbrs".as("ns"))), Seq("s"), "left")
      .join(broadcast(adj.select($"s".as("t"), $"nbrs".as("nt"))), Seq("t"), "left")
      .select($"s", $"t",
        when($"ns".isNull || $"nt".isNull, lit(0L))
          .otherwise(call_function("sorted_intersect_count", $"ns", $"nt")
            .cast("long")).as("support"))
    val total = sup.agg(sum($"support").as("total_triangles"))
    sup
      .join(broadcast(rk.select($"r".as("s"), $"node".as("part_u"))), "s")
      .join(broadcast(rk.select($"r".as("t"), $"node".as("part_v"))), "t")
      .crossJoin(broadcast(total))
      .withColumn("rnk", row_number().over(
        Window.orderBy($"support".desc, $"part_u".asc, $"part_v".asc))
        .cast("long"))
      .filter($"rnk" <= topK)
      .select($"part_u", $"part_v", $"support", $"total_triangles", $"rnk")
  }
}
