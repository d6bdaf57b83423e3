package graft

import org.apache.spark.sql.functions._

import graft.llm.SimOps

/** Graph-ANN beam search (SimOps.nswAnn): deterministic, never worse
  * than its entry points, and competitive with brute force on the
  * fixture corpus. */
class NswAnnSpec extends SparkSpec {

  test("shape and determinism: k rows per query, identical reruns") {
    val a = SimOps.nswAnn(spark, sf).collect().map(_.toString).sorted
    val b = SimOps.nswAnn(spark, sf).collect().map(_.toString).sorted
    assert(a === b)
    val perQuery = SimOps.nswAnn(spark, sf)
      .groupBy("query_id").agg(count(lit(1)).as("n"),
        min("rnk").as("lo"), max("rnk").as("hi"))
      .collect()
    assert(perQuery.length === 8)
    assert(perQuery.forall(r => r.getLong(1) == 5L &&
      r.getLong(2) == 1L && r.getLong(3) == 5L))
  }

  test("the search never returns a worse top-1 than its entry points") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("vec"))
    graft.functions.GraftFunctions.register(spark)
    val entries = SimOps.clusterAssignments(spark, sf)
      .filter($"vec_id" >= 8)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"cid").orderBy($"vec_id".asc)))
      .filter($"rn" === 1).select($"vec_id")
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"vec".as("qvec"))
    val entryBest = emb.join(entries, "vec_id")
      .crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos6",
        round(call_function("cosine_sim", $"vec", $"qvec"), 6))
      .groupBy($"query_id").agg(max($"cos6").as("entry_best"))
    val searchBest = SimOps.nswAnn(spark, sf)
      .groupBy($"query_id").agg(max($"cosine").as("search_best"))
    val joined = searchBest.join(entryBest, "query_id").collect()
    assert(joined.length === 8)
    joined.foreach { r =>
      assert(r.getAs[Double]("search_best") >= r.getAs[Double]("entry_best"),
        s"query ${r.getLong(0)} regressed below its entry set")
    }
  }

  test("recall@5 vs brute force clears the graph-search bar") {
    import spark.implicits._
    val exact = SimOps.simTopkBruteforce(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimOps.nswAnn(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4 hops over the degree-8 undirected graph from per-cell entries:
    // measured 0.875 on the fixture corpus; the bar leaves slack for
    // the deterministic-but-data-dependent walk, not for regressions
    // back to a sparse/disconnected graph (0.1-0.3)
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  /** r12 (HNSW): the hierarchical entry must not COST recall — the
    * upper layer replaces "score every cell rep" with "navigate the
    * rep graph from one global entry", and on the fixture the
    * surviving beam must land layer 0 in at least as good a region. */
  test("hnsw: hierarchical seeding matches or beats the flat NSW recall") {
    import spark.implicits._
    val nsw = SimOps.nswRecall(spark, sf).agg(avg($"recall")).collect()(0)
      .getDouble(0)
    val hnsw = SimOps.hnswRecall(spark, sf).agg(avg($"recall")).collect()(0)
      .getDouble(0)
    assert(hnsw >= nsw, s"hnsw recall $hnsw fell below flat nsw $nsw")
    assert(hnsw >= 0.6, s"hnsw recall@5 = $hnsw")
    // determinism + shape: k rows per query, identical reruns
    val a = SimOps.hnswAnn(spark, sf).collect().map(_.toString).sorted
    val b = SimOps.hnswAnn(spark, sf).collect().map(_.toString).sorted
    assert(a === b)
    val perQuery = SimOps.hnswAnn(spark, sf)
      .groupBy("query_id").agg(count(lit(1)).as("n"))
      .collect()
    assert(perQuery.length === 8 && perQuery.forall(_.getLong(1) == 5L))
  }
}
