package graft

import org.apache.spark.sql.functions._

/** Locks in the round-16 PageRank scale fix: past the broadcast gate
  * the iteration must run as co-partitioned shuffle joins (a 2×10⁹-row
  * rank vector cannot broadcast), and the two arms must agree
  * bit-exactly because they compute the same integer-micro fixpoint. */
class PageRankScaleSpec extends SparkSpec {
  import graft.operators.PageRank

  test("co-partitioned arm matches the broadcast arm bit-exactly") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("vertex"), r.getAs[Long]("rank_micro"),
       r.getAs[Long]("rnk"))
    val bcast = PageRank.bipartiteExact(spark, sf).collect().map(key).sortBy(_._3)
    // gate at 0 vertices → always the shuffle arm
    val copart = PageRank.bipartiteExact(spark, sf, broadcastVertexLimit = 0L)
      .collect().map(key).sortBy(_._3)
    assert(copart.nonEmpty)
    assert(copart.toSeq === bcast.toSeq)
  }

  test("co-partitioned step plans shuffle-hash joins, never a rank broadcast") {
    import spark.implicits._
    val e = Seq((2L, 3L, 2L), (3L, 2L, 2L), (2L, 5L, 1L), (5L, 2L, 1L))
      .toDF("src", "dst", "w")
    val out = e.groupBy($"src").agg(sum($"w").as("out_w"))
    // production layout: out-degree baked onto the edge row, rank
    // state is just (src, rm)
    val eP = e.join(out, "src").repartition($"src").localCheckpoint()
    val state = out.select($"src", lit(333333L).as("rm"))
      .repartition($"src").localCheckpoint()
    val step = PageRank.copartStep(eP, state, base = 50000L)
    val plan = step.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"rank state must not broadcast in the over-threshold arm:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"expected hint-pinned shuffle-hash joins:\n$plan")
    // and the step itself computes the documented update
    val got = step.collect().map(r =>
      (r.getAs[Long]("src"), r.getAs[Long]("rm"))).toMap
    // src=2: in-edges 3→2 (w=2, out_w(3)=2) and 5→2 (w=1, out_w(5)=1):
    // round(.85*333333*2/2) + round(.85*333333*1/1) = 283333*2
    assert(got(2L) === 50000L + 283333L + 283333L)
    assert(got(3L) === 50000L + math.round(0.85 * 333333L * 2 / 3.0))
    assert(got(5L) === 50000L + math.round(0.85 * 333333L * 1 / 3.0))
  }
}
