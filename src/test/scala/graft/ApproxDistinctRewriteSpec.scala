package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.plans.ApproxDistinctRewrite

class ApproxDistinctRewriteSpec extends SparkSpec {

  private def q = Tables.events(spark, sf)
    .groupBy(col("event_type"))
    .agg(countDistinct(col("user_id")).as("n_users"))

  test("count(DISTINCT) becomes HLL++ when enabled; estimate within rsd") {
    GraftFunctions.register(spark)
    val exact = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set(ApproxDistinctRewrite.ENABLED_KEY, "true")
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("hyperloglogplusplus") || plan.contains("approx_count_distinct"),
        s"no HLL in plan:\n${plan.take(1500)}")
      // the exact path's distinct expansion is gone
      assert(!plan.contains("Expand"), s"distinct Expand still present:\n${plan.take(1500)}")
      val approx = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet === exact.keySet)
      approx.foreach { case (k, v) =>
        val e = exact(k)
        assert(math.abs(v - e) <= math.max(2.0, e * 0.05), s"$k: $v vs exact $e")
      }
    } finally spark.conf.set(ApproxDistinctRewrite.ENABLED_KEY, "false")
  }

  test("rewrite is off by default and leaves multi-arg distinct counts alone") {
    GraftFunctions.register(spark)
    // default off → exact plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("hyperloglogplusplus"))
    // multi-column distinct is not rewritten even when enabled
    spark.conf.set(ApproxDistinctRewrite.ENABLED_KEY, "true")
    try {
      val multi = Tables.events(spark, sf)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id"), col("value")).as("n"))
      assert(!multi.queryExecution.executedPlan.toString.contains("hyperloglogplusplus"))
      assert(multi.collect().nonEmpty)
    } finally spark.conf.set(ApproxDistinctRewrite.ENABLED_KEY, "false")
  }
}
