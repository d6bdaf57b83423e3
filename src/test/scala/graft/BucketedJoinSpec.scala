package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join — the 100 TB technique for repeated
  * fact-fact joins: both tables pre-bucketed on the join key land
  * co-partitioned on disk, so the join runs with ZERO exchange of
  * either side (vs a full shuffle of both facts every query). */
class BucketedJoinSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without any Exchange") {
    val n = 8
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.orders(spark, sf).write
      .bucketBy(n, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
    val plan = joined.queryExecution.executedPlan.toString

    // co-located buckets: the join itself requires no shuffle of either
    // side (the only exchange allowed is the final small aggregation's)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side shuffled:\n$plan")

    // and the result matches the plain (shuffling) join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_items"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val actual = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actual === expected)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("approx percentiles land within tolerance of the exact quantiles") {
    val approx = graft.telemetry.Telemetry.approxPercentiles(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap // p50
    val exact = graft.telemetry.Telemetry.valuePercentiles(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, v) =>
      val e = exact(k)
      assert(math.abs(v - e) <= math.max(1.0, e * 0.05),
        s"$k: approx p50 $v vs exact $e")
    }
  }

  test("grid-sketch percentiles equal exact nearest-rank quantiles (0.01 grid, 2dp data)") {
    // the grid is lossless for 2-decimal values, so the sketch must
    // reproduce the exact nearest-rank quantile, not just approximate it
    val grid = graft.telemetry.Telemetry.gridPercentiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(grid.keySet === byType.keySet)
    def nearestRank(vs: Array[Double], p: Double): Double =
      vs(math.ceil(p * vs.length).toInt - 1)
    grid.foreach { case (k, (p50, p99)) =>
      val vs = byType(k)
      assert(math.abs(p50 - nearestRank(vs, 0.5)) < 0.005, s"$k p50 $p50")
      assert(math.abs(p99 - nearestRank(vs, 0.99)) < 0.005, s"$k p99 $p99")
    }
  }
}
