package graft

import org.apache.spark.sql.functions._

/** Proof that AQE's runtime skew-join handling fires on this engine's
  * join shapes — the mechanism SURVEY §4 leans on for skewed fact-fact
  * joins at 100 TB (manual salting in SkewOps covers aggregations). */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed shuffle-join partition (skew=true in final plan)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    SparkEntry.withConfs(spark, confs) {
      // 95% of fact rows share one key — the classic hot-key join
      val fact = spark.range(0, 200000, 1, 8)
        .select(when($"id" % 20 =!= 0, lit(7L)).otherwise($"id" % 1000).as("k"),
                $"id".as("payload"))
      val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
      // note: no groupBy on the join key afterwards — AQE declines to
      // split skew when the result must stay partitioned on that key
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      val row = joined.collect()(0)
      // AQE's final plan is only visible after execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in:\n${plan.take(2000)}")
      assert(row.getLong(0) === 200000L) // every fact row matches one dim row
    }
  }
}
