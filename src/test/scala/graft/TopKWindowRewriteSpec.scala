package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.plans.TopKWindowRewrite

class TopKWindowRewriteSpec extends SparkSpec {

  private def windowTopK(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
  }

  private def testDf = {
    import spark.implicits._
    spark.range(0, 3000, 1, 8)
      .select(($"id" % 41).as("grp"),
              (($"id" * 2654435761L) % 997).as("score"),
              $"id")
  }

  test("rewrite fires when enabled: no Window in plan, ObjectHashAggregate instead") {
    GraftFunctions.register(spark)
    spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "true")
    try {
      val plan = windowTopK(testDf).queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"expected no Window in:\n$plan")
      assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    } finally spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "false")
  }

  test("rewritten result equals the window result (unique sort keys)") {
    GraftFunctions.register(spark)
    val expected = windowTopK(testDf).collect().toSet
    spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "true")
    try {
      val rewritten = windowTopK(testDf).collect().toSet
      assert(rewritten === expected)
      assert(rewritten.nonEmpty)
    } finally spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "false")
  }

  test("rewrite keeps residual predicates and handles rn == 1 argmax") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = testDf
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id".asc)
    def q = df.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"score" > 100)
    val expected = q.collect().toSet
    spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "true")
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"))
      assert(q.collect().toSet === expected)
    } finally spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "false")
  }

  test("rewrite leaves non-row_number windows and unbounded k untouched") {
    import spark.implicits._
    GraftFunctions.register(spark)
    spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "true")
    try {
      val w = Window.partitionBy($"grp").orderBy($"score".desc)
      // rank() is not row_number: must keep the Window
      val ranked = testDf.withColumn("r", rank().over(w)).filter($"r" <= 3)
      assert(ranked.queryExecution.executedPlan.toString.contains("Window"))
      // no rn bound at all: must keep the Window
      val unbounded = testDf.withColumn("rn", row_number().over(w)).filter($"rn" > 2)
      assert(unbounded.queryExecution.executedPlan.toString.contains("Window"))
    } finally spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "false")
  }

  test("rewrite survives unorderable payload columns (map attrs)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // OTel rows carry map-typed attribute columns; those ride along as
    // payload and must not be given orderings (round-2 ADVICE)
    val df = testDf.withColumn("attrs", map(lit("k"), $"id".cast("string")))
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id".asc)
    def q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    val expected = q.select($"grp", $"score", $"id", $"rn").collect().toSet
    spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "true")
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"expected rewrite to fire in:\n$plan")
      val got = q.select($"grp", $"score", $"id", $"rn").collect().toSet
      assert(got === expected)
      assert(q.collect().forall(_.getMap[String, String](3).nonEmpty))
    } finally spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "false")
  }

  test("queryConfs drives the rewrite at action time (Verify/Bench path)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // the round-2 bug: the flag was restored before the action's fresh
    // QueryExecution, so write()/count() ran the plain window plan
    val confs = SparkEntry.queryConfs("q_window_topk_rewrite")
    SparkEntry.withConfs(spark, confs) {
      val df = graft.operators.Core.qWindowTopkRewrite(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"rewrite must be active at action time:\n$plan")
      assert(plan.contains("ObjectHashAggregate"))
      assert(df.count() > 0)
    }
    // and outside the scope the same builder yields the window baseline
    val baseline = graft.operators.Core.qWindowTopkRewrite(spark, sf)
    assert(baseline.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("rewrite handles nulls in the sort key like the window plan") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = spark.range(0, 400, 1, 4)
      .select(($"id" % 7).as("grp"),
              when($"id" % 5 === 0, lit(null)).otherwise($"id" % 97).as("score"),
              $"id")
    val w = Window.partitionBy($"grp").orderBy($"score".desc_nulls_last, $"id".asc)
    def q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    val expected = q.collect().toSet
    spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "true")
    try {
      assert(q.collect().toSet === expected)
    } finally spark.conf.set(TopKWindowRewrite.ENABLED_KEY, "false")
  }
}
