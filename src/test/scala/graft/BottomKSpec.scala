package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class BottomKSpec extends SparkSpec {

  test("bottom-k sample is invariant to partitioning and input order") {
    import spark.implicits._
    GraftFunctions.register(spark)
    def sample(numParts: Int, shuffled: Boolean) = {
      val base = Tables.events(spark, sf).select($"event_type", $"user_id").distinct()
      val arranged =
        if (shuffled) base.orderBy(rand(7)).repartition(numParts)
        else base.repartition(numParts)
      arranged.groupBy($"event_type")
        .agg(call_function("bottomk_by_hash", $"user_id", lit(3)).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    }
    val a = sample(1, shuffled = false)
    val b = sample(13, shuffled = true)
    assert(a === b)
    assert(a.values.forall(_.length === 3))
  }
}
