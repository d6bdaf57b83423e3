package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketed range join — "events within a time window of each other,
  * per key" without the nested-loop join Spark falls back to for pure
  * inequality predicates.
  *
  * Composition (SURVEY.md §3 ladder (a)): quantize time into buckets of
  * the window width; a right row within (t-w, t] can only live in the
  * left row's bucket or the previous one, so exploding the left side to
  * those two bucket keys turns the range predicate into an equi-join on
  * (key, bucket) + a residual filter. Shuffle cost is 2× the left side
  * — independent of time-range selectivity — instead of |L|×|R| pairs.
  */
object RangeJoin {

  /** For each 'error' event: how many events the same user produced in
    * the preceding 5 minutes (exclusive of the error instant). */
  def qRangeJoin(spark: SparkSession, sfDir: String,
                 windowUs: Long = 300L * 1000000): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    val left = Tables.events(spark, sfDir)
      .filter($"event_type" === "error")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
      .withColumn("bucket",
        explode(array(floor($"us" / windowUs) - 1, floor($"us" / windowUs))))
    val right = ev.select($"user_id".as("r_uid"), $"us".as("r_us"),
                          $"event_id".as("r_id"))
      .withColumn("bucket", floor($"r_us" / windowUs))
    left.join(right,
        left("user_id") === $"r_uid" && left("bucket") === right("bucket"),
        "left")
      .groupBy($"event_id", $"user_id")
      .agg(sum(when($"r_us" >= $"us" - windowUs && $"r_us" < $"us", 1L)
                 .otherwise(0L)).as("n_prior"))
  }
}
