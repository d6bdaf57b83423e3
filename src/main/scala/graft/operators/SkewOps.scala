package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-safe aggregation via salting: phase 1 aggregates on
  * (key, salt) so a hot key spreads over `buckets` reducers; phase 2
  * merges the partials per key. Results are identical to a plain
  * groupBy — the oracle for the salted query is the unsalted SQL —
  * while the hot key's partial work parallelizes.
  *
  * (AQE's skew-join handling covers joins; salting is the equivalent
  * lever for aggregations with pathological key distributions.)
  */
object SkewOps {

  /** Two-phase salted sum/count per key. `saltBy` should be a column
    * uncorrelated with the key (a unique id works best) so a hot key
    * spreads uniformly. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, saltBy: Column,
                buckets: Int = 16): DataFrame = {
    df.select(key.as("_key"), value.as("_v"), saltBy.as("_sb"))
      .withColumn("_salt", pmod(hash(col("_sb")), lit(buckets)))
      .groupBy(col("_key"), col("_salt"))
      .agg(sum(col("_v")).as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(col("_key"))
      .agg(sum(col("_partial_sum")).as("_sum"), sum(col("_partial_n")).as("_n"))
  }

  /** Salted per-user event aggregate; same result as plain GROUP BY. */
  def qSaltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    saltedAgg(Tables.events(spark, sfDir), $"user_id", $"value", $"event_id")
      .select($"_key".as("user_id"), $"_n".as("n_events"),
              round($"_sum", 4).as("sum_value"))
  }
}
