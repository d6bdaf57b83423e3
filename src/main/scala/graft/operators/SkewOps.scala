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

  /** Skew-safe salted shuffle join: the fact side salts its key with a
    * deterministic spread (uncorrelated unique id mod S); the build side
    * replicates each row S times, one per salt. A hot join key's rows
    * then land on S reducers instead of one. Every (fact, build) key
    * match still pairs exactly once, so results are identical to the
    * plain join — the oracle IS the unsalted SQL. The shuffle-hash hint
    * keeps the demo honest (broadcast would bypass the skew problem;
    * salting is the lever when the build side is too big to broadcast
    * AND a key is hot — the case AQE's skew handling misses when the
    * hot key sits in one reducer of a hash join). */
  def saltedJoin(fact: DataFrame, factKey: Column, build: DataFrame,
                 buildKey: Column, saltBy: Column, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
    val replicatedBuild = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedBuild.hint("shuffle_hash"),
      factKey === buildKey && saltedFact("_salt") === replicatedBuild("_salt"))
  }

  /** Events ⋈ customer with an 8-way salt, rolled up per market segment;
    * oracle is the plain unsalted join. */
  def qSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = saltedJoin(
      Tables.events(spark, sfDir), $"user_id",
      Tables.customer(spark, sfDir).select($"c_custkey", $"c_mktsegment"),
      $"c_custkey", $"event_id")
    out.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
  }
}
