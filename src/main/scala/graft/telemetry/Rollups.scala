package graft.telemetry

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.RollupRewrite

/** The MATERIALIZED-ROLLUP side of [[graft.plans.RollupRewrite]]: a
  * pre-aggregated hourly table over `events` that the optimizer rule
  * can answer coarser aggregates from. One row per
  * (hour-truncated ts, event_type) carrying the re-aggregable
  * measures:
  *
  *   - `cnt`             count(*)                       (count → sum)
  *   - `sum_value`       sum(value)                     (sum → sum)
  *   - `sum_value_trunc` sum(cast(value as long))       (exact integer)
  *   - `min_value` / `max_value`                        (idempotent)
  *   - `sum_user_id`     sum(user_id)                   (exact integer)
  *
  * At 100 TB the rollup is the thing a streaming ingest maintains
  * incrementally (one upsert per closed hour — the
  * [[graft.streaming.StreamingIngest]] hourly shape) and every
  * dashboard query reads; this builder is its batch materialization.
  * The rollup is ~|hours| × |event types| rows — six orders of
  * magnitude under the raw table — so the rewritten query's scan cost
  * collapses while staying EXACT (counts/sums re-aggregate losslessly,
  * min/max are idempotent; nothing sketchy here — approximate rollups
  * are the tel_sketch_rollup family). */
object Rollups {

  /** Static registration JSON for the driver tables: matches any
    * `events.parquet` scan and derives the rollup location under /tmp
    * from the base path ([[RollupRewrite.rollupPathFor]]) — one conf
    * value serves every scale factor. */
  val EventsSpecJson: String =
    """{"basePathSuffix": "events.parquet",
      | "rollupRoot": "/tmp/graft_rollups",
      | "timeCol": "ts", "grainCol": "hour_ts", "tz": "UTC",
      | "dims": ["event_type"], "count": "cnt",
      | "measures": {
      |   "value": {"sum": "sum_value", "sumLong": "sum_value_trunc",
      |             "min": "min_value", "max": "max_value"},
      |   "user_id": {"sum": "sum_user_id"}}}""".stripMargin

  /** The hourly rollup frame (the thing to materialize) — ONE
    * definition shared with the streaming maintainer
    * ([[graft.streaming.StreamingRollup.rollupFrame]]), so the batch
    * materialization and the incrementally-maintained snapshot are the
    * same view by construction. */
  def hourlyEvents(spark: SparkSession, sfDir: String): DataFrame =
    graft.streaming.StreamingRollup.rollupFrame(Tables.events(spark, sfDir))

  /** `tel_rollup_hourly`: the materialized-view frame itself, minus
    * the raw double sum (kept out of the oracle — cross-engine fp
    * summation order; every oracle-checked measure here is integer or
    * idempotent). */
  def hourlyProof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    hourlyEvents(spark, sfDir).select($"hour_ts", $"event_type", $"cnt",
      $"sum_value_trunc", $"min_value", $"max_value", $"sum_user_id")
  }

  /** `tel_rollup_rewrite`: the drop-in PROOF query for the optimizer
    * rule — written against the RAW events table (aligned time filter,
    * day+dim grouping, count/sum/min/max) and sharing the raw table's
    * DuckDB oracle. With [[RollupRewrite.SPEC_KEY]] set
    * (SparkEntry.queryConfs), the optimizer answers it from the hourly
    * rollup — the strongest correctness statement available for a
    * rewrite: bit-exact drop-in or it hash-fails. Without the conf the
    * same plan scans raw events, so the entry is green either way; the
    * plan flip itself is pinned by RollupRewriteSpec. */
  def rewriteProof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ensureHourlyEvents(spark, sfDir)
    Tables.events(spark, sfDir)
      .filter($"ts" >= lit(java.time.Instant.parse("2024-01-02T00:00:00Z")))
      .groupBy($"ts".cast("date").as("day"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("long")).as("sum_trunc"),
        min($"value").as("min_value"),
        max($"value").as("max_value"))
  }

  /** Materialize the hourly events rollup at the path
    * [[RollupRewrite]] will derive for this sf dir; idempotent (skips
    * when the _SUCCESS marker exists — the driver testdata is
    * immutable, so staleness is not a concern here; a production MV
    * refreshes per closed hour instead). Returns the path. */
  def ensureHourlyEvents(spark: SparkSession, sfDir: String): String = {
    val base = Paths.get(s"$sfDir/events.parquet").toAbsolutePath.toString
    val path = RollupRewrite.rollupPathFor("/tmp/graft_rollups", base)
    if (!Files.exists(Paths.get(s"$path/_SUCCESS"))) {
      hourlyEvents(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(path)
    }
    path
  }
}
