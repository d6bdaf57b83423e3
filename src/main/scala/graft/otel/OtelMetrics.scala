package graft.otel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import OtelTraces.nsToTimestamp

/** OTLP metrics → the reference's five type-specific flat tables
  * (gauge / sum / histogram / exponential_histogram / summary).
  *
  * Reference: /root/reference/internal/arrow/metrics.go,
  * /root/reference/internal/arrow/schema.go, README "Metrics Schemas".
  * The reference routes each metric type to its own table with an
  * optimized schema; these flattens mirror that split.
  *
  * Input contract: one row per metric record —
  *   resource, scope: as in [[OtelTraces]]
  *   metric: struct<name, description, unit, metadata: map<string,string>,
  *                  aggregation_temporality: int, is_monotonic: boolean>
  *   points: array<struct<...>> with type-specific value fields (see each
  *           flatten's projection below).
  */
object OtelMetrics {

  /** proto AggregationTemporality enum → string (metrics.go). */
  def temporalityName(t: Column): Column =
    when(t === 1, "DELTA").when(t === 2, "CUMULATIVE").otherwise("UNSPECIFIED")

  /** Common envelope columns shared by all five metric tables. */
  private def envelope(p: Column): Seq[Column] = Seq(
    nsToTimestamp(p.getField("time_unix_nano")).as("time_unix_nano"),
    element_at(col("resource.attributes"), "service.name").as("service_name"),
    to_json(col("resource.attributes")).as("resource_attributes"),
    col("resource.dropped_attributes_count").as("resource_dropped_attributes_count"),
    col("scope.name").as("scope_name"),
    col("scope.version").as("scope_version"),
    to_json(col("scope.attributes")).as("scope_attributes"),
    col("scope.dropped_attributes_count").as("scope_dropped_attributes_count"),
    col("metric.name").as("metric_name"),
    col("metric.description").as("metric_description"),
    col("metric.unit").as("metric_unit"),
    to_json(col("metric.metadata")).as("metric_metadata"),
    to_json(p.getField("attributes")).as("attributes"),
    nsToTimestamp(p.getField("start_time_unix_nano")).as("start_time_unix_nano"),
    p.getField("flags").as("flags"))

  private def exploded(nested: DataFrame): DataFrame =
    nested.select(col("resource"), col("scope"), col("metric"),
                  explode(col("points")).as("p"))

  def flattenGauge(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("as_double").as("as_double"),
      p.getField("as_int").as("as_int")): _*)
  }

  def flattenSum(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("as_double").as("as_double"),
      p.getField("as_int").as("as_int"),
      col("metric.is_monotonic").as("is_monotonic"),
      temporalityName(col("metric.aggregation_temporality"))
        .as("aggregation_temporality")): _*)
  }

  def flattenHistogram(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("count").as("count"),
      p.getField("sum").as("sum"),
      p.getField("min").as("min"),
      p.getField("max").as("max"),
      p.getField("bucket_counts").as("bucket_counts"),
      p.getField("explicit_bounds").as("explicit_bounds"),
      temporalityName(col("metric.aggregation_temporality"))
        .as("aggregation_temporality")): _*)
  }

  def flattenExponentialHistogram(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("count").as("count"),
      p.getField("sum").as("sum"),
      p.getField("min").as("min"),
      p.getField("max").as("max"),
      p.getField("scale").as("scale"),
      p.getField("zero_count").as("zero_count"),
      p.getField("zero_threshold").as("zero_threshold"),
      p.getField("positive").getField("offset").as("positive_offset"),
      p.getField("positive").getField("bucket_counts").as("positive_buckets"),
      p.getField("negative").getField("offset").as("negative_offset"),
      p.getField("negative").getField("bucket_counts").as("negative_buckets"),
      temporalityName(col("metric.aggregation_temporality"))
        .as("aggregation_temporality")): _*)
  }

  def flattenSummary(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("count").as("count"),
      p.getField("sum").as("sum"),
      transform(p.getField("quantile_values"), q => q.getField("quantile"))
        .as("quantile_values_quantile"),
      transform(p.getField("quantile_values"), q => q.getField("value"))
        .as("quantile_values_value")): _*)
  }
}
