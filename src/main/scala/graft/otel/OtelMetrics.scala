package graft.otel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.{ArrayType, StructType}

import OtelTraces.{emptyToNull, nsToTimestamp}

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

  /** Common envelope columns shared by all five metric tables.
    * Null semantics follow metrics.go appendNullableString /
    * appendNullableMetadata: "" (and "{}" metadata) store NULL;
    * start_time 0 stores NULL (metrics.go:396-400). */
  private def envelope(p: Column): Seq[Column] = Seq(
    nsToTimestamp(p.getField("time_unix_nano")).as("time_unix_nano"),
    emptyToNull(element_at(col("resource.attributes"), "service.name"))
      .as("service_name"),
    to_json(col("resource.attributes")).as("resource_attributes"),
    col("resource.dropped_attributes_count").as("resource_dropped_attributes_count"),
    emptyToNull(col("scope.name")).as("scope_name"),
    emptyToNull(col("scope.version")).as("scope_version"),
    to_json(col("scope.attributes")).as("scope_attributes"),
    col("scope.dropped_attributes_count").as("scope_dropped_attributes_count"),
    col("metric.name").as("metric_name"),
    emptyToNull(col("metric.description")).as("metric_description"),
    emptyToNull(col("metric.unit")).as("metric_unit"),
    nullif(to_json(col("metric.metadata")), lit("{}")).as("metric_metadata"),
    to_json(p.getField("attributes")).as("attributes"),
    when(p.getField("start_time_unix_nano") === 0, lit(null))
      .otherwise(nsToTimestamp(p.getField("start_time_unix_nano")))
      .as("start_time_unix_nano"),
    p.getField("flags").as("flags"))

  /** Exemplar list columns (schema.go:458-469, metrics.go:422-470
    * appendExemplars) — shared by gauge/sum/histogram/exp_histogram.
    * An empty exemplar slice stores NULL in all six columns; the unset
    * half of the as_double/as_int pair stores 0 (not NULL), matching
    * the reference's value-type switch. Points structs without an
    * `exemplars` field flatten to all-NULL columns. */
  private def exemplarCols(nested: DataFrame, p: Column): Seq[Column] = {
    val hasExemplars = nested.schema("points").dataType match {
      case ArrayType(st: StructType, _) => st.fieldNames.contains("exemplars")
      case _                            => false
    }
    if (!hasExemplars) Seq(
      lit(null).cast("array<timestamp>").as("exemplars_time_unix_nano"),
      lit(null).cast("array<double>").as("exemplars_as_double"),
      lit(null).cast("array<string>").as("exemplars_span_id"),
      lit(null).cast("array<string>").as("exemplars_trace_id"),
      lit(null).cast("array<bigint>").as("exemplars_as_int"),
      lit(null).cast("array<string>").as("exemplars_filtered_attributes"))
    else {
      val ex = p.getField("exemplars")
      def nonEmpty(c: Column): Column = when(size(ex) > 0, c)
      Seq(
        nonEmpty(transform(ex, e => nsToTimestamp(e.getField("time_unix_nano"))))
          .as("exemplars_time_unix_nano"),
        nonEmpty(transform(ex, e => coalesce(e.getField("as_double"), lit(0.0))))
          .as("exemplars_as_double"),
        nonEmpty(transform(ex, e => e.getField("span_id"))).as("exemplars_span_id"),
        nonEmpty(transform(ex, e => e.getField("trace_id"))).as("exemplars_trace_id"),
        nonEmpty(transform(ex, e => coalesce(e.getField("as_int"), lit(0L))))
          .as("exemplars_as_int"),
        nonEmpty(transform(ex, e => to_json(e.getField("filtered_attributes"))))
          .as("exemplars_filtered_attributes"))
    }
  }

  private def exploded(nested: DataFrame): DataFrame =
    nested.select(col("resource"), col("scope"), col("metric"),
                  explode(col("points")).as("p"))

  def flattenGauge(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("as_double").as("as_double"),
      p.getField("as_int").as("as_int")) ++ exemplarCols(nested, p): _*)
  }

  def flattenSum(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("as_double").as("as_double"),
      p.getField("as_int").as("as_int"),
      col("metric.is_monotonic").as("is_monotonic"),
      temporalityName(col("metric.aggregation_temporality"))
        .as("aggregation_temporality")) ++ exemplarCols(nested, p): _*)
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
        .as("aggregation_temporality")) ++ exemplarCols(nested, p): _*)
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
        .as("aggregation_temporality")) ++ exemplarCols(nested, p): _*)
  }

  /** Summary has no exemplars (schema.go MetricsSummarySchema); quantile
    * columns use the reference's dotted names (schema.go:164-167). */
  def flattenSummary(nested: DataFrame): DataFrame = {
    val p = col("p")
    exploded(nested).select(envelope(p) ++ Seq(
      p.getField("count").as("count"),
      p.getField("sum").as("sum"),
      transform(p.getField("quantile_values"), q => q.getField("quantile"))
        .as("quantile_values.quantile"),
      transform(p.getField("quantile_values"), q => q.getField("value"))
        .as("quantile_values.value")): _*)
  }
}
