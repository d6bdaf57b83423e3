package graft.otel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Downstream analytics over the reference's own flat tables — the
  * queries its users run on what the exporter writes.
  *
  * `spanMetrics` is the spanmetrics-connector shape (the flagship OTel
  * derived signal): RED metrics — request Rate, Error count, Duration
  * distribution — per service per span name per time bucket, computed
  * from the flat trace table ([[OtelTraces.flatten]]'s schema,
  * internal/arrow/traces.go). One partial-aggregated shuffle on the
  * (bucket, service, span) key; duration percentiles are exact here —
  * swap in the grid sketch (graft.telemetry.Telemetry.gridPercentiles
  * shape) at 100 TB. */
object OtelAnalytics {

  def spanMetrics(flatSpans: DataFrame): DataFrame =
    flatSpans
      .groupBy(
        date_trunc("hour", col("start_time_unix_nano")).as("hour_start"),
        col("service_name"), col("span_name"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("status_code") === "ERROR", 1L).otherwise(0L))
          .as("n_errors"),
        round(sum(col("duration")) / lit(1000000.0), 3).as("total_ms"),
        round(expr("percentile(duration, 0.95)") / lit(1000000.0), 3).as("p95_ms"))
      .withColumn("error_rate",
        round(col("n_errors") / col("n_spans"), 4))

  /** Trace assembly: per-trace summary (root span, span count, total
    * duration, error flag) — the trace-level view assembled from the
    * flat span rows. Root = the span with no parent; the argmax rides
    * through TopKStructs k=1 (hash aggregation — a max(string) would
    * fall back to sort-based aggregation). */
  def traceSummary(flatSpans: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(flatSpans.sparkSession)
    flatSpans
      .groupBy(col("trace_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        min(col("start_time_unix_nano")).as("trace_start"),
        max(col("end_time_unix_nano")).as("trace_end"),
        // tie-break: prefer root-ness, then earliest start, then span_id —
        // multi-root traces (or orphaned subtrees with no parentless span)
        // get a DETERMINISTIC root_span instead of an arbitrary one.
        element_at(call_function("top_k_structs",
          struct(when(col("parent_span_id").isNull, 1L).otherwise(0L).as("is_root"),
                 col("start_time_unix_nano").as("tb_start"),
                 col("span_id").as("tb_span_id"),
                 col("span_name")),
          lit(1), array(lit(false), lit(true), lit(true)),
          array(lit(false), lit(false), lit(false))), 1)
          .getField("span_name").as("root_span"),
        max(when(col("status_code") === "ERROR", 1L).otherwise(0L))
          .as("has_error"))
  }

  /** Service dependency graph — the servicegraph-connector shape: join
    * each span to its parent span and aggregate cross-service
    * (caller → callee) edges with call counts, error counts, and
    * duration totals. One shuffle on span_id (the parent lookup), one
    * partial-aggregated shuffle on the (caller, callee) edge key — at
    * 100 TB the edge cardinality is #service-pairs, tiny next to the
    * span table, so the second shuffle carries almost nothing. */
  def serviceGraph(flatSpans: DataFrame): DataFrame = {
    val child = flatSpans.select(
      col("parent_span_id"), col("service_name").as("callee"),
      col("status_code"), col("duration"))
      .filter(col("parent_span_id").isNotNull)
    val parent = flatSpans.select(
      col("span_id").as("parent_span_id"),
      col("service_name").as("caller"))
    child.join(parent, "parent_span_id")
      .filter(col("caller") =!= col("callee")) // in-service spans aren't edges
      .groupBy(col("caller"), col("callee"))
      .agg(
        count(lit(1)).as("n_calls"),
        sum(when(col("status_code") === "ERROR", 1L).otherwise(0L))
          .as("n_errors"),
        round(sum(col("duration")) / lit(1000000.0), 3).as("total_ms"))
  }
}
