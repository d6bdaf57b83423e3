package graft.otel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.config.ExporterConfig
import graft.sources.{OtelJsonSource, OtelProtoSource}
import graft.streaming.StreamingIngest

/** The reference exporter's `consumeMetrics` dispatch
  * (`/root/reference/exporter.go:130` routing one OTLP metrics request
  * into `internal/arrow/metrics.go`'s FIVE tables), pull-side and
  * continuous: one spool directory feeds five streaming queries —
  * decode, flatten, partitioned sink per metric type, table names from
  * the config's `tableFor(metrics_*)` rules.
  *
  * Five queries rather than one: the five tables have DISTINCT
  * schemas, so a single query would need a union-of-structs detour;
  * each per-type stream is a stateless narrow pass (the file source's
  * checkpointed log gives each its own exactly-once cursor over the
  * same spool, and re-decoding a small proto buffer per type is
  * executor-cheap next to the parquet write). Restart-safe per table:
  * one checkpoint directory each under `checkpointRoot`.
  *
  * Scale shape: all transforms are narrow (no shuffle anywhere
  * between spool and sink); throughput scales with executors × spool
  * file parallelism, and each table partitions independently under
  * the configured time granularity. */
object OtelMetricsPipeline {

  val Signals: Seq[String] = Seq("metrics_gauge", "metrics_sum",
    "metrics_histogram", "metrics_exponential_histogram",
    "metrics_summary")

  /** Per-type (streaming source, flatten) wiring for a spool of
    * OTLP/protobuf request files ([[OtlpHttpReceiver]]'s spool) or
    * OTLP/JSON line files (`format = "json"`). */
  private def wiring(spark: SparkSession, spoolDir: String, format: String)
      : Map[String, DataFrame] = format match {
    case "proto" => Map(
      "metrics_gauge" -> OtelMetrics.flattenGauge(
        OtelProtoSource.metricsGaugeStream(spark, spoolDir)),
      "metrics_sum" -> OtelMetrics.flattenSum(
        OtelProtoSource.metricsSumStream(spark, spoolDir)),
      "metrics_histogram" -> OtelMetrics.flattenHistogram(
        OtelProtoSource.metricsHistogramStream(spark, spoolDir)),
      "metrics_exponential_histogram" ->
        OtelMetrics.flattenExponentialHistogram(
          OtelProtoSource.metricsExponentialHistogramStream(spark, spoolDir)),
      "metrics_summary" -> OtelMetrics.flattenSummary(
        OtelProtoSource.metricsSummaryStream(spark, spoolDir)))
    case "json" => Map(
      "metrics_gauge" -> OtelMetrics.flattenGauge(
        OtelJsonSource.metricsGaugeStream(spark, spoolDir)),
      "metrics_sum" -> OtelMetrics.flattenSum(
        OtelJsonSource.metricsSumStream(spark, spoolDir)),
      "metrics_histogram" -> OtelMetrics.flattenHistogram(
        OtelJsonSource.metricsHistogramStream(spark, spoolDir)),
      "metrics_exponential_histogram" ->
        OtelMetrics.flattenExponentialHistogram(
          OtelJsonSource.metricsExponentialHistogramStream(spark, spoolDir)),
      "metrics_summary" -> OtelMetrics.flattenSummary(
        OtelJsonSource.metricsSummaryStream(spark, spoolDir)))
    case other => throw new IllegalArgumentException(
      s"format '$other' not supported (proto, json)")
  }

  /** Start all five metric-table queries; returns signal → query (the
    * caller awaits/stops them — `values.foreach(_.awaitTermination())`
    * for an AvailableNow drain). */
  def startAll(spark: SparkSession, spoolDir: String,
               cfg: ExporterConfig.Config, checkpointRoot: String,
               format: String = "proto"): Map[String, StreamingQuery] =
    wiring(spark, spoolDir, format).map { case (signal, flat) =>
      signal -> StreamingIngest.ingest(
        flat, cfg.sinkFor(signal), s"$checkpointRoot/$signal")
    }
}
