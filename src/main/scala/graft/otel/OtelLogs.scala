package graft.otel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import OtelTraces.nsToTimestamp

/** OTLP logs → the reference's flat `otel_logs` schema.
  *
  * Reference: /root/reference/internal/arrow/logs.go and
  * /root/reference/README.md "Logs Schema".
  *
  * Input contract: one row per ResourceLogs-ish record —
  *   resource, scope: as in [[OtelTraces]]
  *   records: array<struct<time_unix_nano: long, observed_time_unix_nano: long,
  *            severity_number: int, severity_text: string, body: string,
  *            attributes: map<string,string>, dropped_attributes_count: int,
  *            flags: int, trace_id: string, span_id: string, event_name: string>>
  */
object OtelLogs {

  def flatten(nested: DataFrame): DataFrame =
    nested
      .select(col("resource"), col("scope"), explode(col("records")).as("r"))
      .select(
        nsToTimestamp(col("r.time_unix_nano")).as("time_unix_nano"),
        col("r.severity_number").as("severity_number"),
        col("r.severity_text").as("severity_text"),
        to_json(struct(col("r.body").as("value"))).as("body"),
        to_json(col("r.attributes")).as("log_attributes"),
        col("r.dropped_attributes_count").as("dropped_attributes_count"),
        col("r.flags").as("log_flags"),
        col("r.trace_id").as("trace_id"),
        col("r.span_id").as("span_id"),
        nsToTimestamp(col("r.observed_time_unix_nano")).as("observed_time_unix_nano"),
        col("r.event_name").as("event_name"),
        element_at(col("resource.attributes"), "service.name").as("service_name"),
        to_json(col("resource.attributes")).as("resource_attributes"),
        col("resource.dropped_attributes_count").as("resource_dropped_attributes_count"),
        col("scope.name").as("scope_name"),
        col("scope.version").as("scope_version"),
        to_json(col("scope.attributes")).as("scope_attributes"),
        col("scope.dropped_attributes_count").as("scope_dropped_attributes_count"))
}
