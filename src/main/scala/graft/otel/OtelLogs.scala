package graft.otel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import OtelTraces.{emptyToNull, idOrNull, nsToTimestamp}

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
        emptyToNull(col("r.severity_text")).as("severity_text"),
        // logValueToJSON (logs.go:190) emits scalar bodies raw — a string
        // body is stored as the plain string, not {"value":...}. The input
        // contract carries slice/map bodies pre-JSON-encoded, matching the
        // reference's json.Marshal branch.
        col("r.body").as("body"),
        to_json(col("r.attributes")).as("log_attributes"),
        col("r.dropped_attributes_count").as("dropped_attributes_count"),
        col("r.flags").as("log_flags"),
        // "" / all-zero proto sentinels store NULL (logs.go:133-146)
        idOrNull(col("r.trace_id"), 32).as("trace_id"),
        idOrNull(col("r.span_id"), 16).as("span_id"),
        // observed ts 0 stores NULL (logs.go:150-156)
        when(col("r.observed_time_unix_nano") === 0, lit(null))
          .otherwise(nsToTimestamp(col("r.observed_time_unix_nano")))
          .as("observed_time_unix_nano"),
        emptyToNull(col("r.event_name")).as("event_name"),
        emptyToNull(element_at(col("resource.attributes"), "service.name"))
          .as("service_name"),
        to_json(col("resource.attributes")).as("resource_attributes"),
        col("resource.dropped_attributes_count").as("resource_dropped_attributes_count"),
        emptyToNull(col("scope.name")).as("scope_name"),
        emptyToNull(col("scope.version")).as("scope_version"),
        to_json(col("scope.attributes")).as("scope_attributes"),
        col("scope.dropped_attributes_count").as("scope_dropped_attributes_count"))
}
