package graft.otel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OTLP traces → the reference's flat `otel_traces` schema.
  *
  * Reference: /root/reference/internal/arrow/traces.go (row layout,
  * duration at traces.go:218-220), internal/arrow/attributes.go
  * (service.name extraction, JSON-encoded attribute maps),
  * /root/reference/README.md "Traces Schema".
  *
  * Input contract: one row per ResourceSpans-ish record —
  *   resource: struct<attributes: map<string,string>, dropped_attributes_count: int>
  *   scope:    struct<name: string, version: string,
  *                    attributes: map<string,string>, dropped_attributes_count: int>
  *   spans:    array<struct< trace_id, span_id, trace_state, parent_span_id,
  *                    flags: int, name, kind: int,
  *                    start_time_unix_nano: long, end_time_unix_nano: long,
  *                    attributes: map<string,string>, dropped_attributes_count: int,
  *                    events: array<struct<time_unix_nano: long, name: string,
  *                             attributes: map<string,string>, dropped_attributes_count: int>>,
  *                    dropped_events_count: int,
  *                    links: array<struct<trace_id, span_id, trace_state,
  *                             attributes: map<string,string>,
  *                             dropped_attributes_count: int, flags: int>>,
  *                    dropped_links_count: int,
  *                    status: struct<code: int, message: string>>>
  *
  * The flatten is a pure narrative of narrow ops (explode + projections)
  * — fully parallel, no shuffle at any scale.
  */
object OtelTraces {

  /** proto SpanKind enum → string (traces.go:300 spanKindToString). */
  def kindName(kind: Column): Column =
    when(kind === 0, "UNSPECIFIED").when(kind === 1, "INTERNAL")
      .when(kind === 2, "SERVER").when(kind === 3, "CLIENT")
      .when(kind === 4, "PRODUCER").when(kind === 5, "CONSUMER")
      .otherwise("UNKNOWN")

  /** proto StatusCode enum → string; UNSET stores NULL
    * (traces.go:319 statusCodeToString returns "" → AppendNull). */
  def statusName(code: Column): Column =
    when(code === 1, "OK").when(code === 2, "ERROR").otherwise(lit(null))

  /** Reference appendNullableString semantics: "" stores NULL. */
  def emptyToNull(c: Column): Column = nullif(c, lit(""))

  /** Trace/span ids: "" and the proto all-zeros sentinel store NULL
    * (traces.go:130, logs.go:133-146). */
  def idOrNull(c: Column, width: Int): Column =
    when(c === "" || c === "0" * width, lit(null)).otherwise(c)

  /** ns-epoch long → microsecond timestamp (schemas use Timestamp(us)
    * for Iceberg v1/v2 compatibility — README "Schema"). Exact integer
    * truncation — double division drifts 1us at 2024-era epochs. */
  def nsToTimestamp(ns: Column): Column =
    timestamp_micros(call_function("div", ns.cast("long"), lit(1000L)))

  def flatten(nested: DataFrame): DataFrame =
    nested
      .select(col("resource"), col("scope"), explode(col("spans")).as("span"))
      .select(
        col("span.trace_id").as("trace_id"),
        col("span.span_id").as("span_id"),
        emptyToNull(col("span.trace_state")).as("trace_state"),
        idOrNull(col("span.parent_span_id"), 16).as("parent_span_id"),
        col("span.flags").as("span_flags"),
        col("span.name").as("span_name"),
        kindName(col("span.kind")).as("span_kind"),
        nsToTimestamp(col("span.start_time_unix_nano")).as("start_time_unix_nano"),
        nsToTimestamp(col("span.end_time_unix_nano")).as("end_time_unix_nano"),
        to_json(col("span.attributes")).as("span_attributes"),
        col("span.dropped_attributes_count").as("dropped_attributes_count"),
        transform(col("span.events"), e => nsToTimestamp(e.getField("time_unix_nano")))
          .as("events_time_unix_nano"),
        transform(col("span.events"), e => e.getField("name")).as("events_name"),
        transform(col("span.events"), e => to_json(e.getField("attributes")))
          .as("events_attributes"),
        transform(col("span.events"), e => e.getField("dropped_attributes_count"))
          .as("events_dropped_attributes_count"),
        col("span.dropped_events_count").as("dropped_events_count"),
        transform(col("span.links"), l => l.getField("trace_id")).as("links_trace_id"),
        transform(col("span.links"), l => l.getField("span_id")).as("links_span_id"),
        transform(col("span.links"), l => l.getField("trace_state")).as("links_trace_state"),
        transform(col("span.links"), l => to_json(l.getField("attributes")))
          .as("links_attributes"),
        transform(col("span.links"), l => l.getField("dropped_attributes_count"))
          .as("links_dropped_attributes_count"),
        transform(col("span.links"), l => l.getField("flags")).as("links_flags"),
        col("span.dropped_links_count").as("dropped_links_count"),
        statusName(col("span.status.code")).as("status_code"),
        emptyToNull(col("span.status.message")).as("status_message"),
        (col("span.end_time_unix_nano") - col("span.start_time_unix_nano"))
          .as("duration"),
        emptyToNull(element_at(col("resource.attributes"), "service.name"))
          .as("service_name"),
        to_json(col("resource.attributes")).as("resource_attributes"),
        col("resource.dropped_attributes_count").as("resource_dropped_attributes_count"),
        emptyToNull(col("scope.name")).as("scope_name"),
        emptyToNull(col("scope.version")).as("scope_version"),
        to_json(col("scope.attributes")).as("scope_attributes"),
        col("scope.dropped_attributes_count").as("scope_dropped_attributes_count"))
}
