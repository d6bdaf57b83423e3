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

  /** Critical path per trace — the span chain whose summed self-time
    * dominates end-to-end latency (the APM "where did the time go"
    * view). Bottom-up tree DP as an ITERATIVE co-partitioned join (the
    * PageRank loop shape): each round folds children's best subtree
    * totals into their parents, so round k has every subtree of height
    * ≤ k correct; rounds are bounded by tree DEPTH (≪ span count —
    * telemetry traces are shallow and wide). The per-round sum of
    * totals is monotone and stalls exactly at the fixpoint — one tiny
    * agg as loop control, same convergence trick as
    * [[graft.llm.Dedup.connectedComponents]]. localCheckpoint keeps
    * the growing plan from re-optimizing each round. */
  def criticalPath(flatSpans: DataFrame, maxDepth: Int = 30): DataFrame = {
    val spark = flatSpans.sparkSession
    val spans = flatSpans
      .select(col("trace_id"), col("span_id"), col("parent_span_id"),
              col("duration").cast("long").as("dur"))
      .localCheckpoint()
    var dp = spans.withColumn("total", col("dur")).localCheckpoint()
    def totalSum(): Long =
      dp.agg(coalesce(sum(col("total")), lit(0L))).first().getLong(0)
    var prev = totalSum()
    var converged = false
    var i = 0
    while (!converged && i < maxDepth) {
      val childBest = dp.filter(col("parent_span_id").isNotNull)
        .groupBy(col("trace_id"), col("parent_span_id").as("span_id"))
        .agg(max(col("total")).as("child_max"))
      dp = spans.join(childBest, Seq("trace_id", "span_id"), "left")
        .withColumn("total", col("dur") + coalesce(col("child_max"), lit(0L)))
        .select("trace_id", "span_id", "parent_span_id", "dur", "total")
        .localCheckpoint()
      val s = totalSum()
      converged = s == prev
      prev = s
      i += 1
    }
    dp.filter(col("parent_span_id").isNull)
      .groupBy(col("trace_id"))
      .agg(max(col("total")).as("critical_ns"))
  }

  /** Exemplar → trace pivot: the "metric spike → which request" jump
    * every OTel backend implements. Explodes the flat metric table's
    * exemplar arrays ([[OtelMetrics.flattenGauge]]'s parallel
    * `exemplars_*` columns, internal/arrow/metrics.go's exemplar lists)
    * into one row per exemplar and resolves each against the flat span
    * table. Exemplars are SAMPLED by construction (a handful per series
    * per window), so the exploded side is tiny and broadcast. An
    * exemplar whose trace wasn't ingested (sampled out) survives with
    * `span_found = false` instead of disappearing.
    *
    * Join shape (r6 — ADVICE): an outer join can only broadcast the
    * side OPPOSITE its preserved one, so the old
    * `right-outer + broadcast(right)` hint was ignored and the span
    * table went through a full sort-merge shuffle. Decomposed instead:
    * an inner broadcast-hash join (exemplars build, spans streamed)
    * carries the matches, and the not-found remainder comes from two
    * more broadcast joins over the 2-column key projection. The span
    * table is SCANNED twice (once full-width, once pruned to the join
    * keys) and never shuffled, at any scale. */
  def exemplarTraces(flatMetrics: DataFrame, flatSpans: DataFrame): DataFrame = {
    val ex = flatMetrics
      .filter(col("exemplars_trace_id").isNotNull)
      .select(col("metric_name"),
        arrays_zip(col("exemplars_time_unix_nano").as("ts"),
                   col("exemplars_as_double").as("value"),
                   col("exemplars_span_id").as("span_id"),
                   col("exemplars_trace_id").as("trace_id")).as("exs"))
      .select(col("metric_name"), explode(col("exs")).as("e"))
      .select(col("metric_name"),
        col("e.ts").as("exemplar_time"),
        col("e.value").as("exemplar_value"),
        col("e.span_id").as("span_id"),
        col("e.trace_id").as("trace_id"))
      .filter(col("trace_id") =!= "")
    val spans = flatSpans
      .select(col("trace_id"), col("span_id"),
        col("service_name"), col("span_name"), col("status_code"),
        round(col("duration") / lit(1000000.0), 3).as("duration_ms"))
    val keys = Seq("trace_id", "span_id")
    val found = spans.join(broadcast(ex), keys)
      .withColumn("span_found", lit(true))
    // span keys that matched any exemplar: left-semi with the exemplar
    // side as the broadcast build — tiny output by construction
    val matchedKeys = spans.select(keys.map(col): _*)
      .join(broadcast(ex.select(keys.map(col): _*)), keys, "left_semi")
    val missing = ex.join(broadcast(matchedKeys), keys, "left_anti")
      .withColumn("service_name", lit(null).cast("string"))
      .withColumn("span_name", lit(null).cast("string"))
      .withColumn("status_code",
        lit(null).cast(spans.schema("status_code").dataType))
      .withColumn("duration_ms", lit(null).cast("double"))
      .withColumn("span_found", lit(false))
    val outCols = Seq("metric_name", "exemplar_time", "exemplar_value",
      "trace_id", "span_id", "service_name", "span_name", "status_code",
      "duration_ms", "span_found")
    found.select(outCols.map(col): _*)
      .unionByName(missing.select(outCols.map(col): _*))
  }
}
