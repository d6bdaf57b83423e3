package graft

import graft.otel.{OtelAnalytics, OtelLogs, OtelMetrics, OtelTraces}

// Top-level case classes so Spark can derive encoders.
case class TResource(attributes: Map[String, String], dropped_attributes_count: Int)
case class TScope(name: String, version: String,
                  attributes: Map[String, String], dropped_attributes_count: Int)
case class TEvent(time_unix_nano: Long, name: String,
                  attributes: Map[String, String], dropped_attributes_count: Int)
case class TLink(trace_id: String, span_id: String, trace_state: String,
                 attributes: Map[String, String], dropped_attributes_count: Int,
                 flags: Int)
case class TStatus(code: Int, message: String)
case class TSpan(trace_id: String, span_id: String, trace_state: String,
                 parent_span_id: String, flags: Int, name: String, kind: Int,
                 start_time_unix_nano: Long, end_time_unix_nano: Long,
                 attributes: Map[String, String], dropped_attributes_count: Int,
                 events: Seq[TEvent], dropped_events_count: Int,
                 links: Seq[TLink], dropped_links_count: Int, status: TStatus)
case class TraceBatch(resource: TResource, scope: TScope, spans: Seq[TSpan])

case class LogRecord(time_unix_nano: Long, observed_time_unix_nano: Long,
                     severity_number: Int, severity_text: String, body: String,
                     attributes: Map[String, String],
                     dropped_attributes_count: Int, flags: Int,
                     trace_id: String, span_id: String, event_name: String)
case class LogBatch(resource: TResource, scope: TScope, records: Seq[LogRecord])

case class MMetric(name: String, description: String, unit: String,
                   metadata: Map[String, String],
                   aggregation_temporality: Int, is_monotonic: Boolean)
case class MExemplar(time_unix_nano: Long, as_double: Option[Double],
                     as_int: Option[Long], span_id: String, trace_id: String,
                     filtered_attributes: Map[String, String])
case class GPoint(time_unix_nano: Long, start_time_unix_nano: Long,
                  attributes: Map[String, String], flags: Int,
                  as_double: Option[Double], as_int: Option[Long],
                  exemplars: Seq[MExemplar] = Seq.empty)
case class GaugeBatch(resource: TResource, scope: TScope, metric: MMetric,
                      points: Seq[GPoint])

case class EHBuckets(offset: Int, bucket_counts: Seq[Long])
case class EHPoint(time_unix_nano: Long, start_time_unix_nano: Long,
                   attributes: Map[String, String], flags: Int,
                   count: Long, sum: Option[Double], min: Option[Double],
                   max: Option[Double], scale: Int, zero_count: Long,
                   zero_threshold: Double, positive: EHBuckets,
                   negative: EHBuckets)
case class EHBatch(resource: TResource, scope: TScope, metric: MMetric,
                   points: Seq[EHPoint])

case class QuantileValue(quantile: Double, value: Double)
case class SPoint(time_unix_nano: Long, start_time_unix_nano: Long,
                  attributes: Map[String, String], flags: Int,
                  count: Long, sum: Double,
                  quantile_values: Seq[QuantileValue])
case class SummaryBatch(resource: TResource, scope: TScope, metric: MMetric,
                        points: Seq[SPoint])

class OtelSpec extends SparkSpec {

  private val res = TResource(Map("service.name" -> "svc-a", "host" -> "h1"), 0)
  private val scope = TScope("lib", "1.0", Map.empty, 0)

  test("traces flatten: duration, kind/status names, service_name, JSON attrs") {
    import spark.implicits._
    val t0 = 1700000000000000000L
    val span = TSpan("abc123", "def456", "", "", 1, "GET /x", 2,
      t0, t0 + 1500000000L, Map("http.method" -> "GET"), 0,
      Seq(TEvent(t0 + 1000, "ev1", Map("k" -> "v"), 0)), 0,
      Seq(TLink("ltrace", "lspan", "", Map.empty, 0, 0)), 0, TStatus(2, "boom"))
    val out = OtelTraces.flatten(Seq(TraceBatch(res, scope, Seq(span))).toDF())
    val r = out.collect()(0)
    // duration = end - start in ns (traces.go:219)
    assert(r.getAs[Long]("duration") === 1500000000L)
    assert(r.getAs[String]("span_kind") === "SERVER")
    assert(r.getAs[String]("status_code") === "ERROR")
    assert(r.getAs[String]("service_name") === "svc-a")
    assert(r.getAs[String]("span_attributes").contains("\"http.method\":\"GET\""))
    assert(r.getAs[Seq[String]]("events_name") === Seq("ev1"))
    assert(r.getAs[Seq[String]]("links_trace_id") === Seq("ltrace"))
    // 33 columns in the reference traces schema (README Traces Schema)
    assert(out.columns.length === 33)
  }

  test("logs flatten: severity, correlation ids, JSON body") {
    import spark.implicits._
    val rec = LogRecord(1700000000000000000L, 1700000000000000001L,
      17, "ERROR", "it broke", Map("k" -> "v"), 0, 0, "tid", "sid", "evt")
    val out = OtelLogs.flatten(Seq(LogBatch(res, scope, Seq(rec))).toDF())
    val r = out.collect()(0)
    assert(r.getAs[Int]("severity_number") === 17)
    assert(r.getAs[String]("trace_id") === "tid")
    assert(r.getAs[String]("body").contains("it broke"))
    assert(r.getAs[String]("service_name") === "svc-a")
    assert(out.columns.length === 18)
  }

  test("gauge flatten: envelope + typed values, nullable as_int/as_double") {
    import spark.implicits._
    val m = MMetric("cpu.load", "load", "1", Map.empty, 2, false)
    val pts = Seq(
      GPoint(1700000000000000000L, 1699999000000000000L, Map("core" -> "0"), 0,
             Some(0.75), None),
      GPoint(1700000001000000000L, 1699999000000000000L, Map("core" -> "1"), 0,
             None, Some(42L)))
    val out = OtelMetrics.flattenGauge(Seq(GaugeBatch(res, scope, m, pts)).toDF())
    assert(out.count() === 2)
    val rows = out.collect()
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("as_double")) &&
                            r.getAs[Double]("as_double") === 0.75))
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("as_int")) &&
                            r.getAs[Long]("as_int") === 42L))
    assert(rows.forall(_.getAs[String]("metric_name") === "cpu.load"))
  }

  test("exponential histogram flatten: scale, zero bucket, pos/neg buckets") {
    import spark.implicits._
    val m = MMetric("latency", "lat", "ms", Map.empty, 1, false)
    val p = EHPoint(1700000000000000000L, 1699999000000000000L, Map.empty, 0,
      count = 10, sum = Some(55.5), min = Some(0.1), max = Some(20.0),
      scale = 2, zero_count = 1, zero_threshold = 1e-9,
      positive = EHBuckets(3, Seq(4L, 3L, 2L)), negative = EHBuckets(0, Seq.empty))
    val out = OtelMetrics.flattenExponentialHistogram(
      Seq(EHBatch(res, scope, m, Seq(p))).toDF())
    val r = out.collect()(0)
    assert(r.getAs[Int]("scale") === 2)
    assert(r.getAs[Long]("zero_count") === 1L)
    assert(r.getAs[Int]("positive_offset") === 3)
    assert(r.getAs[Seq[Long]]("positive_buckets") === Seq(4L, 3L, 2L))
    assert(r.getAs[String]("aggregation_temporality") === "DELTA")
  }

  test("summary flatten: parallel quantile/value lists") {
    import spark.implicits._
    val m = MMetric("gc.pause", "gc", "ms", Map.empty, 0, false)
    val p = SPoint(1700000000000000000L, 1699999000000000000L, Map.empty, 0,
      count = 100, sum = 1234.5,
      quantile_values = Seq(QuantileValue(0.5, 3.0), QuantileValue(0.99, 17.0)))
    val out = OtelMetrics.flattenSummary(
      Seq(SummaryBatch(res, scope, m, Seq(p))).toDF())
    val r = out.collect()(0)
    assert(r.getAs[Seq[Double]]("quantile_values.quantile") === Seq(0.5, 0.99))
    assert(r.getAs[Seq[Double]]("quantile_values.value") === Seq(3.0, 17.0))
    assert(r.getAs[Long]("count") === 100L)
  }

  test("gauge exemplars flatten to parallel lists; empty slice stores NULL") {
    import spark.implicits._
    val m = MMetric("cpu.load", "load", "1", Map.empty, 2, false)
    val ex = Seq(
      MExemplar(1700000000500000000L, Some(1.5), None, "s1", "t1", Map("u" -> "1")),
      MExemplar(1700000000600000000L, None, Some(7L), "s2", "t2", Map.empty))
    val pts = Seq(
      GPoint(1700000000000000000L, 0L, Map.empty, 0, Some(0.75), None, ex),
      GPoint(1700000001000000000L, 0L, Map.empty, 0, Some(0.80), None))
    val out = OtelMetrics.flattenGauge(Seq(GaugeBatch(res, scope, m, pts)).toDF())
    val rows = out.orderBy("time_unix_nano").collect()
    val withEx = rows(0)
    // value-type switch: unset half of the pair stores 0 (metrics.go:456-467)
    assert(withEx.getAs[Seq[Double]]("exemplars_as_double") === Seq(1.5, 0.0))
    assert(withEx.getAs[Seq[Long]]("exemplars_as_int") === Seq(0L, 7L))
    assert(withEx.getAs[Seq[String]]("exemplars_span_id") === Seq("s1", "s2"))
    assert(withEx.getAs[Seq[String]]("exemplars_filtered_attributes")
      .head.contains("\"u\":\"1\""))
    // empty exemplar slice → NULL lists, and start_time 0 → NULL
    val noEx = rows(1)
    assert(noEx.isNullAt(noEx.fieldIndex("exemplars_time_unix_nano")))
    assert(noEx.isNullAt(noEx.fieldIndex("start_time_unix_nano")))
  }

  test("reference null semantics: empty strings and zero ids store NULL") {
    import spark.implicits._
    // log with UNSET severity text, zero trace/span ids, zero observed ts
    val rec = LogRecord(1700000000000000000L, 0L, 0, "", "plain body",
      Map.empty, 0, 0, "0" * 32, "0" * 16, "")
    val lr = OtelLogs.flatten(
      Seq(LogBatch(res, TScope("", "", Map.empty, 0), Seq(rec))).toDF()).collect()(0)
    // body is the raw scalar, not JSON-wrapped (logs.go:190 logValueToJSON)
    assert(lr.getAs[String]("body") === "plain body")
    Seq("severity_text", "trace_id", "span_id", "observed_time_unix_nano",
        "event_name", "scope_name", "scope_version").foreach { c =>
      assert(lr.isNullAt(lr.fieldIndex(c)), s"$c should be NULL")
    }
    // span with UNSET status → NULL status_code (traces.go:319)
    val span = TSpan("abc", "def", "", "0" * 16, 0, "op", 9,
      1L, 2L, Map.empty, 0, Seq.empty, 0, Seq.empty, 0, TStatus(0, ""))
    val tr = OtelTraces.flatten(Seq(TraceBatch(res, scope, Seq(span))).toDF()).collect()(0)
    assert(tr.isNullAt(tr.fieldIndex("status_code")))
    assert(tr.isNullAt(tr.fieldIndex("status_message")))
    assert(tr.isNullAt(tr.fieldIndex("parent_span_id")))
    assert(tr.isNullAt(tr.fieldIndex("trace_state")))
    assert(tr.getAs[String]("span_kind") === "UNKNOWN")
  }

  test("spanmetrics RED + trace summary over the flat trace table") {
    import spark.implicits._
    val t0 = 1700000000000000000L
    def span(traceId: String, spanId: String, parent: String, name: String,
             startNs: Long, durNs: Long, statusCode: Int) =
      TSpan(traceId, spanId, "", parent, 1, name, 2,
        startNs, startNs + durNs, Map.empty, 0, Nil, 0, Nil, 0,
        TStatus(statusCode, ""))
    val spans = Seq(
      span("t1", "a", "",  "GET /x", t0,         10000000L, 1), // root, ok
      span("t1", "b", "a", "db.q",   t0 + 1000L, 20000000L, 2), // child, error
      span("t2", "c", "",  "GET /x", t0,         40000000L, 1)) // root, ok
    val flat = OtelTraces.flatten(Seq(TraceBatch(res, scope, spans)).toDF())

    val red = OtelAnalytics.spanMetrics(flat).collect()
      .map(r => r.getAs[String]("span_name") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_errors"),
         r.getAs[Double]("p95_ms"), r.getAs[Double]("error_rate"))).toMap
    assert(red("GET /x") === ((2L, 0L, 38.5, 0.0))) // interpolated p95 of {10,40}
    assert(red("db.q") === ((1L, 1L, 20.0, 1.0)))

    val ts = OtelAnalytics.traceSummary(flat).collect()
      .map(r => r.getAs[String]("trace_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[String]("root_span"),
         r.getAs[Long]("has_error"))).toMap
    assert(ts("t1") === ((2L, "GET /x", 1L)))
    assert(ts("t2") === ((1L, "GET /x", 0L)))
    // plan hygiene: the string argmax must hash-aggregate, not sort
    val plan = OtelAnalytics.traceSummary(flat).queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), s"SortAggregate in:\n${plan.take(1200)}")
  }

  test("service graph aggregates cross-service caller->callee edges") {
    import spark.implicits._
    val t0 = 1700000000000000000L
    def span(traceId: String, spanId: String, parent: String, name: String,
             durNs: Long, statusCode: Int) =
      TSpan(traceId, spanId, "", parent, 1, name, 2,
        t0, t0 + durNs, Map.empty, 0, Nil, 0, Nil, 0, TStatus(statusCode, ""))
    val svcA = TResource(Map("service.name" -> "frontend"), 0)
    val svcB = TResource(Map("service.name" -> "backend"), 0)
    val flat = OtelTraces.flatten(Seq(
      TraceBatch(svcA, scope, Seq(
        span("t1", "a", "", "GET /", 10000000L, 1),
        span("t1", "a2", "a", "render", 1000000L, 1))), // same-service: no edge
      TraceBatch(svcB, scope, Seq(
        span("t1", "b", "a", "query", 20000000L, 2),    // frontend -> backend, error
        span("t1", "b2", "a", "query2", 5000000L, 1)))  // frontend -> backend, ok
    ).toDF())
    val edges = OtelAnalytics.serviceGraph(flat).collect()
    assert(edges.length === 1)
    val e = edges(0)
    assert(e.getAs[String]("caller") === "frontend")
    assert(e.getAs[String]("callee") === "backend")
    assert(e.getAs[Long]("n_calls") === 2L)
    assert(e.getAs[Long]("n_errors") === 1L)
    assert(e.getAs[Double]("total_ms") === 25.0)
  }

  test("multi-root traces get a deterministic earliest-start root_span") {
    import spark.implicits._
    val t0 = 1700000000000000000L
    def rootAt(spanId: String, name: String, startNs: Long) =
      TSpan("tm", spanId, "", "", 1, name, 2,
        startNs, startNs + 1000L, Map.empty, 0, Nil, 0, Nil, 0, TStatus(1, ""))
    // two parentless spans: the EARLIER start must win, whatever the
    // partitioning/merge order (round-3 ADVICE: was arbitrary)
    val flat = OtelTraces.flatten(Seq(TraceBatch(res, scope, Seq(
      rootAt("z9", "late-root", t0 + 500L),
      rootAt("a1", "early-root", t0)))).toDF())
    (1 to 3).foreach { _ =>
      val r = OtelAnalytics.traceSummary(flat.repartition(7)).collect()(0)
      assert(r.getAs[String]("root_span") === "early-root")
    }
  }

  test("sum flatten carries monotonicity and temporality names") {
    import spark.implicits._
    val m = MMetric("requests", "req count", "1", Map.empty, 2, true)
    val pts = Seq(GPoint(1700000000000000000L, 1699999000000000000L,
                         Map.empty, 0, None, Some(100L)))
    val out = OtelMetrics.flattenSum(Seq(GaugeBatch(res, scope, m, pts)).toDF())
    val r = out.collect()(0)
    assert(r.getAs[Boolean]("is_monotonic"))
    assert(r.getAs[String]("aggregation_temporality") === "CUMULATIVE")
  }

  test("critical path equals a driver-side tree DP on deep and random traces") {
    import spark.implicits._
    val t0 = 1700000000000000000L
    def span(traceId: String, spanId: String, parent: String, durNs: Long) =
      TSpan(traceId, spanId, "", parent, 1, s"s-$spanId", 2,
        t0, t0 + durNs, Map.empty, 0, Nil, 0, Nil, 0, TStatus(1, ""))
    // t1: root(10) → {b(5) → d(3)}, {c(20)} → critical = 10+20 = 30
    // t2: a 6-deep chain of 1s → critical = 6 (exercises the loop depth)
    val fixed = Seq(
      span("t1", "a", "", 10), span("t1", "b", "a", 5),
      span("t1", "d", "b", 3), span("t1", "c", "a", 20)) ++
      (0 until 6).map(i => span("t2", s"n$i", if (i == 0) "" else s"n${i - 1}", 1))
    // t3: pseudo-random 40-span tree (deterministic seed)
    val rnd = new scala.util.Random(7)
    val random = span("t3", "r0", "", rnd.nextInt(100) + 1L) +: (1 until 40).map {
      i => span("t3", s"r$i", s"r${rnd.nextInt(i)}", rnd.nextInt(100) + 1L)
    }
    val all = fixed ++ random
    val flat = OtelTraces.flatten(Seq(TraceBatch(res, scope, all)).toDF())
    val got = OtelAnalytics.criticalPath(flat).collect()
      .map(r => r.getAs[String]("trace_id") -> r.getAs[Long]("critical_ns")).toMap
    // driver DP reference
    def expect(spans: Seq[TSpan]): Long = {
      val children = spans.groupBy(_.parent_span_id)
      def dp(id: String, dur: Long): Long =
        dur + children.getOrElse(id, Nil).map(c =>
          dp(c.span_id, c.end_time_unix_nano - c.start_time_unix_nano))
          .foldLeft(0L)(math.max)
      spans.filter(_.parent_span_id.isEmpty)
        .map(s => dp(s.span_id, s.end_time_unix_nano - s.start_time_unix_nano))
        .max
    }
    assert(got("t1") === 30L)
    assert(got("t2") === 6L)
    assert(got("t3") === expect(random))
  }
}
