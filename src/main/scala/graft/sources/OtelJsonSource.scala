package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** OTLP/JSON source: parses the standard OTLP JSON file encoding
  * (proto3 JSON mapping of ExportTraceServiceRequest /
  * ExportLogsServiceRequest / ExportMetricsServiceRequest, one request
  * per line) into the nested input contract consumed by
  * [[graft.otel.OtelTraces]] / [[graft.otel.OtelLogs]] /
  * [[graft.otel.OtelMetrics]] — the graft counterpart of the collector
  * feeding the reference exporter its pdata batches.
  *
  * Proto3-JSON quirks handled here: int64 fields (timestamps, counts,
  * asInt) arrive as STRINGS; attribute maps arrive as key/AnyValue
  * entry lists; absent fields (proto defaults) arrive as nulls.
  * Everything is `from_json` + higher-order functions — fully
  * distributed, schema-pruned, no UDFs.
  */
object OtelJsonSource {

  private val ATTRS =
    "array<struct<key:string,value:struct<stringValue:string,intValue:string," +
      "doubleValue:double,boolValue:boolean>>>"
  private val RES = s"struct<attributes:$ATTRS,droppedAttributesCount:int>"
  private val SCOPE =
    s"struct<name:string,version:string,attributes:$ATTRS,droppedAttributesCount:int>"
  private val EX =
    s"array<struct<timeUnixNano:string,asDouble:double,asInt:string," +
      s"spanId:string,traceId:string,filteredAttributes:$ATTRS>>"
  private val EVENTS_T =
    s"array<struct<timeUnixNano:string,name:string,attributes:$ATTRS," +
      "droppedAttributesCount:int>>"
  private val LINKS_T =
    s"array<struct<traceId:string,spanId:string,traceState:string," +
      s"attributes:$ATTRS,droppedAttributesCount:int,flags:int>>"
  private val NUMDP =
    s"array<struct<startTimeUnixNano:string,timeUnixNano:string,asDouble:double," +
      s"asInt:string,attributes:$ATTRS,flags:int,exemplars:$EX>>"

  val traceSchema: StructType = StructType.fromDDL(
    s"""resourceSpans array<struct<resource:$RES,scopeSpans:array<struct<scope:$SCOPE,
       |spans:array<struct<traceId:string,spanId:string,traceState:string,
       |parentSpanId:string,flags:int,name:string,kind:int,
       |startTimeUnixNano:string,endTimeUnixNano:string,attributes:$ATTRS,
       |droppedAttributesCount:int,
       |events:array<struct<timeUnixNano:string,name:string,attributes:$ATTRS,
       |droppedAttributesCount:int>>,droppedEventsCount:int,
       |links:array<struct<traceId:string,spanId:string,traceState:string,
       |attributes:$ATTRS,droppedAttributesCount:int,flags:int>>,
       |droppedLinksCount:int,status:struct<code:int,message:string>>>>>>>""".stripMargin.replace("\n", ""))

  val logSchema: StructType = StructType.fromDDL(
    s"""resourceLogs array<struct<resource:$RES,scopeLogs:array<struct<scope:$SCOPE,
       |logRecords:array<struct<timeUnixNano:string,observedTimeUnixNano:string,
       |severityNumber:int,severityText:string,
       |body:struct<stringValue:string,intValue:string,doubleValue:double,boolValue:boolean>,
       |attributes:$ATTRS,droppedAttributesCount:int,flags:int,
       |traceId:string,spanId:string,eventName:string>>>>>>""".stripMargin.replace("\n", ""))

  val metricSchema: StructType = StructType.fromDDL(
    s"""resourceMetrics array<struct<resource:$RES,scopeMetrics:array<struct<scope:$SCOPE,
       |metrics:array<struct<name:string,description:string,unit:string,metadata:$ATTRS,
       |gauge:struct<dataPoints:$NUMDP>,
       |sum:struct<dataPoints:$NUMDP,aggregationTemporality:int,isMonotonic:boolean>,
       |histogram:struct<dataPoints:array<struct<startTimeUnixNano:string,
       |timeUnixNano:string,count:string,sum:double,min:double,max:double,
       |bucketCounts:array<string>,explicitBounds:array<double>,attributes:$ATTRS,
       |flags:int,exemplars:$EX>>,aggregationTemporality:int>,
       |exponentialHistogram:struct<dataPoints:array<struct<startTimeUnixNano:string,
       |timeUnixNano:string,count:string,sum:double,min:double,max:double,scale:int,
       |zeroCount:string,zeroThreshold:double,
       |positive:struct<offset:int,bucketCounts:array<string>>,
       |negative:struct<offset:int,bucketCounts:array<string>>,attributes:$ATTRS,
       |flags:int,exemplars:$EX>>,aggregationTemporality:int>,
       |summary:struct<dataPoints:array<struct<startTimeUnixNano:string,
       |timeUnixNano:string,count:string,sum:double,
       |quantileValues:array<struct<quantile:double,value:double>>,attributes:$ATTRS,
       |flags:int>>>>>>>>>""".stripMargin.replace("\n", ""))

  /** OTLP AnyValue entry list → map<string,string> (scalars rendered as
    * their string forms, the reference's attributesToJSON value shape). */
  def attrsToMap(attrs: Column): Column = {
    val entries = transform(attrs, e =>
      struct(e.getField("key").as("key"),
        coalesce(
          e.getField("value").getField("stringValue"),
          e.getField("value").getField("intValue"),
          e.getField("value").getField("doubleValue").cast("string"),
          e.getField("value").getField("boolValue").cast("string")).as("value")))
    coalesce(map_from_entries(entries), map_from_arrays(array(), array()).cast("map<string,string>"))
  }

  private def nsLong(c: Column): Column = coalesce(c.cast("long"), lit(0L))
  private def cnt(c: Column): Column = coalesce(c, lit(0))

  private def resourceCol(r: Column): Column =
    struct(attrsToMap(r.getField("attributes")).as("attributes"),
           cnt(r.getField("droppedAttributesCount")).as("dropped_attributes_count"))

  private def scopeCol(s: Column): Column =
    struct(coalesce(s.getField("name"), lit("")).as("name"),
           coalesce(s.getField("version"), lit("")).as("version"),
           attrsToMap(s.getField("attributes")).as("attributes"),
           cnt(s.getField("droppedAttributesCount")).as("dropped_attributes_count"))

  private def exemplarsCol(ex: Column): Column =
    transform(coalesce(ex, array().cast(EX)), e =>
      struct(nsLong(e.getField("timeUnixNano")).as("time_unix_nano"),
             e.getField("asDouble").as("as_double"),
             e.getField("asInt").cast("long").as("as_int"),
             coalesce(e.getField("spanId"), lit("")).as("span_id"),
             coalesce(e.getField("traceId"), lit("")).as("trace_id"),
             attrsToMap(e.getField("filteredAttributes")).as("filtered_attributes")))

  /** OTLP/JSON trace lines → the [[graft.otel.OtelTraces.flatten]] input. */
  def traces(spark: SparkSession, path: String): DataFrame =
    toTraceBatches(spark.read.schema(traceSchema).json(path))

  /** STREAMING twin: tail a collector-written OTLP/JSON directory (file
    * source — exactly-once via the checkpointed file log, the same
    * guarantee [[graft.streaming.StreamingIngest.readEvents]] rides) into
    * the identical batch contract. Every transform here and in the
    * flattens is narrow, so the whole
    * `tracesStream → flatten → partitioned sink` pipeline runs as one
    * stateless streaming stage — the reference exporter's continuous
    * ingest loop, file-fed. */
  def tracesStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    toTraceBatches(spark.readStream.schema(traceSchema).options(options).json(path))

  /** Streaming twin of [[logs]] (same contract, file-tail source). */
  def logsStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    toLogBatches(spark.readStream.schema(logSchema).options(options).json(path))

  /** Streaming twin of [[metricsGauge]]. */
  def metricsGaugeStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    gaugeBatches(spark.readStream.schema(metricSchema).options(options).json(path))

  /** Streaming twin of [[metricsSum]]. */
  def metricsSumStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    sumBatches(spark.readStream.schema(metricSchema).options(options).json(path))

  /** Streaming twins of the remaining three metric tables — the
    * reference exports all five continuously (metrics.go, 5 tables);
    * histogram points are the most common production metric type, so a
    * collector tailing the spool gets the same five-table contract as
    * batch. All transforms are narrow: each stream runs as one
    * stateless stage into the flattens. */
  def metricsHistogramStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    histogramBatches(spark.readStream.schema(metricSchema).options(options).json(path))

  def metricsExponentialHistogramStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    expHistogramBatches(spark.readStream.schema(metricSchema).options(options).json(path))

  def metricsSummaryStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    summaryBatches(spark.readStream.schema(metricSchema).options(options).json(path))

  def toTraceBatches(raw: DataFrame): DataFrame =
    raw.select(explode(col("resourceSpans")).as("rs"))
      .select(col("rs.resource").as("res"), explode(col("rs.scopeSpans")).as("ss"))
      .select(
        resourceCol(col("res")).as("resource"),
        scopeCol(col("ss.scope")).as("scope"),
        transform(col("ss.spans"), s => struct(
          coalesce(s.getField("traceId"), lit("")).as("trace_id"),
          coalesce(s.getField("spanId"), lit("")).as("span_id"),
          coalesce(s.getField("traceState"), lit("")).as("trace_state"),
          coalesce(s.getField("parentSpanId"), lit("")).as("parent_span_id"),
          cnt(s.getField("flags")).as("flags"),
          coalesce(s.getField("name"), lit("")).as("name"),
          cnt(s.getField("kind")).as("kind"),
          nsLong(s.getField("startTimeUnixNano")).as("start_time_unix_nano"),
          nsLong(s.getField("endTimeUnixNano")).as("end_time_unix_nano"),
          attrsToMap(s.getField("attributes")).as("attributes"),
          cnt(s.getField("droppedAttributesCount")).as("dropped_attributes_count"),
          transform(coalesce(s.getField("events"), array().cast(EVENTS_T)), e => struct(
            nsLong(e.getField("timeUnixNano")).as("time_unix_nano"),
            coalesce(e.getField("name"), lit("")).as("name"),
            attrsToMap(e.getField("attributes")).as("attributes"),
            cnt(e.getField("droppedAttributesCount")).as("dropped_attributes_count")))
            .as("events"),
          cnt(s.getField("droppedEventsCount")).as("dropped_events_count"),
          transform(coalesce(s.getField("links"), array().cast(LINKS_T)), l => struct(
            coalesce(l.getField("traceId"), lit("")).as("trace_id"),
            coalesce(l.getField("spanId"), lit("")).as("span_id"),
            coalesce(l.getField("traceState"), lit("")).as("trace_state"),
            attrsToMap(l.getField("attributes")).as("attributes"),
            cnt(l.getField("droppedAttributesCount")).as("dropped_attributes_count"),
            cnt(l.getField("flags")).as("flags"))).as("links"),
          cnt(s.getField("droppedLinksCount")).as("dropped_links_count"),
          struct(cnt(s.getField("status").getField("code")).as("code"),
                 coalesce(s.getField("status").getField("message"), lit(""))
                   .as("message")).as("status"))).as("spans"))

  /** OTLP/JSON log lines → the [[graft.otel.OtelLogs.flatten]] input.
    * Scalar bodies are rendered raw (logs.go:190 logValueToJSON). */
  def logs(spark: SparkSession, path: String): DataFrame =
    toLogBatches(spark.read.schema(logSchema).json(path))

  def toLogBatches(raw: DataFrame): DataFrame =
    raw.select(explode(col("resourceLogs")).as("rl"))
      .select(col("rl.resource").as("res"), explode(col("rl.scopeLogs")).as("sl"))
      .select(
        resourceCol(col("res")).as("resource"),
        scopeCol(col("sl.scope")).as("scope"),
        transform(col("sl.logRecords"), r => struct(
          nsLong(r.getField("timeUnixNano")).as("time_unix_nano"),
          nsLong(r.getField("observedTimeUnixNano")).as("observed_time_unix_nano"),
          cnt(r.getField("severityNumber")).as("severity_number"),
          coalesce(r.getField("severityText"), lit("")).as("severity_text"),
          coalesce(
            r.getField("body").getField("stringValue"),
            r.getField("body").getField("intValue"),
            r.getField("body").getField("doubleValue").cast("string"),
            r.getField("body").getField("boolValue").cast("string"),
            lit("")).as("body"),
          attrsToMap(r.getField("attributes")).as("attributes"),
          cnt(r.getField("droppedAttributesCount")).as("dropped_attributes_count"),
          cnt(r.getField("flags")).as("flags"),
          coalesce(r.getField("traceId"), lit("")).as("trace_id"),
          coalesce(r.getField("spanId"), lit("")).as("span_id"),
          coalesce(r.getField("eventName"), lit("")).as("event_name"))).as("records"))

  private def explodeMetrics(raw: DataFrame): DataFrame =
    raw.select(explode(col("resourceMetrics")).as("rm"))
      .select(col("rm.resource").as("res"), explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("res"), col("sm.scope").as("sc"), explode(col("sm.metrics")).as("m"))

  private def metricCol(m: Column, temporality: Column, monotonic: Column): Column =
    struct(coalesce(m.getField("name"), lit("")).as("name"),
           coalesce(m.getField("description"), lit("")).as("description"),
           coalesce(m.getField("unit"), lit("")).as("unit"),
           attrsToMap(m.getField("metadata")).as("metadata"),
           coalesce(temporality, lit(0)).as("aggregation_temporality"),
           coalesce(monotonic, lit(false)).as("is_monotonic"))

  private def numPoints(dps: Column): Column =
    transform(dps, p => struct(
      nsLong(p.getField("timeUnixNano")).as("time_unix_nano"),
      nsLong(p.getField("startTimeUnixNano")).as("start_time_unix_nano"),
      attrsToMap(p.getField("attributes")).as("attributes"),
      cnt(p.getField("flags")).as("flags"),
      p.getField("asDouble").as("as_double"),
      p.getField("asInt").cast("long").as("as_int"),
      exemplarsCol(p.getField("exemplars")).as("exemplars")))

  /** OTLP/JSON metric lines → [[graft.otel.OtelMetrics.flattenGauge]] input. */
  def metricsGauge(spark: SparkSession, path: String): DataFrame =
    gaugeBatches(spark.read.schema(metricSchema).json(path))

  private def gaugeBatches(raw: DataFrame): DataFrame = {
    val m = explodeMetrics(raw).filter(col("m.gauge").isNotNull)
    m.select(resourceCol(col("res")).as("resource"), scopeCol(col("sc")).as("scope"),
      metricCol(col("m"), lit(0), lit(false)).as("metric"),
      numPoints(col("m.gauge.dataPoints")).as("points"))
  }

  /** OTLP/JSON metric lines → [[graft.otel.OtelMetrics.flattenSum]] input. */
  def metricsSum(spark: SparkSession, path: String): DataFrame =
    sumBatches(spark.read.schema(metricSchema).json(path))

  private def sumBatches(raw: DataFrame): DataFrame = {
    val m = explodeMetrics(raw)
      .filter(col("m.sum").isNotNull)
    m.select(resourceCol(col("res")).as("resource"), scopeCol(col("sc")).as("scope"),
      metricCol(col("m"), col("m.sum.aggregationTemporality"),
                col("m.sum.isMonotonic")).as("metric"),
      numPoints(col("m.sum.dataPoints")).as("points"))
  }

  /** OTLP/JSON metric lines → [[graft.otel.OtelMetrics.flattenHistogram]] input. */
  def metricsHistogram(spark: SparkSession, path: String): DataFrame =
    histogramBatches(spark.read.schema(metricSchema).json(path))

  private def histogramBatches(raw: DataFrame): DataFrame = {
    val m = explodeMetrics(raw)
      .filter(col("m.histogram").isNotNull)
    m.select(resourceCol(col("res")).as("resource"), scopeCol(col("sc")).as("scope"),
      metricCol(col("m"), col("m.histogram.aggregationTemporality"), lit(false))
        .as("metric"),
      transform(col("m.histogram.dataPoints"), p => struct(
        nsLong(p.getField("timeUnixNano")).as("time_unix_nano"),
        nsLong(p.getField("startTimeUnixNano")).as("start_time_unix_nano"),
        attrsToMap(p.getField("attributes")).as("attributes"),
        cnt(p.getField("flags")).as("flags"),
        coalesce(p.getField("count").cast("long"), lit(0L)).as("count"),
        p.getField("sum").as("sum"),
        p.getField("min").as("min"),
        p.getField("max").as("max"),
        transform(coalesce(p.getField("bucketCounts"), array().cast("array<string>")),
          _.cast("long")).as("bucket_counts"),
        coalesce(p.getField("explicitBounds"), array().cast("array<double>"))
          .as("explicit_bounds"),
        exemplarsCol(p.getField("exemplars")).as("exemplars"))).as("points"))
  }

  /** OTLP/JSON metric lines →
    * [[graft.otel.OtelMetrics.flattenExponentialHistogram]] input. */
  def metricsExponentialHistogram(spark: SparkSession, path: String): DataFrame =
    expHistogramBatches(spark.read.schema(metricSchema).json(path))

  private def expHistogramBatches(raw: DataFrame): DataFrame = {
    val m = explodeMetrics(raw)
      .filter(col("m.exponentialHistogram").isNotNull)
    def buckets(b: Column): Column =
      struct(cnt(b.getField("offset")).as("offset"),
        transform(coalesce(b.getField("bucketCounts"), array().cast("array<string>")),
          _.cast("long")).as("bucket_counts"))
    m.select(resourceCol(col("res")).as("resource"), scopeCol(col("sc")).as("scope"),
      metricCol(col("m"), col("m.exponentialHistogram.aggregationTemporality"),
                lit(false)).as("metric"),
      transform(col("m.exponentialHistogram.dataPoints"), p => struct(
        nsLong(p.getField("timeUnixNano")).as("time_unix_nano"),
        nsLong(p.getField("startTimeUnixNano")).as("start_time_unix_nano"),
        attrsToMap(p.getField("attributes")).as("attributes"),
        cnt(p.getField("flags")).as("flags"),
        coalesce(p.getField("count").cast("long"), lit(0L)).as("count"),
        p.getField("sum").as("sum"),
        p.getField("min").as("min"),
        p.getField("max").as("max"),
        cnt(p.getField("scale")).as("scale"),
        coalesce(p.getField("zeroCount").cast("long"), lit(0L)).as("zero_count"),
        coalesce(p.getField("zeroThreshold"), lit(0.0)).as("zero_threshold"),
        buckets(p.getField("positive")).as("positive"),
        buckets(p.getField("negative")).as("negative"),
        exemplarsCol(p.getField("exemplars")).as("exemplars"))).as("points"))
  }

  /** OTLP/JSON metric lines → [[graft.otel.OtelMetrics.flattenSummary]] input. */
  def metricsSummary(spark: SparkSession, path: String): DataFrame =
    summaryBatches(spark.read.schema(metricSchema).json(path))

  private def summaryBatches(raw: DataFrame): DataFrame = {
    val m = explodeMetrics(raw)
      .filter(col("m.summary").isNotNull)
    m.select(resourceCol(col("res")).as("resource"), scopeCol(col("sc")).as("scope"),
      metricCol(col("m"), lit(0), lit(false)).as("metric"),
      transform(col("m.summary.dataPoints"), p => struct(
        nsLong(p.getField("timeUnixNano")).as("time_unix_nano"),
        nsLong(p.getField("startTimeUnixNano")).as("start_time_unix_nano"),
        attrsToMap(p.getField("attributes")).as("attributes"),
        cnt(p.getField("flags")).as("flags"),
        coalesce(p.getField("count").cast("long"), lit(0L)).as("count"),
        coalesce(p.getField("sum"), lit(0.0)).as("sum"),
        coalesce(p.getField("quantileValues"),
          array().cast("array<struct<quantile:double,value:double>>"))
          .as("quantile_values"))).as("points"))
  }
}
