package graft.config

/** Exporter configuration surface — API parity with the reference's
  * config model (/root/reference/config.go,
  * internal/iceberg/catalog.go:167-223 table naming,
  * internal/iceberg/fileio.go:139-199 storage validation).
  *
  * A user of the reference exporter configures storage backend, catalog,
  * per-signal table names, partition granularity/timezone, compression,
  * and verbosity; this model accepts the same shape, applies the same
  * defaults, and enforces the same validation rules, then resolves to
  * the Spark-side sink settings (Hadoop FS URI + SinkConfig).
  */
object ExporterConfig {

  sealed trait Storage { def compression: String }
  /** storage.s3 — requires bucket and region-or-endpoint. */
  case class S3(bucket: String, region: String = "", endpoint: String = "",
                accessKeyId: String = "", secretAccessKey: String = "",
                compression: String = "snappy") extends Storage
  /** storage.r2 — requires account_id, bucket, and both keys. */
  case class R2(accountId: String, bucket: String,
                accessKeyId: String, secretAccessKey: String,
                compression: String = "snappy") extends Storage
  /** storage.filesystem — requires base_path. */
  case class Filesystem(basePath: String,
                        compression: String = "snappy") extends Storage

  case class Catalog(catalogType: String, // "rest" | "none"; must be set
                     namespace: String = "default",
                     restUri: String = "", warehouse: String = "",
                     token: String = "")

  /** Per-signal table names with the reference's prefix-default scheme. */
  case class TableNames(traces: String = "", logs: String = "",
                        metrics: String = "", metricsGauge: String = "",
                        metricsSum: String = "", metricsHistogram: String = "",
                        metricsExponentialHistogram: String = "",
                        metricsSummary: String = "") {
    private def metricsPrefix = if (metrics.nonEmpty) metrics else "otel_metrics"
    /** catalog.go GetTableName: explicit override beats prefix default. */
    def tableFor(signal: String): String = signal match {
      case "traces" => if (traces.nonEmpty) traces else "otel_traces"
      case "logs"   => if (logs.nonEmpty) logs else "otel_logs"
      case "metrics" => metricsPrefix
      case "metrics_gauge" =>
        if (metricsGauge.nonEmpty) metricsGauge else s"${metricsPrefix}_gauge"
      case "metrics_sum" =>
        if (metricsSum.nonEmpty) metricsSum else s"${metricsPrefix}_sum"
      case "metrics_histogram" =>
        if (metricsHistogram.nonEmpty) metricsHistogram
        else s"${metricsPrefix}_histogram"
      case "metrics_exponential_histogram" =>
        if (metricsExponentialHistogram.nonEmpty) metricsExponentialHistogram
        else s"${metricsPrefix}_exponential_histogram"
      case "metrics_summary" =>
        if (metricsSummary.nonEmpty) metricsSummary
        else s"${metricsPrefix}_summary"
      case other => other
    }
  }

  case class Partition(granularity: String = "hourly", timezone: String = "UTC")

  /** exporterhelper `retry_on_failure` knobs (config.go:27 BackOffConfig
    * squash; README defaults): the export retry loop's shape. */
  case class Retry(enabled: Boolean = true,
                   initialIntervalMs: Long = 5000,
                   maxIntervalMs: Long = 30000,
                   maxElapsedTimeMs: Long = 300000)

  /** exporterhelper `sending_queue` knobs (config.go:26
    * QueueBatchConfig; README: `enabled` default true, `num_consumers`
    * default 10, `queue_size` default 1000 requests). Our durable spool
    * IS the queue (push → spool file → pull), so `queue_size` bounds
    * spool files ([[graft.sources.SpoolLimits]]), `num_consumers`
    * bounds the concurrent sink writers of each micro-batch, and
    * `sending_queue.storage` needs no mapping — the spool is already
    * the persistent file_storage the reference example wires in. */
  case class Queue(enabled: Boolean = true,
                   numConsumers: Int = 10,
                   queueSize: Long = 1000)

  /** The collector `batch` processor knobs the reference's example
    * deployment tunes in front of the exporter
    * (`example/otel-config.yaml:26-29`: `timeout`, `send_batch_size`;
    * processor defaults 200ms / 8192). One spool file is one export
    * request, so `send_batch_size` caps FILES per micro-batch
    * (`maxFilesPerTrigger`) and `timeout` is the micro-batch cadence
    * (processing-time trigger; 0 = re-trigger as fast as possible). */
  case class Batch(sendBatchSize: Int = 8192,
                   timeoutMs: Long = 200)

  case class Config(storage: Storage, catalog: Catalog,
                    tables: TableNames = TableNames(),
                    partition: Partition = Partition(),
                    verbosity: String = "normal",
                    // exporterhelper TimeoutConfig squash (config.go:25;
                    // README: `timeout`, default 5s; 0 disables)
                    timeoutMs: Long = 5000,
                    retry: Retry = Retry(),
                    queue: Queue = Queue(),
                    batch: Batch = Batch()) {

    /** All validation failures, reference-equivalent messages. */
    def validate: Seq[String] = {
      val errs = Seq.newBuilder[String]
      storage match {
        case s: S3 =>
          if (s.bucket.isEmpty) errs += "s3.bucket is required"
          if (s.region.isEmpty && s.endpoint.isEmpty)
            errs += "s3.region or s3.endpoint is required"
        case r: R2 =>
          if (r.accountId.isEmpty) errs += "r2.account_id is required"
          if (r.bucket.isEmpty) errs += "r2.bucket is required"
          if (r.accessKeyId.isEmpty) errs += "r2.access_key_id is required"
          if (r.secretAccessKey.isEmpty) errs += "r2.secret_access_key is required"
        case f: Filesystem =>
          if (f.basePath.isEmpty) errs += "filesystem.base_path is required"
      }
      if (!Set("", "none", "gzip", "zstd", "snappy")(storage.compression))
        errs += "compression must be one of: none, gzip, zstd, snappy"
      if (!Set("rest", "none")(catalog.catalogType))
        errs += "catalog.type must be set to rest or none"
      else if (catalog.catalogType == "rest" && catalog.restUri.isEmpty)
        errs += "catalog.rest.uri is required"
      if (!Set("", "hourly", "daily", "monthly")(partition.granularity))
        errs += "partition.granularity must be one of: hourly, daily, monthly"
      if (!Set("basic", "normal", "detailed")(verbosity))
        errs += "verbosity level is not supported, supported levels are: basic, normal, detailed"
      if (timeoutMs < 0) errs += "timeout must be >= 0 (0 disables)"
      if (retry.initialIntervalMs <= 0)
        errs += "retry_on_failure.initial_interval must be positive"
      if (retry.maxIntervalMs < retry.initialIntervalMs)
        errs += "retry_on_failure.max_interval must be >= initial_interval"
      if (retry.maxElapsedTimeMs < 0)
        errs += "retry_on_failure.max_elapsed_time must be >= 0 (0 disables)"
      if (queue.numConsumers <= 0)
        errs += "sending_queue.num_consumers must be positive"
      if (queue.queueSize <= 0)
        errs += "sending_queue.queue_size must be positive"
      if (batch.sendBatchSize <= 0)
        errs += "batch.send_batch_size must be positive"
      if (batch.timeoutMs < 0)
        errs += "batch.timeout must be >= 0 (0 = continuous)"
      errs.result()
    }

    /** The receiver spool bound `sending_queue` resolves to: enabled →
      * `queue_size` spool files (one file = one queued export request);
      * disabled → unbounded, the reference's no-queue pass-through
      * (our push→pull bridge always spools for durability, so
      * "disabled" only removes the bound, not the handoff). */
    def spoolLimits: graft.sources.SpoolLimits =
      if (queue.enabled)
        graft.sources.SpoolLimits(maxFiles = queue.queueSize)
      else graft.sources.SpoolLimits.Unbounded

    /** File-source options the `batch` knobs resolve to on the
      * spool-tail streaming sources: `send_batch_size` caps files per
      * micro-batch. */
    def streamOptions: Map[String, String] =
      Map("maxFilesPerTrigger" -> batch.sendBatchSize.toString)

    /** Micro-batch cadence the `batch.timeout` knob resolves to for a
      * LIVE deployment (specs use AvailableNow, which also honors
      * `maxFilesPerTrigger`). */
    def streamTrigger: org.apache.spark.sql.streaming.Trigger =
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(batch.timeoutMs)

    /** Concurrent sink writers per micro-batch (`num_consumers`). */
    def sinkParallelism: Option[Int] = Some(queue.numConsumers)

    /** The [[graft.streaming.Delivery.RetryPolicy]] this config's
      * exporterhelper knobs resolve to — where `timeout` and
      * `retry_on_failure` actually bite: every commit/ingest retry
      * loop. Disabled retry = one attempt; `max_elapsed_time` caps the
      * loop's simulated elapsed; `timeout` bounds each attempt. */
    def deliveryPolicy: graft.streaming.Delivery.RetryPolicy =
      graft.streaming.Delivery.RetryPolicy(
        maxAttempts = if (retry.enabled) 5 else 1,
        initialBackoffMs = retry.initialIntervalMs,
        maxBackoffMs = retry.maxIntervalMs,
        attemptTimeoutMs = if (timeoutMs > 0) Some(timeoutMs) else None,
        maxElapsedMs =
          if (retry.maxElapsedTimeMs > 0) Some(retry.maxElapsedTimeMs)
          else None)

    /** Hadoop FS base URI for the configured backend (S3A covers both
      * AWS S3 and R2's S3-compatible endpoint in Spark). */
    def baseUri: String = storage match {
      case s: S3 => s"s3a://${s.bucket}"
      case r: R2 => s"s3a://${r.bucket}"
      case f: Filesystem => s"file://${f.basePath}"
    }

    /** Hadoop configuration wiring the storage credentials into Spark's
      * S3A filesystem — the auth surface of the reference's
      * `BuildAWSConfigFromStorageConfig`
      * (/root/reference/internal/iceberg/auth.go:26-90): static keys
      * when configured, otherwise fall through to the default provider
      * chain (env/instance-profile), exactly the reference's fallback;
      * R2 maps to its S3-compatible account endpoint with region
      * "auto" and path-style access. Apply with
      * `spark.conf` / `sparkContext.hadoopConfiguration.set`. */
    def hadoopStorageConf: Map[String, String] = storage match {
      case s: S3 =>
        val b = Map.newBuilder[String, String]
        if (s.accessKeyId.nonEmpty && s.secretAccessKey.nonEmpty) {
          b += "fs.s3a.access.key" -> s.accessKeyId
          b += "fs.s3a.secret.key" -> s.secretAccessKey
          b += "fs.s3a.aws.credentials.provider" ->
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
        }
        if (s.region.nonEmpty) b += "fs.s3a.endpoint.region" -> s.region
        if (s.endpoint.nonEmpty) {
          b += "fs.s3a.endpoint" -> s.endpoint
          b += "fs.s3a.path.style.access" -> "true"
        }
        b.result()
      case r: R2 => Map(
        "fs.s3a.access.key" -> r.accessKeyId,
        "fs.s3a.secret.key" -> r.secretAccessKey,
        "fs.s3a.endpoint" -> s"https://${r.accountId}.r2.cloudflarestorage.com",
        "fs.s3a.endpoint.region" -> "auto",
        "fs.s3a.path.style.access" -> "true",
        "fs.s3a.aws.credentials.provider" ->
          "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
      case _: Filesystem => Map.empty
    }

    /** REST catalog client settings for a `catalog.type = rest` config
      * (the reference's NewRESTCatalog wiring: uri + warehouse + static
      * bearer token); None when the catalog is disabled. */
    def catalogSettings: Option[graft.catalog.RestCatalogClient.Settings] =
      if (catalog.catalogType == "rest" && catalog.restUri.nonEmpty)
        Some(graft.catalog.RestCatalogClient.Settings(
          uri = catalog.restUri, warehouse = catalog.warehouse,
          auth = graft.catalog.RestCatalogClient.CatalogAuth(token = catalog.token)))
      else None

    /** Build the REST client the way the reference's NewRESTCatalog
      * wiring does (catalog_rest.go:105-127): construct, then run the
      * best-effort CONNECTION PROBE — outcome logged, never fatal, so
      * a briefly-unreachable catalog doesn't fail pipeline startup
      * (commits retry later through the Delivery policy). */
    def catalogClient(): Option[graft.catalog.RestCatalogClient] =
      catalogSettings.map { s =>
        val c = new graft.catalog.RestCatalogClient(s)
        c.testConnection() match {
          case Right(n) => System.err.println(
            s"[graft] successfully connected to REST catalog ${s.uri} " +
              s"($n namespaces found)")
          case Left(msg) => System.err.println(
            s"[graft] $msg (catalog operations may fail later)")
        }
        c
      }

    /** Resolve the sink settings for one signal's table. */
    def sinkFor(signal: String, tsColumn: String = "time_unix_nano")
        : graft.sink.PartitionedParquetSink.SinkConfig =
      graft.sink.PartitionedParquetSink.SinkConfig(
        basePath = baseUri,
        table = tables.tableFor(signal),
        tsColumn = tsColumn,
        granularity = if (partition.granularity.isEmpty) "hourly"
                      else partition.granularity,
        timezone = partition.timezone,
        compression = if (storage.compression.isEmpty) "snappy"
                      else storage.compression)
  }
}
