package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.ExporterConfig._

class ExporterConfigSpec extends AnyFunSuite {

  private val okCatalog = Catalog("none")

  test("table names: prefix defaults and explicit overrides (catalog.go)") {
    val t = TableNames()
    assert(t.tableFor("traces") === "otel_traces")
    assert(t.tableFor("metrics_gauge") === "otel_metrics_gauge")
    assert(t.tableFor("metrics_exponential_histogram") ===
           "otel_metrics_exponential_histogram")
    val prefixed = TableNames(metrics = "m")
    assert(prefixed.tableFor("metrics_sum") === "m_sum")
    val overridden = TableNames(metrics = "m", metricsSum = "special_sum")
    assert(overridden.tableFor("metrics_sum") === "special_sum")
    assert(overridden.tableFor("metrics_histogram") === "m_histogram")
  }

  test("s3 validation: bucket and region-or-endpoint required") {
    assert(Config(S3(bucket = ""), okCatalog).validate
           .exists(_.contains("s3.bucket")))
    assert(Config(S3(bucket = "b"), okCatalog).validate
           .exists(_.contains("s3.region or s3.endpoint")))
    assert(Config(S3(bucket = "b", endpoint = "http://minio:9000"), okCatalog)
           .validate.isEmpty)
  }

  test("r2 validation requires account, bucket, and both keys") {
    val bad = Config(R2("", "", "", ""), okCatalog).validate
    assert(bad.size === 4)
    assert(Config(R2("acct", "b", "k", "s"), okCatalog).validate.isEmpty)
  }

  test("catalog type must be set; rest requires uri") {
    assert(Config(Filesystem("/data"), Catalog("")).validate
           .exists(_.contains("catalog.type")))
    assert(Config(Filesystem("/data"), Catalog("rest")).validate
           .exists(_.contains("catalog.rest.uri")))
    assert(Config(Filesystem("/data"),
                  Catalog("rest", restUri = "http://nessie:19120")).validate.isEmpty)
  }

  test("bad compression, granularity, verbosity are each rejected") {
    val c = Config(Filesystem("/data", compression = "lz4"), okCatalog,
                   partition = Partition(granularity = "weekly"),
                   verbosity = "silent")
    val errs = c.validate
    assert(errs.exists(_.contains("compression")))
    assert(errs.exists(_.contains("granularity")))
    assert(errs.exists(_.contains("verbosity")))
  }

  test("config resolves to sink settings (uri, table, codec, granularity)") {
    val cfg = Config(Filesystem("/data/otel", compression = "zstd"), okCatalog,
                     partition = Partition("daily", "Asia/Tokyo"))
    val sink = cfg.sinkFor("metrics_gauge")
    assert(sink.basePath === "file:///data/otel")
    assert(sink.table === "otel_metrics_gauge")
    assert(sink.compression === "zstd")
    assert(sink.granularity === "daily")
    assert(sink.timezone === "Asia/Tokyo")
    assert(Config(S3(bucket = "tel", region = "us-east-1"), okCatalog)
           .baseUri === "s3a://tel")
  }
}
