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

  test("storage credentials wire to S3A conf (auth.go BuildAWSConfigFromStorageConfig)") {
    // static S3 keys → SimpleAWSCredentialsProvider; region + custom endpoint
    val s3 = Config(S3(bucket = "b", region = "us-east-1",
      endpoint = "http://minio:9000", accessKeyId = "AK",
      secretAccessKey = "SK"), okCatalog).hadoopStorageConf
    assert(s3("fs.s3a.access.key") === "AK" && s3("fs.s3a.secret.key") === "SK")
    assert(s3("fs.s3a.endpoint.region") === "us-east-1")
    assert(s3("fs.s3a.endpoint") === "http://minio:9000")
    assert(s3("fs.s3a.path.style.access") === "true")
    // no static keys → no key entries: fall through to the default chain
    val chain = Config(S3(bucket = "b", region = "r"), okCatalog).hadoopStorageConf
    assert(!chain.contains("fs.s3a.access.key") &&
           !chain.contains("fs.s3a.aws.credentials.provider"))
    // R2 → account endpoint, region "auto" (auth.go:73-82)
    val r2 = Config(R2("acct1", "b", "AK", "SK"), okCatalog).hadoopStorageConf
    assert(r2("fs.s3a.endpoint") === "https://acct1.r2.cloudflarestorage.com")
    assert(r2("fs.s3a.endpoint.region") === "auto")
    // filesystem needs nothing
    assert(Config(Filesystem("/d"), okCatalog).hadoopStorageConf.isEmpty)
  }

  test("rest catalog config resolves to client settings; none yields no client") {
    val rest = Config(Filesystem("/d"),
      Catalog("rest", namespace = "otel", restUri = "http://cat:8181",
        warehouse = "s3://wh", token = "tok")).catalogSettings
    assert(rest.isDefined)
    assert(rest.get.uri === "http://cat:8181")
    assert(rest.get.warehouse === "s3://wh")
    assert(rest.get.auth.token === "tok")
    assert(Config(Filesystem("/d"), Catalog("none")).catalogSettings.isEmpty)
  }

  test("catalogClient: startup probe is best-effort — unreachable catalog still yields a client") {
    // catalog_rest.go:105-127 parity: the probe logs and moves on; a
    // briefly-down catalog must not fail pipeline startup
    val c = Config(Filesystem("/d"),
      Catalog("rest", namespace = "otel", restUri = "http://127.0.0.1:1",
        warehouse = "s3://wh", token = "tok")).catalogClient()
    assert(c.isDefined)
    assert(Config(Filesystem("/d"), Catalog("none")).catalogClient().isEmpty)
  }
}
