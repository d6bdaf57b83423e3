package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.recovery.Recovery
import graft.sink.PartitionedParquetSink
import graft.sink.PartitionedParquetSink.SinkConfig
import graft.streaming.StreamingIngest

/** End-to-end pipeline demo / smoke entrypoint: stream the events table
  * through the partitioned sink, run the recovery tools over the result,
  * and print what happened. Usage:
  *   runMain graft.PipelineDemo <sfDir> <outDir>
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.events(spark, sfDir)
    println(s"[demo] source events: ${events.count()}")

    // 0. The reference's own path: OTLP/JSON (collector output) →
    // flatten → time-partitioned flat table.
    val otlpDir = java.nio.file.Paths.get(s"$outDir/_otlp")
    Files.createDirectories(otlpDir)
    val otlpLines = (0 until 3).map { i =>
      val t0 = 1700000000000000000L + i * 3600000000000L
      s"""{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc-$i"}}]},"scopeSpans":[{"scope":{"name":"lib","version":"1.0"},"spans":[{"traceId":"trace$i","spanId":"span$i","name":"op-$i","kind":2,"startTimeUnixNano":"$t0","endTimeUnixNano":"${t0 + 5000000L}","status":{"code":1}}]}]}]}"""
    }
    Files.writeString(otlpDir.resolve("traces.json"), otlpLines.mkString("\n"))
    val traceTable = graft.otel.OtelTraces.flatten(
      graft.sources.OtelJsonSource.traces(spark, otlpDir.toString))
    PartitionedParquetSink.writeBatch(traceTable,
      SinkConfig(outDir, "otel_traces", tsColumn = "start_time_unix_nano",
                 granularity = "daily"))
    val traceRows = spark.read.parquet(s"$outDir/otel_traces")
    println(s"[demo] OTLP/JSON → otel_traces rows: ${traceRows.count()} " +
      s"services: ${traceRows.select("service_name").distinct().count()}")

    // 1. Streaming ingest into an hourly-partitioned table. The file
    // source tails a directory (as an upstream collector would fill);
    // stage the normalized events there first.
    events.write.mode("overwrite").parquet(s"$outDir/_src")
    // Resolve sink settings through the exporter-config surface, as a
    // reference user's YAML would (filesystem backend, hourly, zstd).
    val exporterCfg = graft.config.ExporterConfig.Config(
      graft.config.ExporterConfig.Filesystem(outDir, compression = "zstd"),
      graft.config.ExporterConfig.Catalog("none"))
    require(exporterCfg.validate.isEmpty, exporterCfg.validate.mkString("; "))
    val cfg = exporterCfg.sinkFor("events", tsColumn = "ts")
      .copy(basePath = outDir) // local path without file:// for the demo dirs
    println(s"[demo] config-resolved sink: table=${cfg.table} codec=${cfg.compression}")
    val q = StreamingIngest.ingest(
      StreamingIngest.dedupStream(
        StreamingIngest.readEvents(spark, s"$outDir/_src", events.schema)),
      cfg, s"$outDir/_chk")
    q.awaitTermination()
    val ingested = spark.read.parquet(s"$outDir/events")
    println(s"[demo] ingested rows: ${ingested.count()}")

    // 2. Partition layout on disk
    val sample = Recovery.listDataFiles(spark, s"$outDir/events")
      .orderBy("file_path").limit(3).collect()
    sample.foreach(r => println(s"[demo] file: ${r.getString(0).replace(outDir, "")}"))

    // 3. Recovery: scan orphans -> reconcile -> clean scan
    val manifest = s"$outDir/_manifest"
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("file_path", "file_size")
    println(s"[demo] orphans before reconcile: ${Recovery.scanOrphans(spark, s"$outDir/events", empty).count()}")
    val m = Recovery.reconcile(spark, s"$outDir/events", manifest)
    println(s"[demo] manifest entries: ${m.count()}")
    println(s"[demo] orphans after reconcile: ${Recovery.scanOrphans(spark, s"$outDir/events", m).count()}")

    // 4. Repartition hourly -> monthly
    Recovery.repartition(spark, cfg, cfg.copy(table = "events_monthly", granularity = "monthly"))
    val monthly = spark.read.parquet(s"$outDir/events_monthly")
    println(s"[demo] monthly rows: ${monthly.count()} partitions: " +
      monthly.select("year", "month").distinct().count())

    // 5. Time-predicate partition pruning over the hourly layout
    val pruned = ingested.filter(col("year") === "2024" && col("month") === "01" &&
                                 col("day") === "01")
    println(s"[demo] day-01 rows via partition pruning: ${pruned.count()}")
    spark.stop()
  }
}
