package graft

import org.apache.spark.sql.functions._

import graft.recovery.{Recovery, VersionedManifest}
import graft.sink.PartitionedParquetSink
import graft.sink.PartitionedParquetSink.SinkConfig

/** The reference exporter's COMPLETE operating loop, end to end in one
  * thread: streaming ingest lands micro-batches in the partitioned
  * layout, every batch commits a snapshot, maintenance compacts and
  * expires, a CDC consumer tails the log incrementally, and the
  * analytics layer queries the final table — the "a user of the
  * reference could switch" integration story (SURVEY §1). */
class LifecycleSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-lifecycle").toString

  test("ingest → snapshot → compact → expire → incremental → analytics") {
    import spark.implicits._
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    val table = PartitionedParquetSink.tablePath(cfg)
    val mDir = s"$base/manifests"
    val events = Tables.events(spark, sf).localCheckpoint()

    // --- phase 1: two ingest batches, one snapshot each (writer.go loop)
    val day = dayofmonth($"ts")
    val batch1 = events.filter(day <= 15)
    val batch2 = events.filter(day > 15)
    PartitionedParquetSink.writeBatch(batch1, cfg)
    val v1 = VersionedManifest.commit(spark, table, mDir)
    PartitionedParquetSink.writeBatch(batch2, cfg)
    spark.catalog.refreshByPath(table)
    val v2 = VersionedManifest.commit(spark, table, mDir)
    assert(VersionedManifest.readAt(spark, table, mDir, Some(v1)).count()
      === batch1.count())
    assert(VersionedManifest.readAt(spark, table, mDir, Some(v2)).count()
      === events.count())

    // --- phase 2: the CDC consumer tails exactly batch 2 as the delta
    val delta = VersionedManifest.readIncremental(spark, table, mDir, v1, Some(v2))
    assert(delta.count() === batch2.count())

    // --- phase 3: maintenance — compact into a second generation and
    // commit the compacted file list as the next snapshot
    val gen2 = SinkConfig(s"$base/gen2", "events",
      tsColumn = "ts", granularity = "daily")
    val (nBefore, nAfter) = Recovery.compact(spark, cfg, gen2)
    assert(nAfter <= nBefore)
    val gen2Table = PartitionedParquetSink.tablePath(gen2)
    val v3 = VersionedManifest.commit(spark, gen2Table, mDir)
    val head = VersionedManifest.readAt(spark, gen2Table, mDir, Some(v3))
    assert(head.count() === events.count())

    // --- phase 4: expiry GCs everything unreachable from the head,
    // old snapshots disappear, the head still reads perfectly
    val (expired, deleted) = VersionedManifest.expireSnapshots(
      spark, mDir, keepLast = 1)
    assert(expired.nonEmpty && deleted > 0L)
    assert(VersionedManifest.readAt(spark, gen2Table, mDir).count()
      === events.count())

    // --- phase 5: analytics on the maintained table — the downstream
    // rollup matches the same rollup computed on the raw source frame
    val servedDf = VersionedManifest.readAt(spark, gen2Table, mDir)
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sv"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(rollup(servedDf) === rollup(events))

    // --- phase 6: the scanner sees no orphans on the live generation
    val orphans = Recovery.scanOrphans(
      spark, gen2Table, VersionedManifest.filesAt(spark, mDir))
    assert(orphans.count() === 0L)
  }
}
