package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.recovery.Recovery
import graft.sink.PartitionedParquetSink
import graft.sink.PartitionedParquetSink.SinkConfig

class SinkRecoverySpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  private def eventsDf = Tables.events(spark, sf)

  test("batch sink lays out hourly year/month/day/hour partitions") {
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "hourly")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val back = spark.read.parquet(s"$base/events")
    assert(back.count() === eventsDf.count())
    // partition columns materialize in the path and survive the roundtrip
    assert(back.columns.toSet.intersect(Set("year", "month", "day", "hour")).size === 4)
    val dirs = new java.io.File(s"$base/events").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("year=2024")))
    val hourDirs = new java.io.File(s"$base/events/year=2024/month=01/day=01").listFiles()
    assert(hourDirs.exists(_.getName.startsWith("hour=")))
  }

  test("sink parquet footers carry Iceberg field IDs (README Features)") {
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "monthly")
    PartitionedParquetSink.writeBatch(eventsDf.limit(100), cfg)
    val file = Files.walk(java.nio.file.Paths.get(s"$base/events")).iterator()
    val parquetFile = scala.jdk.CollectionConverters.IteratorHasAsScala(file).asScala
      .find(_.toString.endsWith(".parquet")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(parquetFile.toString),
        new org.apache.hadoop.conf.Configuration()))
    try {
      val fields = reader.getFooter.getFileMetaData.getSchema.getFields
      import scala.jdk.CollectionConverters._
      val ids = fields.asScala.map(f => f.getName -> Option(f.getId).map(_.intValue))
      // every data column (partition cols live in the directory path) has
      // a stable, unique, positive field id
      assert(ids.forall(_._2.isDefined), s"missing field ids in $ids")
      val vals = ids.flatMap(_._2)
      assert(vals.distinct.size === vals.size && vals.forall(_ > 0))
    } finally reader.close()
  }

  test("field ids survive dotted column names and cover nested struct fields") {
    val base = tmp()
    // "quantile_values.quantile" mirrors the summary table's dotted
    // names (round-2 ADVICE: col(name) parsed the dot as nested access)
    val df = eventsDf.limit(20)
      .select(col("ts"), col("value").as("quantile_values.quantile"),
              struct(col("event_id").as("id"), col("user_id").as("uid")).as("env"))
    val cfg = SinkConfig(base, "dotted", tsColumn = "ts", granularity = "monthly")
    PartitionedParquetSink.writeBatch(df, cfg)
    val file = Files.walk(java.nio.file.Paths.get(s"$base/dotted")).iterator()
    val parquetFile = scala.jdk.CollectionConverters.IteratorHasAsScala(file).asScala
      .find(_.toString.endsWith(".parquet")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(parquetFile.toString),
        new org.apache.hadoop.conf.Configuration()))
    try {
      import scala.jdk.CollectionConverters._
      val schema = reader.getFooter.getFileMetaData.getSchema
      val top = schema.getFields.asScala
      assert(top.exists(_.getName == "quantile_values.quantile"))
      assert(top.forall(f => Option(f.getId).exists(_.intValue > 0)))
      // nested struct fields carry fresh ids too (Iceberg adoption parity)
      val env = top.find(_.getName == "env").get.asGroupType()
      val nestedIds = env.getFields.asScala.map(f => Option(f.getId).map(_.intValue))
      assert(nestedIds.forall(_.exists(_ > 0)), s"nested ids missing: $nestedIds")
      val allIds = top.flatMap(f => Option(f.getId).map(_.intValue)) ++ nestedIds.flatten
      assert(allIds.distinct.size === allIds.size, s"duplicate ids: $allIds")
    } finally reader.close()
  }

  test("sink layout gives static and dynamic partition pruning downstream") {
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val back = spark.read.parquet(s"$base/events")

    // static pruning: a day predicate must reach PartitionFilters and
    // cut the scanned file set to that day's directory
    val oneDay = back.filter(col("year") === "2024" && col("month") === "01" && col("day") === "05")
    val scan = oneDay.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(scan.metadata("PartitionFilters").contains("day"),
      s"day predicate not in PartitionFilters: ${scan.metadata("PartitionFilters")}")
    assert(scan.selectedPartitions.partitionCount === 1)

    // dynamic pruning: a selective dim joined on the partition column
    // prunes at runtime (the 100 TB time-slice join shape)
    import spark.implicits._
    // directory partition values are type-inferred (day=05 → int 5);
    // the dim key must match or the cast blocks DPP
    // DPP requires a selective non-folded predicate on the filtering
    // side — a parquet-backed dim with a residual filter, the realistic
    // shape (a date dimension filtered to a reporting window)
    Seq((5, "x"), (7, "y"), (9, "z")).toDF("day", "tag")
      .write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim").filter(col("tag") =!= "z")
    val joined = back.join(dim, Seq("day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n${plan.take(1500)}")
    assert(joined.count() === back.filter(col("day").isin(5, 7)).count())
  }

  test("monthly granularity only derives year/month (partition.go ToMap)") {
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "monthly")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val sub = new java.io.File(s"$base/events/year=2024").listFiles().map(_.getName)
    assert(sub.contains("month=01"))
    val monthly = new java.io.File(s"$base/events/year=2024/month=01").listFiles()
    assert(monthly.forall(f => !f.getName.startsWith("day=")))
  }

  test("sink honors every reference codec (writer.go none/snappy/gzip/zstd)") {
    for (codec <- Seq("none", "snappy", "gzip", "zstd")) {
      val base = tmp()
      val cfg = SinkConfig(base, "events", tsColumn = "ts",
                           granularity = "monthly", compression = codec)
      val in = eventsDf.limit(50)
      PartitionedParquetSink.writeBatch(in, cfg)
      val files = Files.walk(java.nio.file.Paths.get(s"$base/events")).iterator()
      val names = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
      assert(names.nonEmpty)
      val marker = codec match {
        case "none"   => names.forall(n => !n.contains("snappy") && !n.contains(".gz.") && !n.contains("zstd"))
        case "gzip"   => names.forall(_.contains(".gz."))
        case other    => names.forall(_.contains(s".$other."))
      }
      assert(marker, s"$codec not reflected in $names")
      assert(spark.read.parquet(s"$base/events").count() === in.count())
    }
  }

  test("timezone shifts partition values like the reference PathGenerator") {
    val base = tmp()
    // UTC 2024-01-01 00:09 → Tokyo (+9) 2024-01-01 09:09
    val cfg = SinkConfig(base, "events", tsColumn = "ts",
                         granularity = "hourly", timezone = "Asia/Tokyo")
    val one = eventsDf.orderBy("event_id").limit(1)
    PartitionedParquetSink.writeBatch(one, cfg)
    // zero-padded partition value rendered in the sink timezone, on disk
    val dayDir = new java.io.File(s"$base/events/year=2024/month=01/day=01")
    assert(dayDir.listFiles().exists(_.getName === "hour=09"))
  }

  test("repartition rewrites hourly layout as daily (repartitioner.go)") {
    val base = tmp()
    val hourly = SinkConfig(base, "events_hourly", tsColumn = "ts", granularity = "hourly")
    PartitionedParquetSink.writeBatch(eventsDf, hourly)
    val daily = SinkConfig(base, "events_daily", tsColumn = "ts", granularity = "daily")
    Recovery.repartition(spark, hourly, daily)
    val back = spark.read.parquet(s"$base/events_daily")
    assert(back.count() === eventsDf.count())
    val dayDirs = new java.io.File(s"$base/events_daily/year=2024/month=01").listFiles()
    assert(dayDirs.exists(_.getName.startsWith("day=")))
    assert(!back.columns.contains("hour"))
  }

  test("zone-map file stats skip non-overlapping files in readSlice") {
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val table = s"$base/events"

    val stats = Recovery.fileStats(spark, table, "ts")
    val nFiles = stats.count()
    assert(nFiles > 5)
    assert(stats.filter(col("min_val").isNull).count() === 0, "footer stats missing")
    assert(stats.agg(sum(col("n_rows"))).collect()(0).getLong(0) === eventsDf.count())

    // a 3-day slice must read only the overlapping files and return
    // exactly the rows a full-scan filter returns
    val startUs = java.time.Instant.parse("2024-01-03T00:00:00Z").toEpochMilli * 1000
    val endUs   = java.time.Instant.parse("2024-01-06T00:00:00Z").toEpochMilli * 1000
    val slice = Recovery.readSlice(spark, table, "ts", startUs, endUs)
    val expected = spark.read.parquet(table)
      .filter(unix_micros(col("ts")) >= startUs && unix_micros(col("ts")) < endUs)
    assert(slice.count() === expected.count())
    assert(slice.count() > 0)
    assert(slice.inputFiles.length < nFiles,
      s"no skipping: ${slice.inputFiles.length} of $nFiles files read")
  }

  test("versioned manifest gives snapshot isolation and time travel") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "monthly")
    val tablePath = s"$base/events"
    val manDir = s"$base/_snapshots"

    val batch1 = eventsDf.limit(300)
    PartitionedParquetSink.writeBatch(batch1, cfg)
    val v1 = VersionedManifest.commit(spark, tablePath, manDir)
    assert(v1 === 1L)

    val batch2 = eventsDf.orderBy(col("event_id").desc).limit(200)
    PartitionedParquetSink.writeBatch(batch2, cfg)
    val v2 = VersionedManifest.commit(spark, tablePath, manDir)
    assert(v2 === 2L && VersionedManifest.currentVersion(spark, manDir) === 2L)

    // snapshot 1 still reads exactly the pre-append state
    assert(VersionedManifest.readAt(spark, tablePath, manDir, Some(1L)).count() === 300L)
    // the pointer resolves to the full current state
    assert(VersionedManifest.readAt(spark, tablePath, manDir).count() === 500L)
    // snapshots are immutable file lists
    assert(VersionedManifest.filesAt(spark, manDir, Some(1L)).count() <
           VersionedManifest.filesAt(spark, manDir, Some(2L)).count())
  }

  test("manifest self-heals a lost VERSION pointer and keeps committing") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "monthly")
    val tablePath = s"$base/events"
    val manDir = s"$base/_snapshots"
    PartitionedParquetSink.writeBatch(eventsDf.limit(100), cfg)
    assert(VersionedManifest.commit(spark, tablePath, manDir) === 1L)
    assert(VersionedManifest.commit(spark, tablePath, manDir) === 2L)

    // simulate a crash that lost the pointer between delete and rename:
    // currentVersion must fall back to max(manifest-vN), not 0 — and the
    // next commit must succeed (v3), not collide with manifest-v1 forever
    new java.io.File(s"$manDir/VERSION").delete()
    assert(VersionedManifest.currentVersion(spark, manDir) === 2L)
    assert(VersionedManifest.commit(spark, tablePath, manDir) === 3L)
    assert(VersionedManifest.currentVersion(spark, manDir) === 3L)
    assert(VersionedManifest.readAt(spark, tablePath, manDir).count() === 100L)
  }

  test("stats-carrying manifest prunes time slices from cached metadata") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    val tablePath = s"$base/events"
    val manDir = s"$base/_snapshots"
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    VersionedManifest.commit(spark, tablePath, manDir, statsColumn = Some("ts"))

    val man = VersionedManifest.filesAt(spark, manDir)
    val nFiles = man.count()
    assert(man.columns.toSet.contains("min_val"))
    assert(man.filter(col("min_val").isNull).count() === 0, "stats missing")

    val startUs = java.time.Instant.parse("2024-01-03T00:00:00Z").toEpochMilli * 1000
    val endUs   = java.time.Instant.parse("2024-01-06T00:00:00Z").toEpochMilli * 1000
    val slice = VersionedManifest.readSliceAt(spark, tablePath, manDir, "ts", startUs, endUs)
    val expected = spark.read.parquet(tablePath)
      .filter(unix_micros(col("ts")) >= startUs && unix_micros(col("ts")) < endUs)
    assert(slice.count() === expected.count() && slice.count() > 0)
    assert(slice.inputFiles.length < nFiles,
      s"no metadata pruning: ${slice.inputFiles.length} of $nFiles files read")

    // the scan-cost claim in bytes, not file counts: the pruned read's
    // input files are a small fraction of the table (3 of ~14 daily
    // partitions overlap the slice — require < half as a noise-proof
    // bound)
    def bytesOf(paths: Seq[String]): Long = {
      val conf = spark.sparkContext.hadoopConfiguration
      paths.map { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).getFileStatus(hp).getLen
      }.sum
    }
    val prunedBytes = bytesOf(slice.inputFiles.toIndexedSeq)
    val fullBytes = bytesOf(spark.read.parquet(tablePath).inputFiles.toIndexedSeq)
    assert(prunedBytes > 0 && prunedBytes * 2 < fullBytes,
      s"pruned read still scans $prunedBytes of $fullBytes bytes")
  }

  test("z-order clustering gives zone-map pruning on BOTH columns") {
    val base = tmp()
    // one partition dir, many files → pruning comes from clustering only
    val key = "spark.sql.files.maxRecordsPerFile"
    def write(table: String, zOrder: Seq[String]): Unit = {
      val cfg = SinkConfig(base, table, tsColumn = "ts",
                           granularity = "monthly", writeTasks = Some(1),
                           zOrderBy = zOrder)
      spark.conf.set(key, "64")
      try PartitionedParquetSink.writeBatch(eventsDf, cfg)
      finally spark.conf.unset(key)
    }
    write("zord", Seq("user_id", "event_id"))
    write("tsorted", Nil)

    // fraction of files a mid-range slice on `column` must read
    def overlapFrac(table: String, column: String, lo: Long, hi: Long): Double = {
      val stats = Recovery.fileStats(spark, s"$base/$table", column).collect()
      assert(stats.forall(!_.isNullAt(1)), s"missing $column stats")
      val n = stats.length
      val hit = stats.count(r => r.getLong(2) >= lo && r.getLong(1) <= hi)
      hit.toDouble / n
    }
    val nUsers = eventsDf.agg(org.apache.spark.sql.functions.max(col("user_id")))
      .collect()(0).getLong(0)
    val nEvents = eventsDf.count()

    // ts-sorted files: a user_id slice overlaps (nearly) every file —
    // no pruning on a non-sort column. z-ordered files: the same slice
    // reads a strict subset, AND an event_id slice does too (locality
    // on both interleaved dimensions).
    val uLo = nUsers / 2
    val uHi = nUsers / 2 + nUsers / 10
    val zUser = overlapFrac("zord", "user_id", uLo, uHi)
    val tUser = overlapFrac("tsorted", "user_id", uLo, uHi)
    assert(zUser < 0.7 && zUser < tUser - 0.2,
      s"no user_id pruning from z-order: z=$zUser ts-sorted=$tUser")
    val zEvent = overlapFrac("zord", "event_id", nEvents / 2, nEvents / 2 + nEvents / 10)
    assert(zEvent < 0.7, s"no event_id pruning from z-order: $zEvent")
    // correctness: clustering is just a sort — content is unchanged
    assert(spark.read.parquet(s"$base/zord").count() === eventsDf.count())
  }

  test("scanner finds orphans; reconcile registers them idempotently") {
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "monthly")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val tablePath = s"$base/events"
    val manifestPath = s"$base/_manifest"

    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("file_path", "file_size")
    val orphans = Recovery.scanOrphans(spark, tablePath, empty)
    assert(orphans.count() > 0)

    // materialize the count now — the second reconcile overwrites the
    // manifest files this DataFrame's plan points at
    val c1 = Recovery.reconcile(spark, tablePath, manifestPath).count()
    assert(c1 === orphans.count())
    // second run registers nothing new (idempotent re-register)
    val m2 = Recovery.reconcile(spark, tablePath, manifestPath)
    assert(m2.count() === c1)
    // and a fresh scan against the manifest is clean
    assert(Recovery.scanOrphans(spark, tablePath, m2).count() === 0)

    // reverse orphans: delete a data file out-of-band → scanMissing
    // flags exactly it, pruneMissing heals the manifest
    val victim = Recovery.listDataFiles(spark, tablePath)
      .collect()(0).getString(0)
    new java.io.File(new java.net.URI(victim).getPath).delete()
    val missing = Recovery.scanMissing(spark, tablePath, m2)
    assert(missing.count() === 1)
    assert(missing.collect()(0).getString(0) === victim)
    val pruned = Recovery.pruneMissing(spark, tablePath, manifestPath)
    assert(pruned.count() === c1 - 1)
    assert(Recovery.scanMissing(spark, tablePath, pruned).count() === 0)
  }

  test("reconcile stays distributed over a many-files layout (r5: no driver materialize)") {
    import spark.implicits._
    // many-files fixture: hundreds of tiny files (the reference's 10^6-
    // file scenario scaled down) — the merge path must survive without
    // collecting the file list: since r5 reconcile/pruneMissing write
    // the merged manifest DISTRIBUTED to a temp dir and swap it in
    val base = tmp()
    val tablePath = s"$base/many"
    (0 until 300).toDF("i").repartition(300)
      .write.mode("overwrite").parquet(tablePath)
    val manifestPath = s"$base/_manifest"
    val nFiles = Recovery.listDataFiles(spark, tablePath).count()
    // AQE coalesces some of the 300 round-robin partitions; "hundreds"
    // is what the fixture needs, not an exact count
    assert(nFiles >= 150, s"fixture produced only $nFiles files")

    // distributed listing path agrees with the driver walk here too
    val viaDist = Recovery.scanOrphans(spark, tablePath,
      Seq.empty[(String, Long)].toDF("file_path", "file_size"),
      distributedListing = true).count()
    assert(viaDist === nFiles)

    val c1 = Recovery.reconcile(spark, tablePath, manifestPath,
      distributedListing = true).count()
    assert(c1 === nFiles)
    // idempotent on re-run; a fresh scan is clean
    val m2 = Recovery.reconcile(spark, tablePath, manifestPath)
    assert(m2.count() === nFiles)
    assert(Recovery.scanOrphans(spark, tablePath, m2).count() === 0)
    // the swap left exactly one live manifest directory (no .tmp- residue)
    val residue = new java.io.File(base).listFiles()
      .count(_.getName.startsWith("_manifest.tmp-"))
    assert(residue === 0, s"$residue temp manifest dirs left behind")
    // prune path survives the same layout: delete 5 files out-of-band
    Recovery.listDataFiles(spark, tablePath).limit(5).collect().foreach { r =>
      new java.io.File(new java.net.URI(r.getString(0)).getPath).delete()
    }
    assert(Recovery.pruneMissing(spark, tablePath, manifestPath).count() === nFiles - 5)
  }

  test("partition evolution: granularity rewrite commits as a snapshot, old layout expires") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val mDir = s"$base/manifests"
    val hourly = SinkConfig(base, "events_hourly", tsColumn = "ts", granularity = "hourly")
    val daily = SinkConfig(base, "events_daily", tsColumn = "ts", granularity = "daily")
    PartitionedParquetSink.writeBatch(eventsDf, hourly)
    val hourlyPath = PartitionedParquetSink.tablePath(hourly)
    val dailyPath = PartitionedParquetSink.tablePath(daily)
    val v1 = VersionedManifest.commit(spark, hourlyPath, mDir)

    // evolve: rewrite at daily granularity, commit the NEW layout's
    // files as the next snapshot of the SAME manifest log — absolute
    // paths make the log layout-agnostic, exactly like Iceberg metadata
    Recovery.repartition(spark, hourly, daily)
    val v2 = VersionedManifest.commitFiles(
      spark, mDir, Recovery.listDataFiles(spark, dailyPath))

    val n = eventsDf.count()
    assert(VersionedManifest.readAt(spark, hourlyPath, mDir, Some(v1)).count() === n)
    val evolved = VersionedManifest.readAt(spark, dailyPath, mDir, Some(v2))
    assert(evolved.count() === n)
    // daily layout: no hour partition column survives the rewrite
    assert(!evolved.columns.contains("hour") && evolved.columns.contains("day"))

    // expiry GCs the ENTIRE hourly generation (cross-directory paths)
    val hourlyFiles = Recovery.listDataFiles(spark, hourlyPath).count()
    val (expired, deleted) = VersionedManifest.expireSnapshots(spark, mDir, keepLast = 1)
    assert(expired === Seq(v1))
    assert(deleted === hourlyFiles)
    assert(Recovery.listDataFiles(spark, hourlyPath).count() === 0)
    spark.catalog.refreshByPath(dailyPath)
    assert(VersionedManifest.readAt(spark, dailyPath, mDir).count() === n)
  }

  test("copy-on-write upsert rewrites only affected files, keeps time travel") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val table = s"$base/events"
    val mDir = s"$base/manifests"
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val v1 = VersionedManifest.commit(spark, table, mDir, statsColumn = Some("ts"))
    val v1Files = VersionedManifest.filesAt(spark, mDir, Some(v1))
      .select("file_path").collect().map(_.getString(0)).toSet

    // update 3 day-1 events' value — only day-1 files should rewrite
    val ids = eventsDf.filter(dayofmonth(col("ts")) === 1)
      .select("event_id").limit(3).collect().map(_.getLong(0))
    val updates = eventsDf.filter(col("event_id").isin(ids.toSeq: _*))
      .withColumn("value", lit(9999.5))
    val v2 = VersionedManifest.upsert(spark, table, mDir, updates, "event_id",
      cfg, statsColumn = Some("ts"))
    spark.catalog.refreshByPath(table)

    val now = VersionedManifest.readAt(spark, table, mDir, Some(v2))
    assert(now.count() === eventsDf.count(), "row count must be preserved")
    val updated = now.filter(col("event_id").isin(ids.toSeq: _*))
      .select("value").collect().map(_.getDouble(0))
    assert(updated.length === 3 && updated.forall(_ === 9999.5))
    // untouched key unchanged
    val other = now.filter(!col("event_id").isin(ids.toSeq: _*))
      .agg(sum(col("value"))).collect()(0).getDouble(0)
    val expOther = eventsDf.filter(!col("event_id").isin(ids.toSeq: _*))
      .agg(sum(col("value"))).collect()(0).getDouble(0)
    assert(math.abs(other - expOther) < 1e-6)

    // time travel: v1 still serves the ORIGINAL values
    val old = VersionedManifest.readAt(spark, table, mDir, Some(v1))
      .filter(col("event_id") === ids.head).select("value").collect()
    assert(old.length === 1)
    assert(old(0).getDouble(0) !== 9999.5)

    // file economy: v2 reuses every untouched v1 file
    val v2Files = VersionedManifest.filesAt(spark, mDir, Some(v2))
      .select("file_path").collect().map(_.getString(0)).toSet
    val reused = (v1Files intersect v2Files).size
    assert(reused >= v1Files.size - 2,
      s"upsert rewrote too much: kept $reused of ${v1Files.size}")
    assert(v2Files != v1Files)
  }

  test("rollback commits the old file list as a NEW head, history intact") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val table = s"$base/events"
    val mDir = s"$base/manifests"
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val v1 = VersionedManifest.commit(spark, table, mDir)

    // a bad upsert lands as v2
    val ids = eventsDf.select("event_id").limit(2).collect().map(_.getLong(0))
    val bad = eventsDf.filter(col("event_id").isin(ids.toSeq: _*))
      .withColumn("value", lit(-1.0))
    val v2 = VersionedManifest.upsert(spark, table, mDir, bad, "event_id", cfg)
    spark.catalog.refreshByPath(table)

    // rollback: head becomes v3 whose content EQUALS v1
    val v3 = VersionedManifest.rollback(spark, mDir, v1)
    assert(v3 === v2 + 1)
    assert(VersionedManifest.currentVersion(spark, mDir) === v3)
    val head = VersionedManifest.readAt(spark, table, mDir)
    val orig = VersionedManifest.readAt(spark, table, mDir, Some(v1))
    assert(head.except(orig).count() === 0L && orig.except(head).count() === 0L)
    // the bad snapshot is still readable (append-only history)
    val badRead = VersionedManifest.readAt(spark, table, mDir, Some(v2))
      .filter(col("event_id") === ids.head).select("value").collect()
    assert(badRead.head.getDouble(0) === -1.0)
    // rollback of a rollback is idempotent on content
    val v4 = VersionedManifest.rollback(spark, mDir, v2)
    val headAgain = VersionedManifest.readAt(spark, table, mDir, Some(v4))
    assert(headAgain.filter(col("event_id") === ids.head)
      .select("value").collect().head.getDouble(0) === -1.0)
  }

  test("distributed listing equals the driver walk at every fan-out") {
    import graft.recovery.Recovery
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "hourly")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val table = PartitionedParquetSink.tablePath(cfg)
    val driver = Recovery.listDataFiles(spark, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(driver.nonEmpty)
    // executor path (stops expanding after the first level)...
    val dist = Recovery.listDataFilesDistributed(spark, table, parallelism = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dist === driver)
    // ...and the degenerate all-driver path (tree smaller than fan-out)
    val wide = Recovery.listDataFilesDistributed(spark, table, parallelism = 100000)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(wide === driver)
    // empty table
    assert(Recovery.listDataFilesDistributed(spark, s"$base/nope").count() === 0L)
  }

  test("shallow clone shares data files; tags pin named snapshots") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val table = s"$base/events"
    val mDir = s"$base/manifests"
    val cloneDir = s"$base/clone-manifests"
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    val v1 = VersionedManifest.commit(spark, table, mDir)
    VersionedManifest.writeTag(spark, mDir, "audited", v1)

    // clone: new log, version 1, SAME files (zero copy)
    val cv = VersionedManifest.cloneTo(spark, mDir, cloneDir)
    assert(cv === 1L)
    val srcFiles = VersionedManifest.filesAt(spark, mDir, Some(v1))
      .select("file_path").collect().map(_.getString(0)).toSet
    val cloneFiles = VersionedManifest.filesAt(spark, cloneDir, Some(cv))
      .select("file_path").collect().map(_.getString(0)).toSet
    assert(cloneFiles === srcFiles)
    val srcRead = VersionedManifest.readAt(spark, table, mDir, Some(v1))
    val cloneRead = VersionedManifest.readAt(spark, table, cloneDir, Some(cv))
    assert(cloneRead.count() === srcRead.count())

    // source evolves (upsert) — the clone must NOT see it
    val ids = eventsDf.select("event_id").limit(2).collect().map(_.getLong(0))
    val upd = eventsDf.filter(col("event_id").isin(ids.toSeq: _*))
      .withColumn("value", lit(123.25))
    VersionedManifest.upsert(spark, table, mDir, upd, "event_id", cfg)
    spark.catalog.refreshByPath(table)
    val cloneAfter = VersionedManifest.readAt(spark, table, cloneDir, Some(cv))
      .filter(col("event_id") === ids.head).select("value").collect()
    assert(cloneAfter.head.getDouble(0) !== 123.25)

    // the tag still resolves to the pre-upsert snapshot
    assert(VersionedManifest.readTag(spark, mDir, "audited") === v1)
    val tagged = VersionedManifest.readAtTag(spark, table, mDir, "audited")
      .filter(col("event_id") === ids.head).select("value").collect()
    assert(tagged.head.getDouble(0) !== 123.25)
    // tags are overwrite-atomic: repointing works
    VersionedManifest.writeTag(spark, mDir, "audited",
      VersionedManifest.currentVersion(spark, mDir))
    val retagged = VersionedManifest.readAtTag(spark, table, mDir, "audited")
      .filter(col("event_id") === ids.head).select("value").collect()
    assert(retagged.head.getDouble(0) === 123.25)
  }

  test("bloom file index prunes point lookups to a handful of files") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val table = s"$base/events"
    val mDir = s"$base/manifests"
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    PartitionedParquetSink.writeBatch(eventsDf, cfg)
    VersionedManifest.commit(spark, table, mDir,
      statsColumn = Some("ts"), bloomColumn = Some("event_id"))
    val nFiles = Recovery.listDataFiles(spark, table).count()
    assert(nFiles > 10, s"fixture too small to prove pruning: $nFiles files")

    // every event id must be found exactly (no false negatives, ever)
    val probes = eventsDf.select("event_id").collect().map(_.getLong(0)).take(5)
    probes.foreach { id =>
      val got = VersionedManifest.readPoint(spark, table, mDir, id)
      assert(got.count() === 1, s"event $id not found exactly once")
      assert(got.collect()(0).getAs[Long]("event_id") === id)
    }

    // pruning: the bloom check must admit FAR fewer files than the table
    import spark.implicits._
    val m = VersionedManifest.filesAt(spark, mDir)
    val admitted = m.select("bloom").as[Array[Byte]].collect().count { b =>
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(b))
        .mightContainLong(probes.head)
    }
    assert(admitted <= math.max(2, nFiles / 4),
      s"bloom admitted $admitted of $nFiles files")
    // a key that never existed reads zero rows through the same path
    assert(VersionedManifest.readPoint(spark, table, mDir, -987654321L).count() === 0)
  }

  test("incremental read returns exactly the rows added between snapshots") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val table = s"$base/events"
    val mDir = s"$base/manifests"
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    val day1 = eventsDf.filter(dayofmonth(col("ts")) === 1)
    val day2 = eventsDf.filter(dayofmonth(col("ts")) === 2)
    PartitionedParquetSink.writeBatch(day1, cfg)
    val v1 = VersionedManifest.commit(spark, table, mDir)
    PartitionedParquetSink.writeBatch(day2, cfg)
    val v2 = VersionedManifest.commit(spark, table, mDir)
    val delta = VersionedManifest.readIncremental(spark, table, mDir, v1, Some(v2))
    assert(delta.count() === day2.count())
    // only day-2 rows: the day-1 generation is invisible to the delta
    assert(delta.select(min(dayofmonth(col("ts")))).collect()(0).getInt(0) === 2)
    // same-version delta is empty; full-range delta is the whole table
    assert(VersionedManifest.readIncremental(spark, table, mDir, v2).count() === 0)
    assert(VersionedManifest.readIncremental(spark, table, mDir, 0L).count()
      === day1.count() + day2.count())
  }

  test("expire snapshots GCs exactly the files unreachable from retained snapshots") {
    import graft.recovery.VersionedManifest
    val base = tmp()
    val table = s"$base/events"
    val mDir = s"$base/manifests"
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    val day1 = eventsDf.filter(dayofmonth(col("ts")) === 1).localCheckpoint()
    PartitionedParquetSink.writeBatch(day1, cfg)
    val v1 = VersionedManifest.commit(spark, table, mDir)
    PartitionedParquetSink.writeBatch(
      eventsDf.filter(dayofmonth(col("ts")) === 2), cfg)
    val v2 = VersionedManifest.commit(spark, table, mDir)
    val gen1 = Recovery.listDataFiles(spark, table)
      .collect().map(_.getString(0)).toSet

    // rewrite: write a compacted second generation into the SAME table,
    // then commit ONLY the new files — gen1 is now superseded but must
    // stay readable through v1/v2 until expiry
    val expect = spark.read.parquet(table).count()
    val copy = spark.read.parquet(table).localCheckpoint()
    PartitionedParquetSink.writeBatch(copy.drop("year", "month", "day"), cfg)
    spark.catalog.refreshByPath(table)
    val gen2 = Recovery.listDataFiles(spark, table)
      .filter(!col("file_path").isin(gen1.toSeq: _*))
    val v3 = VersionedManifest.commitFiles(spark, mDir, gen2)
    assert(VersionedManifest.readAt(spark, table, mDir, Some(v1)).count()
      === day1.count())

    val (expired, deleted) = VersionedManifest.expireSnapshots(spark, mDir, keepLast = 1)
    assert(expired === Seq(v1, v2))
    assert(deleted === gen1.size, "every superseded gen1 file is deleted, nothing else")
    gen1.foreach(f =>
      assert(!new java.io.File(new java.net.URI(f).getPath).exists(), s"not deleted: $f"))
    assert(VersionedManifest.versions(spark, mDir) === Seq(v3))
    // current snapshot unharmed: full row count through the pointer
    spark.catalog.refreshByPath(table)
    assert(VersionedManifest.readAt(spark, table, mDir).count() === expect)
    // idempotent: nothing left to expire
    assert(VersionedManifest.expireSnapshots(spark, mDir, keepLast = 1) === (Nil, 0L))
  }

  test("schema evolution: widened batches merge, old files read as null") {
    import spark.implicits._
    val base = tmp()
    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    val day1 = eventsDf.filter(dayofmonth($"ts") === 1)
    val day2 = eventsDf.filter(dayofmonth($"ts") === 2)
      .withColumn("source_region", lit("eu-west"))
    PartitionedParquetSink.writeBatch(day1, cfg)
    PartitionedParquetSink.writeBatch(day2, cfg)

    // default read resolves the schema from one footer — the evolved
    // column is invisible unless schema merging is requested
    spark.catalog.refreshByPath(s"$base/events")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/events")
    assert(merged.columns.contains("source_region"))
    assert(merged.count() === day1.count() + day2.count())
    val byRegion = merged.groupBy($"source_region").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // pre-evolution files surface NULL, evolved files their value
    assert(byRegion(None) === day1.count())
    assert(byRegion(Some("eu-west")) === day2.count())

    // evolution must not break the sink's pruning contract: partition
    // dirs are intact and a day filter still prunes to one partition
    val plan = merged.filter($"day" === "01").queryExecution
      .executedPlan.toString
    assert(!plan.contains("day=02"), "day filter failed to prune evolved table")
  }
}
