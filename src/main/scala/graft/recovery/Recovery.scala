package graft.recovery

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sink.PartitionedParquetSink
import graft.sink.PartitionedParquetSink.SinkConfig

/** Recovery tooling — Spark-native counterpart of the reference's
  * recovery CLI (/root/reference/internal/recovery/{scanner,reconciler,
  * repartitioner}.go).
  *
  *  - scan: list data files in storage, anti-join against the manifest
  *    (the catalog's registered-files list) → orphans.
  *  - reconcile: register orphans into the manifest, idempotently
  *    (at-least-once safe, like the reference's re-register path).
  *  - repartition: read a table and rewrite it at a different
  *    granularity (repartitioner.go re-segments files across partitions).
  */
object Recovery {

  /** Storage listing (metadata-only, like scanner.go walking the bucket;
    * file counts are small relative to data so a driver-side walk is the
    * right tool — the data itself is never read). */
  def listDataFiles(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val path = new Path(tablePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    if (fs.exists(path)) {
      val it = fs.listFiles(path, true)
      while (it.hasNext) {
        val f = it.next()
        val p = f.getPath.toString
        if (p.endsWith(".parquet")) files += ((p, f.getLen))
      }
    }
    files.toSeq.toDF("file_path", "file_size")
  }

  /** DISTRIBUTED storage listing for wide tables: the driver expands
    * only the DIRECTORY tree breadth-first until there are enough
    * leaf directories to spread (cheap — directories ≪ files), then
    * executors list their directories in parallel. At 10⁶ files on an
    * object store this turns the scanner's one sequential LIST stream
    * into #partitions concurrent ones — the same executor-side FS
    * pattern as [[VersionedManifest.expireSnapshots]]'s deletes.
    * Results are identical to [[listDataFiles]]. */
  def listDataFilesDistributed(spark: SparkSession, tablePath: String,
                               parallelism: Int = 64): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty[(String, Long)].toDF("file_path", "file_size")
    // breadth-first expansion over UNSCANNED dirs: each round either
    // hands the pending set to executors (enough fan-out) or scans one
    // more level driver-side (files → shallow, subdirs → next round)
    var pending: Seq[Path] = Seq(root)
    val shallow = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (pending.nonEmpty && pending.size < parallelism) {
      val next = scala.collection.mutable.ArrayBuffer.empty[Path]
      pending.foreach { d =>
        fs.listStatus(d).foreach { c =>
          if (c.isDirectory) next += c.getPath
          else {
            val p = c.getPath.toString
            if (p.endsWith(".parquet")) shallow += ((p, c.getLen))
          }
        }
      }
      pending = next.toSeq
    }
    val shallowDf = shallow.toSeq.toDF("file_path", "file_size")
    if (pending.isEmpty) return shallowDf
    val sConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val deep = spark.sparkContext
      .parallelize(pending.map(_.toString),
        math.min(parallelism, pending.size))
      .mapPartitions { it =>
        val c = sConf.value.value
        it.flatMap { d =>
          val p = new Path(d)
          val dfs = p.getFileSystem(c)
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          val files = dfs.listFiles(p, true)
          while (files.hasNext) {
            val f = files.next()
            val fp = f.getPath.toString
            if (fp.endsWith(".parquet")) out += ((fp, f.getLen))
          }
          out
        }
      }.toDF("file_path", "file_size")
    deep.union(shallowDf)
  }

  /** Orphans = files present in storage but absent from the manifest.
    * `distributedListing` swaps in [[listDataFilesDistributed]] for
    * tables whose file count warrants executor-side listing. */
  def scanOrphans(spark: SparkSession, tablePath: String,
                  manifest: DataFrame,
                  distributedListing: Boolean = false): DataFrame = {
    val files = if (distributedListing) listDataFilesDistributed(spark, tablePath)
                else listDataFiles(spark, tablePath)
    files.join(manifest.select(col("file_path")), Seq("file_path"), "left_anti")
  }

  /** Reverse orphans: manifest entries whose backing file no longer
    * exists in storage (deleted out-of-band). The catalog must drop
    * these or every scan over it fails on a missing file. */
  def scanMissing(spark: SparkSession, tablePath: String,
                  manifest: DataFrame,
                  distributedListing: Boolean = false): DataFrame = {
    val files = if (distributedListing) listDataFilesDistributed(spark, tablePath)
                else listDataFiles(spark, tablePath)
    manifest.join(files.select(col("file_path")), Seq("file_path"), "left_anti")
  }

  /** Overwrite a manifest WE ARE READING FROM without materializing it
    * on the driver (r5 — was a `collect()` + re-parallelize, a driver
    * heap risk at the reference's 10⁶-file scenario): the merged frame
    * is written DISTRIBUTED to a temp sibling directory, then swapped
    * into place with a metadata rename. The single shuffle to one
    * writer task handles metadata-scale rows (a 10⁶-file manifest is
    * tens of MB); the anti-join/dedup upstream keeps its parallelism. */
  private def overwriteManifest(spark: SparkSession, manifestPath: String,
                                merged: DataFrame): DataFrame = {
    val tmp = manifestPath + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8)
    merged.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = new Path(manifestPath)
    val t = new Path(tmp)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Swap with the loss window NARROWED and every rename CHECKED (r6 —
    // delete-then-rename ignored rename's boolean result, and a false
    // return — the typical object-store failure mode — or a crash
    // between the two steps silently lost the manifest; the next read
    // would fall back to an empty one). Old manifest moves ASIDE first,
    // so at any crash point either the old or the new copy is at a
    // known path; the aside copy is removed only after the new one is
    // in place.
    val aside = new Path(manifestPath + ".old-" + t.getName.takeRight(8))
    val hadOld = fs.exists(p)
    if (hadOld && !fs.rename(p, aside))
      throw new java.io.IOException(
        s"manifest swap: failed to move $p aside to $aside")
    if (!fs.rename(t, p)) {
      // restore the old manifest before failing — no silent loss
      if (hadOld) fs.rename(aside, p)
      throw new java.io.IOException(
        s"manifest swap: failed to move $t into place at $p")
    }
    if (hadOld) fs.delete(aside, true)
    // Drop the stale FileStatusCache listing for the overwritten path.
    spark.catalog.refreshByPath(manifestPath)
    spark.read.parquet(manifestPath)
  }

  /** Drop manifest entries with no backing file; returns the pruned
    * manifest (written back idempotently, like [[reconcile]]). */
  def pruneMissing(spark: SparkSession, tablePath: String,
                   manifestPath: String): DataFrame = {
    val existing = spark.read.parquet(manifestPath)
    val live = existing.join(
      listDataFiles(spark, tablePath).select(col("file_path")),
      Seq("file_path"), "left_semi")
    overwriteManifest(spark, manifestPath, live)
  }

  /** Register orphans into the manifest; dedup on path makes re-runs
    * idempotent (reconciler.go's re-register semantics). The merge is a
    * distributed anti-join + dropDuplicates end-to-end; only counts (at
    * call sites) and the swap rename touch the driver. */
  def reconcile(spark: SparkSession, tablePath: String,
                manifestPath: String,
                distributedListing: Boolean = false): DataFrame = {
    import spark.implicits._
    val existing =
      try spark.read.parquet(manifestPath)
      catch { case _: Throwable => Seq.empty[(String, Long)].toDF("file_path", "file_size") }
    val merged = existing
      .unionByName(scanOrphans(spark, tablePath, existing, distributedListing))
      .dropDuplicates("file_path")
    overwriteManifest(spark, manifestPath, merged)
  }

  /** Register an EXPLICIT file set into the manifest — reconcile with a
    * caller-filtered candidate list (e.g. [[RecoveryCli]]'s
    * `--after`/`--before` partition-time window). Same idempotent
    * dedup-on-path semantics as [[reconcile]]. */
  def registerFiles(spark: SparkSession, manifestPath: String,
                    files: DataFrame): DataFrame = {
    import spark.implicits._
    val existing =
      try spark.read.parquet(manifestPath)
      catch { case _: Throwable => Seq.empty[(String, Long)].toDF("file_path", "file_size") }
    val merged = existing
      .unionByName(files.select(col("file_path"), col("file_size")))
      .dropDuplicates("file_path")
    overwriteManifest(spark, manifestPath, merged)
  }

  /** One file's footer → (min, max, rows) for `column`. Runs on
    * executors (see [[fileStats]]); pure function of (path, conf). */
  private def harvestFooter(pathStr: String, conf: org.apache.hadoop.conf.Configuration,
                            column: String): (String, Option[Long], Option[Long], Long) = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(pathStr), conf))
    try {
      import scala.jdk.CollectionConverters._
      var mn: Option[Long] = None
      var mx: Option[Long] = None
      var rows = 0L
      var ok = true
      reader.getFooter.getBlocks.asScala.foreach { block =>
        rows += block.getRowCount
        block.getColumns.asScala
          .find(_.getPath.toDotString == column) match {
          case Some(cc) if cc.getStatistics != null &&
                           !cc.getStatistics.isEmpty =>
            (cc.getStatistics.genericGetMin, cc.getStatistics.genericGetMax) match {
              case (lo: java.lang.Long, hi: java.lang.Long) =>
                mn = Some(mn.fold(lo.longValue)(math.min(_, lo.longValue)))
                mx = Some(mx.fold(hi.longValue)(math.max(_, hi.longValue)))
              case _ => ok = false
            }
          case _ => ok = false
        }
      }
      (pathStr, if (ok) mn else None, if (ok) mx else None, rows)
    } finally reader.close()
  }

  /** Per-file BLOOM FILTER index over a key column (long, timestamp
    * or STRING — keys are xxhash64'd, see [[graft.functions.BloomKeys]])
    * — the point-lookup complement to zone maps: min/max prunes range
    * predicates, blooms prune `key = v` needle queries (find one trace
    * / event / order id in a 100 TB table). One distributed build pass groups
    * rows by their source file and folds them into a fixed-size sketch;
    * persisted through a stats-carrying [[VersionedManifest.commit]]
    * the index lives in the manifest like Iceberg puffin blobs, and
    * [[VersionedManifest.readPoint]] consults only manifest bytes to
    * pick the 1+ε files that can contain the key. */
  def fileBlooms(spark: SparkSession, tablePath: String, column: String,
                 fpp: Double = 0.03): DataFrame = {
    import spark.implicits._
    val scan = spark.read.parquet(tablePath)
    // sketches key on xxhash64 of the value ([[graft.functions
    // .BloomKeys]]) so STRING keys (trace_id hex) index too — the old
    // cast("long") turned them into null and NPE'd the encoder; null
    // keys are dropped (a null never equals a point-lookup literal,
    // so the drop is exact — the same guard writeBloomIndex carries).
    scan
      .where(col(column).isNotNull)
      .select(input_file_name().as("f"),
        graft.functions.BloomKeys.keyCol(
          col(column), scan.schema(column).dataType).as("v"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (f, it) =>
        // size each sketch to ITS file's key count (one file's keys
        // buffer in an executor — bounded by parquet file size): a
        // fixed capacity either over-sizes small files 100× (every
        // lookup then deserializes megabytes of near-empty sketch from
        // the manifest) or saturates big ones past the target fpp
        val vals = it.map(_._2).toArray
        val bf = org.apache.spark.util.sketch.BloomFilter.create(
          math.max(vals.length.toLong, 64L), fpp)
        vals.foreach(bf.putLong)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        // normalize to Hadoop Path form so the key joins listDataFiles
        (new Path(f).toString, bos.toByteArray)
      }
      .toDF("file_path", "bloom")
      .withColumn("bloom_col", lit(column))
      .withColumn("bloom_keys", lit(graft.functions.BloomKeys.Scheme))
  }

  /** File-level column statistics (zone map) harvested from parquet
    * FOOTERS — the per-file min/max metrics an Iceberg catalog keeps,
    * reconstructed from storage alone. Metadata-only: footers are read,
    * row data never is. The harvest runs as a DISTRIBUTED Spark job over
    * the file list (a 100 TB table has ~10^5-10^6 footers; a sequential
    * driver sweep would dominate every query — see also
    * [[VersionedManifest.commit]] which persists these stats so readers
    * prune from cached metadata without touching footers at all).
    * Returns one row per file with the column's min/max (as raw int64
    * for timestamp/long columns) and row count; files without stats
    * surface as nulls (never pruned). */
  def fileStats(spark: SparkSession, tablePath: String,
                column: String): DataFrame = {
    import spark.implicits._
    val paths = listDataFiles(spark, tablePath)
      .select("file_path").as[String].collect().toIndexedSeq
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(paths.length,
      spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(paths, slices)
      .mapPartitions { it =>
        val conf = confB.value.value
        it.map(p => harvestFooter(p, conf, column))
      }
      .toDF("file_path", "min_val", "max_val", "n_rows")
  }

  /** Row counts for an EXPLICIT file list, from parquet footers, as a
    * distributed job (r6 — catalog registration carries real per-file
    * record counts, matching the reference exporter's snapshot summary,
    * instead of a hardcoded 0). Metadata-only like [[fileStats]]. */
  /** Per-file min/max of one INT64/INT32-physical column, harvested
    * from parquet FOOTERS only (no data pages) — the stats a catalog
    * commit embeds into manifest-entry `lower_bounds`/`upper_bounds`
    * so downstream planners prune files from metadata alone. Columns
    * whose footer carries no comparable long stats (binary, all-null)
    * simply don't appear. Distributed like [[fileRowCounts]]: one
    * footer open per file across the cluster, collected driver-side
    * (bytes-per-file: two longs). */
  def fileColumnStats(spark: SparkSession, paths: Seq[String],
                      column: String): Map[String, (Long, Long)] = {
    if (paths.isEmpty) return Map.empty
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(paths.length,
      spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(paths.toIndexedSeq, slices)
      .mapPartitions { it =>
        val conf = confB.value.value
        it.flatMap { p =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new Path(p), conf))
          try {
            import scala.jdk.CollectionConverters._
            val longs = reader.getFooter.getBlocks.asScala
              .flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == column)
              .map(_.getStatistics)
              .filter(s => s != null && s.hasNonNullValue)
              .flatMap { s =>
                (s.genericGetMin, s.genericGetMax) match {
                  case (mn: java.lang.Long, mx: java.lang.Long) =>
                    Some((mn.longValue, mx.longValue))
                  case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                    Some((mn.longValue, mx.longValue))
                  case _ => None
                }
              }
            if (longs.isEmpty) None
            else Some(p -> (longs.map(_._1).min, longs.map(_._2).max))
          } finally reader.close()
        }
      }.collect().toMap
  }

  def fileRowCounts(spark: SparkSession, paths: Seq[String]): Map[String, Long] = {
    if (paths.isEmpty) return Map.empty
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(paths.length,
      spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(paths.toIndexedSeq, slices)
      .mapPartitions { it =>
        val conf = confB.value.value
        it.map { p =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new Path(p), conf))
          try {
            import scala.jdk.CollectionConverters._
            p -> reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
          } finally reader.close()
        }
      }.collect().toMap
  }

  /** Time-sliced read with ZONE-MAP SKIPPING: prune files whose footer
    * [min,max] can't overlap [startUs, endUs) before Spark ever lists
    * them — Iceberg's metadata-level data skipping, at 100 TB the
    * difference between scanning the slice and scanning the table. A
    * residual filter keeps exactness; files without stats are read.
    * (Timestamps compare as parquet's int64 micros.) */
  def readSlice(spark: SparkSession, tablePath: String, tsColumn: String,
                startUs: Long, endUs: Long): DataFrame = {
    val stats = fileStats(spark, tablePath, tsColumn)
    val keep = stats
      .filter(col("min_val").isNull ||
              (col("max_val") >= startUs && col("min_val") < endUs))
      .select("file_path").collect().map(_.getString(0))
    val base = if (keep.isEmpty)
      spark.read.parquet(tablePath).limit(0)
    else
      spark.read.option("basePath", tablePath).parquet(keep.toIndexedSeq: _*)
    base.filter(unix_micros(col(tsColumn)) >= startUs &&
                unix_micros(col(tsColumn)) < endUs)
  }

  // ── Cross-partition file auto-repair ──────────────────────────────
  // Reference: reconciler.go:380 `handleCrossPartitionFile` +
  // repartitioner.go `Repartition` — a register that fails because a
  // file's rows straddle the registered partition is repaired by
  // splitting the file at the table's granularity and registering the
  // splits atomically, then deleting the original.

  /** iceberg-go's cross-partition error substring (repartitioner.go:21,
    * citing table/internal/utils.go) — the signal the reference
    * reconciler keys its auto-repair on. Our own partition validation
    * raises the same words so callers route identically. */
  val CrossPartitionError = "more than one value for partition field"

  /** Raised by [[validateSinglePartition]]; carries the straddler list
    * so the repair path needn't re-sweep footers. */
  final class CrossPartitionException(msg: String, val files: Seq[String])
    extends IllegalStateException(msg)

  /** repartitioner.go:68 `IsCrossPartitionError` parity: substring
    * match anywhere in the cause chain. */
  def isCrossPartitionError(t: Throwable): Boolean = {
    var e = t
    var seen = 0
    while (e != null && seen < 16) {
      if (e.getMessage != null && e.getMessage.contains(CrossPartitionError))
        return true
      e = if (e.getCause eq e) null else e.getCause
      seen += 1
    }
    false
  }

  private def granularityTransform(granularity: String): String =
    granularity match {
      case "hourly"  => "hour"
      case "daily"   => "day"
      case "monthly" => "month"
      case other => throw new IllegalArgumentException(
        s"unknown granularity '$other' (hourly|daily|monthly)")
    }

  /** Granularity inferred from a sink-layout path (deepest time dir
    * present); None for paths without partition dirs. */
  def pathGranularity(path: String): Option[String] =
    if (path.contains("hour=")) Some("hourly")
    else if (path.contains("day=")) Some("daily")
    else if (path.contains("month=")) Some("monthly")
    else None

  /** The subset of `paths` whose ROWS straddle more than one partition
    * at `granularity` on `tsColumn` — the condition that makes
    * iceberg-go's tuple derivation fail with [[CrossPartitionError]].
    * Metadata-only: one distributed footer sweep (int64-micros min/max);
    * files whose footer carries no usable stats can't be judged and are
    * not flagged (they register with a null tuple = never pruned, the
    * conservative fallback [[graft.catalog.IcebergCommit]] already
    * takes). */
  def crossPartitionFiles(spark: SparkSession, paths: Seq[String],
                          tsColumn: String,
                          granularity: String): Seq[String] = {
    if (paths.isEmpty) return Nil
    val tr = granularityTransform(granularity)
    val stats = fileColumnStats(spark, paths, tsColumn)
    paths.filter(p => stats.get(p).exists { case (mn, mx) =>
      graft.catalog.IcebergPartitioning.transformValue(tr, mn) !=
        graft.catalog.IcebergPartitioning.transformValue(tr, mx)
    })
  }

  /** Registration-time validation with the reference's ERROR SHAPE:
    * raises a [[CrossPartitionException]] carrying iceberg-go's exact
    * substring when any of `paths` straddles, so the caller routes on
    * [[isCrossPartitionError]] exactly like reconciler.go:371. */
  def validateSinglePartition(spark: SparkSession, paths: Seq[String],
                              tsColumn: String,
                              granularity: String): Unit = {
    val bad = crossPartitionFiles(spark, paths, tsColumn, granularity)
    if (bad.nonEmpty)
      throw new CrossPartitionException(
        s"${bad.head}: $CrossPartitionError " +
          s"($granularity on $tsColumn; ${bad.size} file(s) affected)", bad)
  }

  /** Repair straddling files, Spark-first: where the reference loops
    * file → Arrow split → per-partition write (repartitioner.go:78),
    * ONE distributed job here reads every straddler and appends its
    * rows back through the sink's dynamic-partition writer at the
    * table's granularity — each partition value lands in its own
    * file(s) by construction, for any number of straddlers at once.
    * Originals are deleted only AFTER the write job commits (Spark's
    * output committer makes the splits all-or-nothing), so a crash
    * mid-repair leaves storage duplicates at worst — which the
    * idempotent path-keyed register and a later reconcile both
    * tolerate. Returns the new split files (path, size) to register. */
  def repairCrossPartitionFiles(spark: SparkSession, basePath: String,
                                table: String, files: Seq[String],
                                tsColumn: String, granularity: String)
      : Seq[(String, Long)] = {
    if (files.isEmpty) return Nil
    import spark.implicits._
    val tablePath = s"$basePath/$table"
    val before = listDataFiles(spark, tablePath)
      .select("file_path").as[String].collect().toSet
    // read ONLY the straddlers, without basePath: dir-derived partition
    // columns stay out and the sink re-derives them from the rows
    val df = spark.read.parquet(files: _*)
    PartitionedParquetSink.writeBatch(df, SinkConfig(basePath, table,
      tsColumn = tsColumn, granularity = granularity))
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val p = new Path(f)
      p.getFileSystem(conf).delete(p, false)
    }
    spark.catalog.refreshByPath(tablePath)
    listDataFiles(spark, tablePath)
      .as[(String, Long)].collect().toSeq
      .filter { case (p, _) => !before.contains(p) }
  }

  /** Rewrite a partitioned table at a new granularity
    * (repartitioner.go). Reads through the partition layout, drops the
    * old partition value columns, re-derives at the target granularity. */
  def repartition(spark: SparkSession, from: SinkConfig, to: SinkConfig): Unit = {
    val df = spark.read.parquet(PartitionedParquetSink.tablePath(from))
    val bare = PartitionedParquetSink.partitionColumns(from.granularity)
      .foldLeft(df)((d, c) => d.drop(c))
    PartitionedParquetSink.writeBatch(bare, to)
  }

  /** Small-file compaction: rewrite a table into files near
    * `targetFileBytes` — THE steady-state maintenance job for any
    * streaming-ingested table (every micro-batch commit emits a file
    * per touched partition; a day of 1-minute batches is 1440 files per
    * partition, and at 100 TB scan cost is dominated by file-open
    * overhead long before bytes). Rows shuffle onto their partition
    * values (writeBatch — one writer per directory), and a
    * rows-per-file cap derived from the table's observed bytes/row
    * splits hot partitions near the target. Returns
    * (filesBefore, filesAfter).
    * Writes to `to` — compact-then-swap (or commit the new file list
    * via [[VersionedManifest]]) keeps readers consistent; compacting
    * in place would race them. */
  def compact(spark: SparkSession, from: SinkConfig, to: SinkConfig,
              targetFileBytes: Long = 128L << 20): (Long, Long) = {
    val files = listDataFiles(spark, PartitionedParquetSink.tablePath(from))
      .agg(count(col("file_path")), coalesce(sum(col("file_size")), lit(0L)))
      .collect()(0)
    val (nBefore, totalBytes) = (files.getLong(0), files.getLong(1))
    val df = spark.read.parquet(PartitionedParquetSink.tablePath(from))
    val bare = PartitionedParquetSink.partitionColumns(from.granularity)
      .foldLeft(df)((d, c) => d.drop(c))
    // writeBatch routes every row of a partition value to ONE task (the
    // small-file guarantee), so within-partition file splitting must come
    // from maxRecordsPerFile: rows-per-file sized from the table's
    // observed bytes/row — a hot partition larger than the target still
    // splits into ~target-sized files.
    val nRows = bare.count()
    val maxRecords =
      if (nRows == 0 || totalBytes == 0) 0L // 0 = unlimited
      else math.max(1L, targetFileBytes * nRows / totalBytes)
    val key = "spark.sql.files.maxRecordsPerFile"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, maxRecords.toString)
    try PartitionedParquetSink.writeBatch(bare, to)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    val nAfter = listDataFiles(spark, PartitionedParquetSink.tablePath(to)).count()
    (nBefore, nAfter)
  }
}
