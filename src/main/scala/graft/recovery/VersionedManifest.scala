package graft.recovery

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sink.PartitionedParquetSink

/** Iceberg-lite snapshot log: the versioned-manifest + pointer scheme
  * that gives the reference's catalog its snapshot isolation and time
  * travel, reconstructed on plain storage.
  *
  *  - every commit writes an immutable `manifest-v{N}` file list and
  *    then swaps the `VERSION` pointer (write-tmp + atomic rename — the
  *    same single-pointer commit protocol Iceberg uses on its metadata
  *    JSON);
  *  - readers resolve a snapshot id (or the pointer) to a file list and
  *    read exactly those files — concurrent appends never tear a read;
  *  - old snapshots stay readable until their manifests are vacuumed.
  */
object VersionedManifest {

  private def versionPath(dir: String) = new Path(s"$dir/VERSION")

  /** Highest manifest-v{N} present in the log directory (0 if none) —
    * the self-healing fallback when the VERSION pointer is missing or
    * unreadable: manifests are immutable and numbered, so the max is
    * always a consistent snapshot to resume from. */
  private def maxManifestVersion(spark: SparkSession, manifestDir: String): Long = {
    val dir = new Path(manifestDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-v") =>
        n.stripPrefix("manifest-v").takeWhile(_.isDigit) }
      .collect { case s if s.nonEmpty => s.toLong }
      .foldLeft(0L)(math.max)
  }

  def currentVersion(spark: SparkSession, manifestDir: String): Long = {
    val p = versionPath(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) maxManifestVersion(spark, manifestDir)
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Commit the CURRENT storage state as the next snapshot: lists the
    * table's data files, writes manifest-v{N}, swaps the pointer.
    * Returns the new version.
    *
    * With `statsColumn` set, the manifest also carries per-file zone-map
    * stats (min/max/n_rows for that column, harvested once, distributed
    * — [[Recovery.fileStats]]); [[readSliceAt]] then prunes time slices
    * from this cached metadata alone, never re-reading footers — the
    * Iceberg manifest-metrics pattern. */
  def commit(spark: SparkSession, tablePath: String, manifestDir: String,
             statsColumn: Option[String] = None,
             bloomColumn: Option[String] = None): Long = {
    val files = Recovery.listDataFiles(spark, tablePath)
    val withStats = statsColumn.fold(files) { c =>
      files.join(Recovery.fileStats(spark, tablePath, c), Seq("file_path"), "left")
    }
    val entries = bloomColumn.fold(withStats) { c =>
      withStats.join(Recovery.fileBlooms(spark, tablePath, c),
                     Seq("file_path"), "left")
    }
    commitFiles(spark, manifestDir, entries)
  }

  /** Point-lookup read pruned by MANIFEST-CACHED per-file bloom
    * filters: only files whose bloom might contain `value` are opened
    * (plus bloom-less entries, never silently skipped); a residual
    * filter keeps exactness through false positives. The needle-in-
    * 100 TB query: cost is one scan of manifest bytes + 1+ε data
    * files, not a table scan. Bloom membership is checked DISTRIBUTED
    * over the manifest — a 10^6-file manifest deserializes sketches in
    * executors, the driver only collects the surviving paths. */
  def readPoint(spark: SparkSession, tablePath: String, manifestDir: String,
                value: Any, version: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val m = filesAt(spark, manifestDir, version)
    require(m.columns.contains("bloom"),
      s"manifest at $manifestDir has no bloom index; commit with bloomColumn")
    // per-row probe key: hash-keyed sketches (bloom_keys = xxhash64,
    // everything fileBlooms writes) probe the needle's hash; legacy
    // raw-long sketches (manifests committed before the scheme column
    // existed) probe the raw long. A sketch we cannot probe (legacy,
    // non-long needle) keeps its file — never silently skipped.
    val hashed = graft.functions.BloomKeys.keyOf(value)
    val rawLong: Option[Long] = value match {
      case l: Long => Some(l)
      case i: Int  => Some(i.toLong)
      case _       => None
    }
    val hasScheme = m.columns.contains("bloom_keys")
    val withScheme =
      if (hasScheme) m.select($"file_path", $"bloom", $"bloom_col",
        $"bloom_keys")
      else m.select($"file_path", $"bloom", $"bloom_col",
        lit(null: String).as("bloom_keys"))
    // single pass: bloom membership AND the indexed column's name come
    // back from one job (one path-sized row per file; sketch bytes never
    // reach the driver)
    val entries = withScheme
      .as[(String, Array[Byte], String, String)]
      .mapPartitions { it =>
        it.map { case (f, b, kc, scheme) =>
          val probe: Option[Long] =
            if (scheme == graft.functions.BloomKeys.Scheme) Some(hashed)
            else rawLong
          val hit = b == null || probe.isEmpty ||
            org.apache.spark.util.sketch.BloomFilter
              .readFrom(new java.io.ByteArrayInputStream(b))
              .mightContainLong(probe.get)
          (if (hit) f else null, kc)
        }
      }.collect()
    val keyCol = entries.collectFirst { case (_, kc) if kc != null => kc }
      .getOrElse(throw new IllegalStateException(
        s"manifest at $manifestDir has no bloom_col entry"))
    val keep = entries.collect { case (f, _) if f != null => f }
    val base = if (keep.isEmpty) spark.read.parquet(tablePath).limit(0)
    else spark.read.option("basePath", tablePath).parquet(keep.toIndexedSeq: _*)
    base.filter(col(keyCol) === lit(value))
  }

  /** Commit an EXPLICIT file list as the next snapshot — the rewrite
    * primitive: a compaction (or any file-replacing maintenance job)
    * writes its new files, then commits exactly the surviving list.
    * Superseded files stay on storage, still readable through older
    * snapshots, until [[expireSnapshots]] collects them — Iceberg's
    * rewrite-then-expire lifecycle. `entries` needs a `file_path`
    * column; extra columns (zone-map stats) ride along. */
  def commitFiles(spark: SparkSession, manifestDir: String,
                  entries: DataFrame): Long = {
    val next = currentVersion(spark, manifestDir) + 1
    entries
      .withColumn("snapshot_id", lit(next))
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$manifestDir/manifest-v$next")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = versionPath(manifestDir).getFileSystem(conf)
    val tmp = new Path(s"$manifestDir/VERSION.tmp")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    // Single-step overwriting rename (FileContext honors
    // Options.Rename.OVERWRITE and throws on failure) — never a
    // delete-then-rename window where no pointer exists. If the
    // filesystem can't do it (rare), currentVersion's
    // max(manifest-vN) fallback still recovers the log.
    val fc = FileContext.getFileContext(tmp.toUri, conf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(versionPath(manifestDir)),
              Options.Rename.OVERWRITE)
    next
  }

  /** Copy-on-write MERGE (upsert): rows in `updates` replace current
    * rows with the same `keyCol`; everything else is untouched. Only
    * the files that CONTAIN an updated key are rewritten — their
    * surviving rows and the updates are written as new files, and the
    * next snapshot is (untouched entries) ∪ (new files) via
    * [[commitFiles]]. Superseded files stay readable through older
    * snapshots until [[expireSnapshots]] — Iceberg's copy-on-write
    * MERGE INTO lifecycle on plain storage. At 100 TB the rewrite cost
    * is proportional to files-touched, not table size, which is why
    * the affected-file probe (a broadcast semi-join against the update
    * keys) matters as much as the rewrite itself. Returns the new
    * version. */
  def upsert(spark: SparkSession, tablePath: String, manifestDir: String,
             updates: DataFrame, keyCol: String,
             cfg: PartitionedParquetSink.SinkConfig,
             statsColumn: Option[String] = None): Long = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val snap = readAt(spark, tablePath, manifestDir)
    val partCols = PartitionedParquetSink.partitionColumns(cfg.granularity)
    val dataCols = snap.columns.filterNot(partCols.contains).map(col)
    val keys = updates.select(col(keyCol)).distinct().localCheckpoint()
    val withFile = snap.withColumn("_src", input_file_name()).localCheckpoint()
    // raw input_file_name form for row filtering, Hadoop-Path form for
    // manifest matching (the two differ in slash count)
    // affected-file sets flow through JOINS, not isin literals — a wide
    // update can touch 10^5 files and an isin that large is a plan tree,
    // not a filter
    val affectedRaw = withFile.join(broadcast(keys), Seq(keyCol), "left_semi")
      .select($"_src").distinct().as[String].collect()
    val affectedNormDf = affectedRaw.map(p => new Path(p).toString).toSeq
      .toDF("file_path")
    val untouched = filesAt(spark, manifestDir)
      .join(broadcast(affectedNormDf), Seq("file_path"), "left_anti")
    val survivors = withFile
      .join(broadcast(affectedRaw.toSeq.toDF("_src")), Seq("_src"), "left_semi")
      .join(broadcast(keys), Seq(keyCol), "left_anti")
    val before = Recovery.listDataFiles(spark, tablePath)
      .select("file_path").localCheckpoint()
    val newData = survivors.select(dataCols: _*)
      .unionByName(updates.select(dataCols: _*))
    PartitionedParquetSink.writeBatch(newData, cfg)
    spark.catalog.refreshByPath(tablePath)
    val newEntries = Recovery.listDataFiles(spark, tablePath)
      .join(broadcast(before), Seq("file_path"), "left_anti")
    val newWithStats = statsColumn.fold(newEntries) { c =>
      newEntries.join(Recovery.fileStats(spark, tablePath, c),
                      Seq("file_path"), "left")
    }
    commitFiles(spark, manifestDir,
      untouched.unionByName(newWithStats, allowMissingColumns = true))
  }

  /** Incremental (CDC-style) read: rows in files ADDED between two
    * snapshots — `(fromVersion, toVersion]`. The consumer pattern for
    * at-least-once downstream jobs: process exactly the new files per
    * manifest commit instead of rescanning the table; at 100 TB the
    * delta is hours of data, the table is years. File-level diff via
    * anti-join on the two manifests (append-only tables add files,
    * compactions add rewritten files — pair with [[expireSnapshots]]). */
  def readIncremental(spark: SparkSession, tablePath: String,
                      manifestDir: String, fromVersion: Long,
                      toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.getOrElse(currentVersion(spark, manifestDir))
    require(to >= fromVersion, s"to=$to precedes from=$fromVersion")
    val toFiles = filesAt(spark, manifestDir, Some(to)).select("file_path")
    // version 0 = before the first snapshot: everything in `to` is new
    val newFiles = (if (fromVersion == 0L) toFiles
      else toFiles.join(
        filesAt(spark, manifestDir, Some(fromVersion)).select("file_path"),
        Seq("file_path"), "left_anti"))
      .collect().map(_.getString(0))
    if (newFiles.isEmpty) spark.read.parquet(tablePath).limit(0)
    else spark.read.option("basePath", tablePath).parquet(newFiles.toIndexedSeq: _*)
  }

  /** Snapshot versions present in the log, ascending (tolerates gaps
    * left by earlier expiries). */
  def versions(spark: SparkSession, manifestDir: String): Seq[Long] = {
    val dir = new Path(manifestDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-v") =>
        n.stripPrefix("manifest-v").takeWhile(_.isDigit) }
      .collect { case s if s.nonEmpty => s.toLong }
      .toSeq.sorted
  }

  /** Expire all but the newest `keepLast` snapshots: drop their
    * manifests and DELETE data files no retained snapshot references —
    * the GC half of the rewrite-then-expire lifecycle, without which
    * every compaction leaks its inputs forever. The reachability set is
    * a distributed anti-join over the manifests (never collected), and
    * the deletes run in executors — at 100 TB a rewrite cycle can
    * orphan millions of files, far beyond a driver loop. Returns
    * (expired versions, data files deleted). */
  def expireSnapshots(spark: SparkSession, manifestDir: String,
                      keepLast: Int = 2): (Seq[Long], Long) = {
    val keepN = math.max(keepLast, 1)
    val vs = versions(spark, manifestDir)
    val expired = vs.dropRight(keepN)
    if (expired.isEmpty) return (Nil, 0L)
    val retained = vs.takeRight(keepN)
    val keep = retained.map(v =>
      filesAt(spark, manifestDir, Some(v)).select("file_path")).reduce(_ union _)
    val exp = expired.map(v =>
      filesAt(spark, manifestDir, Some(v)).select("file_path")).reduce(_ union _)
    val doomed = exp.distinct().join(keep.distinct(), Seq("file_path"), "left_anti")
    val acc = spark.sparkContext.longAccumulator("graft.expired.files")
    // ship the driver's hadoop conf so executor-side deletes see the
    // same filesystem credentials/settings (an object store needs them)
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    doomed.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val conf = confB.value.value
      it.foreach { r =>
        val p = new Path(r.getString(0))
        if (p.getFileSystem(conf).delete(p, false)) acc.add(1)
      }
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(manifestDir).getFileSystem(conf)
    expired.foreach(v => fs.delete(new Path(s"$manifestDir/manifest-v$v"), true))
    (expired, acc.value)
  }

  /** The file list at a snapshot (default: the current pointer). */
  def filesAt(spark: SparkSession, manifestDir: String,
              version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, manifestDir))
    spark.read.parquet(s"$manifestDir/manifest-v$v")
  }

  /** Roll back to an earlier snapshot by committing ITS file list as a
    * NEW head version — never by moving the pointer backwards
    * (Iceberg's rollback semantics). History stays append-only: the
    * bad snapshots remain readable for forensics, [[expireSnapshots]]
    * reachability still sees every version, and a reader that resolved
    * the head mid-rollback sees a consistent snapshot either way. */
  def rollback(spark: SparkSession, manifestDir: String,
               toVersion: Long): Long = {
    val entries = filesAt(spark, manifestDir, Some(toVersion))
      .drop("snapshot_id")
    commitFiles(spark, manifestDir, entries)
  }

  /** ZERO-COPY shallow clone (Delta SHALLOW CLONE / Iceberg snapshot-ref
    * semantics): commit the source's file list at `version` (default:
    * current head) as version 1 of a NEW manifest log. No data moves —
    * a 100 TB table clones in manifest-write time; the clone then
    * evolves independently (upserts/compactions write ITS new files).
    *
    * Caveat (same as every shallow-clone implementation): data files
    * are SHARED until the clone rewrites them, so [[expireSnapshots]]
    * must only ever run on the log that OWNS the files — expiring the
    * clone could delete files the source still references. */
  def cloneTo(spark: SparkSession, srcManifestDir: String,
              dstManifestDir: String, version: Option[Long] = None): Long = {
    val entries = filesAt(spark, srcManifestDir, version).drop("snapshot_id")
    commitFiles(spark, dstManifestDir, entries)
  }

  /** Named snapshot tag (Iceberg tag refs): `tag-<name>` pins a version
    * so consumers can address "the audited snapshot" instead of a
    * number. Overwrite-atomic like the VERSION pointer. */
  def writeTag(spark: SparkSession, manifestDir: String, name: String,
               version: Long): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"invalid tag name: $name")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(s"$manifestDir/tag-$name")
    val tmp = new Path(s"$manifestDir/tag-$name.tmp")
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(tmp.toUri, conf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(p),
              Options.Rename.OVERWRITE)
  }

  def readTag(spark: SparkSession, manifestDir: String, name: String): Long = {
    val p = new Path(s"$manifestDir/tag-$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8").trim.toLong
    finally in.close()
  }

  /** Read the table as of a named tag. */
  def readAtTag(spark: SparkSession, tablePath: String, manifestDir: String,
                name: String): DataFrame =
    readAt(spark, tablePath, manifestDir,
           Some(readTag(spark, manifestDir, name)))

  /** Time-travel read: the table exactly as of snapshot `version`. */
  def readAt(spark: SparkSession, tablePath: String, manifestDir: String,
             version: Option[Long] = None): DataFrame = {
    val files = filesAt(spark, manifestDir, version)
      .select("file_path").collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(tablePath).limit(0)
    else spark.read.option("basePath", tablePath).parquet(files.toIndexedSeq: _*)
  }

  /** Time-sliced snapshot read pruned from MANIFEST-CACHED zone maps —
    * no footer is opened: the min/max stats persisted by a
    * stats-carrying [[commit]] decide which files can overlap
    * [startUs, endUs). A residual filter keeps exactness; entries
    * without stats are read (never silently skipped). This is the 100 TB
    * read path: pruning cost is one scan of a tiny manifest, constant in
    * data size. */
  def readSliceAt(spark: SparkSession, tablePath: String, manifestDir: String,
                  tsColumn: String, startUs: Long, endUs: Long,
                  version: Option[Long] = None): DataFrame = {
    val m = filesAt(spark, manifestDir, version)
    require(m.columns.contains("min_val"),
      s"manifest at $manifestDir has no zone-map stats; commit with statsColumn")
    val keep = m
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
}
