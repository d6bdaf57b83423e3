package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.catalog.IcebergTableMetadata.{SnapshotMeta, TableMetadata}

/** COLD Iceberg table reads — open a table from its warehouse
  * directory ALONE: `version-hint.text` → `vN.metadata.json` →
  * snapshot → manifest list → manifests → pruned file set, no catalog
  * round-trip. This is the interop path that lets the engine query
  * tables the reference stack produced (and re-open its own committed
  * tables after the catalog is gone), the semantics of
  * `/root/reference/internal/iceberg/catalog_rest.go:394` (table
  * metadata is the authority for the snapshot set) applied to the
  * on-disk chain instead of the REST response.
  *
  * Plan shape at scale: everything up to the file list is METADATA —
  * a few KB of JSON plus one Avro OCF per manifest, decoded
  * driver-side exactly like every Iceberg planner (Spark's own Iceberg
  * source plans manifests on the driver too; the data files then scan
  * fully distributed). Min/max pruning runs on the manifest entries'
  * `lower_bounds`/`upper_bounds` BEFORE any parquet footer is opened —
  * a time-slice query on a 100 TB table dispatches only the files
  * whose stats ranges intersect the slice. */
object IcebergTableReader {

  /** One live data file at a snapshot, with its manifest-entry stats. */
  final case class FileEntry(
      path: String, recordCount: Long, sizeBytes: Long,
      snapshotId: Long,
      lowerBounds: Map[Int, Array[Byte]], upperBounds: Map[Int, Array[Byte]])

  def metadata(spark: SparkSession, tableDir: String): TableMetadata =
    IcebergTableMetadata.load(
      spark.sparkContext.hadoopConfiguration, tableDir)
      .getOrElse(throw new IllegalArgumentException(
        s"no Iceberg table metadata under $tableDir/metadata " +
          "(version-hint.text / vN.metadata.json missing)"))

  /** The snapshot log as a DataFrame — time travel starts here. */
  def snapshots(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    metadata(spark, tableDir).snapshots
      .map(s => (s.snapshotId, s.parentId, s.sequenceNumber, s.timestampMs,
        s.manifestList, s.summary.getOrElse("operation", "")))
      .toDF("snapshot_id", "parent_snapshot_id", "sequence_number",
        "timestamp_ms", "manifest_list", "operation")
  }

  private def resolveSnapshot(meta: TableMetadata,
                              asOfSnapshotId: Option[Long]): Option[SnapshotMeta] =
    asOfSnapshotId match {
      case Some(id) =>
        Some(meta.snapshots.find(_.snapshotId == id).getOrElse(
          throw new IllegalArgumentException(
            s"snapshot $id not in table metadata (known: " +
              s"${meta.snapshots.map(_.snapshotId).mkString(", ")})")))
      case None =>
        meta.currentSnapshotId.flatMap(c => meta.snapshots.find(_.snapshotId == c))
    }

  private def readAll(spark: SparkSession, path: String): Option[Array[Byte]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(in.readAllBytes()) finally in.close()
    }
  }

  /** Bounds maps decode as array-of-record (the Java/Go writers' map
    * encoding) or as a real Avro map keyed by stringified ids — accept
    * both so foreign manifests parse. */
  private def boundsOf(v: Any): Map[Int, Array[Byte]] = v match {
    case items: Seq[Any] @unchecked =>
      items.collect { case m: Map[String, Any] @unchecked =>
        (m.get("key"), m.get("value")) match {
          case (Some(k: Int), Some(b: Array[Byte])) => k -> b
          case (Some(k: Long), Some(b: Array[Byte])) => k.toInt -> b
          case _ => -1 -> Array.emptyByteArray
        }
      }.filter(_._1 >= 0).toMap
    case m: Map[String, Any] @unchecked =>
      m.collect { case (k, b: Array[Byte]) =>
        scala.util.Try(k.toInt).toOption.map(_ -> b)
      }.flatten.toMap
    case _ => Map.empty
  }

  /** The live data files at a snapshot (current unless `asOfSnapshotId`
    * time-travels): the snapshot's manifest LIST is the complete state
    * — appends carry prior manifests forward into every new list, per
    * the Iceberg spec — and DELETED (status=2) entries drop out. */
  def dataFiles(spark: SparkSession, tableDir: String,
                asOfSnapshotId: Option[Long] = None): Seq[FileEntry] = {
    val meta = metadata(spark, tableDir)
    resolveSnapshot(meta, asOfSnapshotId) match {
      case None => Seq.empty
      case Some(snap) =>
        val listBytes = readAll(spark, snap.manifestList).getOrElse(
          throw new IllegalArgumentException(
            s"manifest list ${snap.manifestList} missing"))
        val (_, manifests) = AvroOcf.read(listBytes)
        // merge-on-read DELETE manifests (content=1 in manifest_file)
        // would make a data-only scan silently resurrect deleted rows —
        // fail LOUD instead; this engine's own commits are append-only
        // (the reference exporter never deletes), so this only fires on
        // foreign tables that genuinely need a delete-applying reader
        manifests.foreach { case m: Map[String, Any] @unchecked =>
          if (m.get("content").exists(c => c != null && c != 0))
            throw new UnsupportedOperationException(
              s"table has DELETE manifests (${m("manifest_path")}); " +
                "merge-on-read is not supported by this cold reader")
        }
        manifests.flatMap { case m: Map[String, Any] @unchecked =>
          val mpath = m("manifest_path").asInstanceOf[String]
          val mb = readAll(spark, mpath).getOrElse(
            throw new IllegalArgumentException(s"manifest $mpath missing"))
          val (_, entries) = AvroOcf.read(mb)
          entries.collect {
            case e: Map[String, Any] @unchecked if !e.get("status").contains(2) =>
              e.get("data_file").collect {
                case df: Map[String, Any] @unchecked =>
                  FileEntry(
                    path = df("file_path").asInstanceOf[String],
                    recordCount = df.get("record_count")
                      .collect { case l: Long => l }.getOrElse(0L),
                    sizeBytes = df.get("file_size_in_bytes")
                      .collect { case l: Long => l }.getOrElse(0L),
                    snapshotId = e.get("snapshot_id")
                      .collect { case l: Long => l }.getOrElse(snap.snapshotId),
                    lowerBounds = df.get("lower_bounds").map(boundsOf)
                      .getOrElse(Map.empty),
                    upperBounds = df.get("upper_bounds").map(boundsOf)
                      .getOrElse(Map.empty))
              }
          }.flatten
        }
    }
  }

  /** Top-level field id of `column` in the table's CURRENT schema —
    * the key into the bounds maps. */
  def fieldId(meta: TableMetadata, column: String): Int =
    (parse(meta.schemaJson) \ "fields").toOption.collect {
      case JArray(fs) => fs.collectFirst {
        case f if (f \ "name").toOption.contains(JString(column)) =>
          (f \ "id") match { case JInt(n) => n.toInt; case _ => -1 }
      }
    }.flatten.filter(_ >= 0).getOrElse(
      throw new IllegalArgumentException(
        s"column $column not in table schema"))

  /** Read the table cold at a snapshot. Schema comes from the parquet
    * files themselves (the committed schema and the footers agree —
    * RestCatalogSpec's field-id test pins that). An empty snapshot is
    * an empty frame. */
  def read(spark: SparkSession, tableDir: String,
           asOfSnapshotId: Option[Long] = None): DataFrame = {
    val files = dataFiles(spark, tableDir, asOfSnapshotId)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(_.path): _*)
  }

  /** INCREMENTAL cold read: exactly the rows ADDED between two
    * snapshots — the nightly-delta shape ([[graft.recovery.VersionedManifest.readIncremental]]
    * through the real Iceberg chain): the file-set difference of the
    * two snapshots' manifest lists. For the append-only tables this
    * engine writes, that is precisely the later appends' files; a
    * rewrite (same rows, new files) would appear as its new files, as
    * in Iceberg's own incremental-append scan. `fromSnapshotId` is
    * EXCLUSIVE, `toSnapshotId` (default current) inclusive. */
  def readIncremental(spark: SparkSession, tableDir: String,
                      fromSnapshotId: Long,
                      toSnapshotId: Option[Long] = None): DataFrame = {
    val before = dataFiles(spark, tableDir, Some(fromSnapshotId))
      .map(_.path).toSet
    val after = dataFiles(spark, tableDir, toSnapshotId)
    val fresh = after.filterNot(f => before(f.path))
    if (fresh.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(fresh.map(_.path): _*)
  }

  /** Cold time-slice read with MANIFEST-STATS pruning: only files
    * whose `[lower, upper]` range for `column` (Iceberg single-value
    * longs — micros for timestamps) intersects `[startUs, endUs)` are
    * opened; files without stats are kept (can't prune what isn't
    * claimed). Row-level residual filter applied after the scan —
    * same two-phase shape as
    * [[graft.recovery.VersionedManifest.readSliceAt]]. */
  def readSlice(spark: SparkSession, tableDir: String, column: String,
                startUs: Long, endUs: Long,
                asOfSnapshotId: Option[Long] = None): DataFrame = {
    val meta = metadata(spark, tableDir)
    val fid = fieldId(meta, column)
    val files = dataFiles(spark, tableDir, asOfSnapshotId).filter { f =>
      (f.lowerBounds.get(fid), f.upperBounds.get(fid)) match {
        case (Some(lo), Some(hi)) =>
          val l = IcebergSingleValue.longOf(lo)
          val h = IcebergSingleValue.longOf(hi)
          h >= startUs && l < endUs
        case _ => true // no stats → cannot prune
      }
    }
    if (files.isEmpty) return spark.emptyDataFrame
    val df = spark.read.parquet(files.map(_.path): _*)
    val c =
      if (df.schema(column).dataType == TimestampType) unix_micros(col(column))
      else col(column).cast("long")
    df.filter(c >= startUs && c < endUs)
  }
}
