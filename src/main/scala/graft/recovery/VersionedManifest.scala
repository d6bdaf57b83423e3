package graft.recovery

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  def currentVersion(spark: SparkSession, manifestDir: String): Long = {
    val p = versionPath(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Commit the CURRENT storage state as the next snapshot: lists the
    * table's data files, writes manifest-v{N}, swaps the pointer.
    * Returns the new version. */
  def commit(spark: SparkSession, tablePath: String, manifestDir: String): Long = {
    val next = currentVersion(spark, manifestDir) + 1
    Recovery.listDataFiles(spark, tablePath)
      .withColumn("snapshot_id", lit(next))
      .coalesce(1)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$manifestDir/manifest-v$next")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = versionPath(manifestDir).getFileSystem(conf)
    val tmp = new Path(s"$manifestDir/VERSION.tmp")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(versionPath(manifestDir))) fs.delete(versionPath(manifestDir), false)
    fs.rename(tmp, versionPath(manifestDir))
    next
  }

  /** The file list at a snapshot (default: the current pointer). */
  def filesAt(spark: SparkSession, manifestDir: String,
              version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, manifestDir))
    spark.read.parquet(s"$manifestDir/manifest-v$v")
  }

  /** Time-travel read: the table exactly as of snapshot `version`. */
  def readAt(spark: SparkSession, tablePath: String, manifestDir: String,
             version: Option[Long] = None): DataFrame = {
    val files = filesAt(spark, manifestDir, version)
      .select("file_path").collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(tablePath).limit(0)
    else spark.read.option("basePath", tablePath).parquet(files.toIndexedSeq: _*)
  }
}
