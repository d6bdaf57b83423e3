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

  /** Orphans = files present in storage but absent from the manifest. */
  def scanOrphans(spark: SparkSession, tablePath: String,
                  manifest: DataFrame): DataFrame =
    listDataFiles(spark, tablePath)
      .join(manifest.select(col("file_path")), Seq("file_path"), "left_anti")

  /** Register orphans into the manifest; dedup on path makes re-runs
    * idempotent (reconciler.go's re-register semantics). */
  def reconcile(spark: SparkSession, tablePath: String,
                manifestPath: String): DataFrame = {
    import spark.implicits._
    val existing =
      try spark.read.parquet(manifestPath)
      catch { case _: Throwable => Seq.empty[(String, Long)].toDF("file_path", "file_size") }
    val merged = existing
      .unionByName(scanOrphans(spark, tablePath, existing))
      .dropDuplicates("file_path")
    // Materialize before overwriting the same path we read from (the
    // manifest is file metadata — tiny relative to the data it tracks).
    val rows = merged.collect().toIndexedSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), merged.schema)
      .write.mode(SaveMode.Overwrite).parquet(manifestPath)
    // Drop the stale FileStatusCache listing for the overwritten path.
    spark.catalog.refreshByPath(manifestPath)
    spark.read.parquet(manifestPath)
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
}
