package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.json4s.jackson.JsonMethods.{compact => jcompact, render}

import graft.catalog.{IcebergMaintenance, IcebergTableMetadata,
  RestCatalogClient}

/** EXACTLY-ONCE streaming CDC into the Iceberg merge-on-read chain —
  * the streaming twin of [[graft.catalog.IcebergMaintenance.upsert]]
  * and the MOR upgrade over [[StreamingIngest.cdcApply]] (which
  * rewrites files copy-on-write per batch): each micro-batch of keyed
  * changes lands as ONE `overwrite` snapshot (equality-delete +
  * append), so per-batch write cost is O(|batch|) regardless of table
  * size and every batch boundary is a time-travelable snapshot a
  * downstream [[graft.catalog.IcebergTableReader.readChangelog]]
  * consumer can tail.
  *
  * Exactly-once without a transaction coordinator: foreachBatch is
  * at-least-once (a crash between the sink commit and the checkpoint
  * write replays the batch), so each snapshot records its epoch in the
  * summary (`graft.batch_id`) and a replayed batch is detected on the
  * chain itself and skipped — the same dedup-on-the-destination
  * discipline as the reference's idempotent path-keyed manifest
  * registration (exporter.go retry path), applied to snapshot epochs.
  * A crash BEFORE the commit leaves only unreferenced data files
  * (never a partial snapshot — the metadata version flip is atomic),
  * which standard orphan-file maintenance reclaims. */
object IcebergCdcSink {

  /** Apply one CDC micro-batch: bootstrap the chain on first contact,
    * skip if `batchId` is already on it, else upsert. Returns true if
    * the batch was applied, false if it was a detected replay. */
  def applyBatch(spark: SparkSession, tableDir: String, batch: DataFrame,
                 batchId: Long, keyCols: Seq[String],
                 statsColumn: Option[String] = None): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = IcebergTableMetadata.load(conf, tableDir)
    val replay = meta.exists(_.snapshots.exists(
      _.summary.get("graft.batch_id").contains(batchId.toString)))
    if (replay) return false
    if (meta.isEmpty) {
      val (schemaJson, _) = RestCatalogClient.icebergSchemaJson(batch.schema)
      IcebergTableMetadata.commit(conf, tableDir,
        jcompact(render(schemaJson)), None, None)
    }
    // pin the batch: the upsert reads `updates` twice (data + keys)
    val delta = batch.localCheckpoint()
    IcebergMaintenance.upsert(spark, tableDir, delta, keyCols, statsColumn,
      extraSummary = Map("graft.batch_id" -> batchId.toString))
    true
  }

  /** Continuous keyed-change apply: `changes` rows upsert into the
    * Iceberg table at `tableDir` by `keyCols`, one snapshot per
    * micro-batch, exactly-once across restarts (checkpoint resume +
    * [[applyBatch]] replay detection). */
  def cdcApply(changes: DataFrame, tableDir: String, checkpoint: String,
               keyCols: Seq[String],
               statsColumn: Option[String] = None): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch.sparkSession, tableDir, batch, id, keyCols,
          statsColumn)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
