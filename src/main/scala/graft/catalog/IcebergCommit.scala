package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s.JValue

import graft.catalog.RestCatalogClient.DataFile

/** Shared Iceberg APPEND mechanics — the Avro manifest + CARRY-FORWARD
  * manifest list write used by both the REST-catalog commit path
  * ([[RestCatalogClient.appendDataFiles]]) and the catalog-FREE
  * standalone commit below (the HadoopTables shape: chain + manifests
  * only, no service anywhere — the write-side twin of
  * [[IcebergTableReader]]'s cold read). */
object IcebergCommit {

  private def isAvro(b: Array[Byte]): Boolean =
    b.length > 4 && b(0) == 'O' && b(1) == 'b' && b(2) == 'j' && b(3) == 1

  /** Write the manifest for `files` and a manifest LIST that carries
    * forward every entry of `parentList` (per the spec a snapshot's
    * list is the complete table state), returning
    * (manifestPath, listPath). Pre-Avro legacy parent lists contribute
    * nothing (no manifest records to carry). */
  def writeManifests(conf: Configuration, location: String,
                     schemaJson: String, snapId: Long, seqNum: Long,
                     parentSnapshotId: Option[Long],
                     parentList: Option[String],
                     files: Seq[DataFile]): (String, String) = {
    val fs = new Path(location).getFileSystem(conf)
    def writeFile(path: String, bytes: Array[Byte]): Unit = {
      val out = fs.create(new Path(path), true)
      try out.write(bytes) finally out.close()
    }
    val manifestPath = s"$location/metadata/graft-m-$snapId.avro"
    val manifestBytes = AvroOcf.write(
      AvroOcf.ManifestEntrySchema,
      Map("schema" -> schemaJson, "schema-id" -> "0",
          "partition-spec" -> "[]", "partition-spec-id" -> "0",
          "format-version" -> "2", "content" -> "data"),
      files.map(f => AvroOcf.manifestEntry(snapId, f)))
    writeFile(manifestPath, manifestBytes)
    val carried: Seq[AvroOcf.AVal] = parentList.toSeq.flatMap { prev =>
      val p = new Path(prev)
      if (!fs.exists(p)) Nil
      else {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        if (!isAvro(bytes)) Nil
        else AvroOcf.read(bytes)._2.collect {
          case m: Map[String, Any] @unchecked => AvroOcf.manifestFileRecord(m)
        }
      }
    }
    val listPath = s"$location/metadata/snap-$snapId-1-graft.avro"
    writeFile(listPath, AvroOcf.write(
      AvroOcf.ManifestListSchema,
      Map("snapshot-id" -> snapId.toString,
          "parent-snapshot-id" ->
            parentSnapshotId.map(_.toString).getOrElse("null"),
          "sequence-number" -> seqNum.toString,
          "format-version" -> "2"),
      AvroOcf.manifestListEntry(manifestPath, manifestBytes.length.toLong,
        seqNum, snapId, files.size, files.map(_.recordCount).sum) +: carried))
    (manifestPath, listPath)
  }

  /** Catalog-FREE append commit: manifests + the vN.metadata.json chain
    * only. Parent/sequence state comes from the on-disk chain itself —
    * single-writer semantics (the chain has no optimistic lock; a
    * catalog is the thing that arbitrates concurrent writers). Returns
    * the new snapshot id. */
  def commitStandalone(conf: Configuration, location: String,
                       schemaJson: String, defaultSpec: Option[JValue],
                       files: Seq[DataFile]): Long = {
    val prev = IcebergTableMetadata.load(conf, location)
    val snapId = System.nanoTime()
    val seqNum = prev.map(_.lastSequenceNumber).getOrElse(0L) + 1
    val parentId = prev.flatMap(_.currentSnapshotId)
    val parentList = for {
      p <- prev; id <- p.currentSnapshotId
      s <- p.snapshots.find(_.snapshotId == id)
    } yield s.manifestList
    val (_, listPath) = writeManifests(conf, location, schemaJson,
      snapId, seqNum, parentId, parentList, files)
    IcebergTableMetadata.commit(conf, location, schemaJson, defaultSpec,
      Some(IcebergTableMetadata.SnapshotMeta(
        snapId, parentId, seqNum, System.currentTimeMillis(), listPath,
        Map("operation" -> "append",
            "otel.record_count" -> files.map(_.recordCount).sum.toString,
            "otel.file_size" -> files.map(_.sizeBytes).sum.toString,
            "otel.file_count" -> files.size.toString))))
    snapId
  }
}
