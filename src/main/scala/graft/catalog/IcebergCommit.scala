package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s.{JInt, JValue}

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

  private def writeFile(conf: Configuration, path: String,
                        bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** The parent manifest list's entries as records to CARRY FORWARD
    * (per the spec a snapshot's list is the complete table state).
    * Pre-Avro legacy parent lists contribute nothing. */
  private def carriedEntries(conf: Configuration,
                             parentList: Option[String]): Seq[AvroOcf.AVal] =
    parentList.toSeq.flatMap { prev =>
      val p = new Path(prev)
      val fs = p.getFileSystem(conf)
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

  /** Serialize the DATA manifest for `files` (content="data").
    * `specId` is the table spec the tuples were derived under — the
    * reader resolves each manifest's tuple layout from THIS stamp (and
    * the embedded `partition-spec` fields), so files written before a
    * partition-spec evolution keep pruning under their original
    * transform. */
  private def dataManifestBytes(schemaJson: String, snapId: Long,
                                files: Seq[DataFile],
                                partFields: Seq[IcebergPartitioning.PartField],
                                specId: Int)
      : Array[Byte] = {
    val partTypes = partFields.map(p => IcebergPartitioning.avroType(p.transform))
    AvroOcf.write(
      AvroOcf.manifestEntrySchema(partFields.zip(partTypes).map {
        case (p, t) => (p.name, t, p.fieldId) }),
      Map("schema" -> schemaJson, "schema-id" -> "0",
          "partition-spec" -> IcebergPartitioning.specFieldsJson(partFields),
          "partition-spec-id" -> specId.toString,
          "format-version" -> "2", "content" -> "data"),
      files.map { f =>
        val tuple =
          if (partFields.isEmpty) AvroOcf.ARec(Nil)
          else {
            // explicit tuple wins; else derive from the file's OWN
            // column stats — a granularity-partitioned sink always
            // lands each file in one partition, so min==max under the
            // transform and the tuple is exact (straddlers get null =
            // never pruned). One choke point means every commit path
            // (streaming delivery, recovery CLI, compaction) writes
            // real tuples without carrying partition math around.
            val vals =
              if (f.partition.nonEmpty) f.partition.padTo(partFields.length, None)
              else IcebergPartitioning.valuesForFile(partFields,
                f.bounds.map { case (id, lo, hi) =>
                  id -> (IcebergSingleValue.longOf(lo),
                    IcebergSingleValue.longOf(hi)) }.toMap)
            AvroOcf.partitionTuple(partTypes, vals)
          }
        AvroOcf.manifestEntry(snapId, f, tuple)
      })
  }

  /** Serialize a DELETES manifest (content="deletes", entries with
    * explicit sequence numbers, all-null partition tuple = table-wide). */
  private def deleteManifestBytes(schemaJson: String, snapId: Long,
                                  seqNum: Long, deletes: Seq[DeleteFileSpec],
                                  partFields: Seq[IcebergPartitioning.PartField],
                                  specId: Int)
      : Array[Byte] = {
    val partTypes = partFields.map(p => IcebergPartitioning.avroType(p.transform))
    val nullTuple =
      if (partFields.isEmpty) AvroOcf.ARec(Nil)
      else AvroOcf.partitionTuple(partTypes, partFields.map(_ => None))
    AvroOcf.write(
      AvroOcf.manifestEntrySchema(partFields.zip(partTypes).map {
        case (p, t) => (p.name, t, p.fieldId) }),
      Map("schema" -> schemaJson, "schema-id" -> "0",
          "partition-spec" -> IcebergPartitioning.specFieldsJson(partFields),
          "partition-spec-id" -> specId.toString,
          "format-version" -> "2", "content" -> "deletes"),
      deletes.map(d => AvroOcf.deleteManifestEntry(
        snapId, seqNum, d.file, d.content, d.equalityIds, nullTuple)))
  }

  private def writeList(conf: Configuration, location: String, snapId: Long,
                        seqNum: Long, parentSnapshotId: Option[Long],
                        entries: Seq[AvroOcf.AVal]): String = {
    val listPath = s"$location/metadata/snap-$snapId-1-graft.avro"
    writeFile(conf, listPath, AvroOcf.write(
      AvroOcf.ManifestListSchema,
      Map("snapshot-id" -> snapId.toString,
          "parent-snapshot-id" ->
            parentSnapshotId.map(_.toString).getOrElse("null"),
          "sequence-number" -> seqNum.toString,
          "format-version" -> "2"),
      entries))
    listPath
  }

  /** Write the manifest for `files` and a manifest LIST that carries
    * forward every entry of `parentList`, returning
    * (manifestPath, listPath). */
  def writeManifests(conf: Configuration, location: String,
                     schemaJson: String, snapId: Long, seqNum: Long,
                     parentSnapshotId: Option[Long],
                     parentList: Option[String],
                     files: Seq[DataFile],
                     partFields: Seq[IcebergPartitioning.PartField] = Nil,
                     specId: Int = 0)
      : (String, String) = {
    val manifestPath = s"$location/metadata/graft-m-$snapId.avro"
    val manifestBytes =
      dataManifestBytes(schemaJson, snapId, files, partFields, specId)
    writeFile(conf, manifestPath, manifestBytes)
    val listPath = writeList(conf, location, snapId, seqNum, parentSnapshotId,
      AvroOcf.manifestListEntry(manifestPath, manifestBytes.length.toLong,
        seqNum, snapId, files.size, files.map(_.recordCount).sum,
        specId = specId) +:
        carriedEntries(conf, parentList))
    (manifestPath, listPath)
  }

  /** Catalog-FREE append commit: manifests + the vN.metadata.json chain
    * only. Parent/sequence state comes from the on-disk chain itself —
    * single-writer semantics (the chain has no optimistic lock; a
    * catalog is the thing that arbitrates concurrent writers). Returns
    * the new snapshot id. */
  /** The (spec-id, fields) manifests for this table must be written
    * with: the explicit `defaultSpec` argument wins, else the chain's
    * recorded default spec (so maintenance commits passing None
    * inherit the declared partitioning). The id comes from the SAME
    * resolution [[IcebergTableMetadata.commit]] will apply — a spec
    * structurally present in the chain reuses its id, a new one gets
    * the id the metadata commit is about to assign — so the manifest
    * stamp and the chain's `partition-specs` entry always agree. */
  private def partFieldsFor(prev: Option[IcebergTableMetadata.TableMetadata],
                            defaultSpec: Option[JValue])
      : (Int, Seq[IcebergPartitioning.PartField]) = {
    val (specs, id) = IcebergTableMetadata.resolveSpec(prev, defaultSpec)
    val fields = specs.find(sp =>
      (sp \ "spec-id").toOption.contains(JInt(id)))
      .map(IcebergPartitioning.fieldsOf).getOrElse(Nil)
    (id, fields)
  }

  /** `branch` stages the append on that ref instead of main (the
    * write-audit-publish pattern): the new snapshot's parent is the
    * branch head — a branch with no prior commits forks implicitly
    * from main's current state — and `current-snapshot-id` (what plain
    * reads see) does not move until a fast-forward publishes it. */
  def commitStandalone(conf: Configuration, location: String,
                       schemaJson: String, defaultSpec: Option[JValue],
                       files: Seq[DataFile], branch: String = "main"): Long = {
    val prev = IcebergTableMetadata.load(conf, location)
    val snapId = System.nanoTime()
    val seqNum = prev.map(_.lastSequenceNumber).getOrElse(0L) + 1
    val parentId = prev.flatMap(p =>
      p.refs.get(branch).map(_.snapshotId).orElse(p.currentSnapshotId))
    val parentList = for {
      p <- prev; id <- parentId
      s <- p.snapshots.find(_.snapshotId == id)
    } yield s.manifestList
    val (sid, pf) = partFieldsFor(prev, defaultSpec)
    val (_, listPath) = writeManifests(conf, location, schemaJson,
      snapId, seqNum, parentId, parentList, files, pf, sid)
    IcebergTableMetadata.commit(conf, location, schemaJson, defaultSpec,
      Some(IcebergTableMetadata.SnapshotMeta(
        snapId, parentId, seqNum, System.currentTimeMillis(), listPath,
        Map("operation" -> "append",
            "otel.record_count" -> files.map(_.recordCount).sum.toString,
            "otel.file_size" -> files.map(_.sizeBytes).sum.toString,
            "otel.file_count" -> files.size.toString))),
      branch = branch)
    snapId
  }

  /** One DELETE file for a row-level delete commit: `content` 1 =
    * position deletes (`file_path`/`pos` parquet), 2 = equality
    * deletes over the schema columns with ids `equalityIds`. */
  final case class DeleteFileSpec(file: DataFile, content: Int,
                                  equalityIds: Seq[Int] = Nil) {
    require(content == 1 || content == 2,
      s"delete content must be 1 (position) or 2 (equality), got $content")
    require(content == 1 || equalityIds.nonEmpty,
      "equality deletes must name their equality_ids")
  }

  /** Catalog-FREE row-level DELETE commit (Iceberg v2 merge-on-read,
    * the write side of [[IcebergTableReader]]'s delete application):
    * a DELETES manifest (manifest_file.content=1, entries with
    * explicit sequence numbers) + a carry-forward list, operation
    * "delete". No data file is touched — this is the
    * right-to-be-forgotten shape for a 100 TB corpus: the commit cost
    * is the delete set, not the table. Fails if the table does not
    * exist yet (a delete needs something to delete from). */
  def commitStandaloneDeletes(conf: Configuration, location: String,
                              schemaJson: String, defaultSpec: Option[JValue],
                              deletes: Seq[DeleteFileSpec]): Long = {
    val prev = IcebergTableMetadata.load(conf, location).getOrElse(
      throw new IllegalArgumentException(
        s"no Iceberg table at $location to delete from"))
    val snapId = System.nanoTime()
    val seqNum = prev.lastSequenceNumber + 1
    val parentId = prev.currentSnapshotId
    // delete files apply table-wide: same tuple schema as the data
    // manifests (readers expect one r102 shape per spec), all-null
    // values (spec: null partition value = not partition-scoped)
    val (sid, partFields) = partFieldsFor(Some(prev), defaultSpec)
    val manifestPath = s"$location/metadata/graft-d-$snapId.avro"
    val manifestBytes =
      deleteManifestBytes(schemaJson, snapId, seqNum, deletes, partFields, sid)
    writeFile(conf, manifestPath, manifestBytes)
    val parentList = for {
      id <- parentId; s <- prev.snapshots.find(_.snapshotId == id)
    } yield s.manifestList
    val listPath = writeList(conf, location, snapId, seqNum, parentId,
      AvroOcf.manifestListEntry(manifestPath, manifestBytes.length.toLong,
        seqNum, snapId, deletes.size,
        deletes.map(_.file.recordCount).sum, content = 1, specId = sid) +:
        carriedEntries(conf, parentList))
    IcebergTableMetadata.commit(conf, location, schemaJson, defaultSpec,
      Some(IcebergTableMetadata.SnapshotMeta(
        snapId, parentId, seqNum, System.currentTimeMillis(), listPath,
        Map("operation" -> "delete",
            "otel.delete_record_count" ->
              deletes.map(_.file.recordCount).sum.toString,
            "otel.delete_file_count" -> deletes.size.toString))))
    snapId
  }

  /** Catalog-FREE UPSERT commit (the Iceberg v2 merge-on-read MERGE
    * shape): ONE snapshot whose manifest list carries BOTH an
    * equality-DELETES manifest and a fresh DATA manifest at the same
    * sequence number, plus the carried parent state. The v2 sequence
    * rules make this atomic-by-construction: equality deletes apply
    * STRICTLY BELOW their sequence number, so they retire every
    * pre-existing row whose key tuple matches while the new data files
    * — committed AT that sequence number — are untouched. A reader
    * either sees the parent snapshot or the fully-merged state; there
    * is no intermediate. Operation "overwrite" (the spec's name for a
    * snapshot that both adds and logically removes rows). */
  /** The upsert snapshot's manifest layout, shared by the catalog-free
    * chain ([[commitStandaloneUpsert]]) and the REST-cataloged verb
    * ([[RestCatalogClient.upsertFiles]]): one ADDED data manifest, one
    * delete manifest (equality deletes at the same sequence number —
    * they retire rows strictly below it), and a manifest list that
    * carries every prior manifest forward. Returns the list path. */
  def writeUpsertManifests(conf: Configuration, location: String,
                           schemaJson: String, snapId: Long, seqNum: Long,
                           parentSnapshotId: Option[Long],
                           parentList: Option[String],
                           files: Seq[DataFile],
                           deletes: Seq[DeleteFileSpec],
                           partFields: Seq[IcebergPartitioning.PartField],
                           specId: Int): String = {
    val dataPath = s"$location/metadata/graft-m-$snapId.avro"
    val dataBytes =
      dataManifestBytes(schemaJson, snapId, files, partFields, specId)
    writeFile(conf, dataPath, dataBytes)
    val delPath = s"$location/metadata/graft-d-$snapId.avro"
    val delBytes =
      deleteManifestBytes(schemaJson, snapId, seqNum, deletes, partFields,
        specId)
    writeFile(conf, delPath, delBytes)
    writeList(conf, location, snapId, seqNum, parentSnapshotId,
      AvroOcf.manifestListEntry(dataPath, dataBytes.length.toLong,
        seqNum, snapId, files.size, files.map(_.recordCount).sum,
        specId = specId) +:
      AvroOcf.manifestListEntry(delPath, delBytes.length.toLong,
        seqNum, snapId, deletes.size,
        deletes.map(_.file.recordCount).sum, content = 1, specId = specId) +:
        carriedEntries(conf, parentList))
  }

  def commitStandaloneUpsert(conf: Configuration, location: String,
                             schemaJson: String, defaultSpec: Option[JValue],
                             files: Seq[DataFile],
                             deletes: Seq[DeleteFileSpec],
                             extraSummary: Map[String, String] = Map.empty)
      : Long = {
    require(deletes.forall(_.content == 2),
      "upsert retires prior rows via EQUALITY deletes (content=2); " +
        "position deletes cannot target rows committed in the same snapshot")
    val prev = IcebergTableMetadata.load(conf, location).getOrElse(
      throw new IllegalArgumentException(
        s"no Iceberg table at $location to upsert into"))
    val snapId = System.nanoTime()
    val seqNum = prev.lastSequenceNumber + 1
    val parentId = prev.currentSnapshotId
    val (sid, partFields) = partFieldsFor(Some(prev), defaultSpec)
    val parentList = for {
      id <- parentId; s <- prev.snapshots.find(_.snapshotId == id)
    } yield s.manifestList
    val listPath = writeUpsertManifests(conf, location, schemaJson,
      snapId, seqNum, parentId, parentList, files, deletes, partFields, sid)
    IcebergTableMetadata.commit(conf, location, schemaJson, defaultSpec,
      Some(IcebergTableMetadata.SnapshotMeta(
        snapId, parentId, seqNum, System.currentTimeMillis(), listPath,
        Map("operation" -> "overwrite",
            "otel.record_count" -> files.map(_.recordCount).sum.toString,
            "otel.file_count" -> files.size.toString,
            "otel.delete_record_count" ->
              deletes.map(_.file.recordCount).sum.toString) ++ extraSummary)))
    snapId
  }

  /** Catalog-FREE REPLACE commit (compaction's snapshot): the new
    * manifest list contains ONLY the fresh data manifest — no
    * carry-forward — so prior data AND delete manifests fall out of
    * the live state while old snapshots keep time-traveling through
    * their own (untouched) lists. Operation "replace". */
  def commitStandaloneReplace(conf: Configuration, location: String,
                              schemaJson: String, defaultSpec: Option[JValue],
                              files: Seq[DataFile]): Long = {
    val prev = IcebergTableMetadata.load(conf, location).getOrElse(
      throw new IllegalArgumentException(
        s"no Iceberg table at $location to replace"))
    val snapId = System.nanoTime()
    val seqNum = prev.lastSequenceNumber + 1
    val parentId = prev.currentSnapshotId
    val (sid, pf) = partFieldsFor(Some(prev), defaultSpec)
    val (_, listPath) = writeManifests(conf, location, schemaJson,
      snapId, seqNum, parentId, parentList = None, files, pf, sid)
    IcebergTableMetadata.commit(conf, location, schemaJson, defaultSpec,
      Some(IcebergTableMetadata.SnapshotMeta(
        snapId, parentId, seqNum, System.currentTimeMillis(), listPath,
        Map("operation" -> "replace",
            "otel.record_count" -> files.map(_.recordCount).sum.toString,
            "otel.file_count" -> files.size.toString))))
    snapId
  }

  /** One data file carried through a manifest REWRITE: the file, its
    * ORIGINAL data sequence number and adding snapshot, and its
    * partition tuple in its spec's field order. */
  final case class RewriteDataEntry(file: DataFile, sequenceNumber: Long,
                                    snapshotId: Long,
                                    tuple: Seq[Option[Long]])

  /** One delete file carried through a manifest rewrite. */
  final case class RewriteDeleteEntry(file: DataFile, content: Int,
                                      equalityIds: Seq[Int],
                                      sequenceNumber: Long,
                                      snapshotId: Long)

  /** Catalog-FREE manifest REWRITE commit (the metadata-side
    * compaction — Iceberg's RewriteManifests): the live file set,
    * UNCHANGED, reorganized into one data manifest PER SPEC (manifests
    * cannot mix partition tuple layouts) plus at most one deletes
    * manifest, written as EXISTING entries that keep their original
    * sequence numbers and adding snapshots — so merge-on-read
    * strictly-below ordering and changelog attribution survive. The
    * new list carries NOTHING forward (it IS the complete reorganized
    * state); old snapshots keep time-traveling through their own
    * lists. Operation "replace" (the spec's name for snapshots that
    * reorganize without logical change). At 100 TB this is what keeps
    * planning O(manifests) after thousands of streaming micro-batch
    * appends each left a tiny manifest behind. */
  def commitStandaloneRewriteManifests(
      conf: Configuration, location: String, schemaJson: String,
      dataGroups: Seq[(Int, Seq[IcebergPartitioning.PartField],
                       Seq[RewriteDataEntry])],
      deletes: Seq[RewriteDeleteEntry],
      deleteSpec: (Int, Seq[IcebergPartitioning.PartField]) = (0, Nil),
      addedFiles: Seq[DataFile] = Nil,
      addedSpec: (Int, Seq[IcebergPartitioning.PartField]) = (0, Nil))
      : Long = {
    val prev = IcebergTableMetadata.load(conf, location).getOrElse(
      throw new IllegalArgumentException(
        s"no Iceberg table at $location to rewrite"))
    val snapId = System.nanoTime()
    val seqNum = prev.lastSequenceNumber + 1
    val parentId = prev.currentSnapshotId
    val listEntries = Seq.newBuilder[AvroOcf.AVal]
    // ADDED files first (rewrite_data_files' fresh bin-packed outputs):
    // a normal ADDED manifest whose entries inherit the new snapshot's
    // sequence number — strictly above every live delete, so existing
    // equality deletes (already applied during the rewrite read) never
    // re-apply to the rewritten rows.
    if (addedFiles.nonEmpty) {
      val (sid, pf) = addedSpec
      val bytes = dataManifestBytes(schemaJson, snapId, addedFiles, pf, sid)
      val path = s"$location/metadata/graft-rwa-$snapId.avro"
      writeFile(conf, path, bytes)
      listEntries += AvroOcf.manifestListEntry(path, bytes.length.toLong,
        seqNum, snapId, addedFiles = addedFiles.size,
        addedRows = addedFiles.map(_.recordCount).sum, specId = sid)
    }
    dataGroups.zipWithIndex.foreach { case ((sid, pf, entries), gi) =>
      val partTypes = pf.map(p => IcebergPartitioning.avroType(p.transform))
      val bytes = AvroOcf.write(
        AvroOcf.manifestEntrySchema(pf.zip(partTypes).map {
          case (p, t) => (p.name, t, p.fieldId) }),
        Map("schema" -> schemaJson, "schema-id" -> "0",
            "partition-spec" -> IcebergPartitioning.specFieldsJson(pf),
            "partition-spec-id" -> sid.toString,
            "format-version" -> "2", "content" -> "data"),
        entries.map { e =>
          val tuple =
            if (pf.isEmpty) AvroOcf.ARec(Nil)
            else AvroOcf.partitionTuple(partTypes,
              e.tuple.padTo(pf.length, None))
          AvroOcf.existingManifestEntry(e.snapshotId, e.sequenceNumber,
            e.file, content = 0, partition = tuple)
        })
      val path = s"$location/metadata/graft-rw-$snapId-$gi.avro"
      writeFile(conf, path, bytes)
      listEntries += AvroOcf.manifestListEntry(path, bytes.length.toLong,
        seqNum, snapId, addedFiles = 0, addedRows = 0L, specId = sid,
        minSequenceNumber =
          Some(entries.map(_.sequenceNumber).foldLeft(seqNum)(math.min)),
        existingFiles = entries.size,
        existingRows = entries.map(_.file.recordCount).sum)
    }
    if (deletes.nonEmpty) {
      val (sid, pf) = deleteSpec
      val partTypes = pf.map(p => IcebergPartitioning.avroType(p.transform))
      val nullTuple =
        if (pf.isEmpty) AvroOcf.ARec(Nil)
        else AvroOcf.partitionTuple(partTypes, pf.map(_ => None))
      val bytes = AvroOcf.write(
        AvroOcf.manifestEntrySchema(pf.zip(partTypes).map {
          case (p, t) => (p.name, t, p.fieldId) }),
        Map("schema" -> schemaJson, "schema-id" -> "0",
            "partition-spec" -> IcebergPartitioning.specFieldsJson(pf),
            "partition-spec-id" -> sid.toString,
            "format-version" -> "2", "content" -> "deletes"),
        deletes.map(d => AvroOcf.existingManifestEntry(d.snapshotId,
          d.sequenceNumber, d.file, d.content, d.equalityIds, nullTuple)))
      val path = s"$location/metadata/graft-rwd-$snapId.avro"
      writeFile(conf, path, bytes)
      listEntries += AvroOcf.manifestListEntry(path, bytes.length.toLong,
        seqNum, snapId, addedFiles = 0, addedRows = 0L, content = 1,
        specId = sid,
        minSequenceNumber =
          Some(deletes.map(_.sequenceNumber).foldLeft(seqNum)(math.min)),
        existingFiles = deletes.size,
        existingRows = deletes.map(_.file.recordCount).sum)
    }
    val listPath =
      writeList(conf, location, snapId, seqNum, parentId, listEntries.result())
    IcebergTableMetadata.commit(conf, location, schemaJson, None,
      Some(IcebergTableMetadata.SnapshotMeta(
        snapId, parentId, seqNum, System.currentTimeMillis(), listPath,
        Map("operation" -> "replace",
            "graft.rewritten-data-manifests" -> dataGroups.size.toString,
            "graft.rewritten-delete-manifests" ->
              (if (deletes.nonEmpty) "1" else "0"),
            "otel.file_count" -> addedFiles.size.toString,
            "otel.record_count" ->
              addedFiles.map(_.recordCount).sum.toString))))
    snapId
  }
}
