package graft.catalog

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** Hand-rolled Avro Object Container File writer/reader — just enough of
  * the PUBLIC Avro 1.x spec (file container + binary encoding) to write
  * Iceberg v2 manifest / manifest-list files other engines can read,
  * and to read back manifests written by any conforming engine. The
  * same dependency-free play as the r5 proto3 wire decoder
  * ([[graft.sources.OtelProtoSource]]): the format is public and
  * self-describing, and no Avro library ships in `build.sbt`.
  *
  * Behavioral reference: the reference exporter's commits go through
  * iceberg-go's transaction append, which writes real Avro manifests
  * (/root/reference/internal/iceberg/catalog_rest.go:292,345-358) and
  * reads them back via `snapshot.Manifests(fileIO)` (:421-446).
  *
  * Subset implemented (everything Iceberg metadata uses):
  *  - container: magic `Obj\x01`, file-metadata map (`avro.schema`,
  *    `avro.codec` + user pairs), 16-byte sync marker, data blocks of
  *    (count, byteLength, payload, sync);
  *  - encoding: zigzag-varint int/long, utf8 string, bytes, boolean,
  *    float/double (little-endian), null; records (schema field
  *    order); unions (zigzag branch index); arrays and maps (blocked,
  *    negative-count block-size form read but not written);
  *  - codecs: `null` written; `null` and `deflate` (raw, nowrap) read —
  *    the two Iceberg metadata codecs that need no extra libraries.
  *
  * WRITING is value-tagged ([[AVal]]) against a caller-supplied schema
  * JSON: the writer encodes exactly what it is handed, and conformance
  * with the declared schema is proven in RestCatalogSpec by decoding
  * with the REFERENCE implementation (org.apache.avro's
  * GenericDatumReader from the Spark classpath — test-side only).
  * READING is schema-driven off the embedded `avro.schema`, so
  * manifests from other writers (different field order, extra fields,
  * deflate codec) decode correctly into name → value maps.
  */
object AvroOcf {

  // ---------- value model for writing ----------

  sealed trait AVal
  case object ANull extends AVal
  /** Union branch: index within the declared union + payload. */
  final case class AUnion(branch: Int, v: AVal) extends AVal
  final case class ABool(v: Boolean) extends AVal
  final case class AInt(v: Int) extends AVal
  final case class ALong(v: Long) extends AVal
  final case class AFloat(v: Float) extends AVal
  final case class ADouble(v: Double) extends AVal
  final case class AStr(v: String) extends AVal
  final case class ABytes(v: Array[Byte]) extends AVal
  /** Record: values in schema field order. */
  final case class ARec(fields: Seq[AVal]) extends AVal
  final case class AArr(items: Seq[AVal]) extends AVal
  final case class AMap(entries: Seq[(String, AVal)]) extends AVal

  /** Shorthand for the ubiquitous `["null", T]` optional. */
  def opt(v: Option[AVal]): AVal = v match {
    case Some(x) => AUnion(1, x)
    case None    => AUnion(0, ANull)
  }

  // ---------- binary encoder ----------

  final class Encoder {
    private val out = new ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray

    def writeLong(n: Long): Unit = {
      var z = (n << 1) ^ (n >> 63) // zigzag
      while ((z & ~0x7FL) != 0) {
        out.write(((z & 0x7F) | 0x80).toInt)
        z >>>= 7
      }
      out.write(z.toInt)
    }
    def writeInt(n: Int): Unit = writeLong(n.toLong)
    def writeBool(b: Boolean): Unit = out.write(if (b) 1 else 0)
    def writeFloat(f: Float): Unit = {
      val b = java.lang.Float.floatToIntBits(f)
      out.write(b & 0xFF); out.write((b >> 8) & 0xFF)
      out.write((b >> 16) & 0xFF); out.write((b >> 24) & 0xFF)
    }
    def writeDouble(d: Double): Unit = {
      val b = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { out.write(((b >> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def writeBytes(b: Array[Byte]): Unit = { writeLong(b.length.toLong); out.write(b) }
    def writeString(s: String): Unit = writeBytes(s.getBytes(StandardCharsets.UTF_8))
    def writeRaw(b: Array[Byte]): Unit = out.write(b)

    def writeVal(v: AVal): Unit = v match {
      case ANull         => ()
      case AUnion(br, x) => writeLong(br.toLong); writeVal(x)
      case ABool(b)      => writeBool(b)
      case AInt(n)       => writeInt(n)
      case ALong(n)      => writeLong(n)
      case AFloat(f)     => writeFloat(f)
      case ADouble(d)    => writeDouble(d)
      case AStr(s)       => writeString(s)
      case ABytes(b)     => writeBytes(b)
      case ARec(fs)      => fs.foreach(writeVal)
      case AArr(items) =>
        if (items.nonEmpty) { writeLong(items.size.toLong); items.foreach(writeVal) }
        writeLong(0L)
      case AMap(entries) =>
        if (entries.nonEmpty) {
          writeLong(entries.size.toLong)
          entries.foreach { case (k, x) => writeString(k); writeVal(x) }
        }
        writeLong(0L)
    }
  }

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** One-block OCF (manifest files hold catalog-metadata-scale entry
    * counts; a single block keeps the writer simple and readers happy).
    * Sync marker is derived deterministically from the content hash —
    * the spec only requires the 16 bytes be consistent within the file. */
  def write(schemaJson: String, meta: Map[String, String],
            records: Seq[AVal]): Array[Byte] = {
    val body = new Encoder
    records.foreach(body.writeVal)
    val payload = body.bytes

    val md5 = java.security.MessageDigest.getInstance("MD5")
    md5.update(schemaJson.getBytes(StandardCharsets.UTF_8))
    md5.update(payload)
    val sync = md5.digest() // 16 bytes

    val out = new Encoder
    out.writeRaw(Magic)
    val pairs = (meta + ("avro.schema" -> schemaJson, "avro.codec" -> "null")).toSeq
    out.writeLong(pairs.size.toLong)
    pairs.foreach { case (k, v) =>
      out.writeString(k); out.writeBytes(v.getBytes(StandardCharsets.UTF_8))
    }
    out.writeLong(0L) // end of metadata map
    out.writeRaw(sync)
    if (records.nonEmpty) {
      out.writeLong(records.size.toLong)
      out.writeLong(payload.length.toLong)
      out.writeRaw(payload)
      out.writeRaw(sync)
    }
    out.bytes
  }

  // ---------- binary decoder (schema-driven) ----------

  final class Decoder(buf: Array[Byte], var pos: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private def need(n: Int): Unit =
      if (n < 0 || pos + n > end)
        throw new IllegalArgumentException(
          s"malformed Avro: need $n bytes at $pos/$end")
    def readByte(): Int = { need(1); val b = buf(pos) & 0xFF; pos += 1; b }
    def readLong(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        if (shift > 63) throw new IllegalArgumentException("varint too long")
        b = readByte(); acc |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1) // un-zigzag
    }
    def readInt(): Int = {
      val v = readLong()
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(s"int out of range: $v")
      v.toInt
    }
    def readBool(): Boolean = readByte() != 0
    def readFloat(): Float = {
      need(4)
      var b = 0; var i = 0
      while (i < 4) { b |= (buf(pos + i) & 0xFF) << (8 * i); i += 1 }
      pos += 4; java.lang.Float.intBitsToFloat(b)
    }
    def readDouble(): Double = {
      need(8)
      var b = 0L; var i = 0
      while (i < 8) { b |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; java.lang.Double.longBitsToDouble(b)
    }
    def readBytes(): Array[Byte] = {
      val n = readLong()
      if (n < 0 || n > end - pos)
        throw new IllegalArgumentException(s"bytes length $n out of range")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n.toInt)
      pos += n.toInt; r
    }
    def readString(): String = new String(readBytes(), StandardCharsets.UTF_8)
    def readFixed(n: Int): Array[Byte] = {
      need(n)
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; r
    }
    def atEnd: Boolean = pos >= end
  }

  /** Decode one value per the (parsed) Avro schema JSON. Records become
    * `Map[String, Any]`, arrays `Seq[Any]`, maps `Map[String, Any]`,
    * bytes `Array[Byte]`; named-type references are resolved against
    * the records seen so far in this file's schema. */
  def decode(dec: Decoder, schema: JValue,
             named: collection.mutable.Map[String, JValue]): Any = schema match {
    case JString(prim) => decodePrim(dec, prim, named)
    case JArray(branches) => // union
      val idx = dec.readInt()
      if (idx < 0 || idx >= branches.length)
        throw new IllegalArgumentException(s"union branch $idx/${branches.length}")
      decode(dec, branches(idx), named)
    case o: JObject =>
      (o \ "type") match {
        case JString("record") =>
          val name = (o \ "name") match { case JString(n) => n; case _ => "" }
          if (name.nonEmpty) named(name) = o
          val JArray(fields) = (o \ "fields"): @unchecked
          fields.map { f =>
            val JString(fn) = (f \ "name"): @unchecked
            fn -> decode(dec, f \ "type", named)
          }.toMap
        case JString("array") =>
          val items = Seq.newBuilder[Any]
          var n = dec.readLong()
          while (n != 0) {
            if (n < 0) { n = -n; dec.readLong() } // block byte-size form
            var i = 0L
            while (i < n) { items += decode(dec, o \ "items", named); i += 1 }
            n = dec.readLong()
          }
          items.result()
        case JString("map") =>
          val entries = Map.newBuilder[String, Any]
          var n = dec.readLong()
          while (n != 0) {
            if (n < 0) { n = -n; dec.readLong() }
            var i = 0L
            while (i < n) {
              entries += dec.readString() -> decode(dec, o \ "values", named)
              i += 1
            }
            n = dec.readLong()
          }
          entries.result()
        case JString("fixed") =>
          val JInt(size) = (o \ "size"): @unchecked
          dec.readFixed(size.toInt)
        case JString(prim) => decodePrim(dec, prim, named)
        case other =>
          throw new IllegalArgumentException(s"unsupported schema: $other")
      }
    case other => throw new IllegalArgumentException(s"unsupported schema: $other")
  }

  private def decodePrim(dec: Decoder, name: String,
                         named: collection.mutable.Map[String, JValue]): Any =
    name match {
      case "null"    => null
      case "boolean" => dec.readBool()
      case "int"     => dec.readInt()
      case "long"    => dec.readLong()
      case "float"   => dec.readFloat()
      case "double"  => dec.readDouble()
      case "string"  => dec.readString()
      case "bytes"   => dec.readBytes()
      case ref if named.contains(ref) => // named-type reference
        decode(dec, named(ref), named)
      case other => throw new IllegalArgumentException(s"unknown type: $other")
    }

  private def inflateRaw(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // avro deflate is nowrap
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated deflate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Whole-file read: (file metadata, records as decoded values). */
  def read(bytes: Array[Byte]): (Map[String, String], Seq[Any]) = {
    require(bytes.length > 20 && bytes(0) == 'O' && bytes(1) == 'b' &&
            bytes(2) == 'j' && bytes(3) == 1, "not an Avro object container file")
    val dec = new Decoder(bytes, 4, bytes.length)
    val meta = Map.newBuilder[String, String]
    var n = dec.readLong()
    while (n != 0) {
      if (n < 0) { n = -n; dec.readLong() }
      var i = 0L
      while (i < n) {
        meta += dec.readString() -> new String(dec.readBytes(), StandardCharsets.UTF_8)
        i += 1
      }
      n = dec.readLong()
    }
    val metaMap = meta.result()
    val schema = parse(metaMap.getOrElse("avro.schema",
      throw new IllegalArgumentException("missing avro.schema")))
    val codec = metaMap.getOrElse("avro.codec", "null")
    dec.readFixed(16) // sync marker
    val records = Seq.newBuilder[Any]
    while (!dec.atEnd) {
      val count = dec.readLong()
      val size = dec.readLong()
      if (size < 0 || size > bytes.length - dec.pos)
        throw new IllegalArgumentException(s"block size $size out of range")
      val raw = dec.readFixed(size.toInt)
      val payload = codec match {
        case "null"    => raw
        case "deflate" => inflateRaw(raw)
        case other =>
          throw new IllegalArgumentException(s"unsupported avro.codec: $other")
      }
      val bdec = new Decoder(payload)
      val named = collection.mutable.Map.empty[String, JValue]
      var i = 0L
      while (i < count) { records += decode(bdec, schema, named); i += 1 }
      dec.readFixed(16) // trailing sync
    }
    (metaMap, records.result())
  }

  // ---------- Iceberg v2 manifest schemas (public spec field-ids) ----------

  /** Iceberg v2 `manifest_file` Avro schema (the manifest LIST entry
    * type) — field names match the Java/Go implementations' Avro files
    * (`added_data_files_count` etc.), field-ids from the spec are
    * authoritative for conforming readers. */
  val ManifestListSchema: String = compact(render(parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_data_files_count","type":"int","field-id":504},
      |{"name":"existing_data_files_count","type":"int","field-id":505},
      |{"name":"deleted_data_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |  {"type":"record","name":"r508","fields":[
      |   {"name":"contains_null","type":"boolean","field-id":509},
      |   {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
      |   {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
      |   {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}]},
      |  "element-id":508}],"default":null,"field-id":507},
      |{"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519}
      |]}""".stripMargin)))

  /** Iceberg v2 `manifest_entry` Avro schema (the manifest file entry
    * type). Per-column `lower_bounds`/`upper_bounds` (spec field-ids
    * 125/128; the Java/Go writers' array-of-record map encoding with
    * key/value ids 126/127 and 129/130) carry min/max stats in the
    * Iceberg single-value binary serialization — a planner prunes
    * whole files from these WITHOUT opening a footer. Other optional
    * stats maps are omitted entirely — legal Avro/Iceberg (readers
    * resolve absent optional fields to null by field-id). */
  /** [[ManifestEntrySchema]] with a PARTITION TUPLE: `parts` =
    * (name, avroType, fieldId) per partition-spec field, each nullable
    * (a null tuple value = "spans partitions / unknown", never
    * pruned). Empty `parts` reproduces the unpartitioned r102. */
  def manifestEntrySchema(parts: Seq[(String, String, Int)]): String =
    if (parts.isEmpty) ManifestEntrySchema
    else {
      val fields = parts.map { case (n, t, id) =>
        s"""{"name":"$n","type":["null","$t"],"default":null,"field-id":$id}"""
      }.mkString(",")
      val anchor = """"name":"r102","fields":[]"""
      require(ManifestEntrySchema.contains(anchor),
        "manifest_entry schema anchor drifted")
      ManifestEntrySchema.replace(anchor,
        s""""name":"r102","fields":[$fields]""")
    }

  val ManifestEntrySchema: String = compact(render(parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      | {"name":"content","type":"int","field-id":134},
      | {"name":"file_path","type":"string","field-id":100},
      | {"name":"file_format","type":"string","field-id":101},
      | {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      | {"name":"record_count","type":"long","field-id":103},
      | {"name":"file_size_in_bytes","type":"long","field-id":104},
      | {"name":"lower_bounds","type":["null",{"type":"array","items":
      |  {"type":"record","name":"k126_v127","fields":[
      |   {"name":"key","type":"int","field-id":126},
      |   {"name":"value","type":"bytes","field-id":127}]},
      |  "logicalType":"map"}],"default":null,"field-id":125},
      | {"name":"upper_bounds","type":["null",{"type":"array","items":
      |  {"type":"record","name":"k129_v130","fields":[
      |   {"name":"key","type":"int","field-id":129},
      |   {"name":"value","type":"bytes","field-id":130}]},
      |  "logicalType":"map"}],"default":null,"field-id":128},
      | {"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132},
      | {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
      | {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
      |]},"field-id":2}
      |]}""".stripMargin)))

  private def boundsMap(bs: Seq[(Int, Array[Byte])]): AVal =
    if (bs.isEmpty) opt(None)
    else opt(Some(AArr(bs.map { case (id, b) => ARec(Seq(AInt(id), ABytes(b))) })))

  /** Partition TUPLE record for a (schema-aligned) sequence of
    * nullable values: `types` gives each field's Avro type ("int" or
    * "long"), `values` the transform results (None = null, never
    * pruned). Must align with the `parts` the manifest's
    * [[manifestEntrySchema]] was built from. */
  def partitionTuple(types: Seq[String], values: Seq[Option[Long]]): AVal = {
    require(types.length == values.length,
      s"partition tuple arity ${values.length} != spec arity ${types.length}")
    ARec(types.zip(values).map {
      case (_, None) => opt(None)
      case ("int", Some(v)) => opt(Some(AInt(v.toInt)))
      case (_, Some(v)) => opt(Some(ALong(v)))
    })
  }

  /** ADDED manifest entry for one data file (v2: sequence numbers null
    * → inherited from the manifest list / snapshot). `partition` must
    * match the schema the manifest is written with
    * ([[manifestEntrySchema]] / [[partitionTuple]]). */
  def manifestEntry(snapshotId: Long, file: RestCatalogClient.DataFile,
                    partition: AVal = ARec(Nil)): AVal =
    ARec(Seq(
      AInt(1),                        // status = ADDED
      opt(Some(ALong(snapshotId))),
      opt(None),                      // sequence_number (inherit)
      opt(None),                      // file_sequence_number (inherit)
      ARec(Seq(
        AInt(0),                      // content = data
        AStr(file.path),
        AStr("PARQUET"),
        partition,
        ALong(file.recordCount),
        ALong(file.sizeBytes),
        boundsMap(file.bounds.map { case (id, lo, _) => id -> lo }),
        boundsMap(file.bounds.map { case (id, _, hi) => id -> hi }),
        opt(None),                    // split_offsets
        opt(None),                    // equality_ids (data file: none)
        opt(None)))))                 // sort_order_id

  /** ADDED manifest entry for one DELETE file (Iceberg v2 row-level
    * deletes, spec "Delete Files"): `content` 1 = position deletes
    * (parquet of `file_path` id 2147483546 / `pos` id 2147483545),
    * 2 = equality deletes (parquet of the columns named by
    * `equalityIds`). The entry's sequence number is written EXPLICIT
    * (not inherited) because delete application is sequence-keyed:
    * position deletes hit data files with seq <= theirs, equality
    * deletes strictly <. */
  def deleteManifestEntry(snapshotId: Long, sequenceNumber: Long,
                          file: RestCatalogClient.DataFile,
                          content: Int, equalityIds: Seq[Int],
                          partition: AVal = ARec(Nil)): AVal =
    ARec(Seq(
      AInt(1),                        // status = ADDED
      opt(Some(ALong(snapshotId))),
      opt(Some(ALong(sequenceNumber))),
      opt(Some(ALong(sequenceNumber))), // file_sequence_number
      ARec(Seq(
        AInt(content),
        AStr(file.path),
        AStr("PARQUET"),
        partition,
        ALong(file.recordCount),
        ALong(file.sizeBytes),
        boundsMap(file.bounds.map { case (id, lo, _) => id -> lo }),
        boundsMap(file.bounds.map { case (id, _, hi) => id -> hi }),
        opt(None),                    // split_offsets
        if (equalityIds.isEmpty) opt(None)
        else opt(Some(AArr(equalityIds.map(AInt)))),
        opt(None)))))                 // sort_order_id

  /** EXISTING manifest entry (status 0) with EXPLICIT sequence
    * numbers — the building block of manifest REWRITES (spec "Manifest
    * Files": rewritten manifests carry their files as existing entries
    * that keep the original data sequence number and adding snapshot,
    * so merge-on-read ordering survives the reorganization).
    * `content` 0 = data file, 1/2 = position/equality delete file. */
  def existingManifestEntry(snapshotId: Long, sequenceNumber: Long,
                            file: RestCatalogClient.DataFile, content: Int,
                            equalityIds: Seq[Int] = Nil,
                            partition: AVal = ARec(Nil)): AVal =
    ARec(Seq(
      AInt(0),                        // status = EXISTING
      opt(Some(ALong(snapshotId))),   // the ORIGINAL adding snapshot
      opt(Some(ALong(sequenceNumber))),
      opt(Some(ALong(sequenceNumber))), // file_sequence_number
      ARec(Seq(
        AInt(content),
        AStr(file.path),
        AStr("PARQUET"),
        partition,
        ALong(file.recordCount),
        ALong(file.sizeBytes),
        boundsMap(file.bounds.map { case (id, lo, _) => id -> lo }),
        boundsMap(file.bounds.map { case (id, _, hi) => id -> hi }),
        opt(None),                    // split_offsets
        if (equalityIds.isEmpty) opt(None)
        else opt(Some(AArr(equalityIds.map(AInt)))),
        opt(None)))))                 // sort_order_id

  /** `manifest_file` record pointing at one freshly written manifest.
    * `content` 0 = a DATA manifest, 1 = a DELETES manifest (its
    * entries' data_file structs carry position/equality delete files).
    * `minSequenceNumber` / the existing-file counts matter for
    * manifests of rewritten (EXISTING) entries, whose per-entry
    * sequence numbers reach below the writing snapshot's. */
  def manifestListEntry(manifestPath: String, manifestLength: Long,
                        sequenceNumber: Long, snapshotId: Long,
                        addedFiles: Int, addedRows: Long,
                        content: Int = 0, specId: Int = 0,
                        minSequenceNumber: Option[Long] = None,
                        existingFiles: Int = 0,
                        existingRows: Long = 0L): AVal =
    ARec(Seq(
      AStr(manifestPath),
      ALong(manifestLength),
      AInt(specId),                   // partition_spec_id
      AInt(content),
      ALong(sequenceNumber),
      ALong(minSequenceNumber.getOrElse(sequenceNumber)),
      ALong(snapshotId),
      AInt(addedFiles),
      AInt(existingFiles), AInt(0),   // existing / deleted files
      ALong(addedRows),
      ALong(existingRows), ALong(0L), // existing / deleted rows
      opt(None),                      // partitions summary
      opt(None)))                     // key_metadata

  /** Re-encode a DECODED `manifest_file` record (a [[read]] result Map)
    * back to [[AVal]] — the carry-forward step of an Iceberg append:
    * the new snapshot's manifest list must reference every manifest
    * constituting the table state, so prior list entries are copied
    * into the fresh list with their own sequence numbers intact (the
    * spec's inheritance rules key off them). Tolerates records written
    * by other engines: missing optional fields encode as null, and the
    * existing/added counts are preserved verbatim. */
  def manifestFileRecord(m: Map[String, Any]): AVal = {
    def int(k: String, dflt: Int = 0): AVal =
      AInt(m.get(k) match {
        case Some(i: Int) => i
        case Some(l: Long) => l.toInt
        case _ => dflt
      })
    def long(k: String, dflt: Long = 0L): AVal =
      ALong(m.get(k) match {
        case Some(l: Long) => l
        case Some(i: Int) => i.toLong
        case _ => dflt
      })
    val partitions = m.get("partitions") match {
      case Some(items: Seq[Any] @unchecked) if items != null =>
        opt(Some(AArr(items.map { case p: Map[String, Any] @unchecked =>
          ARec(Seq(
            ABool(p.get("contains_null").contains(true)),
            opt(p.get("contains_nan").collect { case b: Boolean => ABool(b) }),
            opt(p.get("lower_bound").collect { case b: Array[Byte] => ABytes(b) }),
            opt(p.get("upper_bound").collect { case b: Array[Byte] => ABytes(b) })))
        })))
      case _ => opt(None)
    }
    ARec(Seq(
      AStr(m("manifest_path").asInstanceOf[String]),
      long("manifest_length"),
      int("partition_spec_id"),
      int("content"),
      long("sequence_number"),
      long("min_sequence_number"),
      long("added_snapshot_id"),
      int("added_data_files_count"),
      int("existing_data_files_count"),
      int("deleted_data_files_count"),
      long("added_rows_count"),
      long("existing_rows_count"),
      long("deleted_rows_count"),
      partitions,
      opt(m.get("key_metadata").collect { case b: Array[Byte] => ABytes(b) })))
  }
}
