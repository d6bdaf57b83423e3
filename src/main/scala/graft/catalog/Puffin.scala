package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods._

/** Puffin statistics-file container (Iceberg's sidecar format for
  * indexes and sketches, spec "Puffin file format"): a magic-framed
  * sequence of raw blob payloads followed by a JSON footer describing
  * each blob's `(type, fields, snapshot-id, sequence-number, offset,
  * length, properties)`. Hand-rolled from the public spec like
  * [[AvroOcf]] — no library. Layout written/read here:
  *
  * {{{
  * Magic "PFA1"
  * blob bytes … (uncompressed, back to back)
  * Magic "PFA1"
  * FooterPayload (UTF-8 JSON, uncompressed)
  * FooterPayloadSize (int32 LE) | Flags (4 bytes, all zero) | Magic
  * }}}
  *
  * The engine uses it to carry per-data-file bloom filters (custom
  * blob type `graft-bloom-v1`, one blob per data file with the file
  * path in blob properties) registered in table metadata's
  * `statistics` list — the needle-lookup index
  * [[IcebergTableReader.readPoint]] prunes with. Blob reads are
  * RANGE reads (`offset`/`length` from the footer), so membership
  * checks distribute: executors each open the sidecar and read only
  * their blobs' slices — a 10^6-file index never materializes on one
  * node. */
object Puffin {

  final case class Blob(blobType: String, fields: Seq[Int],
                        snapshotId: Long, sequenceNumber: Long,
                        bytes: Array[Byte],
                        properties: Map[String, String] = Map.empty)

  final case class BlobMeta(blobType: String, fields: Seq[Int],
                            snapshotId: Long, sequenceNumber: Long,
                            offset: Long, length: Long,
                            properties: Map[String, String])

  private val Magic = Array[Byte]('P', 'F', 'A', '1')

  /** What [[write]] produced, in the shape table metadata's
    * `statistics` entry needs: total file size
    * (`file-size-in-bytes`), footer size (`file-footer-size-in-bytes`
    * — footer magic + payload + the 12-byte payload-size/flags/magic
    * tail, per the spec), and the per-blob directory
    * (`blob-metadata`). A conforming external reader (Trino,
    * Spark-Iceberg) seeks `fileSize - footerSize` and lists blobs from
    * metadata alone, so both must be real — a 0-byte footer size or an
    * empty blob list breaks exactly the interop the sidecar exists
    * for. */
  final case class Written(fileSize: Long, footerSize: Long,
                           blobs: Seq[BlobMeta])

  /** Write a Puffin file; returns sizes + blob directory ([[Written]]). */
  def write(conf: Configuration, path: String, blobs: Seq[Blob],
            properties: Map[String, String] = Map.empty): Written = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      val metas = blobs.map { b =>
        out.write(b.bytes)
        val m = BlobMeta(b.blobType, b.fields, b.snapshotId,
          b.sequenceNumber, offset, b.bytes.length.toLong, b.properties)
        offset += b.bytes.length
        m
      }
      val payload = compact(render(footerJson(metas, properties)))
        .getBytes(StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payload)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(payload.length).array())
      out.write(Array[Byte](0, 0, 0, 0)) // flags: footer uncompressed
      out.write(Magic)
      val footerSize = Magic.length.toLong + payload.length + 12
      Written(offset + footerSize, footerSize, metas)
    } finally out.close()
  }

  private def footerJson(metas: Seq[BlobMeta],
                         properties: Map[String, String]): JValue =
    JObject(
      "blobs" -> JArray(metas.map { m =>
        JObject(
          "type" -> JString(m.blobType),
          "fields" -> JArray(m.fields.map(f => JInt(f): JValue).toList),
          "snapshot-id" -> JInt(BigInt(m.snapshotId)),
          "sequence-number" -> JInt(BigInt(m.sequenceNumber)),
          "offset" -> JInt(BigInt(m.offset)),
          "length" -> JInt(BigInt(m.length)),
          "properties" -> JObject(m.properties.toList.sortBy(_._1)
            .map { case (k, v) => k -> (JString(v): JValue) })): JValue
      }.toList),
      "properties" -> JObject(properties.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }))

  /** Read only the FOOTER (blob directory + file properties): two
    * small tail reads, never the blob bytes — the planner's side of
    * the bargain at any index size. */
  def readFooter(conf: Configuration, path: String)
      : (Seq[BlobMeta], Map[String, String]) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len >= 2L * Magic.length + 12,
      s"$path too short (${len}B) to be a Puffin file")
    val in = fs.open(p)
    try {
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      require(tail.slice(8, 12).sameElements(Magic),
        s"$path: trailing magic mismatch — not a Puffin file")
      val flags = tail.slice(4, 8)
      require(flags.forall(_ == 0),
        s"$path: compressed footer payload not supported by this reader")
      val size = ByteBuffer.wrap(tail, 0, 4).order(ByteOrder.LITTLE_ENDIAN)
        .getInt
      require(size >= 0 && size <= len - 12 - 2L * Magic.length,
        s"$path: hostile footer payload size $size")
      val payload = new Array[Byte](size)
      in.readFully(len - 12 - size, payload)
      val opening = new Array[Byte](Magic.length)
      in.readFully(len - 12 - size - Magic.length, opening)
      require(opening.sameElements(Magic),
        s"$path: footer opening magic mismatch")
      val j = parse(new String(payload, StandardCharsets.UTF_8))
      def props(v: JValue): Map[String, String] = v match {
        case JObject(fs0) => fs0.collect { case (k, JString(s)) => k -> s }.toMap
        case _ => Map.empty
      }
      val blobs = (j \ "blobs").toOption.toSeq.flatMap {
        case JArray(bs) => bs.map { b =>
          BlobMeta(
            blobType = (b \ "type").toOption
              .collect { case JString(t) => t }.getOrElse(""),
            fields = (b \ "fields").toOption.toSeq.flatMap {
              case JArray(ids) => ids.collect { case JInt(n) => n.toInt }
              case _ => Nil
            },
            snapshotId = (b \ "snapshot-id").toOption
              .collect { case JInt(n) => n.toLong }.getOrElse(0L),
            sequenceNumber = (b \ "sequence-number").toOption
              .collect { case JInt(n) => n.toLong }.getOrElse(0L),
            offset = (b \ "offset").toOption
              .collect { case JInt(n) => n.toLong }.getOrElse(0L),
            length = (b \ "length").toOption
              .collect { case JInt(n) => n.toLong }.getOrElse(0L),
            properties = props(b \ "properties"))
        }
        case _ => Nil
      }
      (blobs, props(j \ "properties"))
    } finally in.close()
  }

  /** Range-read ONE blob's payload. */
  def readBlob(conf: Configuration, path: String,
               meta: BlobMeta): Array[Byte] = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      require(meta.length <= Int.MaxValue, s"blob too large: ${meta.length}")
      val buf = new Array[Byte](meta.length.toInt)
      in.readFully(meta.offset, buf)
      buf
    } finally in.close()
  }
}
