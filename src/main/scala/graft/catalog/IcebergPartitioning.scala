package graft.catalog

import org.json4s._

import graft.catalog.IcebergTableMetadata.TableMetadata

/** Iceberg PARTITION TRANSFORMS (public table spec "Partitioning") for
  * the partition tuples written into manifest entries and pruned
  * against on cold read. The reference registers exactly these specs —
  * `/root/reference/internal/iceberg/partition.go:74-97` maps
  * granularity to an hour/day/month transform on the timestamp
  * column — so tables this engine writes carry the same partition
  * metadata a reference-stack reader expects, and vice versa.
  *
  * Value semantics (spec): time transforms apply to timestamp MICROS
  * and yield an int — `hour` = hours from epoch, `day` = days from
  * epoch, `month` = months from 1970-01, `year` = years from 1970;
  * `identity` passes the source value through. Floor division keeps
  * pre-epoch values correct. */
object IcebergPartitioning {

  /** One field of a partition spec: `name` is the tuple field's name
    * in the manifest's r102 record, `fieldId` its Iceberg id (1000+),
    * `sourceId` the schema field the transform reads. */
  final case class PartField(name: String, transform: String,
                             sourceId: Int, fieldId: Int)

  private val MicrosPerHour = 3600L * 1000000L
  private val MicrosPerDay = 24L * MicrosPerHour

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** 32-bit Murmur3 (x86 variant, seed 0) over a byte array — the hash
    * the Iceberg spec's bucket transform REQUIRES (Appendix B "32-bit
    * Hash Requirements": murmur3_x86_32), implemented from the public
    * algorithm so foreign engines place identical values in identical
    * buckets. */
  private[graft] def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n = data.length
    var i = 0
    while (i + 4 <= n) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val rem = n & 3
    if (rem == 3) k ^= (data(i + 2) & 0xff) << 16
    if (rem >= 2) k ^= (data(i + 1) & 0xff) << 8
    if (rem >= 1) {
      k ^= data(i) & 0xff
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k
    }
    h ^= n
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Iceberg bucket hash of a LONG source (spec: int promotes to long,
    * hashed as 8 little-endian bytes). */
  private[graft] def bucketHashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  /** Iceberg bucket hash of a STRING source (spec: UTF-8 bytes). */
  private[graft] def bucketHashString(s: String): Int =
    murmur3(s.getBytes("UTF-8"))

  /** bucket[N] of a long source value, per spec:
    * `(hash(v) & Int.MaxValue) % N`. */
  def bucketValue(n: Int, v: Long): Long =
    ((bucketHashLong(v) & Int.MaxValue) % n).toLong

  /** bucket[N] of a string source value. */
  def bucketValueString(n: Int, s: String): Long =
    ((bucketHashString(s) & Int.MaxValue) % n).toLong

  /** bucket[N] over pre-encoded UTF-8 bytes — the allocation-light
    * entry point [[graft.functions.IcebergBucket]]'s generated code
    * calls (Spark's UTF8String hands back its bytes without a
    * String round-trip). */
  def bucketValueUtf8(n: Int, utf8: Array[Byte]): Long =
    ((murmur3(utf8) & Int.MaxValue) % n).toLong

  /** Whether `transform` is ORDER-PRESERVING — the property every
    * range-based prune and min/max tuple derivation depends on. Bucket
    * is the one transform that is not: a value range says nothing
    * about its bucket values. */
  def monotone(transform: String): Boolean = transform match {
    case BucketRe(_) => false
    case _ => true
  }

  /** transform(sourceValue) — timestamps in micros; long sources for
    * bucket/truncate (string sources go through [[bucketValueString]]
    * at probe time; string tuples are not written by this engine). */
  def transformValue(transform: String, v: Long): Long = transform match {
    case "identity" => v
    case "hour" => Math.floorDiv(v, MicrosPerHour)
    case "day" => Math.floorDiv(v, MicrosPerDay)
    case "month" =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(v, MicrosPerDay))
      (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
    case "year" =>
      java.time.LocalDate.ofEpochDay(Math.floorDiv(v, MicrosPerDay))
        .getYear - 1970L
    // the two Iceberg-spec transforms BOTH the reference
    // (catalog_rest.go:527 parseTransform) and pre-r14 graft lacked:
    // bucket[N] = murmur3-mod (point-lookup spreading), truncate[W] =
    // floor-to-width (prefix clustering, order-preserving)
    case BucketRe(n) => bucketValue(n.toInt, v)
    case TruncateRe(w) => v - Math.floorMod(v, w.toLong)
    case other => throw new UnsupportedOperationException(
      s"partition transform $other " +
        "(supported: identity, hour, day, month, year, bucket[N], truncate[W])")
  }

  /** Avro type of the tuple field (spec: time transforms and bucket
    * are int; identity and truncate inherit the source — all our
    * partition sources are long/timestamp columns). */
  def avroType(transform: String): String = transform match {
    case "identity" => "long"
    case TruncateRe(_) => "long"
    case _ => "int"
  }

  /** Parse a partition-spec JSON (`{"spec-id":N,"fields":[...]}`). */
  def fieldsOf(spec: JValue): Seq[PartField] =
    (spec \ "fields").toOption.toSeq.flatMap {
      case JArray(fs) => fs.flatMap { f =>
        for {
          name <- (f \ "name").toOption.collect { case JString(s) => s }
          tr <- (f \ "transform").toOption.collect { case JString(s) => s }
          src <- (f \ "source-id").toOption.collect { case JInt(n) => n.toInt }
        } yield PartField(name, tr, src,
          (f \ "field-id").toOption.collect { case JInt(n) => n.toInt }
            .getOrElse(1000))
      }
      case _ => Nil
    }

  /** The table's DEFAULT spec fields (empty = unpartitioned). */
  def fields(meta: TableMetadata): Seq[PartField] =
    meta.partitionSpecsJson.find(sp =>
      (sp \ "spec-id").toOption.contains(JInt(meta.defaultSpecId)))
      .orElse(meta.partitionSpecsJson.headOption)
      .map(fieldsOf).getOrElse(Nil)

  /** Spec JSON for a manifest's `partition-spec` metadata entry (the
    * fields array, as the Java writer embeds it). */
  def specFieldsJson(parts: Seq[PartField]): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(JArray(parts.map(p => JObject(
        "name" -> JString(p.name), "transform" -> JString(p.transform),
        "source-id" -> JInt(p.sourceId),
        "field-id" -> JInt(p.fieldId))).toList)))

  /** Partition tuple for one data file from its per-source min/max
    * stats (micros): Some(value) when the whole file lands in ONE
    * partition (what a granularity-partitioned sink always produces),
    * None (null tuple field — never pruned) when it straddles or the
    * source has no stats. Non-monotone transforms (bucket) can only be
    * derived when min == max EXACTLY — equal endpoint buckets say
    * nothing about the values between them. */
  def valuesForFile(parts: Seq[PartField],
                    statsBySourceId: Map[Int, (Long, Long)]): Seq[Option[Long]] =
    parts.map { p =>
      statsBySourceId.get(p.sourceId).flatMap { case (mn, mx) =>
        if (!monotone(p.transform)) {
          if (mn == mx) Some(transformValue(p.transform, mn)) else None
        } else {
          val lo = transformValue(p.transform, mn)
          if (lo == transformValue(p.transform, mx)) Some(lo) else None
        }
      }
    }
}
