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

  /** transform(sourceValue) — timestamps in micros. */
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
    case other => throw new UnsupportedOperationException(
      s"partition transform $other (supported: identity, hour, day, month, year)")
  }

  /** Avro type of the tuple field (spec: time transforms are int;
    * identity inherits the source — all our partition sources are
    * long/timestamp columns). */
  def avroType(transform: String): String =
    if (transform == "identity") "long" else "int"

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
    * source has no stats. */
  def valuesForFile(parts: Seq[PartField],
                    statsBySourceId: Map[Int, (Long, Long)]): Seq[Option[Long]] =
    parts.map { p =>
      statsBySourceId.get(p.sourceId).flatMap { case (mn, mx) =>
        val lo = transformValue(p.transform, mn)
        if (lo == transformValue(p.transform, mx)) Some(lo) else None
      }
    }
}
