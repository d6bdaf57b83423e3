package graft.catalog

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods.parse

/** Iceberg schema JSON → Spark `StructType` — the inverse of
  * [[RestCatalogClient.icebergSchemaJson]] (public table spec
  * "Schemas" primitive/nested type names). This is what makes cold
  * reads SCHEMA-EVOLUTION-AWARE: scanning with the chain's CURRENT
  * schema instead of whatever the first parquet footer happens to say
  * means files written before an `add column` null-fill it, files
  * carrying a dropped column stop showing it, and column order is the
  * table's — the spec's name-mapping resolution for files without
  * embedded field ids (`schema.name-mapping.default`), which is
  * exactly what this engine's Spark-written parquet is. */
object IcebergSchema {

  private val Decimal = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private def primitive(s: String): DataType = s match {
    case "long" => LongType
    case "int" => IntegerType
    case "string" => StringType
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "binary" => BinaryType
    case "date" => DateType
    case "timestamptz" => TimestampType
    case "timestamp" => TimestampNTZType
    case "uuid" => StringType
    case Decimal(p, sc) => DecimalType(p.toInt, sc.toInt)
    case other =>
      throw new IllegalArgumentException(s"unsupported Iceberg type: $other")
  }

  private def dataTypeOf(t: JValue): DataType = t match {
    case JString(s) => primitive(s)
    case o: JObject => (o \ "type") match {
      case JString("struct") => structOf(o)
      case JString("list") =>
        ArrayType(dataTypeOf(o \ "element"),
          containsNull = !(o \ "element-required").toOption
            .contains(JBool(true)))
      case JString("map") =>
        MapType(dataTypeOf(o \ "key"), dataTypeOf(o \ "value"),
          valueContainsNull = !(o \ "value-required").toOption
            .contains(JBool(true)))
      case other =>
        throw new IllegalArgumentException(s"unsupported Iceberg type: $other")
    }
    case other =>
      throw new IllegalArgumentException(s"malformed Iceberg type: $other")
  }

  private def structOf(j: JValue): StructType =
    StructType((j \ "fields").toOption.toSeq.flatMap {
      case JArray(fs) => fs.map { f =>
        val name = (f \ "name") match {
          case JString(n) => n
          case _ => throw new IllegalArgumentException("field without name")
        }
        StructField(name, dataTypeOf(f \ "type"),
          nullable = !(f \ "required").toOption.contains(JBool(true)))
      }
      case _ => Nil
    })

  /** The table's current Spark read schema, or None when the chain
    * carries no usable schema (legacy "{}" bootstrap) or a type this
    * engine does not map — callers fall back to footer inference. */
  def sparkStruct(schemaJson: String): Option[StructType] =
    scala.util.Try(structOf(parse(schemaJson))).toOption.filter(_.nonEmpty)
}
