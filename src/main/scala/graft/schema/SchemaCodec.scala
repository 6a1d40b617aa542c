package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Bidirectional schema format conversion — the reference's
  * `convert_schema_to_api_repr` / `convert_api_repr_to_schema` / `convert`
  * (`src/load_datawarehouse/bigquery/schema.py:222-295`) plus the
  * Spark-native third leg: api_repr ⇄ `StructType`.
  *
  * Round-trip law (golden-tested): `fromJson(toJson(x)) == x` and
  * `toStructType(fromStructType(s))` preserves shape for every type our
  * vocabulary covers.
  */
object SchemaCodec {

  private val mapper = new ObjectMapper()

  // ---------- FieldRepr ⇄ JSON (api_repr) ----------

  def toJson(fields: Seq[FieldRepr]): String =
    mapper.writeValueAsString(toArrayNode(fields))

  private def toArrayNode(fields: Seq[FieldRepr]): ArrayNode = {
    val arr = mapper.createArrayNode()
    fields.foreach { f =>
      val o = mapper.createObjectNode()
      o.put("name", f.name)
      o.put("type", f.fieldType)
      o.put("mode", f.mode)
      if (f.fields.nonEmpty) o.set[ObjectNode]("fields", toArrayNode(f.fields))
      f.description.foreach(o.put("description", _))
      arr.add(o)
    }
    arr
  }

  /** `is_api_repr` (bigquery/schema.py:211-216): dict with name+type+mode. */
  def isApiRepr(node: JsonNode): Boolean =
    node.isObject && node.has("name") && node.has("type") && node.has("mode")

  def fromJson(json: String): Seq[FieldRepr] = {
    val node = mapper.readTree(json)
    require(node.isArray, "api_repr schema must be a JSON array of fields")
    fromArrayNode(node)
  }

  private def fromArrayNode(node: JsonNode): Seq[FieldRepr] =
    node.elements().asScala.toSeq.map { f =>
      require(isApiRepr(f), s"invalid api_repr field: $f")
      FieldRepr(
        name = f.get("name").asText(),
        fieldType = f.get("type").asText(),
        mode = f.get("mode").asText(),
        fields = if (f.has("fields")) fromArrayNode(f.get("fields")) else Nil,
        description = Option(f.get("description")).map(_.asText()))
    }

  // ---------- StructType ⇄ FieldRepr ----------

  /** Spark type → warehouse type name (inverse of Widen.sparkType). */
  def warehouseType(dt: DataType): String = dt match {
    case StringType => "STRING"
    case BinaryType => "BYTES"
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case FloatType | DoubleType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case _: TimestampNTZType => "DATETIME"
    case DateType => "DATE"
    case d: DecimalType => if (d.precision <= 38 && d.scale <= 9) "NUMERIC" else "BIGNUMERIC"
    case _: StructType => "RECORD"
    case other => throw new IllegalArgumentException(s"no warehouse type for $other")
  }

  def fromStructType(schema: StructType): Seq[FieldRepr] =
    schema.fields.toSeq.map { f =>
      f.dataType match {
        case ArrayType(s: StructType, _) =>
          FieldRepr(f.name, "RECORD", "REPEATED", fromStructType(s))
        case ArrayType(elem, _) =>
          FieldRepr(f.name, warehouseType(elem), "REPEATED")
        case s: StructType =>
          // single (non-repeated) struct — emitted as RECORD NULLABLE;
          // the *inference* path never produces this (records are always
          // REPEATED, SURVEY §1.4) but pass-through conversion keeps it.
          FieldRepr(f.name, "RECORD", "NULLABLE", fromStructType(s))
        case dt =>
          FieldRepr(f.name, warehouseType(dt),
            if (f.nullable) "NULLABLE" else "REQUIRED")
      }
    }

  def toStructType(fields: Seq[FieldRepr]): StructType = Widen.toStructType(fields)
}
