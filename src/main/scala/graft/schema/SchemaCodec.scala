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
      // attribute applicability mirrors build_api_repr
      // (bigquery/schema.py:146-160): maxLength only on STRING/BYTES,
      // precision only on NUMERIC/BIGNUMERIC, scale whenever set.
      if (f.fieldType == "STRING" || f.fieldType == "BYTES")
        f.maxLength.foreach(o.put("maxLength", _))
      if (f.fieldType == "NUMERIC" || f.fieldType == "BIGNUMERIC")
        f.precision.foreach(o.put("precision", _))
      f.scale.foreach(o.put("scale", _))
      if (f.policyTags.nonEmpty) {
        val tags = mapper.createObjectNode()
        val names = mapper.createArrayNode()
        f.policyTags.foreach(names.add)
        tags.set[ObjectNode]("names", names)
        o.set[ObjectNode]("policyTags", tags)
      }
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
        description = Option(f.get("description")).map(_.asText()),
        precision = Option(f.get("precision")).map(_.asInt()),
        scale = Option(f.get("scale")).map(_.asInt()),
        maxLength = Option(f.get("maxLength")).map(_.asLong()),
        policyTags = Option(f.get("policyTags"))
          .flatMap(t => Option(t.get("names")))
          .map(_.elements().asScala.toSeq.map(_.asText()))
          .getOrElse(Nil))
    }

  // ---------- StructType ⇄ FieldRepr ----------

  /** Spark type → warehouse type name (inverse of Widen.sparkType). */
  def warehouseType(dt: DataType): String = dt match {
    case StringType => "STRING"
    case _: VarcharType | _: CharType => "STRING"
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

  /** Scalar Spark type → FieldRepr carrying the type's declared
    * parameters: DecimalType(p,s) ⇒ precision/scale (so NUMERIC(10,2)
    * survives the round trip instead of widening to the (38,9) default);
    * VarcharType/CharType length ⇒ maxLength.
    */
  private def scalarRepr(name: String, dt: DataType, mode: String): FieldRepr = {
    val base = FieldRepr(name, warehouseType(dt), mode)
    dt match {
      case d: DecimalType =>
        base.copy(precision = Some(d.precision), scale = Some(d.scale))
      case v: VarcharType => base.copy(maxLength = Some(v.length.toLong))
      case c: CharType => base.copy(maxLength = Some(c.length.toLong))
      case _ => base
    }
  }

  def fromStructType(schema: StructType): Seq[FieldRepr] =
    schema.fields.toSeq.map { f =>
      f.dataType match {
        case ArrayType(s: StructType, _) =>
          FieldRepr(f.name, "RECORD", "REPEATED", fromStructType(s))
        case ArrayType(elem, _) =>
          scalarRepr(f.name, elem, "REPEATED")
        case s: StructType =>
          // single (non-repeated) struct — emitted as RECORD NULLABLE;
          // the *inference* path never produces this (records are always
          // REPEATED, SURVEY §1.4) but pass-through conversion keeps it.
          FieldRepr(f.name, "RECORD", "NULLABLE", fromStructType(s))
        case dt =>
          scalarRepr(f.name, dt, if (f.nullable) "NULLABLE" else "REQUIRED")
      }
    }

  def toStructType(fields: Seq[FieldRepr]): StructType = Widen.toStructType(fields)
}
