package graft.schema

import graft.schema.Lat.Tag
import graft.schema.Lat.Tag._
import org.apache.spark.sql.types._

/** BigQuery-style warehouse field representation — the reference's
  * `api_repr` dict `{name, type, mode[, fields, description, policyTags,
  * maxLength, precision, scale]}`
  * (`src/load_datawarehouse/bigquery/schema.py:116-180`).
  *
  * Attribute applicability follows `build_api_repr`: `maxLength` is only
  * meaningful (and only serialized) for STRING/BYTES; `precision` only
  * for NUMERIC/BIGNUMERIC; `scale` whenever set; `policyTags` is the
  * api's `{"names": [...]}` list.
  */
final case class FieldRepr(name: String,
                           fieldType: String,
                           mode: String,
                           fields: Seq[FieldRepr] = Nil,
                           description: Option[String] = None,
                           precision: Option[Int] = None,
                           scale: Option[Int] = None,
                           maxLength: Option[Long] = None,
                           policyTags: Seq[String] = Nil) {
  require(FieldRepr.Types.contains(fieldType), s"invalid type $fieldType")
  require(FieldRepr.Modes.contains(mode), s"invalid mode $mode")
  require(precision.forall(_ > 0) && scale.forall(_ >= 0),
    s"invalid precision/scale $precision/$scale")
}

object FieldRepr {
  /** `SchemaFieldType` enum (bigquery/schema.py:67-87) — the subset our
    * inference can produce plus the pass-through members.
    */
  val Types: Set[String] = Set("STRING", "BYTES", "INTEGER", "INT64", "FLOAT",
    "FLOAT64", "BOOLEAN", "BOOL", "TIMESTAMP", "DATETIME", "DATE", "TIME",
    "GEOGRAPHY", "NUMERIC", "BIGNUMERIC", "RECORD", "STRUCT")
  /** bigquery/schema.py:88-94 */
  val Modes: Set[String] = Set("NULLABLE", "REQUIRED", "REPEATED")
}

/** Type-widening / unification — the heart of the reference's inference
  * (`guess_warehouse_dtype`, `src/load_datawarehouse/schema.py:434-482`,
  * and condensation `schema.py:265-403`). Pure driver-side functions: the
  * distributed part of inference is the lattice build; condensation runs
  * once on the merged result.
  */
object Widen {

  /** Default for fields whose type could not be determined — observed only
    * as null, or unmapped (bigquery/schema.py:464-475,169-203).
    */
  val DefaultType = "STRING"
  val DefaultMode = "NULLABLE"

  /** `guess_warehouse_dtype` (schema.py:434-482):
    *  1. unless forceNumeric, a precedence switch fires on
    *     bytes → datetime → date → time → str, in that declaration order
    *     (any str observation makes the whole field STRING — "a mix of
    *     strings and numbers … will ALL be treated as STRINGS",
    *     schema.py:29);
    *  2. otherwise numeric widening: float ≻ int ≻ bool, with bool+int
    *     widening to INTEGER (numpy `find_common_type` rule);
    *  3. unknown/empty → None (caller defaults to STRING NULLABLE).
    * Divergence from the reference, documented: tz-aware timestamps join
    * the precedence chain right after naive datetimes (the reference
    * routes them through the pandas-dtype mapper to TIMESTAMP).
    */
  def widen(tags: Seq[Tag], forceNumeric: Boolean = false): Option[String] = {
    if (!forceNumeric) {
      if (tags.contains(TBytes)) return Some("BYTES")
      if (tags.contains(TDatetime)) return Some("DATETIME")
      if (tags.contains(TTimestamp)) return Some("TIMESTAMP")
      if (tags.contains(TDate)) return Some("DATE")
      if (tags.contains(TTime)) return Some("TIME")
      if (tags.contains(TStr)) return Some("STRING")
    }
    val numeric = tags.filter(t => t == TFloat || t == TInt || t == TBool)
    if (numeric.isEmpty) None
    else if (numeric.contains(TFloat)) Some("FLOAT")
    else if (numeric.contains(TInt)) Some("INTEGER")
    else Some("BOOLEAN")
  }

  /** Condense a lattice into api_repr fields — `condense_record_fields`
    * + emission (`schema.py:265-403`, `bigquery/schema.py:439-511`).
    * Per-field precedence: existing-schema override ≻ sub-record ≻ list ≻
    * scalar widening. Emission modes (§1.4 of SURVEY):
    * scalar → NULLABLE; nested record → RECORD REPEATED (always repeated,
    * even when observed as a single dict — bigquery/schema.py:486-497);
    * repeated scalar → REPEATED; unknown → STRING NULLABLE.
    */
  def condense(lat: Lat, existing: Seq[FieldRepr] = Nil,
               forceNumeric: Boolean = false): Seq[FieldRepr] = lat match {
    case r: Lat.LRecord =>
      r.fields.map { case (name, sub) =>
        existing.find(_.name == name) match {
          case Some(fixed) => fixed // existing schema wins (schema.py:359-375)
          case None => condenseField(name, sub, forceNumeric)
        }
      }
    case _ => Nil
  }

  private def condenseField(name: String, lat: Lat,
                            forceNumeric: Boolean): FieldRepr = lat match {
    case r: Lat.LRecord =>
      FieldRepr(name, "RECORD", "REPEATED", condense(r, Nil, forceNumeric))
    case Lat.LList(elem) => elem match {
      case r: Lat.LRecord =>
        FieldRepr(name, "RECORD", "REPEATED", condense(r, Nil, forceNumeric))
      case Lat.LScalar(tags) =>
        FieldRepr(name, widen(tags, forceNumeric).getOrElse(DefaultType), "REPEATED")
      case Lat.LEmpty => FieldRepr(name, DefaultType, "REPEATED")
      case _: Lat.LList => // nested list-of-list: widen the flattened element
        FieldRepr(name, DefaultType, "REPEATED")
    }
    case Lat.LScalar(tags) =>
      FieldRepr(name, widen(tags, forceNumeric).getOrElse(DefaultType), DefaultMode)
    case Lat.LEmpty => FieldRepr(name, DefaultType, DefaultMode)
  }

  /** Warehouse type → Spark type (SURVEY §1.2 mapping) with the
    * NUMERIC/BIGNUMERIC defaults used when no declared precision/scale
    * travels with the field.
    */
  def sparkType(t: String): DataType = t match {
    case "STRING" | "TIME" | "GEOGRAPHY" => StringType
    case "BYTES" => BinaryType
    case "INTEGER" | "INT64" => LongType
    case "FLOAT" | "FLOAT64" => DoubleType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "TIMESTAMP" | "DATETIME" => TimestampType
    case "DATE" => DateType
    case "NUMERIC" => DecimalType(38, 9)
    case "BIGNUMERIC" => DecimalType(38, 18)
    case other => throw new IllegalArgumentException(s"no spark type for $other")
  }

  /** Spark type for a full field repr: a NUMERIC/BIGNUMERIC carrying a
    * declared precision/scale round-trips into the exact
    * `DecimalType(p, s)` instead of the type-default (a user's
    * NUMERIC(10,2) must not widen to (38,9) —
    * bigquery/schema.py:154-160). Documented divergence: Spark's
    * DecimalType caps precision at 38, so a BIGNUMERIC declared wider
    * (the api allows up to 76.76) clamps to (38, min(s, 38)) — the same
    * lossy mapping the type-default (38,18) already takes.
    */
  def sparkTypeOf(f: FieldRepr): DataType = f.fieldType match {
    case "NUMERIC" | "BIGNUMERIC" =>
      def clamped(p: Int, s: Int) = {
        val p2 = math.min(p, DecimalType.MAX_PRECISION)
        DecimalType(p2, math.min(s, p2))
      }
      (f.precision, f.scale) match {
        case (Some(p), s) => clamped(p, s.getOrElse(0))
        case (None, Some(s)) => clamped(38, s)
        case _ => sparkType(f.fieldType)
      }
    case t => sparkType(t)
  }

  /** api_repr fields → Spark StructType. RECORD REPEATED →
    * ArrayType(StructType); scalar REPEATED → ArrayType(primitive);
    * everything nullable (NULLABLE mode).
    */
  def toStructType(fields: Seq[FieldRepr]): StructType =
    StructType(fields.map { f =>
      val base: DataType =
        if (f.fieldType == "RECORD" || f.fieldType == "STRUCT") toStructType(f.fields)
        else sparkTypeOf(f)
      val dt = if (f.mode == "REPEATED") ArrayType(base, containsNull = true) else base
      StructField(f.name, dt, nullable = f.mode != "REQUIRED")
    })
}
