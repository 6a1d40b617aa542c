package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Field-name sanitization: every `\W` character in a key becomes `_`,
  * recursively through nested structs and arrays.
  *
  * Reference semantics: `clean_field_key` / `clean_keys` /
  * `clean_dict_keys` / `clean_list_keys` / `clean_dataframe_*`
  * (`src/load_datawarehouse/data.py:13-120`). The reference rewrites the
  * *data* (dict keys, row by row); on Spark the same rewrite is a pure
  * metadata operation — a single `select` of casts/renames that Catalyst
  * executes as a plan-only Project, so it costs nothing at 100 TB.
  */
object Sanitize {

  /** `clean_field_key` (data.py:13-26): non-string keys are stringified,
    * then every non-word char (`\W`) is replaced by `_`.
    */
  def cleanFieldKey(key: Any): String =
    String.valueOf(key).replaceAll("\\W", "_")

  /** Deep rename over a DataType: struct field names sanitized recursively,
    * array element types descended into. Covers `clean_dict_keys` (nested
    * dicts) and `clean_list_keys` (lists of dicts) in one visitor.
    */
  def cleanDataType(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        f.copy(name = cleanFieldKey(f.name), dataType = cleanDataType(f.dataType))))
    case a: ArrayType => a.copy(elementType = cleanDataType(a.elementType))
    case m: MapType => m.copy(valueType = cleanDataType(m.valueType))
    case other => other
  }

  /** Whether any (possibly nested) field name needs cleaning. */
  def needsCleaning(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.exists(f => f.name != cleanFieldKey(f.name) || needsCleaning(f.dataType))
    case a: ArrayType => needsCleaning(a.elementType)
    case m: MapType => needsCleaning(m.valueType)
    case _ => false
  }

  /** `clean_dataframe_columns` + `clean_dataframe_values`
    * (data.py:71-120): rename all columns and all nested field names.
    * A cast of a struct to an identically-shaped struct with different
    * field names is exactly a deep rename — no row data is touched.
    */
  def cleanColumns(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val quoted = col("`" + f.name.replace("`", "``") + "`")
      val cleaned = cleanDataType(f.dataType)
      val c = if (cleaned == f.dataType) quoted else quoted.cast(cleaned)
      c.as(cleanFieldKey(f.name))
    }
    df.select(cols: _*)
  }
}
