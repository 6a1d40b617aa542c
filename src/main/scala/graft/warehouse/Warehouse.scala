package graft.warehouse

import graft.ingest.{Chunker, Ingest}
import graft.schema.{FieldRepr, SchemaCodec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import java.time.Instant

/** The vendor-neutral warehouse contract — the reference's `DataWarehouse`
  * ABC (`src/load_datawarehouse/classes.py:18-64`), whose whole premise is
  * "switch clouds by swapping a subclass" (`README.md:7-12`). The abstract
  * core is the storage-touching surface each backend must provide; the
  * concrete methods are backend-neutral compositions of that core, so a
  * new backend implements a dozen primitives and inherits the rest —
  * exactly the ABC-plus-default-methods shape of the reference.
  *
  * Implementations: [[SparkWarehouse]] (parquet warehouse directory — the
  * BigQuery-analog primary backend) and [[JdbcWarehouse]] (any JDBC
  * database via Spark's JDBC source; embedded Derby in the gates — the
  * Redshift/Snowflake-slot analog, which the reference declares but stubs,
  * `redshift/__init__.py:7-11`).
  */
trait Warehouse {

  /** The live session every backend drives its scans/writes through. */
  def spark: SparkSession

  // ---------- abstract core (storage-touching; one per backend) ----------

  /** `is_online` — health probe against the backing store. */
  def isOnline: Boolean

  /** Resolve a table to a DataFrame, or TableNotFound (falsy-object → Left). */
  def get(name: String): Either[WarehouseError, DataFrame]

  /** Recorded schema + expiry metadata for a table. */
  def meta(name: String): Either[WarehouseError, TableMeta]

  /** Create a table (optionally replacing; replace without an explicit
    * schema reuses the pre-drop schema, the reference behavior).
    */
  def create(name: String, schema: Seq[FieldRepr] = Nil, replace: Boolean = false,
             expires: Option[Instant] = None): Either[WarehouseError, TableRef]

  /** Drop with `not_found_ok` semantics. */
  def drop(name: String, notFoundOk: Boolean = true): Either[WarehouseError, Unit]

  /** Replace the recorded schema metadata. */
  def setSchema(name: String, schema: Seq[FieldRepr]): Either[WarehouseError, Unit]

  /** Set or clear the TTL; enforcement is [[vacuum]]. */
  def setExpiry(name: String, expires: Option[Instant]): Either[WarehouseError, Unit]

  /** The main load pipeline: prepare (clean keys) → resolve schema
    * (existing wins per-field, new fields append unless `fullSchema`) →
    * create if missing → size-bounded chunked append. Returns rows loaded.
    */
  def load(name: String, data: DataFrame, schema: Seq[FieldRepr] = Nil,
           fullSchema: Boolean = false,
           sizeLimit: Long = Chunker.DefaultSizeLimit): Either[WarehouseError, Long]

  /** Append or overwrite rows wholesale. */
  def update(name: String, data: DataFrame, overwrite: Boolean = false): Either[WarehouseError, Unit]

  /** Key-based MERGE: matching rows replace, fresh rows append. */
  def upsert(name: String, data: DataFrame, keys: Seq[String]): Either[WarehouseError, Unit]

  /** Row-level DML UPDATE ... SET ... WHERE: each `set` column replaced
    * by its expression on rows satisfying the predicate; non-matching
    * and null-predicate rows pass through unchanged.
    */
  def updateWhere(name: String, set: Map[String, org.apache.spark.sql.Column],
                  predicate: org.apache.spark.sql.Column): Either[WarehouseError, Unit]

  /** Row-level DML DELETE ... WHERE: keep only rows where the predicate
    * is NOT satisfied (null-predicate rows are kept — SQL DELETE
    * semantics, only TRUE deletes).
    */
  def deleteWhere(name: String,
                  predicate: org.apache.spark.sql.Column): Either[WarehouseError, Unit]

  /** Metadata-level table rename. */
  def rename(from: String, to: String): Either[WarehouseError, Unit]

  /** Drop every table whose expiry has passed (injected clock for tests). */
  def vacuum(now: Instant): Seq[String]

  /** Register the table as a temp view so `query(sql)` sees it. */
  def registerView(name: String): Unit

  // ---------- concrete surface (backend-neutral compositions) ----------

  /** `select_bigquery_table`: local handle, no storage contact. */
  def select(name: String): TableRef = TableRef(name)

  /** `.rebuild`: drop + recreate, schema defaulting to the pre-drop schema. */
  def rebuild(name: String, schema: Seq[FieldRepr] = Nil): Either[WarehouseError, TableRef] =
    create(name, schema, replace = true)

  /** delete == drop (classes.py `delete`/`drop` alias). */
  def delete(name: String): Either[WarehouseError, Unit] = drop(name)

  /** The SQL surface — full Catalyst SQL over the registered views. */
  def query(sql: String): DataFrame = spark.sql(sql)

  /** Load raw JSON-line records (the reference's `List[Dict]` shape). */
  def loadJson(name: String, lines: Seq[String], schema: Seq[FieldRepr] = Nil,
               fullSchema: Boolean = false): Either[WarehouseError, Long] = {
    // `spark` is an abstract def here, not a stable path — name the
    // encoder explicitly instead of importing spark.implicits._
    val df = Ingest.prepareJson(spark,
      spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING))
    load(name, df, schema, fullSchema)
  }

  /** `fetch_bigquery_table`: projection + multi-column sort (ASC/DESC) +
    * limit (default 10, the reference's declared default).
    */
  def fetch(name: String, fields: Seq[String] = Seq("*"),
            sort: Seq[(String, QuerySort)] = Nil,
            count: Int = 10): Either[WarehouseError, DataFrame] =
    get(name).map { df =>
      val projected =
        if (fields == Seq("*")) df else df.select(fields.map(col): _*)
      val sorted =
        if (sort.isEmpty) projected
        else projected.orderBy(sort.map {
          case (c, QuerySort.Asc) => col(c).asc
          case (c, QuerySort.Desc) => col(c).desc
        }: _*)
      sorted.limit(count)
    }

  /** Pretty schema tree (`describe`, bigquery/schema.py:301-434). */
  def describe(name: String): Either[WarehouseError, String] =
    meta(name).map { m =>
      val fields =
        if (m.schema.nonEmpty) m.schema
        else get(name).map(df => SchemaCodec.fromStructType(df.schema)).getOrElse(Nil)
      graft.schema.Describe(name, fields)
    }
}
