package graft.sources

import graft.ingest.Ingest
import graft.schema.{SchemaInference, Widen}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.util.Properties

/** Source / sink surface (SURVEY §2.6 "Scans/sources" + BASELINE.json
  * "JDBC/Parquet sinks"): every format a warehouse-loading engine needs,
  * with the same schema discipline as the JSON path — inference via OUR
  * lattice where schema is absent, user-supplied schema override where
  * it is not.
  */
object Sources {

  // ---------- reads ----------

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-evolution scan: union the schemas of EVERY file footer under
    * `path` (columns a writer generation lacked read as null) instead of
    * trusting one random footer — the read-side half of additive schema
    * evolution, pairing with the warehouse's `applyChanges`. Costs one
    * footer read per file at planning; leave it off (plain [[parquet]])
    * for homogeneous directories.
    */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** CSV with header; schema either supplied (skips the inference scan,
    * the `full_schema=True` analog) or inferred by Spark's CSV reader.
    */
  def csv(spark: SparkSession, path: String,
          schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
  }

  /** PERMISSIVE CSV scan with a corrupt-record column: rows that fail
    * the supplied schema keep their raw line in `corruptCol` instead of
    * killing the scan (DROPMALFORMED silently loses data; FAILFAST
    * kills a 100 TB ingest on one bad shard). The caller decides what
    * to do with the quarantined rows — count, log, dead-letter.
    */
  def csvPermissive(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType,
                    corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read.option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol,
        org.apache.spark.sql.types.StringType))
      .csv(path)

  /** JSON lines with warehouse-rule inference (record⇒REPEATED, string
    * precedence, STRING default — NOT Spark's JSON inference; SURVEY
    * §7.4 documents the deltas).
    */
  def jsonRecords(spark: SparkSession, path: String): DataFrame =
    Ingest.prepareJson(spark, spark.read.textFile(path))

  /** JDBC scan (predicate pushdown goes through the JDBC dialect). */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  // ---------- sinks ----------

  /** Parquet sink with per-file size budgeting: cap rows per file from a
    * measured average row size — the writer-side analog of the 20 MiB
    * chunking contract (exact greedy chunking is
    * `Chunker.greedyChunkIds`; this is the cheap streaming-friendly
    * variant for bulk writes).
    */
  def writeParquetSized(df: DataFrame, path: String, mode: SaveMode,
                        targetFileBytes: Long = 128L * (1 << 20)): Unit = {
    val sample = df.limit(1000)
    val sampled = sample.select(
      org.apache.spark.sql.functions.avg(Ingest.rowJsonSize(sample))).collect()(0)
    val avgRow = if (sampled.isNullAt(0)) 256.0 else math.max(1.0, sampled.getDouble(0))
    val rowsPerFile = math.max(1L, (targetFileBytes / avgRow).toLong)
    df.write.mode(mode)
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(path)
  }

  /** JDBC sink (reference's cloud-warehouse insert path, vendor-neutral).
    * Batch size tuned for insert round-trips — the JDBC twin of the
    * 20 MiB chunk contract.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append, batchSize: Int = 1000,
                props: Properties = new Properties()): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** ORC scan (columnar alternative to parquet; same pushdown/pruning). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** CSV sink with header — flat schemas only (CSV has no nesting). */
  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** JSON-lines sink — the wire format of the reference's chunked
    * streaming insert (`/root/reference/src/load_datawarehouse/data.py:146-177`
    * measures exactly this serialization); reads back through
    * `jsonRecords`, i.e. OUR inference rules, closing the loop
    * write→infer→load.
    */
  def writeJsonLines(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC sink. */
  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Plain-text scan: one row per line, column `value` — the raw-corpus
    * ingestion format (crawl dumps, log shards). Reads a directory of
    * shards in parallel, one task per split, like any file source.
    */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Plain-text sink: writes the single string column as line-per-row
    * shard files. The caller guarantees values carry no newlines (text
    * files have no quoting — a newline would silently split a row).
    */
  def writeText(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).text(path)

  /** Binary-file scan: one row per file — `(path, modificationTime,
    * length, content)` — the ingestion format for opaque media blobs
    * (images/audio/video) feeding [[graft.ext.Multimodal]]. Files are
    * NOT split: one task per file, so shard media into many files (the
    * uploader's job), and set `pathGlobFilter` to prune by extension at
    * the listing, before any byte is read.
    */
  def binaryFiles(spark: SparkSession, path: String,
                  globFilter: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    globFilter.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** XML scan (Spark 4's built-in XML data source): one row per
    * `rowTag` element. Schema either supplied (skips the inference
    * scan, like the CSV path) or inferred by the XML reader. Files ARE
    * split on row-tag boundaries, so a directory of large XML shards
    * parallelizes like any file source.
    */
  def xml(spark: SparkSession, path: String,
          schema: Option[org.apache.spark.sql.types.StructType] = None,
          rowTag: String = "row"): DataFrame = {
    val base = spark.read.format("xml").option("rowTag", rowTag)
    schema.fold(base)(s => base.schema(s)).load(path)
  }

  /** XML sink — flat schemas round-trip losslessly (values are
    * XML-escaped by the writer); element order inside a row follows the
    * column order.
    */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row",
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("xml").option("rowTag", rowTag).save(path)

  /** Round-trip helper: load any supported source into the warehouse
    * table shape (cleaned keys + recorded api_repr schema).
    */
  def toWarehouseSchema(df: DataFrame): (DataFrame, Seq[graft.schema.FieldRepr]) = {
    val prepared = Ingest.prepare(df)
    (prepared, graft.schema.SchemaCodec.fromStructType(prepared.schema))
  }

  /** Inference façade over files: infer without loading (schema-only scan). */
  def inferJsonSchema(spark: SparkSession, path: String): Seq[graft.schema.FieldRepr] =
    Widen.condense(
      SchemaInference.deconstructJson(spark.read.textFile(path)).lat)
}
