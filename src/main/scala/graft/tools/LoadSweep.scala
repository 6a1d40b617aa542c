package graft.tools

import graft.Tables
import graft.ingest.Ingest
import graft.schema.SchemaInference
import graft.warehouse.SparkWarehouse
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Scale sweep for the REFERENCE'S core path — the one the LLM-kernel
  * sweeps ([[ScaleSweep]], [[AdversarialSweep]]) don't touch: raw
  * JSON-line records → lattice schema inference (one `treeAggregate`,
  * no shuffle) → canonicalize + schema'd parse → warehouse `load`
  * (type resolution + size-bounded greedy chunked append). This is
  * `load_bigquery_table`'s pipeline (reference `data.py` + `schema.py`),
  * measured at 10k / 100k / 1M records.
  *
  * The synthetic records exercise the expensive inference features on
  * every line: dirty keys (spaces → sanitize), a nested record (the
  * record⇒REPEATED wrap), an array, int⇄float widening pressure on
  * `score` (every 3rd record float), and a sparse `extra` field (every
  * 10th record) forcing presence-count bookkeeping.
  *
  * Claim under test: every stage is linear in rows with no shuffle in
  * inference (treeAggregate) and no global sort in chunking. Output:
  * one JSON line per (stage, n) to SPARK_GRAFT_LOAD_OUT (default
  * load_sweep.json).
  */
object LoadSweep {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = thunk()
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** n synthetic JSON-object lines, generated distributed. */
  private def jsonLines(spark: SparkSession, n: Long): Dataset[String] = {
    val base = concat(
      lit("""{"user id": """), col("id"),
      lit(""", "name": "u"""), col("id"), lit("\""),
      lit(""", "props": {"score": """),
      when(pmod(col("id"), lit(3L)) === 0,
        concat(pmod(col("id"), lit(100L)), lit(".5")))
        .otherwise(pmod(col("id"), lit(100L)).cast("string")),
      lit(""", "tag": "t"""), pmod(col("id"), lit(7L)), lit("\""),
      lit("""}, "vals": ["""), col("id"), lit(", "), col("id") + 1,
      lit("]"),
      when(pmod(col("id"), lit(10L)) === 0, lit(""", "extra": "x"}"""))
        .otherwise(lit("}")))
    spark.range(n).select(base.as("value"))
      .as[String](org.apache.spark.sql.Encoders.STRING)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_LOAD_OUT", "load_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val work = "target/loadsweep"
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[load] $line"); results += line }

    val ns = Seq(10000L, 100000L, 1000000L, 10000000L)
    // materialize the raw lines first: generation cost never contaminates
    // the stage timings
    ns.foreach { n =>
      jsonLines(spark, n).write.mode("overwrite").text(s"$work/lines_$n")
    }
    def linesAt(n: Long): Dataset[String] =
      spark.read.textFile(s"$work/lines_$n")

    // warmup at the smallest size (JIT + codegen), results discarded
    Ingest.prepareJson(spark, linesAt(ns.head)).count()

    ns.foreach { n =>
      val lines = linesAt(n)
      val (tInfer, schema) =
        timed(() => SchemaInference.inferJson(spark, lines)._2)
      record(s"""{"stage":"infer_json","rows":$n,""" +
        s""""fields":${schema.fields.length},"sec":$tInfer}""")

      val (tPrep, prepared) = timed(() => {
        val df = Ingest.prepareJson(spark, lines)
        df.write.mode("overwrite").parquet(s"$work/prep_$n")
        spark.read.parquet(s"$work/prep_$n")
      })
      record(s"""{"stage":"prepare_json","rows":$n,""" +
        s""""fields":${prepared.schema.fields.length},"sec":$tPrep}""")

      val whDir =
        java.nio.file.Files.createTempDirectory(s"graft-loadsweep-$n").toString
      val wh = new SparkWarehouse(spark, whDir)
      val (tLoad, loaded) = timed(() =>
        wh.load("records", prepared).fold(
          e => throw new RuntimeException(e.message), identity))
      record(s"""{"stage":"warehouse_load","rows":$n,""" +
        s""""loaded":$loaded,"sec":$tLoad}""")
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[load] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
