package graft.tools

import graft.Tables
import graft.warehouse.SparkWarehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map skipping sweep: files read and scan wall time, pruned vs
  * plain, across table sizes and layouts.
  *
  * Claims under test (the r11 skipping feature's 100 TB premise):
  *  1. on a range-clustered table a selective predicate reads O(match)
  *     FILES, not O(table) — the files-read column should stay flat as
  *     the table grows while the unpruned scan's file count grows
  *     linearly;
  *  2. Z-order keeps pruning effective on BOTH clustered dimensions,
  *     where a single-column sort only serves its prefix;
  *  3. the stats pass itself is one linear scan (analyze_sec column).
  *
  * Output: one JSON line per (layout, n, dim) to SPARK_GRAFT_SKIP_OUT
  * (default skipping_sweep.json). reps=3 fresh timings per point,
  * median reported, raw seconds kept.
  */
object SkippingSweep {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = thunk()
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def base(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("a"),
      pmod(col("id") * 7919L, lit(n)).as("b"),
      (col("id") * 3L).as("v"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_SKIP_OUT", "skipping_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[skip] $line"); results += line }
    def unwrap[A](e: Either[graft.warehouse.WarehouseError, A]): A =
      e.fold(err => throw new RuntimeException(err.message), identity)
    val reps = 3

    val ns = Seq(100000L, 1000000L, 10000000L)
    // files scale with table size so per-file row counts stay constant
    // (the regime where skipping matters: more data = more files, and
    // the question is how many the predicate READS)
    def filesFor(n: Long): Int = math.max(8, (n / 100000L).toInt * 8)

    for (n <- ns; layout <- Seq("sorted", "zorder")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-skip-$layout-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      // the unpruned baseline: same directory, skipping disabled
      val whPlain = new SparkWarehouse(spark, dir, skippingEnabled = false)
      unwrap(wh.load("t", base(spark, n).repartition(16)))
      val nf = filesFor(n)
      layout match {
        case "sorted" =>
          unwrap(wh.compact("t", targetFiles = nf, sortCols = Seq("a")))
        case "zorder" =>
          unwrap(wh.compactZOrder("t", targetFiles = nf,
            zCols = Seq("a", "b"), buckets = 256))
      }
      val (analyzeSec, analyzed) = timed(() => unwrap(wh.analyzeStats("t")))
      val totalFiles = unwrap(wh.get("t")).inputFiles.length
      // ~0.5% selective band on each dimension
      val width = math.max(1L, n / 200L)
      for (dim <- Seq("a", "b")) {
        val pred = col(dim) >= lit(n / 2) && col(dim) < lit(n / 2 + width)
        val filesRead = org.apache.spark.sql.GraftFileIndexBridge
          .filesRead(unwrap(wh.scanPruned("t", pred)))
        val prunedT = (1 to reps).map(_ =>
          timed(() => unwrap(wh.scanPruned("t", pred)).count())._1).sorted
        val plainT = (1 to reps).map(_ =>
          timed(() => unwrap(whPlain.get("t")).filter(pred).count())._1).sorted
        val rows = unwrap(wh.scanPruned("t", pred)).count()
        val plainRows = unwrap(whPlain.get("t")).filter(pred).count()
        require(rows == plainRows,
          s"pruned/plain row drift: $rows vs $plainRows")
        record(
          s"""{"layout":"$layout","n":$n,"dim":"$dim","files_total":$totalFiles,""" +
            s""""files_read":$filesRead,"rows":$rows,""" +
            s""""analyze_sec":$analyzeSec,"files_analyzed":$analyzed,""" +
            s""""pruned_sec":${prunedT(reps / 2)},""" +
            s""""plain_sec":${plainT(reps / 2)},""" +
            s""""pruned_raw":${prunedT.mkString("[", ",", "]")},""" +
            s""""plain_raw":${plainT.mkString("[", ",", "]")}}""")
      }
    }
    // ---- string layouts (r12): a source/date-shaped corpus table.
    // Claims: (a) prefix predicates (LIKE 'p%') read O(match) files on
    // a source-clustered layout; (b) string×date Z-order (numeric
    // proxies) keeps BOTH dims selective; (c) != closes constant files.
    for (n <- ns) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-skipstr-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      val whPlain = new SparkWarehouse(spark, dir, skippingEnabled = false)
      val nf = filesFor(n)
      // 40 sources × dates scattered over ~400 days — the layout keys
      // of a crawl corpus
      val data = spark.range(n).select(
        concat(lit("source_"), pmod(col("id"), lit(40L)).cast("string"),
          lit("/doc"), col("id").cast("string")).as("url"),
        date_add(lit("2019-01-01").cast("date"),
          pmod(col("id") * 7919L, lit(400L)).cast("int")).as("d"),
        (col("id") * 3L).as("v"))
      unwrap(wh.load("t", data.repartition(16)))
      unwrap(wh.compactZOrder("t", targetFiles = nf,
        zCols = Seq("url", "d"), buckets = 256))
      val (analyzeSec, _) = timed(() => unwrap(wh.analyzeStats("t")))
      val totalFiles = unwrap(wh.get("t")).inputFiles.length
      // (no != probe here: unique urls have no constant files — the
      // dictionary-layout != close is pinned by Round12Spec instead)
      val probes = Seq(
        ("prefix", col("url").startsWith("source_17/")),
        ("date_band", col("d") >= lit("2019-06-01").cast("date") &&
          col("d") < lit("2019-06-08").cast("date")))
      for ((kind, pred) <- probes) {
        val filesRead = org.apache.spark.sql.GraftFileIndexBridge
          .filesRead(unwrap(wh.scanPruned("t", pred)))
        val prunedT = (1 to reps).map(_ =>
          timed(() => unwrap(wh.scanPruned("t", pred)).count())._1).sorted
        val plainT = (1 to reps).map(_ =>
          timed(() => unwrap(whPlain.get("t")).filter(pred).count())._1).sorted
        val rows = unwrap(wh.scanPruned("t", pred)).count()
        val plainRows = unwrap(whPlain.get("t")).filter(pred).count()
        require(rows == plainRows,
          s"string-layout pruned/plain drift ($kind): $rows vs $plainRows")
        record(
          s"""{"layout":"zorder_string","n":$n,"dim":"$kind",""" +
            s""""files_total":$totalFiles,"files_read":$filesRead,""" +
            s""""rows":$rows,"analyze_sec":$analyzeSec,""" +
            s""""pruned_sec":${prunedT(reps / 2)},""" +
            s""""plain_sec":${plainT(reps / 2)},""" +
            s""""pruned_raw":${prunedT.mkString("[", ",", "]")},""" +
            s""""plain_raw":${plainT.mkString("[", ",", "]")}}""")
      }
    }
    // ---- https:// URL layout (r13): keys whose first 8 bytes are the
    // CONSTANT scheme. Claim: the common-prefix-stripped z-proxy
    // restores prefix selectivity exactly where the unstripped 8-byte
    // window was blind (r12 honest numbers: 8/8 files at 100k rows) —
    // the difference shows at the SMALL file counts a fresh corpus has.
    for (n <- ns) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-skipurl-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      val whPlain = new SparkWarehouse(spark, dir, skippingEnabled = false)
      val nf = filesFor(n)
      val data = spark.range(n).select(
        format_string("https://s%d.example.com/d%d",
          pmod(col("id"), lit(40L)), col("id")).as("url"),
        date_add(lit("2019-01-01").cast("date"),
          pmod(col("id") * 7919L, lit(400L)).cast("int")).as("d"),
        (col("id") * 3L).as("v"))
      unwrap(wh.load("t", data.repartition(16)))
      unwrap(wh.compactZOrder("t", targetFiles = nf,
        zCols = Seq("url", "d"), buckets = 256))
      val (analyzeSec, _) = timed(() => unwrap(wh.analyzeStats("t")))
      val totalFiles = unwrap(wh.get("t")).inputFiles.length
      val probes = Seq(
        ("prefix", col("url").startsWith("https://s17.")),
        ("date_band", col("d") >= lit("2019-06-01").cast("date") &&
          col("d") < lit("2019-06-08").cast("date")))
      for ((kind, pred) <- probes) {
        val filesRead = org.apache.spark.sql.GraftFileIndexBridge
          .filesRead(unwrap(wh.scanPruned("t", pred)))
        val prunedT = (1 to reps).map(_ =>
          timed(() => unwrap(wh.scanPruned("t", pred)).count())._1).sorted
        val plainT = (1 to reps).map(_ =>
          timed(() => unwrap(whPlain.get("t")).filter(pred).count())._1).sorted
        val rows = unwrap(wh.scanPruned("t", pred)).count()
        val plainRows = unwrap(whPlain.get("t")).filter(pred).count()
        require(rows == plainRows,
          s"url-layout pruned/plain drift ($kind): $rows vs $plainRows")
        record(
          s"""{"layout":"zorder_url","n":$n,"dim":"$kind",""" +
            s""""files_total":$totalFiles,"files_read":$filesRead,""" +
            s""""rows":$rows,"analyze_sec":$analyzeSec,""" +
            s""""pruned_sec":${prunedT(reps / 2)},""" +
            s""""plain_sec":${plainT(reps / 2)},""" +
            s""""pruned_raw":${prunedT.mkString("[", ",", "]")},""" +
            s""""plain_raw":${plainT.mkString("[", ",", "]")}}""")
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      results.mkString("[\n", ",\n", "\n]")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
