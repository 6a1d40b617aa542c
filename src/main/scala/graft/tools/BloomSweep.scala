package graft.tools

import graft.Tables
import graft.warehouse.SparkWarehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-skipping + incremental-analyze sweep — the two r11 follow-ons
  * to the zone-map feature, measured where their premises live:
  *
  *  1. BLOOM leg — a RANDOM (hash-partitioned) layout where every
  *     file's [min,max] spans the whole key domain, so zone maps prune
  *     nothing; a per-file Bloom filter should cut a point lookup on
  *     the high-cardinality key to ~1 file (present value) or ~0 files
  *     (absent in-range value), with files_read recorded for zone-only
  *     vs zone+bloom on the SAME table. The key column holds EVEN
  *     values only so an odd probe is in-range-but-absent — the case
  *     only a content filter can prove.
  *  2. INCREMENTAL leg — append 10% to an analyzed table, then time
  *     `analyzeStats()` (incremental: should cost O(append)) vs
  *     `analyzeStats(incremental = false)` (full rebuild: O(table));
  *     the gap is the 100 TB append-maintenance claim.
  *
  * Correctness guard on every point: pruned scan row count == plain
  * scan row count. Output: one JSON line per point to
  * SPARK_GRAFT_BLOOM_OUT (default bloom_sweep.json); scan timings are
  * 3 in-JVM reps with medians + raws (same protocol as
  * skipping_sweep_r11.json), analyze timings single-shot (they are the
  * dominant cost under test, not a microsecond kernel).
  */
object BloomSweep {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = thunk()
    ((System.nanoTime() - t0) / 1e9, r)
  }

  // key `a` = even values 0,2,..,2(n-1): unique, high-cardinality, and
  // odd probes are in-range absent. `v` is payload.
  private def base(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select((col("id") * 2L).as("a"),
      pmod(col("id") * 7919L, lit(n)).as("b"),
      (col("id") * 3L).as("v"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_BLOOM_OUT", "bloom_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[bloom] $line"); results += line }
    def unwrap[A](e: Either[graft.warehouse.WarehouseError, A]): A =
      e.fold(err => throw new RuntimeException(err.message), identity)
    val reps = 3
    def filesRead(df: DataFrame): Long =
      org.apache.spark.sql.GraftFileIndexBridge.filesRead(df)

    val ns = Seq(100000L, 1000000L, 10000000L)
    def filesFor(n: Long): Int = math.max(8, (n / 100000L).toInt * 8)

    // ---- leg 1: bloom point lookup on a random layout ----
    for (n <- ns) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-bloom-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      val whPlain = new SparkWarehouse(spark, dir, skippingEnabled = false)
      val nf = filesFor(n)
      // hash repartition = random layout: every file spans ~the domain
      unwrap(wh.load("t", base(spark, n).repartition(nf)))
      val (statsSec, _) = timed(() => unwrap(wh.analyzeStats("t")))
      val totalFiles = unwrap(wh.get("t")).inputFiles.length
      val present = col("a") === lit(n) // even, present once
      val absent = col("a") === lit(n + 1L) // odd, in-range, absent
      val zoneFilesPresent = filesRead(unwrap(wh.scanPruned("t", present)))
      val zoneFilesAbsent = filesRead(unwrap(wh.scanPruned("t", absent)))
      val (bloomSec, bloomFiles) =
        timed(() => unwrap(wh.analyzeBloom("t", Seq("a"))))
      val bloomFilesPresent = filesRead(unwrap(wh.scanPruned("t", present)))
      val bloomFilesAbsent = filesRead(unwrap(wh.scanPruned("t", absent)))
      val prunedT = (1 to reps).map(_ =>
        timed(() => unwrap(wh.scanPruned("t", present)).count())._1).sorted
      val plainT = (1 to reps).map(_ =>
        timed(() => unwrap(whPlain.get("t")).filter(present).count())._1).sorted
      val rows = unwrap(wh.scanPruned("t", present)).count()
      val plainRows = unwrap(whPlain.get("t")).filter(present).count()
      require(rows == plainRows && rows == 1L,
        s"bloom pruned/plain drift: $rows vs $plainRows (want 1)")
      require(unwrap(wh.scanPruned("t", absent)).count() == 0L,
        "bloom absent probe returned rows")
      record(
        s"""{"leg":"bloom","n":$n,"files_total":$totalFiles,""" +
          s""""zone_files_present":$zoneFilesPresent,""" +
          s""""zone_files_absent":$zoneFilesAbsent,""" +
          s""""bloom_files_present":$bloomFilesPresent,""" +
          s""""bloom_files_absent":$bloomFilesAbsent,""" +
          s""""analyze_stats_sec":$statsSec,""" +
          s""""analyze_bloom_sec":$bloomSec,"files_bloomed":$bloomFiles,""" +
          s""""pruned_sec":${prunedT(reps / 2)},""" +
          s""""plain_sec":${plainT(reps / 2)},""" +
          s""""pruned_raw":${prunedT.mkString("[", ",", "]")},""" +
          s""""plain_raw":${plainT.mkString("[", ",", "]")}}""")
    }

    // ---- leg 2: incremental analyze vs full rebuild after an append ----
    for (n <- ns) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-incstat-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      val whPlain = new SparkWarehouse(spark, dir, skippingEnabled = false)
      val nf = filesFor(n)
      unwrap(wh.load("t", base(spark, n).repartition(nf)))
      val (initialSec, initialFiles) =
        timed(() => unwrap(wh.analyzeStats("t")))
      // append 10% new rows (disjoint key range), few files
      val extra = spark.range(n, n + n / 10)
        .select((col("id") * 2L).as("a"),
          pmod(col("id") * 7919L, lit(n)).as("b"),
          (col("id") * 3L).as("v"))
      unwrap(wh.load("t", extra.repartition(math.max(1, nf / 10))))
      val (incSec, incFiles) = timed(() => unwrap(wh.analyzeStats("t")))
      val (fullSec, fullFiles) =
        timed(() => unwrap(wh.analyzeStats("t", incremental = false)))
      val pred = col("a") >= lit(2L * n) // only appended rows match
      val rows = unwrap(wh.scanPruned("t", pred)).count()
      val plainRows = unwrap(whPlain.get("t")).filter(pred).count()
      require(rows == plainRows && rows == n / 10,
        s"incstat pruned/plain drift: $rows vs $plainRows (want ${n / 10})")
      val readFiles = filesRead(unwrap(wh.scanPruned("t", pred)))
      record(
        s"""{"leg":"incremental","n":$n,"appended":${n / 10},""" +
          s""""initial_analyze_sec":$initialSec,""" +
          s""""initial_files":$initialFiles,""" +
          s""""incremental_analyze_sec":$incSec,""" +
          s""""incremental_files":$incFiles,""" +
          s""""full_reanalyze_sec":$fullSec,"full_files":$fullFiles,""" +
          s""""append_scan_files_read":$readFiles}""")
    }

    // ---- leg 3: dynamic file pruning for joins (joinPruned) ----
    // clustered fact + 40-consecutive-key dim: the BETWEEN hull closes
    // all but ~1 file; random fact + blooms + 3 scattered keys: the IN
    // list closes all but ~3. Baseline = the same broadcast join on the
    // skipping-disabled frame.
    for (n <- ns) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-dfp-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      val whPlain = new SparkWarehouse(spark, dir, skippingEnabled = false)
      val nf = filesFor(n)
      unwrap(wh.load("fact", base(spark, n).repartition(16)))
      unwrap(wh.compact("fact", targetFiles = nf, sortCols = Seq("a")))
      unwrap(wh.analyzeStats("fact"))
      val totalFiles = unwrap(wh.get("fact")).inputFiles.length
      import spark.implicits._
      val dim = (n until n + 80L by 2L).map(k => (k, s"d$k")).toDF("dk", "dn")
      val pruned = unwrap(wh.joinPruned("fact", "a", dim, "dk"))
      val dfpFiles = filesRead(pruned)
      val prunedT = (1 to reps).map(_ => timed(() =>
        unwrap(wh.joinPruned("fact", "a", dim, "dk")).count())._1).sorted
      def plainJoin() = unwrap(whPlain.get("fact"))
        .join(broadcast(dim), col("a") === col("dk"))
      val plainT = (1 to reps).map(_ =>
        timed(() => plainJoin().count())._1).sorted
      val rows = pruned.count()
      require(rows == plainJoin().count() && rows == 40L,
        s"dfp drift: $rows")
      // random layout + blooms, 3 scattered point keys
      unwrap(wh.compact("fact", targetFiles = nf))
      unwrap(wh.analyzeStats("fact"))
      unwrap(wh.analyzeBloom("fact", Seq("a")))
      val dim3 = Seq(2L, n - (n % 2) + n / 2, 2L * (n - 1)).distinct
        .map(k => (k, k)).toDF("dk", "w")
      val j3 = unwrap(wh.joinPruned("fact", "a", dim3, "dk"))
      val bloomFiles = filesRead(j3)
      val bloomT = (1 to reps).map(_ => timed(() =>
        unwrap(wh.joinPruned("fact", "a", dim3, "dk")).count())._1).sorted
      val plain3T = (1 to reps).map(_ => timed(() =>
        unwrap(whPlain.get("fact"))
          .join(broadcast(dim3), col("a") === col("dk")).count())._1).sorted
      record(
        s"""{"leg":"dfp","n":$n,"files_total":$totalFiles,""" +
          s""""hull_files_read":$dfpFiles,""" +
          s""""hull_join_sec":${prunedT(reps / 2)},""" +
          s""""hull_plain_sec":${plainT(reps / 2)},""" +
          s""""bloom_files_read":$bloomFiles,""" +
          s""""bloom_join_sec":${bloomT(reps / 2)},""" +
          s""""bloom_plain_sec":${plain3T(reps / 2)},""" +
          s""""hull_raw":${prunedT.mkString("[", ",", "]")},""" +
          s""""bloom_raw":${bloomT.mkString("[", ",", "]")}}""")
    }

    // ---- leg 4: metadata-only aggregates (statsAggFast) ----
    // warm metadata path vs the real scan for the same three numbers
    for (n <- Seq(1000000L, 10000000L)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-fastagg-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      unwrap(wh.load("t", base(spark, n).repartition(filesFor(n))))
      unwrap(wh.analyzeStats("t"))
      unwrap(wh.statsAggFast("t", Seq("a"))).collect() // warm the cache
      val metaT = (1 to reps).map(_ => timed(() =>
        unwrap(wh.statsAggFast("t", Seq("a"))).collect())._1).sorted
      val scanT = (1 to reps).map(_ => timed(() =>
        unwrap(wh.get("t")).agg(count(lit(1)), min("a"), max("a"))
          .collect())._1).sorted
      val m = unwrap(wh.statsAggFast("t", Seq("a"))).head
      val sRow = unwrap(wh.get("t"))
        .agg(count(lit(1)).as("cnt"), min("a").as("min_a"),
          max("a").as("max_a")).head
      require(m == sRow, s"fastagg drift: $m vs $sRow")
      record(
        s"""{"leg":"fastagg","n":$n,""" +
          s""""meta_sec":${metaT(reps / 2)},"scan_sec":${scanT(reps / 2)},""" +
          s""""meta_raw":${metaT.mkString("[", ",", "]")},""" +
          s""""scan_raw":${scanT.mkString("[", ",", "]")}}""")
    }

    // ---- leg 5: bloom-cache driver-memory budget at many files ----
    // the scale point the r11 verdict asked for: decoded residency at
    // ~800 (file, column) filters, plus the over-budget behavior (bloom
    // pruning disabled, zone pruning and results intact)
    {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-budget-800").toString
      val wh = new SparkWarehouse(spark, dir)
      val n = 800000L
      unwrap(wh.load("t", base(spark, n).repartition(800)))
      unwrap(wh.analyzeStats("t"))
      val (bloomSec, _) = timed(() => unwrap(wh.analyzeBloom("t", Seq("a"))))
      val probe = col("a") === lit(1000L) // even → present exactly once
      val filesPruned = filesRead(unwrap(wh.scanPruned("t", probe)))
      require(unwrap(wh.scanPruned("t", probe)).count() == 1L)
      val (resTables, resBytes) = wh.bloomCacheResident
      // a fresh warehouse under a tiny budget: decode refused, pruning
      // falls back to zone maps (random layout → all files), same rows
      spark.conf.set("spark.graft.bloomCache.maxBytes", "4096")
      val wh2 = new SparkWarehouse(spark, dir)
      val filesOver = filesRead(unwrap(wh2.scanPruned("t", probe)))
      require(unwrap(wh2.scanPruned("t", probe)).count() == 1L)
      spark.conf.unset("spark.graft.bloomCache.maxBytes")
      record(
        s"""{"leg":"budget","n":$n,"files":800,""" +
          s""""analyze_bloom_sec":$bloomSec,""" +
          s""""decoded_bytes":$resBytes,"resident_tables":$resTables,""" +
          s""""files_read_pruned":$filesPruned,""" +
          s""""files_read_over_budget":$filesOver}""")
    }

    // ---- leg 6: prefix + n-gram filters (r13) on a random layout ----
    // the substring-predicate family: zone maps read everything here
    // (every file spans the domain), the prefix filter serves
    // LIKE 'q%', the n-gram filter serves LIKE '%x%' — files_read
    // before/after on the SAME table, plus the sidecar's byte cost.
    for (n <- Seq(100000L, 1000000L)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-pfxngram-$n").toString
      val wh = new SparkWarehouse(spark, dir)
      val whPlain = new SparkWarehouse(spark, dir, skippingEnabled = false)
      val nf = filesFor(n)
      val docs = spark.range(n).select(
        format_string("https://s%d.x/p", col("id")).as("url"),
        format_string("begin doc%d tail", col("id")).as("body"),
        col("id").as("v"))
      unwrap(wh.load("t", docs.repartition(nf)))
      unwrap(wh.analyzeStats("t"))
      val totalFiles = unwrap(wh.get("t")).inputFiles.length
      val prefProbe = col("url").startsWith(s"https://s${n / 2}.")
      val containsProbe = col("body").contains(s" doc${n / 2} ")
      val zonePref = filesRead(unwrap(wh.scanPruned("t", prefProbe)))
      val zoneCont = filesRead(unwrap(wh.scanPruned("t", containsProbe)))
      val (anSec, _) = timed(() => unwrap(wh.analyzeBloom("t",
        Seq("url", "body"), prefixBytes = 12, ngramBytes = 6)))
      val pfxFiles = filesRead(unwrap(wh.scanPruned("t", prefProbe)))
      val ngramFiles = filesRead(unwrap(wh.scanPruned("t", containsProbe)))
      val sidecarBytes = Option(spark.read
          .parquet(s"$dir/t/_graft_bloom")
          .agg(sum(length(col("bloom")))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val prunedT = (1 to reps).map(_ => timed(() =>
        unwrap(wh.scanPruned("t", containsProbe)).count())._1).sorted
      val plainT = (1 to reps).map(_ => timed(() =>
        unwrap(whPlain.get("t")).filter(containsProbe).count())._1).sorted
      val rows = unwrap(wh.scanPruned("t", containsProbe)).count()
      val plainRows = unwrap(whPlain.get("t")).filter(containsProbe).count()
      require(rows == plainRows && rows == 1L,
        s"pfx/ngram pruned/plain drift: $rows vs $plainRows (want 1)")
      require(unwrap(wh.scanPruned("t", prefProbe)).count() == 1L,
        "prefix probe drift")
      record(
        s"""{"leg":"pfx_ngram","n":$n,"files_total":$totalFiles,""" +
          s""""zone_files_prefix":$zonePref,""" +
          s""""zone_files_contains":$zoneCont,""" +
          s""""pfx_files_prefix":$pfxFiles,""" +
          s""""ngram_files_contains":$ngramFiles,""" +
          s""""analyze_sec":$anSec,"sidecar_bytes":$sidecarBytes,""" +
          s""""contains_pruned_sec":${prunedT(reps / 2)},""" +
          s""""contains_plain_sec":${plainT(reps / 2)},""" +
          s""""pruned_raw":${prunedT.mkString("[", ",", "]")},""" +
          s""""plain_raw":${plainT.mkString("[", ",", "]")}}""")
    }

    // ---- leg 7: n-gram filter sizing from MEASURED window cardinality
    // (r14) on a REPETITIVE 1M corpus — real document text repeats its
    // n-byte windows heavily (language entropy ≪ rows×len), which is
    // exactly where the r13 rows×24 heuristic over-allocated. Old
    // sizing is reproduced via explicit expectedItemsPerFile =
    // rowsPerFile×24 (the same capacity the heuristic computed); the
    // comparison holds files_read EQUAL on present and absent substring
    // probes while the sidecar shrinks.
    for (n <- Seq(1000000L)) {
      val nf = filesFor(n)
      val rowsPerFile = n / nf
      // ~1k distinct templates: per-file distinct 6-byte windows are a
      // few thousand, vs the heuristic's rowsPerFile×24 = 300k capacity
      val docs = spark.range(n).select(
        format_string("item %d of batch %d in the usual place",
          pmod(col("id"), lit(997L)), pmod(col("id"), lit(131L)))
          .as("body"),
        col("id").as("v"))
      def sidecarBytesOf(dir: String): Long =
        Option(spark.read.parquet(s"$dir/t/_graft_bloom")
            .filter(col("column").contains("ngram"))
            .agg(sum(length(col("bloom")))).head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
      val present = col("body").contains("item 499 of batch 77 ")
      val absent = col("body").contains("item 999 of batch 999")
      val presentRows = docs.filter(present).count()
      def run(sizing: String, expected: Long): (Long, Long, Long, Double) = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-ngsz-$sizing").toString
        val wh = new SparkWarehouse(spark, dir)
        unwrap(wh.load("t", docs.repartition(nf)))
        unwrap(wh.analyzeStats("t"))
        val (anSec, _) = timed(() => unwrap(wh.analyzeBloom("t",
          Seq("body"), expectedItemsPerFile = expected, ngramBytes = 6)))
        val fp = filesRead(unwrap(wh.scanPruned("t", present)))
        val fa = filesRead(unwrap(wh.scanPruned("t", absent)))
        require(unwrap(wh.scanPruned("t", present)).count() == presentRows,
          s"$sizing sizing dropped matching rows")
        require(unwrap(wh.scanPruned("t", absent)).count() == 0L)
        (sidecarBytesOf(dir), fp, fa, anSec)
      }
      val (oldBytes, oldP, oldA, oldSec) = run("rows24", rowsPerFile * 24L)
      val (newBytes, newP, newA, newSec) = run("measured", 0L)
      require(newP <= oldP && newA <= oldA,
        s"measured sizing reads MORE files: $newP/$newA vs $oldP/$oldA")
      record(
        s"""{"leg":"ngram_sizing","n":$n,"files":$nf,""" +
          s""""rows24_sidecar_bytes":$oldBytes,""" +
          s""""measured_sidecar_bytes":$newBytes,""" +
          s""""shrink_factor":${oldBytes.toDouble / newBytes},""" +
          s""""rows24_files_present":$oldP,"measured_files_present":$newP,""" +
          s""""rows24_files_absent":$oldA,"measured_files_absent":$newA,""" +
          s""""rows24_analyze_sec":$oldSec,""" +
          s""""measured_analyze_sec":$newSec}""")
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      results.mkString("[\n", ",\n", "\n]")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
