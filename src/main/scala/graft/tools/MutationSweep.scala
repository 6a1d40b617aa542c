package graft.tools

import graft.Tables
import graft.warehouse.SparkWarehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-mutation sweep: upsert / predicate DML / compaction
  * time-vs-rows — the last operator family without a measured curve
  * (batch kernels, adversarial density, load path, streaming, and ANN
  * are covered by the sibling sweeps).
  *
  * Each mutation on a parquet warehouse is scan + join/filter +
  * atomic rewrite, so the claim under test is linearity in table size
  * with the change-set size held at a realistic fraction (10% updated,
  * 1% inserted). Output: one JSON line per (op, n) to
  * SPARK_GRAFT_MUT_OUT (default mutation_sweep.json).
  */
object MutationSweep {

  private def timed[A](thunk: () => A): Double = {
    val t0 = System.nanoTime()
    thunk()
    (System.nanoTime() - t0) / 1e9
  }

  private def base(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"),
      concat(lit("name_"), col("id")).as("name"),
      pmod(col("id"), lit(7L)).cast("int").as("segment"),
      (pmod(col("id") * 37L, lit(100000L)) / lit(100L)).as("balance"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_MUT_OUT", "mutation_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[mut] $line"); results += line }
    def unwrap[A](e: Either[graft.warehouse.WarehouseError, A]): A =
      e.fold(err => throw new RuntimeException(err.message), identity)

    val ns = Seq(10000L, 100000L, 1000000L, 10000000L)
    // warmup at the smallest size (committer init, JIT), discarded
    locally {
      val wh = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory("graft-mut-warm").toString)
      unwrap(wh.load("t", base(spark, ns.head)))
      unwrap(wh.upsert("t", base(spark, 100).limit(10), Seq("id")))
    }

    ns.foreach { n =>
      val wh = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory(s"graft-mut-$n").toString)
      val tLoad = timed(() => unwrap(wh.load("t", base(spark, n))))
      record(s"""{"op":"load","rows":$n,"sec":$tLoad}""")

      // 10% changed rows + 1% fresh keys
      val changes = base(spark, n).filter(pmod(col("id"), lit(10L)) === 0)
        .withColumn("balance", col("balance") + 1.0)
        .unionByName(base(spark, n + n / 100).filter(col("id") >= n))
      val tUps = timed(() => unwrap(wh.upsert("t", changes, Seq("id"))))
      record(s"""{"op":"upsert_10pct","rows":$n,"sec":$tUps}""")

      val tUpd = timed(() => unwrap(wh.updateWhere("t",
        Map("balance" -> (col("balance") * 2.0)), col("segment") === 3)))
      record(s"""{"op":"update_where","rows":$n,"sec":$tUpd}""")

      val tDel = timed(() => unwrap(wh.deleteWhere("t",
        col("segment") === 5)))
      record(s"""{"op":"delete_where","rows":$n,"sec":$tDel}""")

      val tCmp = timed(() => unwrap(wh.compact("t", targetFiles = 4,
        sortCols = Seq("id"))))
      record(s"""{"op":"compact_sorted","rows":$n,"sec":$tCmp}""")

      // final content sanity: base + 1% fresh, minus the deleted segment
      val rows = unwrap(wh.get("t")).count()
      val expected = spark.range(n + n / 100)
        .filter(pmod(col("id"), lit(7L)) =!= 5L).count()
      require(rows == expected, s"content drift at n=$n: $rows != $expected")

      // partition-pruned MERGE (r9): the same one-day change-set (10% of
      // one of 32 day-partitions) against (a) a day-partitioned table
      // whose upsert keys include the partition column — only the
      // touched directory is rewritten — and (b) a flat copy, where the
      // merge must rewrite the whole table. The claim under test: the
      // pruned cost tracks the TOUCHED partition's size (~n/32), so the
      // (b)/(a) ratio grows toward 32 with table size.
      val basep = base(spark, n).withColumn("day", pmod(col("id"), lit(32L)))
      val oneDay = basep
        .filter(col("day") === 7 && pmod(col("id"), lit(10L)) === 0)
        .withColumn("balance", col("balance") + 1.0)
      val whp = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory(s"graft-mutp-$n").toString)
      unwrap(whp.createPartitioned("tp", basep, Seq("day")))
      val tP1 = timed(() => unwrap(whp.upsert("tp", oneDay, Seq("id", "day"))))
      record(s"""{"op":"upsert_part_1day","rows":$n,"sec":$tP1}""")
      val pRows = unwrap(whp.get("tp")).count()
      require(pRows == n, s"pruned upsert drift at n=$n: $pRows != $n")
      val whf = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory(s"graft-mutf-$n").toString)
      unwrap(whf.load("tf", basep))
      val tF1 = timed(() => unwrap(whf.upsert("tf", oneDay, Seq("id", "day"))))
      record(s"""{"op":"upsert_flat_1day","rows":$n,"sec":$tF1}""")

      // partition-pruned predicate DML (r9): DELETE of one day on the
      // partitioned table is a directory drop (no data file read) —
      // its cost must be flat in table size — vs the same predicate on
      // the flat copy (whole-table rewrite). The pruned UPDATE of one
      // day rewrites only that directory.
      val tPD = timed(() => unwrap(whp.deleteWhere("tp", col("day") === 9)))
      record(s"""{"op":"delete_part_1day","rows":$n,"sec":$tPD}""")
      val tFD = timed(() => unwrap(whf.deleteWhere("tf", col("day") === 9)))
      record(s"""{"op":"delete_flat_1day","rows":$n,"sec":$tFD}""")
      val tPU = timed(() => unwrap(whp.updateWhere("tp",
        Map("balance" -> (col("balance") + 1.0)), col("day") === 11)))
      record(s"""{"op":"update_part_1day","rows":$n,"sec":$tPU}""")
      val pAfter = unwrap(whp.get("tp")).count()
      val fAfter = unwrap(whf.get("tf")).count()
      require(pAfter == fAfter,
        s"pruned/flat DML drift at n=$n: $pAfter != $fAfter")

      // merge-on-read vs copy-on-write POINT DML (r10): a selective
      // predicate (one key) that is NOT partition-only. CoW must
      // rewrite the whole table (cost grows with n); MoR appends one
      // tombstone / one delta row after a pushed-filter scan whose
      // row-group stats skip almost everything (cost ~flat in n —
      // the deletion-vector claim under test). Also measured: the
      // read-side anti-join tax while vectors are pending, and the
      // compaction that folds them.
      val whm = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory(s"graft-mutm-$n").toString)
      unwrap(whm.load("tm", base(spark, n)))
      val whc = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory(s"graft-mutc-$n").toString)
      unwrap(whc.load("tc", base(spark, n)))
      val tMDel = timed(() => unwrap(whm.deleteWhereMor("tm",
        col("id") === n / 2)))
      record(s"""{"op":"delete_point_mor","rows":$n,"sec":$tMDel}""")
      val tCDel = timed(() => unwrap(whc.deleteWhere("tc",
        col("id") === n / 2)))
      record(s"""{"op":"delete_point_cow","rows":$n,"sec":$tCDel}""")
      val tMUpd = timed(() => unwrap(whm.updateWhereMor("tm",
        Map("balance" -> (col("balance") + 5.0)), col("id") === n / 3)))
      record(s"""{"op":"update_point_mor","rows":$n,"sec":$tMUpd}""")
      val tCUpd = timed(() => unwrap(whc.updateWhere("tc",
        Map("balance" -> (col("balance") + 5.0)), col("id") === n / 3)))
      record(s"""{"op":"update_point_cow","rows":$n,"sec":$tCUpd}""")
      val tMRead = timed(() => unwrap(whm.get("tm")).count())
      record(s"""{"op":"read_with_dv","rows":$n,"sec":$tMRead}""")
      val tMFold = timed(() => unwrap(whm.compact("tm", targetFiles = 4)))
      record(s"""{"op":"compact_fold_dv","rows":$n,"sec":$tMFold}""")
      // end-state equivalence: MoR (folded) ≡ CoW. Exact row count;
      // the balance sum is compared within double-summation tolerance
      // (partition order differs between the two tables, and double
      // addition is not associative — the oracle gates pin exact
      // row-level equivalence, this is the sweep's sanity check)
      def state(wh: SparkWarehouse, t: String): (Long, Double) = {
        val r = unwrap(wh.get(t))
          .agg(count(lit(1)), sum(col("balance"))).head()
        (r.getLong(0), r.getDouble(1))
      }
      val (nM, sM) = state(whm, "tm")
      val (nC, sC) = state(whc, "tc")
      require(nM == nC && math.abs(sM - sC) <= 1e-9 * math.max(1.0, math.abs(sC)),
        s"MoR/CoW drift at n=$n: ($nM,$sM) != ($nC,$sC)")
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[mut] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
