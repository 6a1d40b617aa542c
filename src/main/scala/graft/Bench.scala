package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Methodology: one untimed warmup execution per query (JIT + codegen
  * compilation + file-index caches), then `SPARK_GRAFT_BENCH_REPS`
  * timed executions (default 1; the driver's per-round run) with the
  * per-query MEDIAN reported — steady-state numbers, the standard
  * practice for JVM engines. The reported total is the sum of medians.
  *
  * The artifact is SELF-DESCRIBING (r8 verdict item 7: the r8 drift
  * band and the x83 re-measurement dispute both came from unlabeled
  * runs): `meta` stamps reps, JVM freshness (fresh per `runMain` —
  * run/fork := true), cpu count, heap, spark version, and the run
  * label, and `runs` keeps every rep's raw seconds per query so any
  * later dispute is attributable from the committed file alone.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val runLabel = sys.env.getOrElse("SPARK_GRAFT_RUN_ID", "driver")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        // a failed query must never look like a fast success
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val median =
        if (times.contains(-1.0)) -1.0
        else {
          val s = times.sorted
          val n = s.length
          // true median: average the two middle elements for even rep
          // counts (with reps=2 the upper-middle alone would report the
          // max of the two runs, not the median the meta claims)
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
        }
      (name, median, times)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // streaming machinery floor: one warmup + one timed run of the
    // s-gates' fixed protocol around a noop kernel (StreamQueries
    // .machineryFloor), stamped into meta so cross-round streaming
    // deltas can subtract fixed cost from artifacts alone. -1.0 = the
    // floor probe itself failed (never fake a zero floor).
    val streamFloor = try {
      graft.queries.StreamQueries.machineryFloor(spark, sfDir) // warmup
      val t0 = System.nanoTime()
      graft.queries.StreamQueries.machineryFloor(spark, sfDir)
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] stream floor probe failed: ${e.getMessage}")
        -1.0
    }
    val meta = s"""{"run":"$runLabel","reps":$reps,""" +
      s""""jvm":"fresh-per-runMain","cpus":$cpus,""" +
      s""""heap":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",""" +
      s""""spark":"${spark.version}",""" +
      s""""stream_floor_sec":$streamFloor,""" +
      s""""shuffle_partitions":"${spark.conf.get("spark.sql.shuffle.partitions")}"}"""
    val runs = results.map { case (k, _, ts) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","meta":$meta,"runs":$runs}"""
    // the driver contract: ONE line with metric/value/unit/queries/sf
    println(json)
    // the driver artifact keeps only a truncated stdout TAIL, losing most
    // per-gate timings; also write the full map to a file so every
    // round-over-round comparison is reproducible from disk
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
