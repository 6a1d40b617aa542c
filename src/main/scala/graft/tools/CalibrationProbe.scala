package graft.tools

import graft.Tables
import graft.ext.Ivf
import org.apache.spark.sql.functions._

/** Calibrated-IVF-build probe — the r9 artifact for the verdict's
  * wiring item: a DEFAULT-built index (`Ivf.buildCalibrated`) must
  * reach its target recall on the real corpus, with the recommendation
  * and its cost recorded per scale point. Uses [[AnnSweep]]'s jittered
  * ×k corpora (realistic density, no exact duplicates; materialized to
  * `target/annsweep` — run after AnnSweep or it materializes its own).
  *
  * Per point: calibrated build seconds (train + index + recall-curve
  * measurement), the recommended nProbe, the estimated recall at it, a
  * verification query pass AT the recommended width with its recall
  * against fresh brute-force truth (the recommendation must be real,
  * not an artifact of the calibration sample), and the
  * pruning-effective flag (false = the cluster-free regime where
  * reaching the target needs most of the cells). Output:
  * SPARK_GRAFT_CAL_OUT (default calibration.json).
  */
object CalibrationProbe {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = thunk()
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CAL_OUT", "calibration.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = "target/annsweep"
    val results = scala.collection.mutable.ArrayBuffer.empty[String]

    val base = Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    val scales = Seq(1, 25)
    scales.foreach { k =>
      if (!new java.io.File(s"$work/emb_x$k/_SUCCESS").exists())
        base.select(explode(sequence(lit(0L), lit(k - 1L))).as("i"),
            col("vec_id"), col("embedding"))
          .select((col("vec_id") + col("i") * lit(10000000L)).as("vec_id"),
            transform(col("embedding"),
              x => (x + col("i").cast("float") * lit(0.0017f)).cast("float"))
              .as("embedding"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$work/emb_x$k")
    }
    val queries = base.filter(col("vec_id") < 32)

    // warmup: a tiny calibrated build end to end
    Ivf.buildCalibrated(
      Tables(spark, "/root/testdata/sf0.01", "embeddings"),
      nCentroids = 8, k = 5, nQueries = 8).release()

    scales.foreach { kScale =>
      val corpus = spark.read.parquet(s"$work/emb_x$kScale")
      val rows = 2000L * kScale
      val (tBuild, built) = timed(() =>
        Ivf.buildCalibrated(corpus, nCentroids = 16, k = 10,
          targetRecall = 0.9, nQueries = 32))
      val cal = built.calibration
      // verify the recommendation against FRESH truth: probe the
      // persisted-index path at the recommended width with an
      // independent query batch
      val idxPath = s"$work/ivfcal_x$kScale"
      Ivf.writeIndex(built.indexed, idxPath)
      Ivf.writeCalibration(spark, idxPath, cal)
      built.release() // snapshot written out; the probe reads the persisted path
      val idx = Ivf.readIndex(spark, idxPath)
      val evalQ = base.filter(col("vec_id") >= 32 && col("vec_id") < 64)
      val truth = graft.ext.Similarity.bruteForceTopK(corpus, evalQ, k = 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (tQuery, got) = timed(() =>
        Ivf.topKPruned(idx, evalQ, built.model, k = 10,
            nProbe = cal.recommendedNProbe)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
      val freshRecall = got.intersect(truth).size.toDouble / truth.size
      val line = s"""{"method":"ivf_calibrated","scale":"x$kScale",""" +
        s""""rows":$rows,"build_sec":$tBuild,""" +
        s""""recommended_n_probe":${cal.recommendedNProbe},""" +
        s""""target_recall":${cal.targetRecall},""" +
        s""""est_recall":${cal.estRecall},""" +
        s""""target_reached":${cal.targetReached},""" +
        s""""pruning_effective":${cal.pruningEffective},""" +
        s""""query_sec":$tQuery,"fresh_eval_recall":$freshRecall}"""
      println(s"[cal] $line")
      results += line

      // the two-knob IVF-PQ analog: same protocol, recall measured over
      // the (nProbe, nCandidates) grid; fresh-truth evaluation at the
      // recommended pair. Target 0.7 — the PQ path's recall vs EXACT
      // truth is quantization-bound (Round9Spec measures 0.79 on a full
      // scan at m=8), so 0.9 would just exercise the warning path.
      val (tBuildPq, builtPq) = timed(() =>
        graft.ext.IvfPq.buildCalibrated(corpus, nCentroids = 16, m = 8,
          k = 10, targetRecall = 0.7, nQueries = 32))
      val calPq = builtPq.calibration
      // the r9 artifact's defect: timing a probe over the LAZY indexed
      // plan re-derived the whole index per action and skipped the
      // persisted/compact layout the repo ships, overstating probe cost
      // ~5–7×. The honest protocol (the IVF leg's): persist the
      // calibrated snapshot to the compact two-table layout + sidecar,
      // read back, time ONLY the pruned compact probe at the
      // sidecar-recommended knobs.
      val idxPathPq = s"$work/ivfpqcal_x$kScale"
      graft.ext.IvfPq.writeIndexCompactFrom(builtPq.indexed, idxPathPq)
      graft.ext.IvfPq.writeCalibration(spark, idxPathPq, calPq)
      builtPq.release()
      val calPqStored = graft.ext.IvfPq.readCalibration(spark, idxPathPq)
        .getOrElse(sys.error(s"no calibration sidecar at $idxPathPq"))
      val (tQueryPq, gotPq) = timed(() => {
        val res = graft.ext.IvfPq.topKPrunedCompact(spark, idxPathPq, evalQ,
          builtPq.model, k = 10, nProbe = calPqStored.recommendedNProbe,
          nCandidates = calPqStored.recommendedNCandidates)
        val pairs = res.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(res)
        pairs
      })
      val freshPq = gotPq.intersect(truth).size.toDouble / truth.size
      val linePq = s"""{"method":"ivfpq_calibrated","scale":"x$kScale",""" +
        s""""rows":$rows,"build_sec":$tBuildPq,""" +
        s""""recommended_n_probe":${calPq.recommendedNProbe},""" +
        s""""recommended_n_candidates":${calPq.recommendedNCandidates},""" +
        s""""target_recall":${calPq.targetRecall},""" +
        s""""est_recall":${calPq.estRecall},""" +
        s""""target_reached":${calPq.targetReached},""" +
        s""""pruning_effective":${calPq.pruningEffective},""" +
        s""""query_sec":$tQueryPq,"fresh_eval_recall":$freshPq}"""
      println(s"[cal] $linePq")
      results += linePq
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[cal] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
