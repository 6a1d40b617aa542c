package graft.tools

import graft.Tables
import graft.ext.{Ivf, IvfPq, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN query-cost sweep: brute-force vs IVF vs IVF-PQ as the corpus
  * grows — the similarity-search pillar's scale measurement (the other
  * pillars are covered by [[ScaleSweep]] / [[AdversarialSweep]] /
  * [[LoadSweep]] / [[StreamSweep]]).
  *
  * Corpora: embeddings ×k (k = 1/25/125/625 → 2k/50k/250k/1.25M
  * vectors, d = 64),
  * each copy id-offset and jittered per-dimension by a copy-specific
  * epsilon — realistic density, no exact duplicates. Per scale point,
  * the IVF / IVF-PQ models train on the bounded seeded sample and the
  * index is PERSISTED partitioned by centroid (the 100 TB layout);
  * build cost is reported separately from query cost, because at scale
  * you build once and query forever. Query cost = one 32-query batch,
  * k = 10.
  *
  * Claim under test: brute-force query cost grows linearly with the
  * corpus (it must — it reads everything), while the pruned-probe paths
  * read only their probed partition directories, so their query cost
  * stays near-flat while THEIR index build is the linear pass. Output:
  * one JSON line per (method, k) to SPARK_GRAFT_ANN_OUT (default
  * ann_sweep.json).
  */
object AnnSweep {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = thunk()
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_ANN_OUT", "ann_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = "target/annsweep"
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[ann] $line"); results += line }

    val base = Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    val scales = Seq(1, 25, 125, 625)
    scales.foreach { k =>
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

    // warmup (JIT + codegen for both kernel families), results discarded
    Similarity.bruteForceTopK(spark.read.parquet(s"$work/emb_x1"),
      queries, k = 10).count()
    Ivf.topKPruned(Ivf.index(spark.read.parquet(s"$work/emb_x1"),
        Ivf.train(spark.read.parquet(s"$work/emb_x1"), "embedding", 16)),
      queries, Ivf.train(spark.read.parquet(s"$work/emb_x1"), "embedding", 16),
      k = 10).count()

    // pair set for recall-vs-brute (tiny: |queries|·k rows)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    scales.foreach { kScale =>
      val corpus = spark.read.parquet(s"$work/emb_x$kScale")
      val rows = 2000L * kScale

      val (tBrute, bruteSet) =
        timed(() => pairs(Similarity.bruteForceTopK(corpus, queries, k = 10)))
      record(s"""{"method":"brute_force","scale":"x$kScale","rows":$rows,""" +
        s""""out":${bruteSet.size},"sec":$tBrute,"recall":1.0}""")
      def recall(s: Set[(Long, Long)]): Double =
        s.intersect(bruteSet).size.toDouble / bruteSet.size

      val (tLsh, lshSet) =
        timed(() => pairs(Similarity.lshTopK(corpus, queries, k = 10)))
      record(s"""{"method":"lsh","scale":"x$kScale","rows":$rows,""" +
        s""""out":${lshSet.size},"sec":$tLsh,"recall":${recall(lshSet)}}""")

      val (tIvfBuild, ivfModel) = timed(() => {
        val m = Ivf.train(corpus, "embedding", nCentroids = 16)
        Ivf.writeIndex(Ivf.index(corpus, m), s"$work/ivf_x$kScale")
        m
      })
      record(s"""{"method":"ivf_build","scale":"x$kScale","rows":$rows,""" +
        s""""out":0,"sec":$tIvfBuild}""")
      val ivfIndex = Ivf.readIndex(spark, s"$work/ivf_x$kScale")
      val (tIvf, ivfSet) = timed(() => pairs(
        Ivf.topKPruned(ivfIndex, queries, ivfModel, k = 10, nProbe = 2)))
      record(s"""{"method":"ivf_pruned","scale":"x$kScale","rows":$rows,""" +
        s""""out":${ivfSet.size},"sec":$tIvf,"recall":${recall(ivfSet)}}""")

      val (tPqBuild, pqModel) = timed(() => {
        val m = IvfPq.train(corpus, "embedding", nCentroids = 16, m = 8)
        IvfPq.index(corpus, m).write.mode("overwrite")
          .partitionBy("centroid").parquet(s"$work/ivfpq_x$kScale")
        m
      })
      record(s"""{"method":"ivfpq_build","scale":"x$kScale","rows":$rows,""" +
        s""""out":0,"sec":$tPqBuild}""")
      val pqIndex = spark.read.parquet(s"$work/ivfpq_x$kScale")
      val (tPq, pqSet) = timed(() => pairs(
        IvfPq.topKPruned(pqIndex, queries, pqModel, k = 10, nProbe = 2)))
      record(s"""{"method":"ivfpq_pruned","scale":"x$kScale","rows":$rows,""" +
        s""""out":${pqSet.size},"sec":$tPq,"recall":${recall(pqSet)}}""")
      // the compact two-table layout: codes-only prune scan + id-filtered
      // vector fetch — the scan-bytes answer to the rescore gap
      IvfPq.writeIndexCompact(corpus, pqModel, s"$work/ivfpqc_x$kScale")
      val (tPqC, pqCSet) = timed(() => {
        val r = IvfPq.topKPrunedCompact(spark, s"$work/ivfpqc_x$kScale",
          queries, pqModel, k = 10, nProbe = 2)
        val s = pairs(r)
        org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(r)
        s
      })
      record(s"""{"method":"ivfpq_compact","scale":"x$kScale","rows":$rows,""" +
        s""""out":${pqCSet.size},"sec":$tPqC,"recall":${recall(pqCSet)}}""")

      // the ADC prune can only retain nCandidates rows per query; when a
      // duplicate cluster wider than that collapses to ADC near-ties the
      // true top-k dies BEFORE rescore — probe the remedy (wider prune)
      // at the widest point to pin the explanation
      if (kScale == scales.last) {
        val (tPqW, pqWSet) = timed(() => pairs(
          IvfPq.topKPruned(pqIndex, queries, pqModel, k = 10, nProbe = 2,
            nCandidates = 1024)))
        record(s"""{"method":"ivfpq_pruned_c1024","scale":"x$kScale",""" +
          s""""rows":$rows,"out":${pqWSet.size},"sec":$tPqW,""" +
          s""""recall":${recall(pqWSet)}}""")
      }
    }

    // ---- the calibration curve on the REAL corpus: what probe width
    // does THIS corpus need? (the ×1 recall findings' actionable answer)
    {
      val corpus = spark.read.parquet(s"$work/emb_x1")
      val model = Ivf.train(corpus, "embedding", nCentroids = 16)
      val indexed = Ivf.index(corpus, model)
      Ivf.calibrateNProbe(indexed, queries, model, k = 10, maxProbe = 16)
        .orderBy("n_probe").collect().foreach { r =>
          record(s"""{"method":"ivf_calibration","scale":"x1","rows":2000,""" +
            s""""n_probe":${r.getInt(0)},"recall":${r.getDouble(3)}}""")
        }
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[ann] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
