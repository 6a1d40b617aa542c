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
  * Corpora: embeddings ×k (k = 1/5/25 → 2k/10k/50k vectors, d = 64),
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

    scales.foreach { kScale =>
      val corpus = spark.read.parquet(s"$work/emb_x$kScale")
      val rows = 2000L * kScale

      val (tBrute, nBrute) =
        timed(() => Similarity.bruteForceTopK(corpus, queries, k = 10).count())
      record(s"""{"method":"brute_force","scale":"x$kScale","rows":$rows,""" +
        s""""out":$nBrute,"sec":$tBrute}""")

      val (tLsh, nLsh) =
        timed(() => Similarity.lshTopK(corpus, queries, k = 10).count())
      record(s"""{"method":"lsh","scale":"x$kScale","rows":$rows,""" +
        s""""out":$nLsh,"sec":$tLsh}""")

      val (tIvfBuild, ivfModel) = timed(() => {
        val m = Ivf.train(corpus, "embedding", nCentroids = 16)
        Ivf.writeIndex(Ivf.index(corpus, m), s"$work/ivf_x$kScale")
        m
      })
      record(s"""{"method":"ivf_build","scale":"x$kScale","rows":$rows,""" +
        s""""out":0,"sec":$tIvfBuild}""")
      val ivfIndex = Ivf.readIndex(spark, s"$work/ivf_x$kScale")
      val (tIvf, nIvf) = timed(() =>
        Ivf.topKPruned(ivfIndex, queries, ivfModel, k = 10, nProbe = 2).count())
      record(s"""{"method":"ivf_pruned","scale":"x$kScale","rows":$rows,""" +
        s""""out":$nIvf,"sec":$tIvf}""")

      val (tPqBuild, pqModel) = timed(() => {
        val m = IvfPq.train(corpus, "embedding", nCentroids = 16, m = 8)
        IvfPq.index(corpus, m).write.mode("overwrite")
          .partitionBy("centroid").parquet(s"$work/ivfpq_x$kScale")
        m
      })
      record(s"""{"method":"ivfpq_build","scale":"x$kScale","rows":$rows,""" +
        s""""out":0,"sec":$tPqBuild}""")
      val pqIndex = spark.read.parquet(s"$work/ivfpq_x$kScale")
      val (tPq, nPq) = timed(() =>
        IvfPq.topKPruned(pqIndex, queries, pqModel, k = 10, nProbe = 2).count())
      record(s"""{"method":"ivfpq_pruned","scale":"x$kScale","rows":$rows,""" +
        s""""out":$nPq,"sec":$tPq}""")
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[ann] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
