package graft.tools

import graft.Tables
import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Micro-bench for the round-8 fused kernels vs their composable-HOF
  * oracles, at data scale (the gates run them at volumes where the
  * difference is invisible — that is how the ADC defect survived three
  * rounds). Prints one JSON line per (kernel, form).
  */
object KernelBench {

  private def timed(thunk: () => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = thunk()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- top-token ratio over every sf0.1 document, 20× replicated
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
      .select(explode(sequence(lit(0), lit(19))).as("i"), col("text"))
      .select(concat(col("text"), lit(" z"), col("i")).as("text"))
    docs.write.mode("overwrite").parquet("target/kb_docs")
    val staged = spark.read.parquet("target/kb_docs")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    def sumRatio(c: org.apache.spark.sql.Column): Long =
      staged.select(sum(c.cast("double")).cast("long").as("s"))
        .collect()(0).getLong(0)
    sumRatio(TextAnalysis.topTokenRatioOver(col("toks"))) // warmup
    val (tNat, _) = timed(() => sumRatio(TextAnalysis.topTokenRatioOver(col("toks"))))
    val (tCom, _) = timed(() =>
      sumRatio(TextAnalysis.topTokenRatioOverComposable(col("toks"))))
    println(s"""[kb] {"kernel":"top_token_ratio","rows":100000,""" +
      s""""native_sec":$tNat,"composable_sec":$tCom}""")

    // ---- remaining interpreted per-token folds, measured to decide
    // whether fusing is worth it (attribute-only lambdas, linear)
    val stagedText = spark.read.parquet("target/kb_docs")
    def sumLong(c: org.apache.spark.sql.Column): Long =
      stagedText.select(sum(c).cast("long").as("s")).collect()(0).getLong(0)
    sumLong(TextAnalysis.bagFingerprint(col("text"))) // warmup
    val (tBag, _) = timed(() => sumLong(TextAnalysis.bagFingerprint(col("text"))))
    val (tRoll, _) =
      timed(() => sumLong(TextAnalysis.rollingFingerprint(col("text"))))
    println(s"""[kb] {"kernel":"bag_fingerprint","rows":100000,""" +
      s""""native_sec":-1,"composable_sec":$tBag}""")
    println(s"""[kb] {"kernel":"rolling_fingerprint","rows":100000,""" +
      s""""native_sec":-1,"composable_sec":$tRoll}""")

    // ---- signature agreement over 2M synthetic candidate pairs
    val sigs = spark.range(2000000).select(col("id"),
      transform(sequence(lit(0L), lit(15L)),
        j => pmod(xxhash64(col("id") * lit(31L) + j), lit(1000L))).as("sa"),
      transform(sequence(lit(0L), lit(15L)),
        j => pmod(xxhash64(col("id") * lit(37L) + j), lit(1000L))).as("sb"))
    sigs.write.mode("overwrite").parquet("target/kb_sigs")
    val sp = spark.read.parquet("target/kb_sigs")
    def countAbove(c: org.apache.spark.sql.Column): Long =
      sp.filter(c >= 0.5).count()
    countAbove(Dedup.signatureSimilarity(col("sa"), col("sb"))) // warmup
    val (tSigNat, _) =
      timed(() => countAbove(Dedup.signatureSimilarity(col("sa"), col("sb"))))
    val (tSigCom, _) = timed(() =>
      countAbove(Dedup.signatureSimilarityComposable(col("sa"), col("sb"))))
    println(s"""[kb] {"kernel":"sig_agreement","rows":2000000,""" +
      s""""native_sec":$tSigNat,"composable_sec":$tSigCom}""")
    spark.stop()
  }
}
