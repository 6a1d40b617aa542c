package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** BPE learning at production vocabulary scale — the r10 measurement
  * behind the r6 claim "at real vocab sizes the cache becomes a periodic
  * checkpoint", previously measured only to ~500 merges (Round8Spec).
  *
  * Per point: [[graft.ext.BpeLearn.learnMergesBatchedStats]] on the
  * sf0.1 documents corpus to ≥5k merges at two batch widths, recording
  * wall seconds, driver round-trips (`rounds` — also the checkpoint
  * cadence: one localCheckpoint per round, so plan depth stays one
  * projection regardless of vocabulary size), merges actually learned
  * (the corpus can exhaust), and merges-per-round. The claim under
  * test: round-trips ≈ vocab/batch (the batched guard rarely ends a
  * round early on a natural corpus) and wall time grows ~linearly in
  * rounds, not in merges².
  *
  * Plus the differential leg at a vocabulary 3× the r8 spec's: batched
  * ≡ sequential, merge for merge — the guard's soundness claim at the
  * scale the sweep certifies. Output: SPARK_GRAFT_BPE_OUT (default
  * bpe_sweep.json).
  */
object BpeSweep {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = thunk()
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BPE_OUT", "bpe_sweep.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[bpe] $line"); results += line }

    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")

    // warmup: tiny learn end to end (JIT + codegen for the fold lambda)
    graft.ext.BpeLearn.learnMergesBatched(docs.limit(200), col("text"),
      merges = 16, batch = 8)

    // finding worth its own point: the synthetic testdata's raw word
    // vocabulary is 31 tokens — BPE EXHAUSTS at 89 merges (every word
    // fully merged). Recorded so nobody mistakes 89 for a bug.
    val (secRaw, rawStats) = timed(() =>
      graft.ext.BpeLearn.learnMergesBatchedStats(docs, col("text"),
        merges = 5000, batch = 8))
    record(s"""{"leg":"raw_words_exhaust","target":5000,""" +
      s""""merges":${rawStats.merges.size},"rounds":${rawStats.rounds},""" +
      s""""sec":$secRaw}""")

    // deep legs run on a trigram-derived corpus: words are adjacent
    // word 3-grams of the REAL text joined with '_' — the character
    // statistics of the corpus, with a vocabulary (≤31³) deep enough to
    // sustain a production-scale merge table.
    val tri = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), array_join(
        expr("transform(sequence(0, size(ws)-3), i -> " +
          "concat(element_at(ws, i+1), '_', element_at(ws, i+2), '_', " +
          "element_at(ws, i+3)))"), " ").as("text"))
      .localCheckpoint()

    // differential leg: batched ≡ sequential at 1500 merges — 3× the
    // r8 spec's depth, on the deep corpus
    val diffMerges = 1500
    val (secSeq, seqRules) = timed(() =>
      graft.ext.BpeLearn.learnMergesSequential(tri, col("text"), diffMerges))
    record(s"""{"leg":"sequential","merges":${seqRules.size},""" +
      s""""rounds":${seqRules.size},"sec":$secSeq}""")
    val (secDiff, diffStats) = timed(() =>
      graft.ext.BpeLearn.learnMergesBatchedStats(tri, col("text"),
        diffMerges, batch = 8))
    require(diffStats.merges == seqRules,
      s"batched != sequential at $diffMerges merges: first drift at " +
        diffStats.merges.zip(seqRules).indexWhere(x => x._1 != x._2))
    record(s"""{"leg":"batched_diff","merges":${diffStats.merges.size},""" +
      s""""rounds":${diffStats.rounds},"sec":$secDiff,"batch":8,""" +
      s""""matches_sequential":true}""")

    // production-scale leg: ≥5k merges at two batch widths
    Seq(8, 32).foreach { batch =>
      val target = 5000
      val (sec, stats) = timed(() =>
        graft.ext.BpeLearn.learnMergesBatchedStats(tri, col("text"),
          target, batch = batch))
      val mergesLearned = stats.merges.size
      record(s"""{"leg":"batched_5k","batch":$batch,"target":$target,""" +
        s""""merges":$mergesLearned,"rounds":${stats.rounds},""" +
        s""""merges_per_round":${mergesLearned.toDouble / stats.rounds},""" +
        s""""sec":$sec}""")
    }
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(tri)

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[bpe] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
