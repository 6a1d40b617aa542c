package graft

import graft.ext.BpeLearn
import org.apache.spark.sql.functions._

/** Round-8 pins: the batched BPE learner is the default AND actually
  * cuts driver round-trips at a real vocabulary size.
  */
class Round8Spec extends SparkSpec {

  test("default learnMerges is the batched path (same output, same API)") {
    val sps = spark; import sps.implicits._
    val docs = Seq("abab abab aa", "the cat sat on the mat").toDF("text")
    val viaDefault = BpeLearn.learnMerges(docs, col("text"), merges = 6)
    val viaBatched = BpeLearn.learnMergesBatched(docs, col("text"), merges = 6)
    val viaSequential = BpeLearn.learnMergesSequential(docs, col("text"), merges = 6)
    assert(viaDefault == viaBatched)
    assert(viaDefault == viaSequential)
  }

  test("a 500-merge vocabulary learns in far fewer than 500 driver round-trips") {
    val sps = spark; import sps.implicits._
    // A corpus where batching can LEGALLY engage (the exactness guard
    // only admits a candidate whose count strictly exceeds what earlier
    // selections could create): 512 two-char words over globally UNIQUE
    // characters (no token sharing, so `sharing` is always empty and the
    // guard reduces to 2x the collection cutoff), frequencies in blocks
    // of 32 equal counts with each block > 2.1x the block four steps
    // down — every round's whole batch clears the guard.
    // (On adversarial corpora — e.g. uniformly random letters, where the
    // top pairs all share tokens — the learner degrades toward one merge
    // per round by DESIGN: exactness over throughput, never past the
    // sequential learner's cost.)
    val blocks = 16
    val freqs = new Array[Int](blocks)
    for (j <- (blocks - 1) to 0 by -1)
      freqs(j) = if (j >= blocks - 3) 20 else math.ceil(freqs(j + 3) * 2.1).toInt
    val words = (0 until 512).map { i =>
      val w = new String(Array((0x4E00 + 2 * i).toChar, (0x4E00 + 2 * i + 1).toChar))
      // one row per word: its F occurrences whitespace-joined
      Seq.fill(freqs(i / 32))(w).mkString(" ")
    }
    val docs = words.toDF("text")
    val stats = BpeLearn.learnMergesBatchedStats(docs, col("text"),
      merges = 500, batch = 32)
    assert(stats.merges.size == 500,
      s"expected 500 merges, learned ${stats.merges.size}")
    // one round-trip per BATCH, not per merge: 500 merges in ~16 rounds
    assert(stats.rounds <= 20,
      s"rounds=${stats.rounds}: batching win lost (expected ~16)")
  }
}
