package graft

import graft.ext.{Dedup, SetSim}
import org.apache.spark.sql.functions._

/** Property tests for the round-8 measured-scale work, over seeded
  * random corpora (Round6PropSpec's device — the scalatest/scalacheck
  * bridge artifact is not on the offline classpath).
  *
  * Both properties guard path-choice independence: the r8 adversarial
  * sweep retuned `maxBucket` (1024 → 256) and added the capped prefix
  * join, and neither knob may ever change WHAT is computed — only how
  * the pair space is enumerated.
  */
class Round8PropSpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private def randomCorpus(rnd: scala.util.Random, nDocs: Int) = {
    val spark0 = spark
    import spark0.implicits._
    val texts = new scala.collection.mutable.ArrayBuffer[String]
    for (i <- 0 until nDocs) {
      val t =
        if (i > 0 && rnd.nextInt(3) == 0) texts(rnd.nextInt(i)) // dup pressure
        else Seq.fill(4 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      texts += t
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toSeq.toDF("id", "text")
  }

  test("LSH candidate pairs are independent of maxBucket: the array " +
    "path, the skew fallback, and mixed regimes enumerate one pair set") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val df = randomCorpus(rnd, 40 + rnd.nextInt(60))
      def pairsAt(cap: Int) =
        Dedup.minhashCandidates(df, col("id"), col("text"), maxBucket = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reference = pairsAt(1 << 20) // pure array path
      // caps 2 and 3 force the skew fallback on most buckets; a random
      // mid cap exercises the mixed regime
      for (cap <- Seq(2, 3, 4 + rnd.nextInt(16))) {
        assert(pairsAt(cap) === reference,
          s"trial $trial: pair set changed at maxBucket=$cap")
      }
    }
  }

  test("native signature agreement is bitwise-equal to the composable " +
    "fold under both evaluation paths") {
    val rnd = new scala.util.Random(20260816L)
    val spark0 = spark
    import spark0.implicits._
    val rows = (0 until 500).map { i =>
      val n = 16
      val a = Array.fill(n)(rnd.nextLong(8)) // small range -> real agreement
      val b = if (i % 5 == 0) a.clone() else Array.fill(n)(rnd.nextLong(8))
      (a.toSeq, b.toSeq)
    }
    // through parquet: a local Seq relation is folded by
    // ConvertToLocalRelation and evaluated interpreted driver-side, so
    // the codegen leg of this differential would be vacuous (the
    // CodegenNoFallbackSpec lesson)
    val staged = java.nio.file.Files
      .createTempDirectory("graft-r8-sig").toString
    rows.toDF("sa", "sb").write.mode("overwrite").parquet(staged)
    val df = spark.read.parquet(staged)
    def run(): Seq[Long] = df.select(
        Dedup.signatureSimilarity(col("sa"), col("sb")).as("native"),
        Dedup.signatureSimilarityComposable(col("sa"), col("sb")).as("composed"))
      .collect().toSeq.map { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
        java.lang.Double.doubleToLongBits(r.getDouble(0))
      }
    val withCodegen = run()
    assert(withCodegen.exists(bits =>
      java.lang.Double.longBitsToDouble(bits) > 0.0 &&
        java.lang.Double.longBitsToDouble(bits) < 1.0),
      "degenerate fixture: no partial agreements")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(withCodegen == run())
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("fused top-token count is bitwise-equal to the composable " +
    "O(distinct*n) fold, nulls and empties included") {
    import graft.ext.TextAnalysis
    val rnd = new scala.util.Random(20260817L)
    val spark0 = spark
    import spark0.implicits._
    // no empty arrays: under ANSI both forms throw DIVIDE_BY_ZERO on
    // size=0 (identically) — an empty token array is not a legal input
    val rows: Seq[Seq[Option[String]]] = (0 until 300).map { i =>
      if (i == 0) Seq(None, None) // all-null: both forms score 0/2
      else Seq.fill(1 + rnd.nextInt(40))(
        if (rnd.nextInt(10) == 0) None
        else Some(vocab(rnd.nextInt(vocab.size))))
    }
    // through parquet — same ConvertToLocalRelation vacuity guard as above
    val staged = java.nio.file.Files
      .createTempDirectory("graft-r8-tok").toString
    rows.toDF("toks").write.mode("overwrite").parquet(staged)
    val df = spark.read.parquet(staged)
    def run(): Seq[Long] = df.select(
        TextAnalysis.topTokenRatioOver(col("toks")).as("native"),
        TextAnalysis.topTokenRatioOverComposable(col("toks")).as("composed"))
      .collect().toSeq.map { r =>
        val a = r.getDouble(0); val b = r.getDouble(1)
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b), s"native $a != composed $b")
        java.lang.Double.doubleToLongBits(a)
      }
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(withCodegen == run())
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("capped prefix join with a non-binding cap equals the exact join " +
    "at random thresholds; a binding cap only ever removes pairs") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 5) {
      val df = randomCorpus(rnd, 30 + rnd.nextInt(40))
      val tau = 40 + rnd.nextInt(60) // (40, 99]
      val exact = SetSim.jaccardJoin(df, col("id"), col("text"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val loose = SetSim.jaccardJoinCapped(df, col("id"), col("text"), tau,
        maxPerTok = 1 << 20)
      assert(loose.dropped.isEmpty,
        s"trial $trial: non-binding cap reported drops")
      val loosePairs = loose.pairs
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(loosePairs === exact,
        s"trial $trial (tau=$tau): non-binding cap changed the pair set")
      // a tight cap must be a SUBSET (never invents pairs) and must
      // account for what it dropped
      val tight = SetSim.jaccardJoinCapped(df, col("id"), col("text"), tau,
        maxPerTok = 2)
      val tightPairs = tight.pairs
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(tightPairs.subsetOf(exact),
        s"trial $trial (tau=$tau): tight cap invented pairs")
      if (tightPairs != exact)
        assert(tight.dropped.count() > 0,
          s"trial $trial (tau=$tau): pairs lost without drop accounting")
    }
  }
}
