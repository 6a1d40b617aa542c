package graft

import graft.ext.{BigramLm, Dedup}
import org.apache.spark.sql.functions._

/** Property tests for the round-6 additions over seeded random corpora
  * (ChunkerSpec's device — the scalatest/scalacheck bridge artifact is
  * not on the offline classpath, so properties run over seeded random
  * workloads).
  */
class Round6PropSpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private def randomCorpus(rnd: scala.util.Random, nDocs: Int) = {
    val spark0 = spark
    import spark0.implicits._
    // duplication pressure: some docs are copies/prefixes of earlier ones
    val texts = new scala.collection.mutable.ArrayBuffer[String]
    for (i <- 0 until nDocs) {
      val t =
        if (i > 0 && rnd.nextInt(4) == 0) texts(rnd.nextInt(i))
        else Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      texts += t
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toSeq.toDF("id", "text")
  }

  test("segment dedup: kept totals equal the distinct-segment count and " +
    "every output is an in-order token subsequence of its input") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val w = 1 + rnd.nextInt(6)
      val df = randomCorpus(rnd, 30 + rnd.nextInt(40))
      val out = Dedup.segmentDedup(df, col("id"), col("text"), w)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      val input = df.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      // global invariant: every distinct segment survives exactly once
      val allSegs = input.values.flatMap { t =>
        val toks = t.split(" ").filter(_.nonEmpty)
        toks.grouped(w).map(_.mkString(" "))
      }.toSet
      assert(out.map(_._3).sum === allSegs.size.toLong,
        s"trial $trial (w=$w): kept sum != distinct segments")
      // per-doc invariants
      out.foreach { case (id, nSeg, nKept, text) =>
        assert(nKept <= nSeg)
        val inToks = input(id).split(" ").filter(_.nonEmpty).toSeq
        val outToks =
          if (text.isEmpty) Seq.empty else text.split(" ").toSeq
        // subsequence check
        var i = 0
        outToks.foreach { t =>
          val j = inToks.indexOf(t, i)
          assert(j >= 0, s"trial $trial doc $id: output not a subsequence")
          i = j + 1
        }
        assert(nSeg === (if (inToks.isEmpty) 0L
          else ((inToks.size - 1) / w + 1).toLong))
      }
    }
  }

  test("bigram components are non-positive under a same-corpus model " +
    "and tf totals match pair counts") {
    val rnd = new scala.util.Random(77L)
    for (_ <- 1 to 3) {
      val df = randomCorpus(rnd, 40)
      val model = BigramLm.bigramCounts(df, col("text"))
      val v = BigramLm.vocabSize(df, col("text"))
      val comps = BigramLm
        .docBigramComponents(df, col("id"), col("text"), model, v)
        .collect()
      assert(comps.forall(_.getDouble(4) <= 0.0),
        "a same-corpus conditional probability exceeded 1")
      val tfSum = comps.map(_.getLong(3)).sum
      val expected = df.collect().map { r =>
        math.max(0, r.getString(1).split(" ").count(_.nonEmpty) - 1)
      }.sum
      assert(tfSum === expected.toLong)
    }
  }

  test("bounded top-k agg equals a driver-side reference on random data") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(99L)
    for (_ <- 1 to 3) {
      val k = 1 + rnd.nextInt(5)
      val rows = Seq.fill(300)((rnd.nextInt(1000).toLong,
        s"g${rnd.nextInt(5)}", rnd.nextInt(50).toDouble))
        .distinctBy(_._1) // unique ids keep the reference order total
      val df = rows.toDF("id", "g", "v").repartition(7)
      val topk = udaf(new ext.TopKAgg(k))
      val got = df.groupBy("g").agg(topk(col("id"), col("v")).as("t"))
        .select(col("g"), col("t")).collect()
        .map(r => (r.getString(0),
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getDouble(0), x.getLong(1))))).toMap
      val want = rows.groupBy(_._2).map { case (g, rs) =>
        g -> rs.map(r => (r._3, r._1))
          .sortBy { case (v, id) => (-v, id) }.take(k).toSeq
      }
      assert(got === want)
    }
  }
}
