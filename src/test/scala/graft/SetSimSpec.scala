package graft

import org.apache.spark.sql.functions._
import graft.ext.SetSim

/** Prefix-filter exact set-similarity join: recall-1.0 equivalence with
  * a Scala brute force over seeded random corpora, plus evidence the
  * prefix actually prunes on a Zipfian vocabulary.
  */
class SetSimSpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  private def bruteForce(docs: Seq[(Long, String)],
                         tauPct: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 100 >= tauPct.toLong * uni
    } yield (ia, ib, inter, uni)).toSet
  }

  private def randomCorpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    // Zipf-ish universe: token t appears with prob ~ 1/(t+2)
    val universe = (0 until 40).map(i => s"w$i")
    (0L until nDocs).map { id =>
      val toks = universe.filter(t =>
        rnd.nextDouble() < 3.0 / (universe.indexOf(t) + 3))
      val padded = if (toks.isEmpty) Seq("w0") else toks
      id -> rnd.shuffle(padded).mkString(" ")
    }
  }

  test("jaccardJoin equals brute force on seeded random corpora") {
    for ((seed, tau) <- Seq((1, 50), (2, 70), (3, 90))) {
      val corpus = randomCorpus(seed, 60)
      val got = SetSim.jaccardJoin(corpus.toDF("id", "text"),
          col("id"), col("text"), tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == bruteForce(corpus, tau), s"seed=$seed tau=$tau")
    }
  }

  test("duplicate docs always pair at tau=100") {
    val corpus = Seq(1L -> "a b c", 2L -> "c b a", 3L -> "a b d")
    val got = SetSim.jaccardJoin(corpus.toDF("id", "text"),
        col("id"), col("text"), 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // order-insensitive set equality only
  }

  test("prefix filter prunes candidates below the full pair count") {
    // Distinct rare suffixes: docs share common tokens (high df) but
    // differ on rare ones, so prefixes (rare-first) rarely collide.
    val docs = (0L until 50L).map { i =>
      i -> (s"rare$i common1 common2 common3 common4 common5")
    }
    val cands = SetSim.candidateCount(docs.toDF("id", "text"),
      col("id"), col("text"), tauPct = 90)
    val allPairs = 50L * 49 / 2
    // τ=0.9 on 6-token sets needs overlap ≥ 6 of union — impossible here;
    // prefix length is 6 − ⌈0.9·6⌉ + 1 = 1, the rare token → no collisions.
    assert(cands == 0L, s"expected full prune, got $cands of $allPairs")
  }
}
