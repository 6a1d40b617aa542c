package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Novelty, SetSim}

/** Round-7 operators: sorted-neighborhood blocking, cluster
  * representatives, n-gram novelty.
  */
class Round7Spec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  // --- sortedNeighborhoodJoin ------------------------------------------

  test("sorted neighborhood: exact copies always pair (identical keys sort adjacent)") {
    val docs = (0L until 50L).map(i => (i, s"alpha beta w$i x$i y$i z$i")) ++
      Seq((100L, "alpha beta w7 x7 y7 z7")) // exact copy of doc 7
    val got = SetSim.sortedNeighborhoodJoin(docs.toDF("id", "text"),
        col("id"), col("text"), window = 3, tauPct = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 100L)))
  }

  test("sorted neighborhood: window bounds candidacy, verify bounds output") {
    // three docs with the same key prefix family; only the true near-dup
    // pair passes the Jaccard threshold
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g z"), // J(1,2) = 7/9 = 77.8%
      (3L, "q r s t u v w x"))
    val out = SetSim.sortedNeighborhoodJoin(docs.toDF("id", "text"),
        col("id"), col("text"), window = 5, tauPct = 70)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((1L, 2L, 7L, 9L)))
  }

  test("sorted neighborhood matches brute force when window covers the corpus") {
    val rnd = new scala.util.Random(11)
    val universe = (0 until 30).map(i => s"w$i")
    val docs = (0L until 40L).map { id =>
      val toks = universe.filter(_ => rnd.nextDouble() < 0.3)
      id -> (if (toks.isEmpty) "w0" else rnd.shuffle(toks).mkString(" "))
    }
    val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 100 >= 80L * uni
    } yield (ia, ib, inter, uni)).toSet
    val got = SetSim.sortedNeighborhoodJoin(docs.toDF("id", "text"),
        col("id"), col("text"), window = 40, tauPct = 80)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == brute)
  }

  // --- representatives -------------------------------------------------

  test("representatives picks max score, ties to min id") {
    val labeled = Seq(
      (1L, 10L, 500L), (2L, 10L, 900L), (3L, 10L, 900L), // tie at 900 → id 2
      (4L, 20L, 100L),
      (5L, 30L, 0L), (6L, 30L, -5L))
      .toDF("id", "component", "score")
    val got = Dedup.representatives(labeled, col("id"), col("component"),
        col("score"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((10L, 2L, 900L, 3L), (20L, 4L, 100L, 1L),
      (30L, 5L, 0L, 2L)))
  }

  test("representatives emits exactly one row per component") {
    val labeled = (0L until 200L).map(i => (i, i % 7, i * 3 % 11))
      .toDF("id", "component", "score")
    val reps = Dedup.representatives(labeled, col("id"), col("component"),
      col("score"))
    assert(reps.count() == 7)
    assert(reps.agg(sum("n_members")).head().getLong(0) == 200L)
  }

  // --- warehouse schema evolution --------------------------------------

  test("get() sees columns appended by a later load generation") {
    val wh = new graft.warehouse.SparkWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-evo-spec").toString)
    val gen1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val gen2 = Seq((3L, "c", 9.5)).toDF("id", "name", "score")
    wh.load("t", gen1).fold(e => fail(e.message), _ => ())
    wh.load("t", gen2).fold(e => fail(e.message), _ => ())
    val out = wh.get("t").fold(e => fail(e.message), identity)
    // the appended column must be visible even though gen-1 files lack
    // it (single-footer reads can pick a gen-1 file and drop it)
    assert(out.columns.contains("score"))
    val rows = out.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(9.5)))
  }

  // --- minhashCandidatesBetweenPortable --------------------------------

  test("cross-corpus candidates pair across sides only") {
    val mk = (id: Long, seed: Int) => {
      val rnd = new scala.util.Random(seed)
      id -> Seq.fill(30)(s"w${rnd.nextInt(40)}").mkString(" ")
    }
    // left: docs 0-9; right: copies of 3 and 4 (guaranteed cross hits)
    // plus two unrelated docs. Left also contains its OWN duplicate
    // (0 and 1 share a seed) which must NOT appear — within-side pairs
    // are excluded by construction.
    val left = (Seq(mk(0L, 7), mk(1L, 7)) ++
      (2L to 9L).map(i => mk(i, i.toInt))).toDF("id", "text")
    val right = Seq(mk(100L, 3), mk(101L, 4),
      mk(102L, 55), mk(103L, 56)).toDF("id", "text")
    val got = graft.ext.Dedup.minhashCandidatesBetweenPortable(
        left, right, col("id"), col("text"), col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((3L, 100L)) && got.contains((4L, 101L)),
      s"planted cross duplicates missed: $got")
    assert(got.forall { case (a, b) => a < 100L && b >= 100L },
      s"within-side pair leaked: $got")
  }

  // --- ngramNovelty ----------------------------------------------------

  test("novelty credits each gram once, to the earliest doc") {
    val docs = Seq(
      (1L, "a b c d"),     // grams: abc, bcd → both novel
      (2L, "a b c e"),     // grams: abc (seen), bce → 1 novel
      (3L, "a b c d"),     // exact repeat → 0 novel
      (4L, "x y"))         // too short → 0 grams
      .toDF("id", "text")
    val got = Novelty.ngramNovelty(docs, col("id"), col("text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 0L, 0L)))
  }

  test("novelty sums to the distinct gram count of the corpus") {
    val rnd = new scala.util.Random(5)
    val docs = (0L until 80L).map { id =>
      id -> Seq.fill(12)(s"t${rnd.nextInt(20)}").mkString(" ")
    }
    val out = Novelty.ngramNovelty(docs.toDF("id", "text"),
      col("id"), col("text"), n = 2)
    val totalNovel = out.agg(sum("novel_grams")).head().getLong(0)
    val distinctGrams = docs.flatMap { case (_, t) =>
      t.split(" ").sliding(2).map(_.mkString(" "))
    }.distinct.size
    assert(totalNovel == distinctGrams)
    // hashed-key variant agrees on this corpus (no collisions at n=160)
    val hashed = Novelty.ngramNovelty(docs.toDF("id", "text"),
      col("id"), col("text"), n = 2, hashGrams = true)
    assert(hashed.orderBy("id").collect().toSeq ==
      out.orderBy("id").collect().toSeq)
  }
}
