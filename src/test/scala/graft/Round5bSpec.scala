package graft

import graft.ext.{Bm25, Divergence, TextAnalysis}
import graft.ops.Cdc
import org.apache.spark.sql.functions._

/** Semantics of the round-5 second batch: BM25 retrieval, sliding-window
  * chunking, snapshot diff (changelog derivation), and per-source
  * distribution divergence.
  */
class Bm25Spec extends SparkSpec {

  private def corpus = {
    val sps = spark; import sps.implicits._
    Seq(
      (1L, "cat sat on the mat"),
      (2L, "cat cat cat"),
      (3L, "dog ate the bone and the cat watched"),
      (4L, "nothing relevant here at all six")
    ).toDF("doc_id", "text")
  }

  test("scoredTerms carries full doc length and only query terms") {
    val rows = Bm25.scoredTerms(corpus, col("doc_id"), col("text"),
      Seq("cat", "bone")).collect()
    assert(rows.map(_.getString(1)).toSet == Set("cat", "bone"))
    // doc 3 has 8 tokens; its rows keep dl=8 even though only 2 match
    assert(rows.filter(_.getLong(0) == 3L).forall(_.getLong(4) == 8L))
    // df(cat)=3 docs, df(bone)=1
    assert(rows.find(r => r.getString(1) == "cat").get.getLong(3) == 3L)
    assert(rows.find(r => r.getString(1) == "bone").get.getLong(3) == 1L)
  }

  test("topK matches the hand-computed Lucene BM25 formula") {
    val res = Bm25.topK(corpus, col("doc_id"), col("text"),
      Seq("cat"), k = 3).collect()
    // N=4 docs, avgdl=(5+3+8+6)/4=5.5, df(cat)=3
    val idf = math.log(1.0 + (4.0 - 3 + 0.5) / (3 + 0.5))
    def s(tf: Long, dl: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 5.5))
    val expect = Map(1L -> s(1, 5), 2L -> s(3, 3), 3L -> s(1, 8))
    assert(res.length == 3)
    res.foreach { r =>
      assert(math.abs(r.getDouble(2) - expect(r.getLong(0))) < 1e-12)
    }
    // doc 2 (high tf, short doc) must rank first
    assert(res.head.getLong(0) == 2L)
  }

  test("plan: df side broadcasts back onto postings (no df shuffle join)") {
    val docs = Tables(spark, sf0001, "documents")
    val plan = Bm25.scoredTerms(docs, col("doc_id"), col("text"),
        Seq("vector", "stream"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term df must broadcast, not shuffle:\n$plan")
  }

  test("rarer terms weigh more (idf ordering)") {
    val res = Bm25.topK(corpus, col("doc_id"), col("text"),
      Seq("bone", "mat"), k = 4).collect()
    // docs 1 and 3 each match exactly one single-occurrence term with
    // df=1; the shorter doc (1, dl=5) outranks the longer (3, dl=8)
    assert(res.map(_.getLong(0)).take(2).toSeq == Seq(1L, 3L))
  }
}

class SlidingChunksSpec extends SparkSpec {

  test("window/stride chunking: starts, overlap, and short tail") {
    val sps = spark; import sps.implicits._
    val doc = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis
      .slidingChunks(doc, col("doc_id"), col("text"), window = 16, stride = 8)
      .orderBy("chunk_id").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(16L, 12L, 4L))
    val c0 = rows(0).getString(2).split(" ")
    val c1 = rows(1).getString(2).split(" ")
    // 50% overlap: second half of chunk 0 == first half of chunk 1
    assert(c0.drop(8).toSeq == c1.take(8).toSeq)
    assert(c1.head == "t9" && rows(2).getString(2) == "t17 t18 t19 t20")
  }

  test("documents shorter than one window produce a single short chunk") {
    val sps = spark; import sps.implicits._
    val doc = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis
      .slidingChunks(doc, col("doc_id"), col("text"), window = 8, stride = 4)
      .collect()
    assert(rows.length == 1) // empty doc contributes nothing
    assert(rows.head.getLong(0) == 1L && rows.head.getString(2) == "a b c")
  }

  test("plan stays shuffle-free (no Exchange)") {
    val docs = Tables(spark, sf0001, "documents")
    val plan = TextAnalysis
      .slidingChunks(docs, col("doc_id"), col("text"), 16, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("property: stride == window partitions every document exactly") {
    // non-overlapping chunking must reconstruct each document verbatim
    val docs = Tables(spark, sf0001, "documents").limit(100)
    Seq(5, 16, 64).foreach { w =>
      val rebuilt = TextAnalysis
        .slidingChunks(docs, col("doc_id"), col("text"), w, w)
        .groupBy("doc_id")
        .agg(concat_ws(" ",
          array_sort(collect_list(struct(col("chunk_id"), col("chunk"))))
            .getField("chunk")).as("rebuilt"))
      val orig = docs.select(col("doc_id"),
        array_join(filter(TextAnalysis.tokens(col("text")), t => t =!= ""),
          " ").as("orig"))
      val bad = rebuilt.join(orig, "doc_id")
        .filter(col("rebuilt") =!= col("orig")).count()
      assert(bad == 0, s"w=$w: $bad documents failed reconstruction")
    }
  }
}

class SnapshotDiffSpec extends SparkSpec {

  private def frames = {
    val sps = spark; import sps.implicits._
    val old = Seq(
      (1L, Some("a"), Some(10L)),  // unchanged
      (2L, Some("b"), Some(20L)),  // value update
      (3L, Some("c"), Some(30L)),  // deleted
      (4L, None: Option[String], Some(40L)),  // null -> value update
      (5L, Some("e"), None: Option[Long])     // null payload unchanged
    ).toDF("k", "s", "v")
    val nu = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Some(21L)),
      (4L, Some("d"), Some(40L)),
      (5L, Some("e"), None: Option[Long]),
      (6L, Some("f"), Some(60L))   // inserted
    ).toDF("k", "s", "v")
    (old, nu)
  }

  test("derives exactly the I/U/D rows, null transitions included") {
    val (old, nu) = frames
    val got = Cdc.snapshotDiff(old, nu, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "U"), (3L, "D"), (4L, "U"), (6L, "I")))
  }

  test("round-trips: applyChangelog(old, diff) == new snapshot") {
    val (old, nu) = frames
    val log = Cdc.snapshotDiff(old, nu, Seq("k"))
      .withColumn("seq", lit(1L))
    val applied = Cdc.applyChangelog(old, log, Seq("k"), "seq", "op")
    assert(applied.exceptAll(nu).isEmpty && nu.exceptAll(applied).isEmpty)
  }

  test("identical snapshots produce an empty changelog") {
    val (old, _) = frames
    assert(Cdc.snapshotDiff(old, old, Seq("k")).isEmpty)
  }

  test("property: applyChangelog(old, diff(old, new)) == new on random snapshots") {
    val sps = spark; import sps.implicits._
    val rnd = new scala.util.Random(42)
    def snapshot(): Seq[(Long, Option[String], Option[Long])] =
      (1 to 60).flatMap { k =>
        if (rnd.nextDouble() < 0.3) None // absent key
        else Some((k.toLong,
          if (rnd.nextDouble() < 0.2) None else Some("v" + rnd.nextInt(4)),
          if (rnd.nextDouble() < 0.2) None else Some(rnd.nextInt(5).toLong)))
      }
    (1 to 5).foreach { round =>
      val old = snapshot().toDF("k", "s", "v")
      val nu = snapshot().toDF("k", "s", "v")
      val log = Cdc.snapshotDiff(old, nu, Seq("k")).withColumn("seq", lit(1L))
      val applied = Cdc.applyChangelog(old, log, Seq("k"), "seq", "op")
      assert(applied.exceptAll(nu).isEmpty && nu.exceptAll(applied).isEmpty,
        s"round-trip mismatch in round $round")
    }
  }
}

class CountMinSpec extends SparkSpec {

  import graft.ext.{CountMin, CountMinAgg}

  test("estimates never undercount and are exact without collisions") {
    val sps = spark; import sps.implicits._
    val terms = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("t")
    val sk = terms.as[String].select(new CountMinAgg(64, 4).toColumn).head()
    assert(CountMin.estimate(sk, 64, 4, "a") == 5L)
    assert(CountMin.estimate(sk, 64, 4, "b") == 3L)
    assert(CountMin.estimate(sk, 64, 4, "c") == 1L)
    // absent term: bounded by collisions, never negative
    val zz = CountMin.estimate(sk, 64, 4, "zz")
    assert(zz >= 0L && zz <= 9L)
  }

  test("sketch of the whole equals merged sketches of the parts") {
    val agg = new CountMinAgg(32, 3)
    val all = ("x y z x x y w v u t s r q" * 3).split(" ")
    val whole = all.foldLeft(agg.zero)(agg.reduce)
    val (h1, h2) = all.splitAt(all.length / 2)
    val merged = agg.merge(h1.foldLeft(agg.zero)(agg.reduce),
      h2.foldLeft(agg.zero)(agg.reduce))
    assert(whole.toSeq == merged.toSeq)
  }

  test("over-count stays within the (e/width)·N contract on real data") {
    val sps = spark; import sps.implicits._
    val toks = Tables(spark, sf0001, "documents")
      .select(explode(ext.TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val sk = toks.as[String].select(new CountMinAgg(1024, 4).toColumn).head()
    val total = toks.count()
    val bound = math.ceil(math.E / 1024 * total).toLong
    val exact = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // never-undercount is deterministic; the (e/width)·N bound is
    // PROBABILISTIC — it holds per query with probability ≥ 1 − e^−depth,
    // so the contract being tested allows an e^−depth fraction of
    // violations (2× margin for the finite sample), not zero
    var violations = 0
    exact.foreach { case (t, n) =>
      val est = CountMin.estimate(sk, 1024, 4, t)
      assert(est >= n, s"undercount on $t")
      if (est > n + bound) violations += 1
    }
    val allowed = math.ceil(2.0 * math.exp(-4.0) * exact.length).toInt
    assert(violations <= allowed,
      s"$violations/${exact.length} bound violations > allowed $allowed")
  }
}

class ExactSubstringSpec extends SparkSpec {

  private val span = (1 to 8).map(i => s"s$i").mkString(" ")

  test("a shared 8-gram is scrubbed from both documents; unique text kept") {
    val sps = spark; import sps.implicits._
    val docs = Seq(
      (1L, s"u1 u2 $span u3"),
      (2L, s"v1 $span"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text")
    val got = ext.ExactSubstring
      .scrub(docs, col("doc_id"), col("text"), w = 8, hashGrams = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 11L, 3L, "u1 u2 u3")))
    assert(got(1) == ((2L, 9L, 1L, "v1")))
    assert(got(2) == ((3L, 9L, 9L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")))
  }

  test("overlapping flagged windows merge coverage; full scrub empties") {
    val sps = spark; import sps.implicits._
    val nine = (1 to 9).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, nine), (2L, nine)).toDF("doc_id", "text")
    val got = ext.ExactSubstring
      .scrub(docs, col("doc_id"), col("text"), w = 8, hashGrams = false)
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(got.forall(_ == ((0L, ""))))
  }

  test("documents shorter than the window are never scrubbed") {
    val sps = spark; import sps.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = ext.ExactSubstring
      .scrub(docs, col("doc_id"), col("text"), w = 8, hashGrams = false)
      .collect()
    assert(got.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L))
  }

  test("long fully-duplicated document scrubs linearly (no quadratic mask)") {
    val sps = spark; import sps.implicits._
    // 30k tokens, fully duplicated: every position is covered, so the
    // coverage array is as long as the document — the worst case for a
    // per-token array_contains mask (~9·10⁸ comparisons); the two-pointer
    // MaskedKeep walk does it in one linear pass.
    val n = 30000
    val longText = (0 until n).map(i => s"t${i % 97}x$i").mkString(" ")
    val docs = Seq((1L, longText), (2L, longText),
      (3L, "short unique tail piece")).toDF("doc_id", "text")
    val got = ext.ExactSubstring
      .scrub(docs, col("doc_id"), col("text"), w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == ((1L, n.toLong, 0L)))
    assert(got(1) == ((2L, n.toLong, 0L)))
    assert(got(2) == ((3L, 4L, 4L)))
  }

  test("partially covered long document keeps exactly the uncovered prefix/suffix") {
    val sps = spark; import sps.implicits._
    // shared 1000-token span in the middle of distinct documents: the
    // mask must remove exactly the span (merged overlapping windows)
    // and keep both unique flanks in order.
    val span = (0 until 1000).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $span z1 z2"),
      (2L, s"b1 $span y1 y2 y3")).toDF("doc_id", "text")
    val got = ext.ExactSubstring
      .scrub(docs, col("doc_id"), col("text"), w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 5L, "a1 a2 a3 z1 z2")))
    assert(got(1) == ((2L, 4L, "b1 y1 y2 y3")))
  }

  test("MaskedKeep kernel is differential-equal to the composed array_contains mask") {
    val sps = spark; import sps.implicits._
    // 60 seeded random (tokens, covered) workloads incl. empty masks,
    // full masks, and out-of-range covered positions
    val rnd = new scala.util.Random(20260813L)
    val rows = (0 until 60).map { i =>
      val n = rnd.nextInt(40)
      val toks = Seq.fill(n)(s"t${rnd.nextInt(9)}")
      val covered = (0 until rnd.nextInt(n + 8))
        .map(_ => rnd.nextInt(n + 4)).distinct.sorted
      (i.toLong, toks, covered)
    }
    val df = rows.toDF("id", "toks", "covered")
    val got = df.select(col("id"),
        graft.functions.SketchFunctions.masked_keep(
          col("toks"), col("covered")).as("kernel"),
        filter(col("toks"),
          (t, idx) => !array_contains(col("covered"), idx)).as("composed"))
      .collect()
    assert(got.length == 60)
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"row ${r.getLong(0)}: kernel ${r.getSeq[String](1)} != composed ${r.getSeq[String](2)}")
    }
  }

  test("hashed gram keys produce the identical scrub on real data") {
    val docs = Tables(spark, sf0001, "documents")
    val a = ext.ExactSubstring.scrub(docs, col("doc_id"), col("text"),
      w = 8, hashGrams = false)
    val b = ext.ExactSubstring.scrub(docs, col("doc_id"), col("text"),
      w = 8, hashGrams = true)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}

class FusionSpec extends SparkSpec {

  test("rrf matches the hand-computed reciprocal-rank sum") {
    val sps = spark; import sps.implicits._
    val l1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val l2 = Seq((20L, 1L), (10L, 2L)).toDF("doc_id", "rank")
    val got = ext.Fusion.rrf(Seq(l1, l2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val s10 = 1.0 / 61 + 1.0 / 62
    val s20 = 1.0 / 62 + 1.0 / 61
    val s30 = 1.0 / 63
    // 10 and 20 tie exactly (symmetric ranks) → doc_id breaks the tie
    assert(got.map(_._1).toSeq == Seq(10L, 20L, 30L))
    assert(math.abs(got(0)._3 - s10) < 1e-15 && got(0)._2 == 2)
    assert(math.abs(got(1)._3 - s20) < 1e-15)
    assert(math.abs(got(2)._3 - s30) < 1e-15 && got(2)._2 == 1)
  }

  test("a document high on both lists beats single-list leaders") {
    val sps = spark; import sps.implicits._
    val l1 = Seq((1L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val l2 = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val top = ext.Fusion.rrf(Seq(l1, l2)).head()
    assert(top.getLong(0) == 3L) // two rank-2 hits beat one rank-1 hit
  }
}

class TokenBudgetMixSpec extends SparkSpec {

  test("budgets cap token mass; unbudgeted and over-budget groups pass whole") {
    val sps = spark; import sps.implicits._
    val docs = (1 to 200).map(i => (i.toLong, "g1", "t " * 10)) ++
      (201 to 400).map(i => (i.toLong, "g2", "t " * 10)) ++
      (401 to 410).map(i => (i.toLong, "g3", "t " * 10))
    val df = docs.toDF("doc_id", "source", "text")
    val tok = ext.TextAnalysis.tokenCount(col("text"))
    // g1 has 2000 tokens ("t "*10 trims to 10 tokens); cap at ~27%
    val mix = ext.Sampling.tokenBudgetMix(df, col("source"), tok,
      col("doc_id"), Map("g1" -> 550L, "g3" -> 1000000L))
    val by = mix.groupBy("source").agg(
      count(lit(1)).as("n"), sum(tok).as("t")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(by("g2") == ((200L, 2000L)), "unbudgeted group must pass whole")
    assert(by("g3") == ((10L, 100L)), "budget over total ⇒ rate 1")
    val (n1, t1) = by("g1")
    assert(t1 <= 550 * 1.5 && t1 >= 550 * 0.5,
      s"g1 tokens $t1 far from its 550 budget")
    assert(n1 < 200)
    // determinism: same inputs select the same rows
    val again = ext.Sampling.tokenBudgetMix(df, col("source"), tok,
      col("doc_id"), Map("g1" -> 550L, "g3" -> 1000000L))
    assert(mix.exceptAll(again).isEmpty && again.exceptAll(mix).isEmpty)
  }

  test("plan: the mix itself is one filter — no shuffle, no join") {
    val docs = Tables(spark, sf0001, "documents")
    val mix = ext.Sampling.tokenBudgetMix(docs, col("source"),
      ext.TextAnalysis.tokenCount(col("text")), col("doc_id"),
      Map("src0" -> 100L))
    val plan = mix.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"membership filter must stay map-side:\n$plan")
  }
}

class UnigramLmSpec extends SparkSpec {

  test("docLogProb matches the hand-computed smoothed unigram model") {
    val sps = spark; import sps.implicits._
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val model = ext.UnigramLm.termCounts(docs, col("text"))
    // counts: a=2, b=1, c=1; total=4, V=3 → denom=7
    val got = ext.UnigramLm.docLogProb(docs, col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lp1 = (2 * math.log(3.0 / 7) + math.log(2.0 / 7)) / 3
    val lp2 = math.log(2.0 / 7)
    assert(got(1L)._1 == 3 && math.abs(got(1L)._2 - lp1) < 1e-12)
    assert(got(2L)._1 == 1 && math.abs(got(2L)._2 - lp2) < 1e-12)
  }

  test("terms unseen by a sampled model score as the unseen mass") {
    val sps = spark; import sps.implicits._
    val docs = Seq((1L, "zzz")).toDF("doc_id", "text")
    val model = ext.UnigramLm
      .termCounts(Seq((2L, "a b")).toDF("doc_id", "text"), col("text"))
    val lp = ext.UnigramLm.docLogProb(docs, col("doc_id"), col("text"), model)
      .head().getDouble(2)
    // p(zzz) = (0+1)/(2+2)
    assert(math.abs(lp - math.log(1.0 / 4)) < 1e-12)
  }

  test("typical documents outscore garbled ones") {
    val docs = Tables(spark, sf0001, "documents")
    val model = ext.UnigramLm.termCounts(docs, col("text"))
    val scored = ext.UnigramLm
      .docLogProb(docs, col("doc_id"), col("text"), model)
    val sps = spark; import sps.implicits._
    val garbled = Seq((-1L, "qqqq wwww eeee rrrr tttt"))
      .toDF("doc_id", "text")
    val gLp = ext.UnigramLm
      .docLogProb(garbled, col("doc_id"), col("text"), model)
      .head().getDouble(2)
    val corpusMin = scored.agg(min(col("avg_logprob"))).head().getDouble(0)
    assert(gLp < corpusMin, "out-of-distribution text must score below corpus")
  }
}

class DmlSpec extends SparkSpec {

  import graft.warehouse.SparkWarehouse

  private def freshWh() = new SparkWarehouse(spark,
    java.nio.file.Files.createTempDirectory("graft-dml").toString)

  test("deleteWhere removes only TRUE-predicate rows and keeps meta") {
    val sps = spark; import sps.implicits._
    val wh = freshWh()
    val data = Seq((1L, Some("a")), (2L, None: Option[String]), (3L, "b"
      match { case s => Some(s) })).toDF("k", "s")
    assert(wh.load("t", data).isRight)
    // predicate s = 'a' is NULL for row 2 → row 2 survives (SQL DELETE)
    assert(wh.deleteWhere("t", col("s") === "a").isRight)
    val kept = wh.get("t").toOption.get.select("k")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("deleteWhere deleting every row keeps a readable empty table") {
    val sps = spark; import sps.implicits._
    val wh = freshWh()
    assert(wh.load("t", Seq((1L, "a")).toDF("k", "s")).isRight)
    assert(wh.deleteWhere("t", lit(true)).isRight)
    val df = wh.get("t").toOption.get
    assert(df.isEmpty && df.columns.toSeq == Seq("k", "s"))
  }

  test("updateWhere rewrites matching rows only; unknown column rejected") {
    val sps = spark; import sps.implicits._
    val wh = freshWh()
    assert(wh.load("t", Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "s", "v")).isRight)
    assert(wh.updateWhere("t",
      Map("s" -> lit("X"), "v" -> (col("v") + 1L)), col("k") === 1L).isRight)
    val rows = wh.get("t").toOption.get.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "X", 11L), (2L, "b", 20L)))
    val bad = wh.updateWhere("t", Map("nope" -> lit(1)), lit(true))
    assert(bad.isLeft)
  }

  test("rename is a metadata move; copy survives source mutation") {
    val sps = spark; import sps.implicits._
    val wh = freshWh()
    assert(wh.load("src", Seq((1L, "a"), (2L, "b")).toDF("k", "s")).isRight)
    assert(wh.copyTable("src", "cp").isRight)
    assert(wh.rename("cp", "cp2").isRight)
    assert(wh.get("cp").isLeft)                       // old name gone
    assert(wh.updateWhere("src", Map("s" -> lit("Z")), lit(true)).isRight)
    val copied = wh.get("cp2").toOption.get.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(copied.toSeq == Seq((1L, "a"), (2L, "b"))) // unaffected
    // error surface: missing source, conflicting destination
    assert(wh.rename("nope", "x").isLeft)
    assert(wh.copyTable("src", "cp2").isLeft)
    assert(wh.copyTable("src", "cp2", replace = true).isRight)
  }

  test("DML refuses bucketed tables (layout contract)") {
    val sps = spark; import sps.implicits._
    val wh = freshWh()
    wh.createBucketed("tb", Seq((1L, "a")).toDF("k", "s"), Seq("k"), 4)
    assert(wh.deleteWhere("tb", lit(true)).isLeft)
    assert(wh.updateWhere("tb", Map("s" -> lit("x")), lit(true)).isLeft)
  }
}

class DivergenceSpec extends SparkSpec {

  test("a group distributed like the corpus has near-zero KL; a skewed one doesn't") {
    val sps = spark; import sps.implicits._
    val docs = Seq.tabulate(90)(i => (s"g${i % 2}", "x y")) ++
      Seq.fill(10)(("g2", "x x"))
    val kl = Divergence
      .klBySource(docs.toDF("source", "text"), col("source"), col("text"),
        vocabSize = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // g0/g1 are 50/50 over {x,y} like (almost) the corpus → tiny KL;
    // g2 is all-x against a near-balanced corpus → large KL
    assert(math.abs(kl("g0") - kl("g1")) < 1e-9)
    assert(kl("g2") > 10 * kl("g0") && kl("g0") > 0.0)
  }

  test("a genuinely-null group key is kept distinct from the rollup row") {
    val sps = spark; import sps.implicits._
    val docs = Seq((Some("s1"), "a a b"), (None, "b b a"))
      .toDF("source", "text")
    val rows = Divergence.sourceTermComponents(docs, col("source"),
      col("text"), vocabSize = 10).collect()
    // the null-keyed GROUP must appear with its own components (2 terms),
    // not be swallowed by the grouping-sets marginal
    val nullGrp = rows.filter(_.isNullAt(0))
    assert(nullGrp.length == 2)
    assert(nullGrp.map(_.getLong(2)).sum == 3) // its 3 tokens all counted
  }

  test("the token-stream shuffle is computed once and reused (AQE)") {
    val d = Tables(spark, sf0001, "documents")
    val df = Divergence.klBySource(d, col("source"), col("text"), 40)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"corpus counts shuffle not reused — every consumer re-scans:\n$plan")
  }

  test("vocabulary restriction keeps only top-V corpus terms") {
    val sps = spark; import sps.implicits._
    val docs = Seq(("s1", "a a a b b c")).toDF("source", "text")
    val terms = Divergence.sourceTermComponents(docs, col("source"),
      col("text"), vocabSize = 2).collect().map(_.getString(1)).toSet
    assert(terms == Set("a", "b")) // c cut by V=2 (ties: count desc, term asc)
  }
}
