package graft

import graft.ext.{BpeLearn, Clustering, Sampling, SemDedup}
import graft.ops.Cdc
import org.apache.spark.sql.functions._

/** Semantics of the round-5 extensions: distributed k-means, CDC
  * changelog application, hash-membership stratified sampling, BPE merge
  * learning.
  */
class ClusteringSpec extends SparkSpec {

  test("lloydStepStats sums every member exactly once per dimension") {
    val e = Tables(spark, sf0001, "embeddings")
    val cents = SemDedup.seedCentroids(e, k = 4)
    val stats = Clustering.lloydStepStats(e, cents, maxDims = 4).collect()
    val total = e.count()
    // each of the 4 dims partitions all points across clusters
    (0 until 4).foreach { p =>
      assert(stats.filter(_.getInt(1) == p).map(_.getLong(3)).sum == total)
    }
    // cluster ids within codebook range
    assert(stats.map(_.getLong(0)).forall(c => c >= 0 && c < 4))
  }

  test("train converges on well-separated synthetic clusters") {
    val sps = spark; import sps.implicits._
    // two tight groups far apart on opposite axes; the seed codebook
    // (lowest 2 ids = one point from each group) must settle on the
    // group means
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (4L, Array(1.1f, -0.1f)),
      (1L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 0.9f)), (5L, Array(-0.1f, 1.1f)))
      .toDF("vec_id", "embedding")
    val codebook = Clustering.train(pts, k = 2, iters = 3)
    assert(codebook.length == 2)
    val c0 = codebook(0)._2
    val c1 = codebook(1)._2
    // centroid 0 (seeded from vec 0) ends x-heavy; centroid 1 y-heavy
    assert(c0(0) > 0.8f && c0(1) < 0.2f)
    assert(c1(0) < 0.2f && c1(1) > 0.8f)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    val sps = spark; import sps.implicits._
    // both points sit on the x axis; centroid 1 (seeded from the second
    // lowest id, also x-ish but strictly farther) is never nearest after
    // the first step in a 2-codebook where centroid 0 dominates
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.001f)))
      .toDF("vec_id", "embedding")
    val codebook = Clustering.train(pts, k = 2, iters = 2)
    // vec 0 assigns to centroid 0 (tie-break to lowest id on identical
    // cosine is irrelevant here); both near-parallel vectors land on
    // centroid 0 or 1 deterministically, and the empty one must retain
    // a finite centroid (no NaN/zero-division)
    assert(codebook.forall(_._2.forall(v => !v.isNaN && !v.isInfinite)))
  }
}

class CdcSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def snap: DataFrame = {
    val sps = spark; import sps.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
  }

  test("latest change wins: update, delete, insert, untouched") {
    val sps = spark; import sps.implicits._
    val changes = Seq(
      (1L, 10L, "U", "a1"), (1L, 11L, "U", "a2"),   // two updates: seq 11 wins
      (2L, 12L, "D", "x"),                          // delete id 2
      (9L, 13L, "U", "new")                         // insert id 9
    ).toDF("id", "seq", "op", "v")
    val got = Cdc.applyChangelog(snap, changes, Seq("id"), "seq", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (3L, "c"), (9L, "new")))
  }

  test("a stale delete is overridden by a later upsert and vice versa") {
    val sps = spark; import sps.implicits._
    val changes = Seq(
      (1L, 10L, "D", "x"), (1L, 11L, "U", "back"),  // delete then re-insert
      (3L, 20L, "U", "c2"), (3L, 21L, "D", "x")     // update then delete
    ).toDF("id", "seq", "op", "v")
    val got = Cdc.applyChangelog(snap, changes, Seq("id"), "seq", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "back"), (2L, "b")))
  }

  test("compaction is deterministic under duplicate sequence numbers") {
    val sps = spark; import sps.implicits._
    val changes = Seq(
      (1L, 10L, "U", "zz"), (1L, 10L, "U", "aa")    // same seq: lexicographic
    ).toDF("id", "seq", "op", "v")
    val a = Cdc.latestChanges(changes, Seq("id"), "seq").collect()
    val b = Cdc.latestChanges(changes.repartition(7), Seq("id"), "seq").collect()
    assert(a.sameElements(b))
    // output is (id, seq, op, v); max(struct(seq, op, v)) → "zz" beats "aa"
    assert(a.head.getString(3) == "zz")
  }

  test("changelog missing a payload column fails loudly") {
    val sps = spark; import sps.implicits._
    val changes = Seq((1L, 10L, "U")).toDF("id", "seq", "op")
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, changes, Seq("id"), "seq", "op")
    }
  }
}

class BpeLearnSpec extends SparkSpec {

  test("merges match the hand-computed BPE rounds on a tiny corpus") {
    val sps = spark; import sps.implicits._
    // corpus: "abab abab aa" → chars. Round 1 pairs: (a b)×4, (b a)×2,
    // (a a)×1 → merge "a b". Round 2 tokens: [ab ab] [ab ab] [a a] →
    // pairs: (ab ab)×2, (a a)×1 → merge "ab ab". Round 3: [abab] [abab]
    // [a a] → pairs: (a a)×1 → merge "a a".
    val docs = Seq("abab abab aa").toDF("text")
    val got = BpeLearn.learnMergesSequential(docs, col("text"), merges = 3)
    assert(got == Seq((1L, "a b", 4L), (2L, "ab ab", 2L), (3L, "a a", 1L)))
  }

  test("greedy application does not re-merge across a fresh merge") {
    val sps = spark; import sps.implicits._
    // "aaa" under rule (a,a): left-to-right gives [aa, a], never [a, aa]
    // and never a triple merge
    val t = Seq("a a a").toDF("tok")
      .select(BpeLearn.applyMerge(col("tok"), "a", "a").as("t"))
      .collect().head.getString(0)
    assert(t == "aa a")
  }

  test("multi-char tokens only merge on full-token matches") {
    val sps = spark; import sps.implicits._
    // rule (a,b): "ca b" must NOT merge ("ca" ends in 'a' but is not
    // the token "a"); "c a b" must merge the tail
    val rows = Seq("ca b", "c a b").toDF("tok")
      .select(BpeLearn.applyMerge(col("tok"), "a", "b").as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("ca b", "c ab"))
  }

  test("learning stops early when no adjacent pairs remain") {
    val sps = spark; import sps.implicits._
    val docs = Seq("x y").toDF("text")
    // single-char words have no intra-word pairs at all
    val got = BpeLearn.learnMergesSequential(docs, col("text"), merges = 5)
    assert(got.isEmpty)
  }

  test("batched learner is output-identical to sequential on the fixture corpus") {
    val sps = spark; import sps.implicits._
    val docs = Seq("abab abab aa", "the cat sat on the mat",
      "banana bandana", "deduplicate the data then train").toDF("text")
    for (m <- Seq(1, 3, 8, 20)) {
      val seqM = BpeLearn.learnMergesSequential(docs, col("text"), merges = m)
      for (b <- Seq(2, 4, 8)) {
        val batM = BpeLearn.learnMergesBatched(docs, col("text"), merges = m, batch = b)
        assert(batM == seqM, s"divergence at merges=$m batch=$b")
      }
    }
  }

  test("chunked apply is output-identical to the single-projection apply") {
    val docs = Tables(spark, sf0001, "documents").limit(120)
    val merges = BpeLearn.learnMergesSequential(docs, col("text"), merges = 6)
      .map { case (_, pair, _) =>
        val Array(a, b) = pair.split(" ", 2); (a, b)
      }
    val whole = BpeLearn.tokenCounts(docs, col("doc_id"), col("text"), merges)
      .orderBy("doc_id").collect().toSeq
    for (chunk <- Seq(1, 2, 4)) {
      val chunked = BpeLearn.tokenCountsChunked(docs, col("doc_id"), col("text"),
        merges, chunk = chunk)
      val got = chunked.orderBy("doc_id").collect().toSeq
      BpeLearn.release(chunked)
      assert(got == whole, s"chunk=$chunk diverged")
    }
  }

  test("batched learner matches sequential on real sf0.001 documents") {
    val docs = Tables(spark, sf0001, "documents").limit(200)
    val seqM = BpeLearn.learnMergesSequential(docs, col("text"), merges = 12)
    val batM = BpeLearn.learnMergesBatched(docs, col("text"), merges = 12, batch = 6)
    assert(batM == seqM)
  }
}

class ResampleSpec extends SparkSpec {

  test("gapFill densifies the span, zero-fills counts, carries levels") {
    val sps = spark; import sps.implicits._
    import graft.ops.Resample
    // key 1 observed at ticks 10 and 13 → grid 10..13; key 2 a single
    // tick → grid of one row
    val obs = Seq((1L, 10L, 2L, 100L), (1L, 13L, 1L, 250L), (2L, 5L, 4L, 40L))
      .toDF("k", "t", "n", "level")
    val got = Resample.gapFill(obs, "k", "t",
        zeroFill = Seq("n"), carryForward = Seq("level"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 10L, 2L, 100L), (1L, 11L, 0L, 100L), (1L, 12L, 0L, 100L),
      (1L, 13L, 1L, 250L), (2L, 5L, 4L, 40L)))
  }

  test("forwardFill leaves leading nulls null and is partition-local") {
    val sps = spark; import sps.implicits._
    import graft.ops.Resample
    val df = Seq((1L, 1L, Option.empty[Long]), (1L, 2L, Some(7L)),
      (1L, 3L, Option.empty[Long]), (2L, 1L, Option.empty[Long]))
      .toDF("k", "t", "v")
    val got = Resample.forwardFill(df, "k", "t", Seq("v"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // key 1's leading null stays (nothing to carry); key 2 must NOT
    // inherit key 1's value
    assert(got.toSeq == Seq((1L, 1L, None), (1L, 2L, Some(7L)),
      (1L, 3L, Some(7L)), (2L, 1L, None)))
  }
}

class IncrementalDedupSpec extends SparkSpec {

  test("re-submitted content is rejected regardless of its new id") {
    val sps = spark; import sps.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val incoming = Seq((10L, "alpha"), (11L, "gamma"), (12L, "beta"),
      (13L, "delta")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.newDocuments(corpus, incoming,
        col("doc_id"), col("text"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(11L, 13L))
  }

  test("duplicates inside the corpus do not multiply incoming rows") {
    val sps = spark; import sps.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "alpha")).toDF("doc_id", "text")
    val incoming = Seq((10L, "alpha"), (11L, "new")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.newDocuments(corpus, incoming,
        col("doc_id"), col("text")).collect()
    assert(got.length == 1 && got.head.getLong(0) == 11L)
  }

  test("same new text twice in one batch admits only the lowest id") {
    val sps = spark; import sps.implicits._
    val corpus = Seq((1L, "alpha")).toDF("doc_id", "text")
    val incoming = Seq((12L, "fresh"), (10L, "fresh"), (11L, "other"))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.newDocuments(corpus, incoming,
        col("doc_id"), col("text"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 11L))
  }

  test("null-text rows are excluded, not admitted forever") {
    val sps = spark; import sps.implicits._
    val corpus = Seq((1L, Some("alpha")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, Option.empty[String]), (11L, Some("new")))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.newDocuments(corpus, incoming,
        col("doc_id"), col("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L))
  }
}

class LevenshteinBandRuleSpec extends SparkSpec {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.{Expression, Levenshtein}

  private def bandedIn(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists {
        case Levenshtein(_, _, Some(_)) => true
        case _ => false
      })

  test("every threshold comparison shape rewrites to the banded kernel") {
    val sps = spark; import sps.implicits._
    graft.functions.GraftExtensions.registerAll(spark)
    // parquet-backed (a literal LocalRelation would constant-fold the
    // whole filter away before the shape could be observed)
    val df = Tables(spark, sf0001, "customer")
      .select($"c_name".as("a"), concat($"c_name", lit("X")).as("b"))
    val shapes: Seq[Column] = Seq(
      levenshtein($"a", $"b") <= 2, levenshtein($"a", $"b") < 3,
      lit(2) >= levenshtein($"a", $"b"), lit(3) > levenshtein($"a", $"b"),
      levenshtein($"a", $"b") > 2, levenshtein($"a", $"b") >= 3,
      lit(2) < levenshtein($"a", $"b"), lit(2) <= levenshtein($"a", $"b"))
    shapes.foreach { c =>
      assert(bandedIn(df.filter(c)), s"not rewritten: $c")
    }
    // a bare projected distance must NOT be touched
    assert(!bandedIn(df.select(levenshtein($"a", $"b").as("d"))))
  }

  test("banded filters keep exact unbanded semantics incl. nulls") {
    val sps = spark; import sps.implicits._
    graft.functions.GraftExtensions.registerAll(spark)
    val df = Seq(("kitten", Some("sitting")), ("abc", Some("abc")),
      ("abc", Some("abd")), ("abc", Some("xyzabcdef")), ("abc", None))
      .toDF("a", "b")
    def keys(d: org.apache.spark.sql.DataFrame) =
      d.select("a", "b").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    val dists = df.select($"a", $"b", levenshtein($"a", $"b").as("d"))
      .collect()
      .map(r => ((r.getString(0), Option(r.getString(1))),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    // lev <= 2: null rows drop, distance rows compare numerically
    assert(keys(df.filter(levenshtein($"a", $"b") <= 2)) ==
      dists.filter(_._2.exists(_ <= 2)).keySet)
    // the negated band: lev > 2
    assert(keys(df.filter(levenshtein($"a", $"b") > 2)) ==
      dists.filter(_._2.exists(_ > 2)).keySet)
    // strict/flipped forms agree with the same ground truth
    assert(keys(df.filter(lit(3) > levenshtein($"a", $"b"))) ==
      dists.filter(_._2.exists(_ < 3)).keySet)
    assert(keys(df.filter(levenshtein($"a", $"b") >= 1)) ==
      dists.filter(_._2.exists(_ >= 1)).keySet)
  }
}

class MediaResizeSpec extends SparkSpec {

  import graft.ext.Multimodal

  test("resizeStub downsamples and upsamples with nearest-neighbor picks") {
    val bytes = Array[Byte](10, 20, 30, 40)
    // downsample 4→2: indices 0*4/2=0, 1*4/2=2
    assert(Multimodal.resizeStub(bytes, 2).toSeq == Seq[Byte](10, 30))
    // upsample 4→8: indices 0,0,1,1,2,2,3,3
    assert(Multimodal.resizeStub(bytes, 8).toSeq ==
      Seq[Byte](10, 10, 20, 20, 30, 30, 40, 40))
    // empty payload stays empty
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4).isEmpty)
  }

  test("resizeFeatures checksums the picked bytes per media row") {
    val sps = spark; import sps.implicits._
    val d = Seq((1L, "abcd")).toDF("doc_id", "text")
    val got = Multimodal.resizeFeatures(
        Multimodal.attachPayload(d, "doc_id", "text"), target = 2)
      .collect().head
    // picks 'a'(97) and 'c'(99)
    assert(got == Multimodal.ResizedMedia(1L, 4L, 196L))
  }
}

class ProfileSpec extends SparkSpec {

  test("profile reports rows, nulls, ndv, min/max per column in one pass") {
    val sps = spark; import sps.implicits._
    val df = Seq((Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a")))
      .toDF("k", "s")
    val got = graft.ops.Profile.profile(df, Seq("k", "s"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "c")))
  }
}

class HashSampleSpec extends SparkSpec {

  test("membership is identical across partitionings and runs") {
    val d = Tables(spark, sf0001, "documents")
    val a = Sampling.stratifiedSampleByHash(d, col("lang"), col("doc_id"), 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratifiedSampleByHash(d.repartition(13), col("lang"),
        col("doc_id"), 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("returns min(n, stratum size) rows per stratum") {
    val d = Tables(spark, sf0001, "documents")
    val sizes = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.stratifiedSampleByHash(d, col("lang"), col("doc_id"), 1000000)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == sizes)
  }
}
