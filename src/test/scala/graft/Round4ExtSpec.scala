package graft

import graft.ext.{Dedup, SemDedup, Similarity}
import graft.ops.BloomJoin
import org.apache.spark.sql.functions._

/** Semantics of the round-4 extensions: semantic dedup, int8-quantized
  * similarity, cross-document n-gram coverage, bloom-prefiltered joins.
  */
class SemDedupSpec extends SparkSpec {

  test("planted exact copies are flagged; originals are kept") {
    val e = Tables(spark, sf0001, "embeddings")
    val copies = e.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val corpus = e.unionByName(copies)
    val cents = SemDedup.seedCentroids(corpus, k = 4)
    val flags = SemDedup.flagDuplicates(corpus, cents, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // every planted copy has its original (lower id, identical vector,
    // same cluster) as a predecessor at cos ≈ 1
    (0L until 10L).foreach { i =>
      assert(flags(i + 100000L), s"copy of $i not flagged")
    }
    // no original is a near-dup of another random vector at τ=0.99
    assert(flags.count { case (id, d) => id < 100000L && d } == 0)
  }

  test("copies land in their original's cluster (assignment determinism)") {
    val e = Tables(spark, sf0001, "embeddings")
    val cents = SemDedup.seedCentroids(e, k = 4)
    val a = e.select(col("vec_id"),
        SemDedup.assignCluster(col("embedding"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aCopy = e.withColumn("vec_id", col("vec_id") + 500L)
      .select(col("vec_id"),
        SemDedup.assignCluster(col("embedding"), cents).as("c"))
      .collect().map(r => r.getLong(0) - 500L -> r.getLong(1)).toMap
    assert(a == aCopy)
    // seed members assign to their own centroid (self-cosine = max)
    (0L until 4L).foreach(i => assert(a(i) == i))
  }

  test("deduplicate = corpus minus flagged members") {
    val e = Tables(spark, sf0001, "embeddings")
    val copies = e.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val corpus = e.unionByName(copies)
    val cents = SemDedup.seedCentroids(corpus, k = 4)
    val kept = SemDedup.deduplicate(corpus, cents, tau = 0.99)
    assert(kept.count() == corpus.count() - 10)
    assert(kept.filter(col("vec_id") >= 100000L).count() == 0)
  }
}

class Int8Spec extends SparkSpec {

  test("codes are honest int8: tinyint storage, |q| <= 127") {
    val e = Tables(spark, sf0001, "embeddings")
    val idx = Similarity.int8Index(e)
    val elemType = idx.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(elemType == org.apache.spark.sql.types.ByteType)
    val mx = idx.select(array_max(transform(col("codes"),
      x => abs(x.cast("int")))).as("m")).agg(max("m")).collect()(0).getInt(0)
    assert(mx <= 127)
  }

  test("int8 top-1 recall vs exact brute force is high") {
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val idx = Similarity.int8Index(e)
    val approx = Similarity.int8TopK(idx, q, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val agree = exact.keys.count(k => exact(k) == approx(k))
    // int8 symmetric quantization loses <1% dot precision — top-1
    // should almost always survive it
    assert(agree >= 18, s"top-1 agreement $agree/20")
  }

  test("zero vector quantizes to all-zero codes, scale 0, score 0") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 3f)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.int8Index(df)
    val z = idx.filter(col("neighbor_id") === 1L).collect()(0)
    assert(z.getDouble(1) == 0.0)
    assert(z.getSeq[Byte](2).forall(_ == 0))
    val scores = Similarity.int8TopK(idx, df, k = 2).collect()
    assert(scores.filter(r => r.getLong(0) == 2L && r.getLong(2) == 1L)
      .forall(_.getDouble(3) == 0.0))
  }
}

class DupNgramSpec extends SparkSpec {

  test("cross-document coverage counts grams shared with ANY other doc") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // grams: abc, bcd
      (2L, "a b c e"),   // grams: abc, bce -> shares abc with doc 1
      (3L, "x y z w"),   // grams: xyz, yzw -> unique
      (4L, "x y"))       // < 3 tokens -> no grams
      .toDF("doc_id", "text")
    val rep = Dedup.dupNgramCoverage(docs, col("doc_id"), col("text"), n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(rep(1L) == ((2L, 1L, Some(0.5))))
    assert(rep(2L) == ((2L, 1L, Some(0.5))))
    assert(rep(3L) == ((2L, 0L, Some(0.0))))
    assert(rep(4L) == ((0L, 0L, None))) // reported, not dropped
  }

  test("within-doc repeats do not inflate the cross-doc count") {
    val spark0 = spark
    import spark0.implicits._
    // "a b c a b c" repeats gram "a b c" internally; distinct-per-doc
    // means it counts once, and with no OTHER doc sharing it, zero shared
    val docs = Seq((1L, "a b c a b c"), (2L, "q r s t")).toDF("doc_id", "text")
    val rep = Dedup.dupNgramCoverage(docs, col("doc_id"), col("text"), n = 3)
      .filter(col("id") === 1L).collect()(0)
    assert(rep.getLong(2) == 0L)
  }
}

class EpochShuffleSpec extends SparkSpec {

  test("positions are an exact permutation, rerun-identical, seed-sensitive") {
    val d = Tables(spark, sf0001, "documents").select(col("doc_id"))
    val n = d.count()
    val p1 = ext.Sampling.epochShuffle(d, col("doc_id"), seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact permutation of [0, n)
    assert(p1.values.toSeq.sorted == (0L until n).toSeq)
    // content-deterministic: a rerun reproduces every position
    val p2 = ext.Sampling.epochShuffle(d, col("doc_id"), seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 == p2)
    // a different epoch seed produces a genuinely different order
    val p3 = ext.Sampling.epochShuffle(d, col("doc_id"), seed = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 != p3)
  }

  test("no single-partition Window operator in the plan") {
    val d = Tables(spark, sf0001, "documents").select(col("doc_id"))
    val plan = ext.Sampling.epochShuffle(d, col("doc_id"), seed = 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}

class AdjacentPairsSpec extends SparkSpec {

  test("pairs zip consecutive tokens; single-token docs are empty") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq("a b c", "solo", "x y")
      .toDF("text")
      .select(ext.TextAnalysis.adjacentPairsOver(
        ext.TextAnalysis.tokens(col("text"))).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b", "b c"))
    assert(rows(1) == Seq())
    assert(rows(2) == Seq("x y"))
  }
}

class BloomJoinSpec extends SparkSpec {

  test("bloom-prefiltered join equals the plain join exactly") {
    val li = Tables(spark, sf0001, "lineitem")
    val dim = Tables(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 250000.0).select("o_orderkey")
    val got = BloomJoin.join(li, dim, "l_orderkey", "o_orderkey", 4096)
      .groupBy("o_orderkey").count().orderBy("o_orderkey").collect()
    val want = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").count().orderBy("o_orderkey").collect()
    assert(got.sameElements(want))
  }

  test("non-integral join key is rejected loudly, not silently dropped") {
    val li = Tables(spark, sf0001, "lineitem")
    val dim = Tables(spark, sf0001, "orders").select("o_orderpriority")
    intercept[IllegalArgumentException] {
      BloomJoin.buildKeyFilter(dim, "o_orderpriority", 64)
    }
    intercept[IllegalArgumentException] {
      BloomJoin.join(li.withColumn("lk", col("l_orderkey").cast("string")),
        Tables(spark, sf0001, "orders").select("o_orderkey"),
        "lk", "o_orderkey", 64)
    }
  }

  test("prefilter drops most non-matching fact rows, never a matching one") {
    val li = Tables(spark, sf0001, "lineitem")
    val dim = Tables(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 250000.0).select("o_orderkey")
    val bytes = BloomJoin.buildKeyFilter(dim, "o_orderkey", 4096)
    val pre = li.filter(BloomJoin.mightContain(bytes, col("l_orderkey")))
    val full = li.count()
    val matching = li.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    val kept = pre.count()
    assert(kept >= matching, "false negative: bloom dropped a matching row")
    // with fpp=3%, kept ≈ matching + 0.03·(full − matching) ≪ full
    assert(kept < matching + (full - matching) / 2,
      s"bloom kept $kept of $full (matching $matching) — no selectivity")
    // every truly-matching key passes the filter
    assert(li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .filter(!BloomJoin.mightContain(bytes, col("l_orderkey"))).count() == 0)
  }

  test("probe is the native codegen predicate, not a UDF") {
    val li = Tables(spark, sf0001, "lineitem")
    val dim = Tables(spark, sf0001, "orders").select("o_orderkey").limit(100)
    val bytes = BloomJoin.buildKeyFilter(dim, "o_orderkey", 1024)
    val plan = li.filter(BloomJoin.mightContain(bytes, col("l_orderkey")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython")
      && !plan.contains("UDF"), plan)
  }
}
