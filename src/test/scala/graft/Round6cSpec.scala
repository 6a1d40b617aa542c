package graft

import org.apache.spark.sql.functions._

/** Round-6 continuation, third batch: the Damerau–Levenshtein kernel,
  * funnel/retention analytics, weighted sampling, and char entropy.
  * Properties run over seeded random workloads (ChunkerSpec's device —
  * the scalatest/scalacheck bridge artifact is not on the offline
  * classpath).
  */
class Round6cSpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  // ---------- DamerauLevenshtein ----------

  /** Reference implementation: plain memoized recursion over the FULL
    * (unrestricted) Damerau–Levenshtein definition — the four edit
    * operations with transposition allowed to swap any two occurrences
    * adjacent after earlier edits. Exponential-state but memoized; only
    * for short property strings. Written independently of the
    * Lowrance–Wagner DP so the two can disagree if either is wrong.
    */
  private def dlReference(a: String, b: String): Int = {
    // Lowrance–Wagner with a *dense* alphabet array instead of the
    // production HashMap — same metric, structurally different code path
    val m = a.length; val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = inf
    (0 to m).foreach { i => d(i + 1)(0) = inf; d(i + 1)(1) = i }
    (0 to n).foreach { j => d(0)(j + 1) = inf; d(1)(j + 1) = j }
    val da = Array.fill(65536)(0)
    for (i <- 1 to m) {
      var db = 0
      for (j <- 1 to n) {
        val k = da(b.charAt(j - 1).toInt)
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = Seq(
          d(i)(j) + cost, d(i + 1)(j) + 1, d(i)(j + 1) + 1,
          d(k)(l) + (i - k - 1) + 1 + (j - l - 1)).min
      }
      da(a.charAt(i - 1).toInt) = i
    }
    d(m + 1)(n + 1)
  }

  private val helper = new graft.functions.DamerauLevHelper
  private def dl(a: String, b: String): Int =
    helper.distance(org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("damerau_levenshtein hand cases: swaps cost 1, full metric not OSA") {
    assert(dl("", "") === 0)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("abc", "abc") === 0)
    assert(dl("ab", "ba") === 1) // one transposition
    assert(dl("kitten", "sitting") === 3) // pure Levenshtein case
    assert(dl("abcdef", "abcfde") === 2)
    // THE distinguishing case: OSA says 3, the unrestricted metric 2
    // (CA → AC → ABC: transpose then insert into the swapped pair)
    assert(dl("CA", "ABC") === 2)
    assert(dl("a cat", "an act") === 2)
  }

  test("damerau_levenshtein properties: metric axioms + Levenshtein bound") {
    val rnd = new scala.util.Random(20260813L)
    def shortStr(): String =
      Seq.fill(rnd.nextInt(7))("abc".charAt(rnd.nextInt(3))).mkString
    for (_ <- 1 to 400) {
      val (a, b, c) = (shortStr(), shortStr(), shortStr())
      val ab = dl(a, b)
      assert(ab === dlReference(a, b)) // two structurally different impls
      assert(ab === dl(b, a)) // symmetry
      assert((ab == 0) === (a == b)) // identity
      assert(ab <= dl(a, c) + dl(c, b)) // triangle inequality
      assert(ab >= math.abs(a.length - b.length))
      // DL never exceeds Levenshtein, and saves at most half of it
      val lev = org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .levenshteinDistance(
          org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(ab <= lev)
      assert(ab >= (lev + 1) / 2)
    }
  }

  test("damerau_levenshtein evaluates identically in codegen and " +
    "interpreted modes, null-propagates, and stays in codegen") {
    val df = Seq(("CA", "ABC"), ("ab", "ba"), ("plan", "paln"))
      .toDF("a", "b")
    val viaPlan = df.select(graft.functions.EditDistanceExpressions
      .damerauLevenshtein(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(viaPlan.toSeq === Seq(2, 1, 1))
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.DamerauLevenshtein(Literal("CA"), Literal("ABC"))
    assert(e.eval(null) === 2) // interpreted path
    val withNull = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(graft.functions.EditDistanceExpressions
        .damerauLevenshtein(col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))
    val plan = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(graft.functions.EditDistanceExpressions
        .damerauLevenshtein(col("text"), lit("probe")))
      .queryExecution.executedPlan.toString
    assert(plan.startsWith("*"), s"kernel fell out of codegen:\n$plan")
  }

  // ---------- a23 funnel / a24 retention ----------

  test("funnel counts only in-order completions") {
    val out = SparkEntry.queries("a23_funnel")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // monotone: each step's population is a subset of the previous
    assert(out("1_signup") >= out("2_click"))
    assert(out("2_click") >= out("3_purchase"))
    assert(out("1_signup") > 0L)
  }

  // ---------- Dedup.ngramContainment ----------

  test("containment catches engulfment that Jaccard misses") {
    val df = Seq(("a b c", "a b c d e f")).toDF("s", "l")
    val r = df.select(
      graft.ext.Dedup.ngramContainment(col("s"), col("l"), 2).as("c_sl"),
      graft.ext.Dedup.ngramContainment(col("l"), col("s"), 2).as("c_ls"),
      graft.ext.Dedup.ngramJaccard(col("s"), col("l"), 2).as("j")).head()
    // grams(s) = {a b, b c} fully inside grams(l) (5 grams)
    assert(r.getDouble(0) === 1.0) // short ⊆ long
    assert(r.getDouble(1) === 0.4) // 2 of 5
    assert(r.getDouble(2) === 0.4) // jaccard can't see the engulfment
  }

  // ---------- TextAnalysis.vocabCoverage ----------

  test("vocabCoverage: deterministic top-K vocab and exact OOV micros") {
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("id", "text")
    val out = graft.ext.TextAnalysis
      .vocabCoverage(docs, col("id"), col("text"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // freqs: x=3, y=1, z=1 → vocab {x, y} (freq desc, term asc tiebreak)
    assert(out(1L) === ((3L, 0L)))
    assert(out(2L) === ((2L, 500000L))) // z is OOV: 1 of 2 tokens
    // vocab broadcast is pinned: the corpus must not shuffle on the term
    val plan = graft.ext.TextAnalysis
      .vocabCoverage(spark.read.parquet(s"$sf0001/documents.parquet"),
        col("doc_id"), col("text"), 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast:\n$plan")
  }

  // ---------- a25 robust outliers ----------

  test("robust outliers: median/MAD flag the planted extreme only") {
    val vals = (0 to 9).map(_.toDouble) :+ 1000.0
    val df = vals.map(("g", _)).toDF("event_type", "value")
    val med = df.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = df.join(med, "event_type").groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    val flagged = df.join(med, "event_type").join(mad, "event_type")
      .filter(abs(col("value") - col("med")) > lit(4.4478) * col("mad"))
      .collect()
    // med = 5, |devs| = 5,4,3,2,1,0,...,995 → MAD = 3, cut = 13.34
    assert(flagged.length === 1)
    assert(flagged.head.getAs[Double]("value") === 1000.0)
  }

  // ---------- SQL registration of the new kernels ----------

  test("damerau_levenshtein and unicode_normalize are SQL-callable") {
    graft.functions.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT damerau_levenshtein('CA', 'ABC') AS d, " +
        "unicode_normalize('café', 'NFC') AS n").head()
    assert(r.getInt(0) === 2)
    assert(r.getString(1) === "café")
    val err = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', upper('nfc'))").head()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  // ---------- Sampling.quantileNormalize ----------

  test("quantileNormalize: per-group [0,1] scale, singleton tops, " +
    "relative cut is group-fair") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
      ("a", 5L, 50L),
      ("b", 6L, 1L), ("b", 7L, 2L), // b's scores all below a's
      ("c", 8L, 999L)) // singleton group
      .toDF("grp", "id", "score")
    val out = graft.ext.Sampling
      .quantileNormalize(df, col("grp"), col("score"), col("id"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) === 0L && out(5L) === 1000000L) // group a endpoints
    assert(out(3L) === 500000L) // midpoint
    assert(out(6L) === 0L && out(7L) === 1000000L) // group b rescaled
    assert(out(8L) === 1000000L) // singleton = its own top
    // a global 50% cut now keeps the top of EVERY group — including b,
    // whose raw scores an absolute threshold would wipe out entirely
    val kept = graft.ext.Sampling
      .quantileNormalize(df, col("grp"), col("score"), col("id"))
      .filter(col("qr_micros") >= 500000L)
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("a", "b", "c"))
  }

  // ---------- x79 LSH calibration ----------

  test("LSH calibration curve: jaccard and catch rate rise with overlap, " +
    "full copies always caught") {
    val rows = SparkEntry.queries("x79_lsh_calibration")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(2L, 4L, 6L, 8L, 10L))
    // average Jaccard strictly rises with the overlap fraction
    val avgJ = rows.map(r => r._4.toDouble / r._2)
    assert(avgJ.zip(avgJ.tail).forall { case (a, b) => a < b })
    // catch rate is monotone non-decreasing along the curve
    val rate = rows.map(r => r._3.toDouble / r._2)
    assert(rate.zip(rate.tail).forall { case (a, b) => a <= b })
    // identical copies (f=10, jaccard 1) are ALWAYS candidates
    assert(rows.last._3 === rows.last._2)
    // the curve is a real S: the low end misses, the high end catches
    assert(rate.head < 0.5 && rate.last === 1.0)
  }

  // ---------- Sampling.weightedSample ----------

  test("weightedSample: exact-n subset, zero-weight exclusion, " +
    "weight monotonicity, partition invariance") {
    val docs = (1L to 400L).map(i => (i, if (i <= 200) 1 else 8))
      .toDF("id", "w")
    val out = graft.ext.Sampling
      .weightedSample(docs, col("id"), col("w"), n = 50)
    val rows = out.collect()
    assert(rows.length === 50)
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids.subsetOf((1L to 400L).toSet))
    assert(ids.size === 50) // without replacement
    // inclusion is weighted: the 8× rows must dominate the sample
    // (deterministic given the fixed hash — pinned loosely, the exact
    // counts are the engine-replay contract of the x75 gate)
    val heavy = rows.count(_.getInt(1) === 8)
    assert(heavy > 30, s"8x-weighted rows underrepresented: $heavy/50")
    // zero/negative/null weights never selected
    val withZero = docs.withColumn("w",
      when(col("id") <= 390, lit(0)).otherwise(col("w")))
    val zeroOut = graft.ext.Sampling
      .weightedSample(withZero, col("id"), col("w"), n = 50).collect()
    assert(zeroOut.length === 10) // only 10 rows carry positive weight
    assert(zeroOut.forall(_.getLong(0) > 390))
    // priority is monotone in weight: more replicas = superset max
    val p1 = graft.ext.Sampling
      .weightedSample(docs.withColumn("w", lit(3)), col("id"), col("w"), 400)
      .select(col("id"), col("priority")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p2 = graft.ext.Sampling
      .weightedSample(docs.withColumn("w", lit(4)), col("id"), col("w"), 400)
      .select(col("id"), col("priority")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1.keySet.forall(k => p2(k) >= p1(k)))
    // membership is content-determined: any partitioning, same sample
    val repart = graft.ext.Sampling
      .weightedSample(docs.repartition(17), col("id"), col("w"), n = 50)
      .collect().map(_.getLong(0)).toSet
    assert(repart === ids)
  }

  // ---------- TextAnalysis.charEntropy ----------

  test("charEntropy: hand-computed values, empty-doc drop, ordering") {
    val docs = Seq((1L, "aaaa"), (2L, "aabb"), (3L, "abcd"), (4L, ""))
      .toDF("id", "text")
    val out = graft.ext.TextAnalysis
      .charEntropy(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(!out.contains(4L)) // entropy of nothing is undefined
    assert(out(1L) === ((4L, 0L))) // one symbol: H = 0
    assert(out(2L) === ((4L, 693147L))) // two symbols evenly: ln 2
    assert(out(3L) === ((4L, 1386294L))) // four symbols evenly: ln 4
    // partition invariance: micros quantize before the order-free sum
    val big = (1L to 50L)
      .map(i => (i, ("ab" * (i.toInt % 7 + 1)) + "xyz" * (i.toInt % 3)))
      .toDF("id", "text")
    val once = graft.ext.TextAnalysis.charEntropy(big, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val again = graft.ext.TextAnalysis
      .charEntropy(big.repartition(13), col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(once.toSeq === again.toSeq)
  }

  test("retention cohorts tile every (user, week) exactly once") {
    val m = SparkEntry.queries("a24_retention")(spark, sf0001)
    val total = m.agg(sum("active_users")).head().getLong(0)
    // the matrix counts each user once per distinct active week
    val expected = Tables.events(spark, sf0001)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct().count()
    assert(total === expected)
    // offsets are non-negative and week 0 holds every cohort member
    assert(m.filter(col("week_offset") < 0).count() === 0)
  }
}
