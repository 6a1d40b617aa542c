package graft

/** Global scale guard: NO gate query may plan an accidental cartesian or
  * nested-loop join. A refactor that drops an equi-key (a renamed column,
  * a lost join condition) still returns correct rows at test scale and
  * then explodes at 100 TB; this sweep fails it here.
  *
  * Whitelisted by design (bounded or broadcast brute-force scans where
  * the non-equi join IS the algorithm):
  *   - a02/a22/x06/x77: exact pairwise metrics over an explicitly
  *     bounded set;
  *   - x11/x31/x35/x67: brute-force ANN — the query side broadcasts
  *     and every corpus row is scored map-side (that full scan is the
  *     contract; x35 scans the int8-compressed index; x67 runs TWO
  *     brute-force rankings to evaluate truncation recall).
  * Streaming gates are excluded: building their frame executes a real
  * streaming run (covered by their own gates), and their micro-batch
  * plans are checked by Structured Streaming itself.
  */
class GlobalPlanGuardSpec extends SparkSpec {

  private val deliberatePairwise =
    Set("a02_edit_distance", "a22_damerau_pairs", "x06_ngram_jaccard",
      "x11_ann_bruteforce", "x31_ann_pq", "x35_ann_int8", "x67_ann_recall",
      "x77_containment")

  test("no gate plans an accidental cartesian or nested-loop join") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("s0"))
      .filterNot(deliberatePairwise)
    val offenders = names.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"accidental non-equi joins in: ${offenders.mkString(", ")}")
  }

  test("detached component pipelines keep equi-join candidate plans") {
    // the x21/x47 gates detach their results into a LocalRelation (the
    // work runs eagerly inside connectedComponents), so the sweep above
    // no longer sees their pipeline plans — guard the LAZY candidate
    // building blocks directly: bucket-local pair generation (incl. the
    // over-cap keyed-join fallback) must never plan a cartesian
    import org.apache.spark.sql.functions.col
    val d = Tables(spark, sf0001, "documents").limit(60)
      .select(col("doc_id"), col("text"))
    val plans = Seq(
      graft.ext.Dedup.minhashCandidates(d, col("doc_id"), col("text"),
        bands = 4, wordGrams = 3, maxBucket = 2),
      graft.ext.Dedup.minhashCandidatesPortable(d, col("doc_id"), col("text"),
        maxBucket = 2),
      graft.ext.Dedup.simhashCandidates(d, col("doc_id"), col("text"),
        maxBucket = 2))
      .map(_.queryExecution.executedPlan.toString)
    plans.zip(Seq("minhash", "portable", "simhash")).foreach { case (p, n) =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$n candidate generation plans a non-equi join")
    }
  }

  test("a18 fuzzy join pins its bounded blocking-key candidate generation") {
    // a18's scale safety is the `blk` equi-join BEFORE the levenshtein
    // filter: candidates are per-blocking-key, never all-pairs. The
    // global sweep above already rejects a cartesian, but a refactor
    // could silently degrade to a wider equi key (or none on the probe
    // side); pin that the executed plan (1) hash-joins, (2) keys on
    // blk, and (3) evaluates levenshtein AFTER the join (as a filter),
    // so the metric never becomes the join condition of a loop join.
    val plan = SparkEntry.queries("a18_fuzzy_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "a18 lost its equi join")
    assert("(?i)hashjoin.*\\[blk".r.findFirstIn(plan.replace("\n", " ")).isDefined
      || "(?i)join.*blk".r.findFirstIn(plan.replace("\n", " ")).isDefined,
      "a18 no longer keys its join on the blocking column")
    assert(plan.toLowerCase.contains("levenshtein"),
      "a18's verify filter disappeared from the physical plan")
  }

  test("a22's deliberate pairwise scan stays bounded by its pushed id filter") {
    // a22 is whitelisted as deliberate brute force — legitimate ONLY
    // while its input stays an explicitly bounded set. Pin the bound:
    // the scan must push p_partkey <= 40 down to parquet, so the
    // C(40,2)=780-pair budget can never silently widen into a
    // corpus-wide quadratic scan.
    val plan = SparkEntry.queries("a22_damerau_pairs")(spark, sf0001)
      .queryExecution.executedPlan.toString.replace("\n", " ")
    assert("LessThanOrEqual\\(p_partkey,\\s*40\\)".r.findFirstIn(plan).isDefined,
      "a22's bounding filter is no longer pushed to the scan")
    // p_partkey starts at 0 in the testdata, so <= 40 admits 41 ids
    val rows = SparkEntry.queries("a22_damerau_pairs")(spark, sf0001).count()
    assert(rows <= 820, s"a22 produced $rows pairs — bound (C(41,2)) broken")
  }
}
