package graft

/** Global scale guard: NO gate query may plan an accidental cartesian or
  * nested-loop join. A refactor that drops an equi-key (a renamed column,
  * a lost join condition) still returns correct rows at test scale and
  * then explodes at 100 TB; this sweep fails it here.
  *
  * Whitelisted by design (bounded or broadcast brute-force scans where
  * the non-equi join IS the algorithm):
  *   - a02/x06: exact pairwise metrics over an explicitly bounded set;
  *   - x11/x31/x35: brute-force ANN — the query side broadcasts and
  *     every corpus row is scored map-side (that full scan is the
  *     contract; x35 scans the int8-compressed index).
  * Streaming gates are excluded: building their frame executes a real
  * streaming run (covered by their own gates), and their micro-batch
  * plans are checked by Structured Streaming itself.
  */
class GlobalPlanGuardSpec extends SparkSpec {

  private val deliberatePairwise =
    Set("a02_edit_distance", "x06_ngram_jaccard", "x11_ann_bruteforce",
      "x31_ann_pq", "x35_ann_int8")

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
}
