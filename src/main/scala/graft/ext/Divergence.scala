package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-distribution drift between corpus slices: per-group (source /
  * snapshot / shard) unigram distributions compared to the corpus-wide
  * distribution by KL divergence, KL(p_grp ‖ p_corpus) = Σ_t p·ln(p/q).
  * The standard monitor for "did this crawl slice / new data drop look
  * like the rest of the corpus?" in training-data pipelines.
  *
  * Scale design — HIERARCHICAL aggregation:
  *   - the token stream is scanned and shuffled ONCE, into per-(group,
  *     term) counts — everything else derives from that counts frame,
  *     which is |groups|·|vocab|-sized, i.e. tiny next to the corpus;
  *   - the corpus marginal re-aggregates the counts frame instead of
  *     re-reading the corpus (exact: sums of exact longs), and the
  *     repeated references to the counts subtree hit AQE's exchange
  *     reuse (one shuffle execution, many readers — pinned by
  *     DivergenceSpec). A `groupingSets` formulation is strictly worse here:
  *     Expand duplicates every token row before the shuffle, and
  *     Catalyst splits the grouping-set filters into separate
  *     full-corpus passes;
  *   - distributions are restricted to the corpus top-V vocabulary
  *     (count desc, term asc — deterministic), selected with
  *     `orderBy(...).limit(V)` → `TakeOrderedAndProject`, then
  *     broadcast — per-group joins never shuffle on the raw vocabulary,
  *     which at 100 TB is itself huge and heavy-tailed;
  *   - both distributions renormalize over the selected vocabulary, so
  *     every p/q is a ratio of exact integer counts; a vocabulary term
  *     absent from a group contributes lim_{p→0} p·ln(p/q) = 0 by
  *     simply having no row.
  *
  * No reference counterpart (north-star extension, BASELINE.json).
  */
object Divergence {

  /** Per-(group, term) divergence components
    * `(grp, term, cnt, grp_total, corpus_cnt, corpus_total, component)`
    * where `component = p·ln(p/q)`. Map-side-deterministic arithmetic —
    * quantize per row before summing for an order-independent total.
    */
  def sourceTermComponents(docs: DataFrame, grpCol: Column, textCol: Column,
                           vocabSize: Int): DataFrame = {
    val terms = docs.select(grpCol.as("grp"),
        explode(filter(TextAnalysis.tokens(textCol), t => t =!= ""))
          .as("term"))
    // the ONE pass over the token stream (groupBy keeps a null group
    // key as its own group — no sentinel needed); the explicit
    // isNotNull matches the predicate downstream joins would push, so
    // every consumer sees the SAME canonical subtree and AQE reuses
    // one shuffle instead of re-scanning the corpus per consumer
    val perGrp = terms.filter(col("term").isNotNull)
      .groupBy("grp", "term")
      .agg(count(lit(1)).as("cnt"))
    val corpus = perGrp.groupBy("term")
      .agg(sum(col("cnt")).as("corpus_cnt"))
    val vocab = corpus
      .orderBy(col("corpus_cnt").desc, col("term")).limit(vocabSize)
    // sum over zero rows is NULL — fail fast with a clear message
    // instead of an opaque NPE at unbox time
    val totalRow = vocab.agg(sum(col("corpus_cnt"))).head()
    require(!totalRow.isNullAt(0),
      "divergence corpus is empty: no vocabulary terms to weight against")
    val corpusTotal = totalRow.getLong(0)
    val grpV = perGrp.join(broadcast(vocab), Seq("term"))
    // null-safe join key: a genuinely-null group is a real group here,
    // not an absent match (a plain equi-join would silently drop it)
    val grpTotals = grpV.groupBy("grp")
      .agg(sum(col("cnt")).as("grp_total"))
      .withColumnRenamed("grp", "_tgrp")
    val p = col("cnt").cast("double") / col("grp_total")
    val q = col("corpus_cnt").cast("double") / lit(corpusTotal.toDouble)
    grpV.join(broadcast(grpTotals), col("grp") <=> col("_tgrp"))
      .select(col("grp"), col("term"), col("cnt"), col("grp_total"),
        col("corpus_cnt"), lit(corpusTotal).as("corpus_total"),
        (p * log(p / q)).as("component"))
  }

  /** KL(group ‖ corpus) per group over the top-`vocabSize` vocabulary:
    * `(grp, n_terms, kl)`.
    */
  def klBySource(docs: DataFrame, grpCol: Column, textCol: Column,
                 vocabSize: Int = 1000): DataFrame =
    sourceTermComponents(docs, grpCol, textCol, vocabSize)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_terms"), sum(col("component")).as("kl"))
}
