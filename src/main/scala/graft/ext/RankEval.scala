package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — nDCG@k and MRR over ranked retrieval
  * lists against graded relevance labels (Järvelin & Kekäläinen 2002
  * for DCG; the standard exponential-gain form `(2^rel − 1)/log2(r+1)`).
  * This is the eval half of the retrieval family ([[Bm25]], [[Fusion]],
  * the ANN paths): a pipeline that tunes retrieval needs its quality
  * metrics computed by the same engine, over the same tables, at the
  * same scale as the retrieval itself.
  *
  * Determinism/portability: per-position gains quantize to integer
  * micros BEFORE the per-query sum (order-free integer addition — the
  * x45/x49 device), `IDCG` ranks relevance over the FULL label table
  * (the proper normalizer, not retrieved-only), and `nDCG` is the ratio
  * of the two integer sums. `MRR` is `round(10^6 / first_relevant_rank)`
  * — exact integer arithmetic.
  *
  * Scale shape: one equi-join of the ranked lists against labels on
  * `(query, doc)`, windows partitioned BY QUERY (bounded partitions —
  * a ranked list is ≤ k rows by construction, labels per query are the
  * candidate pool), and one keyed aggregation per query. Nothing is
  * corpus-global.
  */
object RankEval {

  private def gainMicros(rel: Column, rank: Column): Column =
    round((pow(lit(2.0), rel.cast("double")) - lit(1.0)) /
      log2(rank.cast("double") + lit(1.0)) * lit(1000000.0), 0).cast("long")

  /** Per-query `(query, dcg_micros, idcg_micros, ndcg, mrr_micros)`.
    *
    * `ranked`: `(query, doc_id, rank)` — rank 1-based, unique per query.
    * `rels`: `(query, doc_id, rel)` — graded relevance ≥ 0; docs absent
    * from `rels` count as rel 0.
    */
  def ndcgMrr(ranked: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val joined = ranked.filter(col("rank") <= k)
      .join(rels, Seq("query", "doc_id"), "left")
      .select(col("query"), col("rank"),
        coalesce(col("rel"), lit(0L)).as("rel"))
    val perQuery = joined.groupBy("query")
      .agg(sum(gainMicros(col("rel"), col("rank"))).as("dcg_micros"),
        min(when(col("rel") > 0L, col("rank"))).as("_first_rel"))
    val wIdeal = Window.partitionBy(col("query"))
      .orderBy(col("rel").desc, col("doc_id"))
    val idcg = rels.filter(col("rel") > 0L)
      .withColumn("_irank", row_number().over(wIdeal))
      .filter(col("_irank") <= k)
      .groupBy("query")
      .agg(sum(gainMicros(col("rel"), col("_irank"))).as("idcg_micros"))
    perQuery.join(idcg, Seq("query"), "left")
      .select(col("query"), col("dcg_micros"),
        coalesce(col("idcg_micros"), lit(0L)).as("idcg_micros"),
        when(coalesce(col("idcg_micros"), lit(0L)) > 0L,
          col("dcg_micros").cast("double") /
            col("idcg_micros").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"),
        coalesce(round(lit(1000000.0) / col("_first_rel"), 0).cast("long"),
          lit(0L)).as("mrr_micros"))
  }

  /** Recall@k of a candidate ranking against a ground-truth ranking —
    * the eval harness for the ANN family ([[Similarity]], [[Ivf]],
    * [[Pq]], [[IvfPq]]): how much of the exact top-k an approximate
    * index actually returns. Both inputs are `(query_id, neighbor_id,
    * rank)`; rows ranked beyond k are ignored. Returns per-query
    * `(query_id, n_truth, n_hits, recall_micros)` with the denominator
    * `n_truth` (truth lists shorter than k — tiny corpora — divide by
    * what exists).
    *
    * Scale shape: one semi join on `(query, neighbor)` + two keyed aggs
    * over top-k lists only (≤ k rows per query a side) — the corpus
    * never reappears here.
    */
  def recallAtK(truth: DataFrame, candidate: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val t = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val c = candidate.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val nTruth = t.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
    val hits = t.join(c, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    nTruth.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          * lit(1000000.0) / col("n_truth").cast("double"), 0)
          .cast("long").as("recall_micros"))
  }

  /** ROC-AUC of a score column against a binary label, by the
    * Mann–Whitney rank-sum with EXACT tie handling: group rows by
    * score, cumulative-count the groups in score order, and use the
    * doubled tie-averaged rank `2c + m + 1` (always an integer) so the
    * whole statistic stays in long arithmetic; the single final
    * division runs in IEEE doubles (correctly-rounded, so any engine
    * reproduces it bit-for-bit from the same integers).
    *
    * Returns one row `(n_pos, n_neg, auc_micros)`; `auc_micros` is NULL
    * when either class is empty (AUC undefined).
    *
    * Scale shape: one groupBy on the score (partial-aggregable) and one
    * global cumulative window over DISTINCT scores only — callers feed
    * quantized scores (micros, counts), so that table is bounded by the
    * quantization range, not the corpus.
    */
  def auc(scored: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val g = scored
      .select(scoreCol.as("score"), labelCol.cast("long").as("y"))
      .groupBy("score")
      .agg(count(lit(1)).as("m"), sum(col("y")).as("npos"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g
      .withColumn("c", coalesce(sum(col("m")).over(w), lit(0L)))
      .agg(
        sum(col("npos") * (lit(2L) * col("c") + col("m") + lit(1L)))
          .as("r2"),
        sum(col("npos")).as("np"),
        sum(col("m") - col("npos")).as("nn"))
    r.select(col("np").as("n_pos"), col("nn").as("n_neg"),
      when(col("np") > 0L && col("nn") > 0L,
        round((col("r2") - col("np") * (col("np") + lit(1L)))
          .cast("double") * lit(1000000.0) /
          (lit(2.0) * col("np").cast("double") * col("nn").cast("double")),
          0).cast("long"))
        .as("auc_micros"))
  }
}
