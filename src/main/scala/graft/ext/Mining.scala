package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining for retrieval/embedding training: the top-k
  * retrieved documents that are NOT labeled relevant are exactly the
  * confusable examples a reranker or bi-encoder needs as negatives
  * (the standard DPR/contrastive-training recipe — random negatives
  * are too easy, top-of-ranking non-relevant are the signal).
  *
  * Scale shape: one anti join on `(query, doc)` + a per-query window
  * over ≤ k rows — both sides are top-k lists, the corpus never
  * appears; any retriever ([[Bm25]], the ANN family, [[Fusion]])
  * produces the `ranked` input.
  */
object Mining {

  /** From `ranked` `(query, doc_id, rank)` drop `positives`
    * `(query, doc_id)` and renumber what survives: `(query, neg_rank,
    * doc_id, rank)` with `neg_rank` 1-based in retrieval order,
    * capped at `nNeg` per query.
    */
  def hardNegatives(ranked: DataFrame, positives: DataFrame, k: Int,
                    nNeg: Int = Int.MaxValue): DataFrame = {
    require(k > 0, "k must be positive")
    require(nNeg > 0, "nNeg must be positive")
    val negs = ranked.filter(col("rank") <= k)
      .join(positives.select(col("query"), col("doc_id")),
        Seq("query", "doc_id"), "left_anti")
    val w = Window.partitionBy("query").orderBy("rank")
    negs.withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= nNeg)
      .select(col("query"), col("neg_rank"), col("doc_id"), col("rank"))
  }
}
