package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard score-free method for
  * merging heterogeneous rankings (lexical BM25 + vector ANN + priors)
  * into one hybrid retrieval list: score(d) = Σ_lists 1/(k + rank_d),
  * with k≈60 damping the head. Rank-based fusion needs no score
  * calibration across lists, which is why it wins in hybrid search.
  *
  * Scale: the inputs are already top-k lists (tiny — the upstream
  * operators did the heavy lifting with pruned shuffles and
  * `TakeOrderedAndProject`); fusion itself is a union + one keyed
  * aggregation over |lists|·k rows. Never fuse full corpora — rank
  * lists first.
  */
object Fusion {

  /** Per-(id, list) components `(id, component = 1/(k + rank))` from
    * ranked frames each carrying `(idCol, rankCol)` (rank is 1-based).
    * Deterministic map-side arithmetic — quantize per row before
    * summing for an engine-portable exact total.
    */
  def rrfComponents(rankings: Seq[DataFrame], idCol: String,
                    rankCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings
      .map(_.select(col(idCol), col(rankCol)))
      .reduce(_ unionByName _)
      .select(col(idCol),
        (lit(1.0) / (lit(k.toDouble) + col(rankCol))).as("component"))
  }

  /** Fused ranking `(idCol, n_lists, rrf)` sorted best-first (ties by
    * id for determinism).
    */
  def rrf(rankings: Seq[DataFrame], idCol: String = "doc_id",
          rankCol: String = "rank", k: Int = 60): DataFrame =
    rrfComponents(rankings, idCol, rankCol, k)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"), sum(col("component")).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
}
