package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every candidate
  * document by the log-likelihood ratio of a target-domain
  * bag-of-hashed-ngrams model over the raw-corpus model, then keep the
  * highest-weight documents — the standard recipe for tilting a web
  * corpus toward a target domain without a trained classifier.
  *
  * Scale design — the whole scorer is map-side:
  *   - features are word unigrams + bigrams hashed into a FIXED number
  *     of buckets via the engine-portable md5 polynomial
  *     ([[Sampling.hashBucket]]), so both distribution tables are
  *     bounded by `buckets` rows (a few thousand) regardless of corpus
  *     size — they `broadcast()` and the scoring joins never shuffle
  *     the corpus;
  *   - per-(doc, feature) log-ratio components quantize to integer
  *     micros BEFORE the per-doc sum, so the weight is engine-exact
  *     and partition-invariant (the x58 device);
  *   - selection is a two-stage top-n (`TakeOrderedAndProject`), never
  *     a global sort.
  *
  * Smoothing: p(f) = (count(f) + 1) / (total + buckets) on both sides —
  * a feature unseen in the target scores the unseen mass, never -inf.
  */
object Dsir {

  /** Per-(doc, feature) counts `(doc_id, feat, tf)`: word unigrams and
    * bigrams hashed into `buckets`. Tokens are staged as their own
    * projection before the gram lambdas reference them (interpreted
    * HOFs re-evaluate bound subtrees per element).
    */
  def hashedFeatures(docs: DataFrame, idCol: Column, textCol: Column,
                     buckets: Int = 4096): DataFrame = {
    val toked = docs.select(idCol.as("doc_id"),
      filter(TextAnalysis.tokens(textCol), t => t =!= "").as("_toks"))
    val bigrams = zip_with(
      slice(col("_toks"), lit(1), greatest(size(col("_toks")) - 1, lit(0))),
      slice(col("_toks"), lit(2), greatest(size(col("_toks")) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    toked
      .select(col("doc_id"),
        explode(concat(col("_toks"), bigrams)).as("gram"))
      .select(col("doc_id"),
        Sampling.hashBucket(col("gram"), buckets).as("feat"))
      .groupBy("doc_id", "feat").agg(count(lit(1)).as("tf"))
  }

  /** Hashed-feature distribution `(feat, cnt)` — at most `buckets` rows
    * however large the corpus (the broadcast side of the scorer).
    */
  def featureCounts(features: DataFrame): DataFrame =
    features.groupBy("feat").agg(sum(col("tf")).as("cnt"))

  /** Importance weight per source document:
    * `weight_micros = Σ_f tf_f · (ln p_target(f) − ln p_source(f))`
    * in integer micros. Both distribution tables broadcast; the corpus
    * is touched by exactly one featurize + one doc-keyed aggregation.
    */
  private def assembleWeights(srcFeats: DataFrame, srcCounts: DataFrame,
                              tgtCounts: DataFrame, buckets: Int): DataFrame = {
    val sTotRow = srcCounts.agg(sum(col("cnt"))).head()
    require(!sTotRow.isNullAt(0),
      "DSIR: source corpus has no features (empty or all-blank text)")
    val tTotRow = tgtCounts.agg(sum(col("cnt"))).head()
    require(!tTotRow.isNullAt(0),
      "DSIR: target sample has no features (empty or all-blank text)")
    val sDenom = lit(sTotRow.getLong(0).toDouble + buckets.toDouble)
    val tDenom = lit(tTotRow.getLong(0).toDouble + buckets.toDouble)
    srcFeats
      .join(broadcast(srcCounts.withColumnRenamed("cnt", "s_cnt")),
        Seq("feat"))
      .join(broadcast(tgtCounts.withColumnRenamed("cnt", "t_cnt")),
        Seq("feat"), "left")
      .select(col("doc_id"),
        round(col("tf").cast("double") *
          (log((coalesce(col("t_cnt"), lit(0L)) + lit(1L)).cast("double")
            / tDenom)
            - log((col("s_cnt") + lit(1L)).cast("double") / sDenom))
          * lit(1000000.0), 0).cast("long").as("_wm"))
      .groupBy("doc_id").agg(sum(col("_wm")).as("weight_micros"))
  }

  /** The LAZY plan form — featurizes per consuming action (the totals
    * pass, each broadcast build, and the weight scan each re-derive the
    * feature tables from text). Use for plan inspection; production
    * callers want [[importanceWeights]].
    */
  def importanceWeightsPlan(source: DataFrame, target: DataFrame,
                            idCol: Column, textCol: Column,
                            buckets: Int = 4096): DataFrame = {
    val srcFeats = hashedFeatures(source, idCol, textCol, buckets)
    assembleWeights(srcFeats, featureCounts(srcFeats),
      featureCounts(hashedFeatures(target, idCol, textCol, buckets)), buckets)
  }

  def importanceWeights(source: DataFrame, target: DataFrame,
                        idCol: Column, textCol: Column,
                        buckets: Int = 4096): DataFrame = {
    // featurizing (tokenize + hash) is the expensive scan: cache each
    // corpus's compact feature table so the totals pass, the broadcast
    // builds and the weight scan all read ONE featurization instead of
    // re-deriving it per consumer. The result is localCheckpoint-ed so
    // the caches can be dropped here — release the returned frame with
    // `GraftColumnBridge.unpersistCheckpoint` (gates detach instead).
    val srcFeats = hashedFeatures(source, idCol, textCol, buckets).persist()
    val srcCounts = featureCounts(srcFeats).persist()
    val tgtCounts =
      featureCounts(hashedFeatures(target, idCol, textCol, buckets)).persist()
    try {
      assembleWeights(srcFeats, srcCounts, tgtCounts, buckets)
        .localCheckpoint(true)
    } finally {
      srcFeats.unpersist()
      srcCounts.unpersist()
      tgtCounts.unpersist()
    }
  }

  /** Deterministic top-n selection by (weight desc, id asc) — ties
    * break on the id, so the selected set is a pure function of the
    * corpus.
    */
  def selectTopN(weights: DataFrame, n: Int): DataFrame =
    weights.orderBy(col("weight_micros").desc, col("doc_id")).limit(n)
}
