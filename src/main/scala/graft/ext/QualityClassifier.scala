package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a logistic-regression classifier
  * over hashed n-gram features, trained by distributed full-batch
  * gradient descent — the "quality classifier" recipe (score web
  * documents by P(high-quality), keep the high scorers) used since
  * GPT-3's LR-over-tfidf filter.
  *
  * Scale design:
  *   - features come from [[Dsir.hashedFeatures]] — the model is at
  *     most `buckets` weights, so it BROADCASTS and both scoring and
  *     the gradient's error join never shuffle the corpus;
  *   - one gradient step = one broadcast join + one feature-keyed
  *     aggregation (partial-aggregable); the corpus is read once per
  *     step, no driver-side loops over rows;
  *   - all state is integer micros: margins are exact long sums of
  *     tf×weight, per-doc sigmoid errors quantize to micros the moment
  *     they leave double-land, so training is engine-exact and
  *     partition-invariant (the same device as [[Dsir]] weights).
  *
  * The model is `(feat, w_micros)` plus a bias in micros; a feature
  * absent from the table has weight 0.
  */
object QualityClassifier {

  /** Model container: feature weights in micros (≤ buckets rows, keep
    * it broadcast-sized) and the bias in micros.
    */
  final case class Model(weights: DataFrame, biasMicros: Long)

  /** Per-doc margin in micros: `bias + Σ tf·w_f` — pure long
    * arithmetic over a broadcast weight table. Docs with no features
    * (blank text) are absent.
    */
  def margins(features: DataFrame, model: Model): DataFrame =
    features
      .join(broadcast(model.weights), Seq("feat"), "left")
      .groupBy("doc_id")
      .agg((sum(col("tf") * coalesce(col("w_micros"), lit(0L)))
        + lit(model.biasMicros)).as("margin_micros"))

  /** σ(margin) quantized to micros — the only double computation in
    * the classifier, mirrored verbatim by the oracle.
    */
  def probMicros(marginMicros: Column): Column =
    round(lit(1000000.0) /
      (lit(1.0) + exp(negate(marginMicros.cast("double")) / lit(1000000.0))),
      0).cast("long")

  /** One full-batch gradient step at learning rate `lr`:
    * `w ← w − lr/N · Σ_d tf_d,f · (σ(margin_d) − y_d)` with the error
    * term quantized to micros per doc before the feature sum. `labels`
    * is `(doc_id, y)` with y ∈ {0, 1}; `n` is the label count (hoisted
    * — it never changes across steps). The per-doc error table is
    * cached for the step: its two consumers (bias gradient, feature
    * gradients) read ONE computation of the margins join instead of
    * re-deriving it per action, and the returned weights are already
    * checkpointed (flat lineage; release with [[release]]).
    */
  def gradientStep(features: DataFrame, labels: DataFrame, model: Model,
                   lr: Double, n: Long): Model = {
    require(n > 0L, "gradientStep: empty label set")
    val errs = margins(features, model)
      .join(labels, Seq("doc_id"))
      .select(col("doc_id"),
        (probMicros(col("margin_micros"))
          - col("y").cast("long") * lit(1000000L)).as("err_micros"))
      .persist()
    try {
      val biasG = errs.agg(sum(col("err_micros"))).head().getLong(0)
      val grads = features
        .join(errs, Seq("doc_id"))
        .groupBy("feat")
        .agg(sum(col("tf") * col("err_micros")).as("g_micros"))
      val scale = lit(lr / n.toDouble)
      val newW = grads
        .join(model.weights, Seq("feat"), "full")
        .select(col("feat"),
          (coalesce(col("w_micros"), lit(0L))
            - round(coalesce(col("g_micros"), lit(0L)).cast("double") * scale,
                0).cast("long")).as("w_micros"))
      // same rounding semantics as the SQL round (HALF_UP away from
      // zero; Scala math.round rounds negative halves toward +inf)
      val biasDelta = BigDecimal(biasG.toDouble * (lr / n.toDouble))
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
      Model(newW.localCheckpoint(true), model.biasMicros - biasDelta)
    } finally errs.unpersist()
  }

  /** Train `steps` full-batch steps from the zero model. Each step's
    * weight table is localCheckpoint-ed: the lineage stays flat however
    * many steps run (weights are ≤ buckets rows — the checkpoint is
    * tiny) and must be released with [[release]] when done.
    */
  def train(docs: DataFrame, idCol: Column, textCol: Column,
            labels: DataFrame, steps: Int, lr: Double,
            buckets: Int = 4096): Model = {
    require(steps >= 1, s"steps ($steps) must be >= 1")
    // tokenization + hashing is the expensive scan: cache the compact
    // (doc_id, feat, tf) table once for all steps' joins instead of
    // re-deriving it from text 2× per step
    val features = Dsir.hashedFeatures(docs, idCol, textCol, buckets)
      .persist()
    try {
      val spark = docs.sparkSession
      import spark.implicits._
      val n = labels.agg(count(lit(1))).head().getLong(0)
      require(n > 0L, "train: empty label set")
      val zero = Model(Seq.empty[(Int, Long)].toDF("feat", "w_micros"), 0L)
      (1 to steps).foldLeft(zero) { (m, _) =>
        val next = gradientStep(features, labels, m, lr, n)
        if (m ne zero) release(m)
        next
      }
    } finally features.unpersist()
  }

  /** Release a trained model's checkpoint blocks. */
  def release(model: Model): Unit =
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(model.weights)

  /** Score documents: `(doc_id, prob_micros)` — broadcast weights, one
    * map-side join + one doc-keyed agg, no corpus shuffle.
    */
  def score(docs: DataFrame, idCol: Column, textCol: Column, model: Model,
            buckets: Int = 4096): DataFrame =
    margins(Dsir.hashedFeatures(docs, idCol, textCol, buckets), model)
      .select(col("doc_id"), probMicros(col("margin_micros")).as("prob_micros"))
}
