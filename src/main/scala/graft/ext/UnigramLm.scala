package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet/Gopher-style "perplexity
  * filter" quality signal: score every document by its average token
  * log-probability under a corpus-trained unigram LM (add-one smoothed),
  * then filter/bucket on the score. Documents far below the corpus
  * average are boilerplate/garbled; far above are repetitive.
  *
  * Scale design:
  *   - the LM "training" is the corpus term-count table — one explode +
  *     one keyed aggregation (the same postings shuffle as [[Bm25]]),
  *     plus ONE scalar pass for (total tokens, vocabulary size);
  *   - scoring joins per-(doc, term) counts against the term table KEYED
  *     ON THE TERM — both sides shuffle on a well-distributed key; when
  *     the model is trained on a sample (standard: the LM needs far less
  *     data than the corpus being scored), pass it through `broadcast()`
  *     upstream and the scoring join is map-side;
  *   - per-doc totals are a `(doc_id)` aggregation of per-term
  *     components: `Σ tf·ln p(t)` — partial-aggregable, no window.
  *
  * Smoothing: p(t) = (count(t) + 1) / (total + |V|); a term absent from
  * the model (possible when the model frame is a sample) scores as the
  * unseen mass 1 / (total + |V|).
  */
object UnigramLm {

  /** Corpus term counts `(term, cnt)` — the "model". */
  def termCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(filter(TextAnalysis.tokens(textCol),
        t => t =!= "")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** Per-(doc, term) components
    * `(doc_id, term, tf, component = tf·ln((cnt+1)/(total+V)))` under the
    * given model. Deterministic arithmetic; quantize per row before
    * summing for an engine-portable exact total.
    */
  def docTermComponents(docs: DataFrame, idCol: Column, textCol: Column,
                        model: DataFrame): DataFrame = {
    val stats = model
      .agg(sum(col("cnt")).as("total"), count(lit(1)).as("v")).head()
    val total = stats.getLong(0); val v = stats.getLong(1)
    val tf = docs
      .select(idCol.as("doc_id"),
        explode(filter(TextAnalysis.tokens(textCol), t => t =!= ""))
          .as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val denom = lit(total.toDouble + v.toDouble)
    tf.join(model, Seq("term"), "left")
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * log((coalesce(col("cnt"), lit(0L)) + lit(1L))
          .cast("double") / denom)).as("component"))
  }

  /** Per-doc score `(doc_id, n_tokens, avg_logprob)` — the filterable
    * quality signal (higher = more corpus-typical).
    */
  def docLogProb(docs: DataFrame, idCol: Column, textCol: Column,
                 model: DataFrame): DataFrame =
    docTermComponents(docs, idCol, textCol, model)
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"), sum(col("component")).as("_lp"))
      .select(col("doc_id"), col("n_tokens"),
        (col("_lp") / col("n_tokens")).as("avg_logprob"))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3 splits a
    * corpus into head/middle/tail by LM perplexity): every document gets
    * `(doc_id, avg_milli, bucket)` where `avg_milli` is its integer
    * milli-logprob-per-token and `bucket` is head (score ≥ pHi
    * quantile), middle, or tail (score ≤ pLo quantile).
    *
    * Determinism device: per-(doc,term) components are quantized to
    * integer micro-logprobs BEFORE summing (sum order is then
    * irrelevant), and the quantile thresholds are rounded to exact
    * binary quarters — so bucket assignment is engine-exact and
    * partition-invariant. The thresholds are two driver-side doubles
    * (never a single-row cross join); the rest is two keyed
    * aggregations over the same postings shuffle the scorer uses.
    */
  def perplexityBuckets(docs: DataFrame, idCol: Column, textCol: Column,
                        model: DataFrame, pLo: Double = 0.25,
                        pHi: Double = 0.75): DataFrame = {
    require(pLo < pHi, s"pLo ($pLo) must be below pHi ($pHi)")
    val scored = docTermComponents(docs, idCol, textCol, model)
      .select(col("doc_id"), col("tf"),
        round(col("component") * lit(1000000.0), 0).cast("long").as("_cm"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"), sum(col("_cm")).as("lp_micros"))
      .select(col("doc_id"),
        round(col("lp_micros").cast("double") * lit(1000.0) /
          col("n_tokens").cast("double"), 0).cast("long").as("avg_milli"))
    val thr = scored.agg(
      (round(expr(s"percentile(avg_milli, $pLo)") * 4) / 4).as("t_lo"),
      (round(expr(s"percentile(avg_milli, $pHi)") * 4) / 4).as("t_hi"))
      .head()
    require(!thr.isNullAt(0) && !thr.isNullAt(1),
      "perplexityBuckets: empty corpus (no scored documents)")
    val (tLo, tHi) = (thr.getDouble(0), thr.getDouble(1))
    scored.select(col("doc_id"), col("avg_milli"),
      when(col("avg_milli").cast("double") >= tHi, "head")
        .when(col("avg_milli").cast("double") > tLo, "middle")
        .otherwise("tail").as("bucket"))
  }
}
