package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram conditional language-model scoring — the order-sensitive step
  * up from [[UnigramLm]]'s perplexity filter (CCNet's quality signal,
  * Wenzek et al. 2020, trains a 5-gram KenLM; a corpus-trained bigram
  * model is the same signal family computable with two keyed
  * aggregations): score every document by
  * `Σ tf(a,b) · ln p(b|a)` under add-one smoothing
  * `p(b|a) = (c(a,b) + 1) / (c(a) + |V|)`. Unlike the unigram score,
  * this penalizes scrambled or template-stitched text whose word
  * *frequencies* look corpus-typical but whose word *order* does not —
  * exactly the garbled-concatenation failure mode unigram filtering
  * misses.
  *
  * Scale design (same shuffle budget shape as [[UnigramLm]]):
  *   - model "training" = one explode to bigram occurrences + one keyed
  *     aggregation on `(ctx, nxt)` (map-side partial counts apply);
  *     context totals derive from the model by a second, model-sized
  *     aggregation — they never touch the corpus again;
  *   - vocabulary size is ONE distinct-count over token occurrences;
  *   - scoring joins per-(doc, ctx, nxt) counts against the model on
  *     the bigram key and against context totals on the context key —
  *     well-distributed keys both times; a sample-trained model passes
  *     through `broadcast()` upstream and both joins go map-side;
  *   - per-doc totals are a `(doc_id)` aggregation of components —
  *     partial-aggregable, no window.
  *
  * Bigrams absent from the model (sample-trained case) score as the
  * unseen mass `1 / (c(a) + |V|)`, and unseen contexts as `1 / |V|` —
  * the standard add-one fallbacks, via `coalesce(cnt, 0)`.
  */
object BigramLm {

  /** Per-occurrence bigram pairs `(doc_id, ctx, nxt)` — one row per
    * adjacent token pair; documents with fewer than two tokens produce
    * none. Tokens carry no internal whitespace ([[TextAnalysis.tokens]]
    * splits on it), so `(ctx, nxt)` round-trips through a single
    * space-joined string losslessly if a flat key is ever needed.
    */
  def bigramPairs(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val tk = filter(TextAnalysis.tokens(textCol), t => t =!= "")
    docs.select(idCol.as("doc_id"), tk.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("_t"), lit(1), size(col("_t")) - 1),
          slice(col("_t"), lit(2), size(col("_t")) - 1),
          (a, b) => struct(a.as("ctx"), b.as("nxt")))).as("_bg"))
      .select(col("doc_id"), col("_bg.ctx").as("ctx"), col("_bg.nxt").as("nxt"))
  }

  /** Corpus bigram counts `(ctx, nxt, cnt)` — the "model". */
  def bigramCounts(docs: DataFrame, textCol: Column): DataFrame =
    bigramPairs(docs, lit(0L), textCol)
      .groupBy("ctx", "nxt").agg(count(lit(1)).as("cnt"))

  /** Context totals `(ctx, ccnt)` derived from the model — `c(a)` is the
    * number of bigram occurrences opening with `a` (occurrences of `a`
    * excluding document-final positions), i.e. the row sum of the
    * model's count matrix.
    */
  def contextCounts(model: DataFrame): DataFrame =
    model.groupBy("ctx").agg(sum(col("cnt")).as("ccnt"))

  /** Distinct-token vocabulary size |V| over the corpus (ALL token
    * occurrences, including single-token documents that contribute no
    * bigram).
    */
  def vocabSize(docs: DataFrame, textCol: Column): Long =
    docs.select(explode(filter(TextAnalysis.tokens(textCol),
        t => t =!= "")).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)

  /** Per-(doc, bigram) components
    * `(doc_id, ctx, nxt, tf, component = tf·ln((cnt+1)/(ccnt+V)))` under
    * the given model. Deterministic arithmetic; quantize per row before
    * summing for an engine-portable exact total (the x45/x49 device).
    */
  def docBigramComponents(docs: DataFrame, idCol: Column, textCol: Column,
                          model: DataFrame, vocab: Long): DataFrame = {
    val tf = bigramPairs(docs, idCol, textCol)
      .groupBy("doc_id", "ctx", "nxt").agg(count(lit(1)).as("tf"))
    tf.join(model, Seq("ctx", "nxt"), "left")
      .join(contextCounts(model), Seq("ctx"), "left")
      .select(col("doc_id"), col("ctx"), col("nxt"), col("tf"),
        (col("tf") * log((coalesce(col("cnt"), lit(0L)) + lit(1L))
            .cast("double") /
          (coalesce(col("ccnt"), lit(0L)) + lit(vocab)).cast("double")))
          .as("component"))
  }

  /** Per-doc score `(doc_id, n_bigrams, avg_logprob)` — the filterable
    * quality signal (higher = more corpus-typical word order).
    */
  def docLogProb(docs: DataFrame, idCol: Column, textCol: Column,
                 model: DataFrame, vocab: Long): DataFrame =
    docBigramComponents(docs, idCol, textCol, model, vocab)
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("component")).as("_lp"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("_lp") / col("n_bigrams")).as("avg_logprob"))
}
