package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling — the per-source "data card" a training-data
  * pipeline publishes next to the data: document/token/byte volumes,
  * exact duplicate-text rate, mean document length, and tokenizer
  * fertility (chars per BPE-ish token; Ács' fertility metric, the
  * standard tokenizer-efficiency readout per language/source).
  *
  * Scale shape: ONE map-side projection (token counts, text digest)
  * into ONE grouped aggregation; the distinct-text count is the only
  * two-phase piece (count-distinct over md5 digests — 16 bytes per doc
  * on the wire, partial-aggregated per group). Ratios use the
  * correctly-rounded IEEE double-division device (exact integers in,
  * deterministic micros out), never an engine-dependent decimal.
  */
object Profiling {

  private def ratioMicros(num: Column, den: Column): Column =
    when(den > 0L,
      round(num.cast("double") * lit(1000000.0) / den.cast("double"), 0)
        .cast("long"))

  /** Cross-source leakage matrix: for every pair of sources, how many
    * DISTINCT texts they share verbatim — the governance view that
    * catches one feed republishing another (train/eval leakage through
    * a mirror) before mixing weights are chosen. `(source_a, source_b,
    * shared_texts)` with `source_a < source_b`.
    *
    * Scale shape: dedup to (digest, source) pairs, one digest-keyed
    * agg, pair-expand ONLY digests seen in ≥ 2 sources (bounded by the
    * source count, not the corpus), one keyed count — no doc×doc or
    * source×source scan.
    */
  def sourceOverlap(docs: DataFrame, sourceCol: Column,
                    textCol: Column): DataFrame = {
    val byDigest = docs
      .select(md5(textCol).as("_h"), sourceCol.as("_src"))
      .distinct()
      .groupBy("_h").agg(sort_array(collect_set(col("_src"))).as("_srcs"))
      .filter(size(col("_srcs")) >= 2)
    byDigest
      .select(col("_h"), explode(
        flatten(transform(col("_srcs"), (a, i) =>
          transform(slice(col("_srcs"), i + lit(2),
            greatest(size(col("_srcs")) - i - 1, lit(0))),
            b => struct(a.as("a"), b.as("b")))))).as("_p"))
      .groupBy(col("_p.a").as("source_a"), col("_p.b").as("source_b"))
      .agg(count(lit(1)).as("shared_texts"))
  }

  /** One row per group: `(grp, n_docs, n_tokens, n_bpe_tokens, n_chars,
    * n_distinct_texts, dup_rate_micros, avg_doc_tokens_micros,
    * fertility_micros)` — fertility = chars per BPE token.
    */
  def corpusCard(docs: DataFrame, groupCol: Column,
                 textCol: Column): DataFrame = {
    val staged = docs.select(groupCol.as("grp"),
      TextAnalysis.tokenCount(textCol).as("n_toks"),
      TextAnalysis.bpeTokenCount(textCol).as("n_bpe"),
      length(textCol).cast("long").as("n_chars"),
      md5(textCol).as("_digest"))
    staged.groupBy("grp")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_bpe")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("_digest")).as("n_distinct_texts"))
      .select(col("grp"), col("n_docs"), col("n_tokens"),
        col("n_bpe_tokens"), col("n_chars"), col("n_distinct_texts"),
        ratioMicros(col("n_docs") - col("n_distinct_texts"), col("n_docs"))
          .as("dup_rate_micros"),
        ratioMicros(col("n_tokens"), col("n_docs"))
          .as("avg_doc_tokens_micros"),
        ratioMicros(col("n_chars"), col("n_bpe_tokens"))
          .as("fertility_micros"))
  }
}
