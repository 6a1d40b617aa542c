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
