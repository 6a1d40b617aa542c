package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-order n-gram novelty: how much of each document's n-gram
  * vocabulary is NEW relative to every earlier document (ids define the
  * order — ingestion order in a crawl, time order in a feed). The
  * curation signal behind "diminishing returns" dataset growth curves:
  * a source whose marginal documents introduce no new n-grams is
  * saturated; a high-novelty slice is worth keeping even at lower
  * quality scores.
  *
  * Exact semantics (integer counts, no estimates): a distinct n-gram g
  * of document d is NOVEL iff no document with a smaller id contains g
  * — equivalently `min_id(g) == d`. Ties go to the earliest id, so
  * every gram is credited exactly once across the corpus:
  * `Σ_d novel(d) = |distinct grams in corpus|`.
  *
  * Scale shape: one explode with doc-local dedup, one gram-keyed
  * aggregation for the global first-seen id (map-side combined), then
  * two DOC-keyed counts joined on id — the expensive gram-keyed data
  * never joins back against the corpus. The gram key can be hashed
  * (`hashGrams`) so the shuffle carries 8-byte keys instead of strings
  * at 100 TB — collisions under xxhash64 are negligible and only ever
  * MERGE two grams (slightly undercounting novelty), the standard
  * trade every hashed-vocabulary pipeline makes.
  */
object Novelty {

  /** Per-document novelty counts over whitespace-token `n`-grams:
    * `(id, n_grams, novel_grams)` — distinct grams in the doc, and how
    * many of them first appear there (corpus order = ascending id).
    * Documents shorter than `n` tokens report `(0, 0)`.
    */
  def ngramNovelty(docs: DataFrame, id: Column, text: Column, n: Int,
                   hashGrams: Boolean = false): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = docs.select(id.cast("long").as("id"),
      split(text, " ").as("_t"))
    // NB: raw single-space split (not TextAnalysis.tokens) — the gram
    // definition must match the DuckDB oracle's string_split exactly
    // hash BEFORE the doc-local dedup so `n_grams` and `novel_grams` count
    // in the same (hashed) gram domain — a within-doc collision then merges
    // the pair in BOTH columns instead of leaving n_grams in raw-gram units
    val gramArr = TextAnalysis.wordNgramsOver(col("_t"), n)
    val keyedArr =
      if (hashGrams) transform(gramArr, g => xxhash64(g)) else gramArr
    val keyed = toks
      .select(col("id"), explode(array_distinct(keyedArr)).as("gram"))
    val firstSeen = keyed.groupBy("gram").agg(min(col("id")).as("_first"))
    val novel = firstSeen.groupBy(col("_first").as("id"))
      .agg(count(lit(1)).as("novel_grams"))
    val perDoc = keyed.groupBy("id").agg(count(lit(1)).as("n_grams"))
    // docs with no grams still report a row
    toks.select(col("id"))
      .join(perDoc, Seq("id"), "left")
      .join(novel, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"))
  }
}
