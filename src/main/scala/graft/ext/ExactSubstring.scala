package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-substring deduplication — the span-level dedup of "Deduplicating
  * Training Data Makes Language Models Better" (Lee et al., 2022): any
  * w-token window that appears verbatim in MORE THAN ONE document is
  * boilerplate/contamination; every token covered by such a window is
  * scrubbed from every document carrying it. Unlike document-level dedup
  * (MinHash/SimHash — [[Dedup]]), this removes the duplicated SPANS and
  * keeps the unique remainder of each document.
  *
  * Algorithm shape (the paper uses a corpus-wide suffix array; the
  * distributed equivalent is window-hashing):
  *   1. every stride-1 w-token window becomes a gram row — a w× blow-up
  *      of the token stream, the inherent cost of exact-substring
  *      matching (the suffix array pays the same in sort order);
  *   2. ONE shuffle keyed on the gram finds grams spanning >1 distinct
  *      document (`hashGrams=true` ships an 8-byte xxhash64 key instead
  *      of the w-token string — at 100 TB the key width IS the shuffle,
  *      and a 64-bit collision merging two grams is ~2⁻⁶⁴ per pair);
  *   3. flagged window starts fold back per document (`collect_list`
  *      bounded by the doc's own length), and the coverage mask, token
  *      filtering and text rebuild are codegen'd array lambdas —
  *      map-side, no further shuffle.
  */
object ExactSubstring {

  private def cleanToks(textCol: Column): Column =
    filter(TextAnalysis.tokens(textCol), t => t =!= "")

  /** Stride-1 w-token windows: `(doc_id, start, gram)`. */
  def grams(docs: DataFrame, idCol: Column, textCol: Column,
            w: Int): DataFrame = {
    require(w > 0, s"window must be positive, got $w")
    docs.select(idCol.as("doc_id"), cleanToks(textCol).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        explode(when(size(col("_toks")) >= w,
            sequence(lit(0), size(col("_toks")) - w))
          .otherwise(array().cast("array<int>"))).as("start"))
      .select(col("doc_id"), col("start"),
        array_join(slice(col("_toks"), col("start") + 1, lit(w)), " ")
          .as("gram"))
  }

  /** Grams occurring in more than one distinct document. */
  def duplicatedGrams(g: DataFrame): DataFrame =
    g.groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("gram"))

  /** Scrub the corpus: `(doc_id, n_tokens, n_kept, new_text)` with every
    * token covered by a cross-document duplicated w-gram removed.
    * `hashGrams=false` keeps string gram keys (exact, engine-auditable —
    * the gate's mode); `true` is the scale mode.
    */
  def scrub(docs: DataFrame, idCol: Column, textCol: Column, w: Int,
            hashGrams: Boolean = true): DataFrame = {
    val g0 = grams(docs, idCol, textCol, w)
    val g = if (hashGrams) g0.withColumn("gram", xxhash64(col("gram"))) else g0
    // the gram stream is derived twice (once for the >1-doc aggregate,
    // once as the join probe) — a 2× constant factor on the map side,
    // kept deliberately: the fused single-aggregation alternative
    // (collect all (doc,start) occurrences per gram, filter, explode)
    // does one shuffle but materializes EVERY occurrence of a
    // duplicated gram in one row, and the grams this operator exists
    // for (boilerplate/licenses) are exactly the ones with millions of
    // occurrences at corpus scale
    val flagged = g.join(duplicatedGrams(g), Seq("gram"))
      .select(col("doc_id"), col("start"))
    val starts = flagged.groupBy("doc_id")
      .agg(collect_list(col("start")).as("_starts"))
    docs.select(idCol.as("doc_id"), cleanToks(textCol).as("_toks"))
      .join(starts, Seq("doc_id"), "left")
      // sorted distinct covered positions, then ONE two-pointer walk
      // (graft.functions.MaskedKeep) over tokens + positions — linear in
      // n_tokens + n_covered. A per-token `array_contains(_covered, i)`
      // re-scans the covered array each token: quadratic on exactly the
      // heavily-duplicated documents this operator exists to scrub.
      .select(col("doc_id"), col("_toks"),
        array_sort(array_distinct(flatten(transform(
          coalesce(col("_starts"), array().cast("array<int>")),
          s => sequence(s, s + w - 1))))).as("_covered"))
      .select(col("doc_id"),
        size(col("_toks")).cast("long").as("n_tokens"),
        graft.functions.SketchFunctions.masked_keep(
          col("_toks"), col("_covered")).as("_kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("_kept")).cast("long").as("n_kept"),
        array_join(col("_kept"), " ").as("new_text"))
  }
}
