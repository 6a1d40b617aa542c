package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test contamination detection — the benchmark-hygiene pass a
  * training-data pipeline runs before any evaluation claim: which test
  * documents share verbatim word n-grams with the training corpus, and
  * how much.
  *
  * Scale shape (the discovery path is never pairwise over documents):
  *
  *   1. each side explodes to DISTINCT (doc, n-gram) rows — one
  *      projection + one distinct per side;
  *   2. the train side collapses to a DISTINCT n-gram set (drops the
  *      doc id — contamination asks "seen in training?", not "where") —
  *      the big corpus reduces before the join;
  *   3. ONE left join test-grams ⟕ train-gram-set on the gram key, then
  *      ONE aggregation by test doc: total grams + hits in the same
  *      pass. No document ever meets another document.
  *
  * With `hashed=true` the join key is xxhash64(gram) — 8-byte shuffle
  * keys instead of strings, the 100 TB wire-size optimization (a 2⁻⁶⁴
  * collision adds a false hit; acceptable for discovery, switch off for
  * audits — the string path is engine-portable and DuckDB-oracled).
  */
object Contamination {

  /** Distinct `(id, gram)` pairs of one corpus side. */
  private def docGrams(df: DataFrame, idCol: Column, textCol: Column,
                       n: Int, hashed: Boolean): DataFrame = {
    val grams = df
      .select(idCol.as("id"), TextAnalysis.tokens(textCol).as("_t"))
      .select(col("id"), explode(TextAnalysis.wordNgramsOver(col("_t"), n)).as("gram"))
    (if (hashed) grams.select(col("id"), xxhash64(col("gram")).as("gram"))
     else grams).distinct()
  }

  /** Per-test-document report: `(test_id, shared_ngrams, test_ngrams,
    * contamination)` for every test document with at least `minShared`
    * training-set n-grams; `contamination` = shared/total in [0,1].
    */
  def report(train: DataFrame, test: DataFrame,
             trainId: Column, trainText: Column,
             testId: Column, testText: Column,
             n: Int = 3, hashed: Boolean = false,
             minShared: Long = 1L): DataFrame = {
    val trainGrams = docGrams(train, trainId, trainText, n, hashed)
      .select("gram").distinct().withColumn("_hit", lit(1L))
    docGrams(test, testId, testText, n, hashed)
      .join(trainGrams, Seq("gram"), "left")
      .groupBy(col("id").as("test_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("shared_ngrams"),
        count(lit(1)).as("test_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .withColumn("contamination",
        col("shared_ngrams").cast("double") / col("test_ngrams").cast("double"))
  }
}
