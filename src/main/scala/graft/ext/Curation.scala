package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, as ONE declarative plan:
  *
  *   quality score → language ID filter → exact dedup (canonical = min
  *   id per normalized text) → deterministic train/test split.
  *
  * Every stage is an already-gated operator (x02, x03, x05, x17); the
  * point of this module is that composing them stays a single Catalyst
  * plan — one scan of the corpus, one shuffle (the dedup window's hash
  * partitioning on normalized text), everything else map-side. At
  * 100 TB this is the difference between one pass and four.
  */
object Curation {

  /** Curated corpus: the input columns plus `predicted` (language) and
    * `is_test` (hash split), one row per surviving canonical document.
    */
  def curate(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", minQuality: Double = 0.5,
             langs: Seq[String] = TextAnalysis.LangMarkers.map(_._1),
             stops: Seq[String] = Seq("a", "the"),
             testPercent: Int = 10): DataFrame = {
    // stage the token array once; every metric reads the attribute
    val toks = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      TextAnalysis.tokens(col(textCol)).as("_t"))
    val scored = toks
      .select(col("doc_id"), col("text"),
        TextAnalysis.qualityScoreOver(col("_t"), length(col("text")), stops)
          .as("quality"),
        TextAnalysis.langScoresOver(col("_t")).as("_ls"))
      .withColumn("predicted", TextAnalysis.langIdFromScores(col("_ls")))
      .drop("_ls")
    val filtered = scored
      .filter(col("quality") >= minQuality && col("predicted").isin(langs: _*))
    // exact dedup keeping the minimum id per normalized text — a window
    // PARTITIONED on the content key (scales with key cardinality)
    val w = Window.partitionBy(Dedup.normalized(col("text")))
      .orderBy(col("doc_id"))
    filtered
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumn("is_test", Sampling.isTest(col("doc_id"), testPercent))
  }
}
