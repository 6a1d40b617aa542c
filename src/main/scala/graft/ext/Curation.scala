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

  /** Shared quality + language stages: `(doc_id, text, quality,
    * predicted)` with the token array staged once.
    */
  private def qualityLangFilter(docs: DataFrame, idCol: String,
                                textCol: String, minQuality: Double,
                                langs: Seq[String],
                                stops: Seq[String]): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      TextAnalysis.tokens(col(textCol)).as("_t"))
    toks
      .select(col("doc_id"), col("text"),
        TextAnalysis.qualityScoreOver(col("_t"), length(col("text")), stops)
          .as("quality"),
        TextAnalysis.langScoresOver(col("_t")).as("_ls"))
      .withColumn("predicted", TextAnalysis.langIdFromScores(col("_ls")))
      .drop("_ls")
      .filter(col("quality") >= minQuality && col("predicted").isin(langs: _*))
  }

  /** Curated corpus: the input columns plus `predicted` (language) and
    * `is_test` (hash split), one row per surviving canonical document.
    */
  def curate(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", minQuality: Double = 0.5,
             langs: Seq[String] = TextAnalysis.LangMarkers.map(_._1),
             stops: Seq[String] = Seq("a", "the"),
             testPercent: Int = 10): DataFrame = {
    val filtered = qualityLangFilter(docs, idCol, textCol, minQuality, langs, stops)
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

  /** Curation with NEAR-duplicate removal: the same quality/language
    * stages, then MinHash LSH candidates → connected components → keep
    * each component's canonical (min id) plus every unpaired document.
    * Candidate pairs are xxhash64-based, so this variant is spec-pinned
    * (planted copies must vanish; output ⊆ the exact-dedup `curate`)
    * rather than DuckDB-oracled — `curate` is its oracle-checked twin.
    *
    * NOT a single lazy plan: the component stage iterates to fixpoint,
    * so calling this runs Spark jobs and the returned plan embeds the
    * materialized label table. Once the result has been consumed
    * (written / collected), call [[releaseNearDedup]] to free the
    * embedded checkpoint blocks; the plan must not be re-executed after
    * release.
    */
  def curateNearDedup(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", minQuality: Double = 0.5,
                      langs: Seq[String] = TextAnalysis.LangMarkers.map(_._1),
                      stops: Seq[String] = Seq("a", "the"),
                      testPercent: Int = 10, bands: Int = 8,
                      wordGrams: Int = 3, ccMaxIterations: Int = 200): DataFrame = {
    val filtered = qualityLangFilter(docs, idCol, textCol, minQuality, langs, stops)
    val cands = Dedup.minhashCandidates(
      filtered.select(col("doc_id"), col("text")),
      col("doc_id"), col("text"), bands = bands, wordGrams = wordGrams)
    val comps = Dedup.connectedComponents(cands, ccMaxIterations)
    filtered.alias("f")
      .join(comps.alias("c"), col("f.doc_id") === col("c.id"), "left")
      .filter(col("c.component").isNull || col("c.component") === col("f.doc_id"))
      .select(col("f.doc_id"), col("f.text"), col("f.quality"), col("f.predicted"))
      .withColumn("is_test", Sampling.isTest(col("doc_id"), testPercent))
  }

  /** Release the component-label checkpoint embedded in a consumed
    * [[curateNearDedup]] plan.
    */
  def releaseNearDedup(result: DataFrame): Unit =
    org.apache.spark.sql.GraftColumnBridge.unpersistEmbeddedCheckpoints(result)
}
