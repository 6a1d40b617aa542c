package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher rule-based quality filtering (Rae et al. 2021, appendix A1.1):
  * the document-level heuristic gauntlet — word-count bounds, mean word
  * length bounds, symbol-to-word ratio, bullet/ellipsis line ratios,
  * alphabetic-word ratio, and a minimum-distinct-stopword requirement —
  * that became the de-facto baseline filter for web-scale corpora.
  *
  * Scale design: every rule is a map-side array/string expression over
  * one staged token array — no shuffle, no join, no UDF; a corpus pass
  * is a single projection. All thresholds compare via INTEGER
  * cross-multiplication (`hits * 100 < pct * words`), never a double
  * ratio, so verdicts are engine-exact and partition-invariant.
  */
object GopherRules {

  /** Thresholds, configurable per corpus; defaults are the paper's
    * (percent thresholds ×100 to stay integral).
    */
  final case class Config(
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Long = 3L,
      maxMeanWordLen: Long = 10L,
      maxSymbolPct: Long = 10L, // '#'/'...' hits vs words, strict <
      maxBulletLinePct: Long = 90L, // lines starting with a bullet, strict <
      maxEllipsisLinePct: Long = 30L, // lines ending in '...', strict <
      minAlphaWordPct: Long = 80L, // words with >= 1 [a-z], >=
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minDistinctStopwords: Int = 2)

  /** Per-document rule verdicts over a pre-staged token array (stage the
    * tokens as their own projection first — interpreted lambdas
    * re-evaluate bound subtrees per element). Returns a struct of one
    * boolean per rule plus the conjunction `pass`.
    */
  def flagsOver(text: Column, toks: Column, cfg: Config = Config()): Column = {
    val words = size(toks).cast("long")
    // total word characters: exact, whitespace never counted
    val chars = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val rWordCount = words >= cfg.minWords && words <= cfg.maxWords
    // minMeanWordLen <= chars/words <= maxMeanWordLen, cross-multiplied
    val rMeanLen =
      chars >= lit(cfg.minMeanWordLen) * words &&
        chars <= lit(cfg.maxMeanWordLen) * words
    val symbolHits =
      TextAnalysis.countPattern(text, "#") +
        TextAnalysis.countPattern(text, "\\.\\.\\.") +
        TextAnalysis.countPattern(text, "…")
    val rSymbol = symbolHits * lit(100L) < lit(cfg.maxSymbolPct) * words
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")))
      .cast("long")
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val rBullet = bulletLines * lit(100L) < lit(cfg.maxBulletLinePct) * nLines
    val rEllipsis =
      ellipsisLines * lit(100L) < lit(cfg.maxEllipsisLinePct) * nLines
    val alphaWords =
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val rAlpha = alphaWords * lit(100L) >= lit(cfg.minAlphaWordPct) * words
    // distinct stopwords present: probe the fixed list against the doc
    // (identical form in any engine; no array-dedup semantics to match)
    val stopHits = size(filter(
      array(cfg.stopwords.map(lit): _*), s => array_contains(toks, s)))
      .cast("long")
    val rStop = stopHits >= lit(cfg.minDistinctStopwords.toLong)
    struct(
      rWordCount.as("r_word_count"),
      rMeanLen.as("r_mean_word_len"),
      rSymbol.as("r_symbol_ratio"),
      rBullet.as("r_bullet_lines"),
      rEllipsis.as("r_ellipsis_lines"),
      rAlpha.as("r_alpha_words"),
      rStop.as("r_stopwords"),
      (rWordCount && rMeanLen && rSymbol && rBullet && rEllipsis &&
        rAlpha && rStop).as("pass"))
  }

  /** Evaluate the gauntlet corpus-wide: `(doc_id, r_*..., pass)` — one
    * map-side projection, no shuffle.
    */
  def evaluate(docs: DataFrame, idCol: Column, textCol: Column,
               cfg: Config = Config()): DataFrame = {
    val staged = docs.select(idCol.as("doc_id"), textCol.as("_text"),
      filter(TextAnalysis.tokens(textCol), t => length(t) > 0).as("_toks"))
    val f = flagsOver(col("_text"), col("_toks"), cfg)
    staged.select(col("doc_id"), f.as("f")).select(col("doc_id"), col("f.*"))
  }

  /** Keep only passing documents (the actual filter verb). */
  def filterDocs(docs: DataFrame, idCol: Column, textCol: Column,
                 cfg: Config = Config()): DataFrame = {
    val staged = docs.withColumn("_toks",
      filter(TextAnalysis.tokens(textCol), t => length(t) > 0))
    staged
      .where(flagsOver(textCol, col("_toks"), cfg).getField("pass"))
      .drop("_toks")
  }
}
