package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injection point: makes the engine's native functions
  * available to every session created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the standard
  * way a Spark-native library ships custom expressions to SQL users
  * (cluster-wide, no per-session registration call needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => LevenshteinBandRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "built-in")

  /** The injected function set — also registrable onto an existing
    * session via `registerAll` (spark.sql.extensions is a static conf
    * read at SparkContext creation; running sessions use this instead).
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two float vectors"),
      (exprs: Seq[Expression]) => DotProductFloat(exprs.head, exprs(1))),
    (FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) - cosine similarity of two float vectors"),
      (exprs: Seq[Expression]) => CosineSimilarityFloat(exprs.head, exprs(1))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash from an array of token hashes"),
      (exprs: Seq[Expression]) => SimHash64FromHashes(exprs.head)),
    (FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - full (unrestricted) Damerau-Levenshtein distance"),
      (exprs: Seq[Expression]) => DamerauLevenshtein(exprs.head, exprs(1))),
    (FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(s, form) - Unicode normalization; form is a literal NFC/NFD/NFKC/NFKD"),
      (exprs: Seq[Expression]) => UnicodeNormalize(exprs.head,
        exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
            if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        })))

  /** Register every engine function AND the optimizer rules on an
    * already-running session (the extension path for sessions built
    * without `spark.sql.extensions`; `extraOptimizations` is the
    * supported post-hoc rule injection point).
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(LevenshteinBandRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinBandRule
  }
}
