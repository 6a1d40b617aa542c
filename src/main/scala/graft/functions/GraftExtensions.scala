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

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two float vectors"),
      (exprs: Seq[Expression]) => DotProductFloat(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) - cosine similarity of two float vectors"),
      (exprs: Seq[Expression]) => CosineSimilarityFloat(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash from an array of token hashes"),
      (exprs: Seq[Expression]) => SimHash64FromHashes(exprs.head)))
  }
}
