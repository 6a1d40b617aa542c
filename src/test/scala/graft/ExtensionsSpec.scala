package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.SparkSessionExtensions

/** The extension hook's function set must register cleanly and resolve
  * in SQL. (`spark.sql.extensions` itself is a static conf read at
  * SparkContext creation, so the injection path is exercised against a
  * fresh SparkSessionExtensions instance and the registrations against
  * the live session.)
  */
class ExtensionsSpec extends SparkSpec {

  test("extension apply() injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
    assert(GraftExtensions.functions.map(_._1.funcName) ==
      Seq("vector_dot", "vector_cosine", "simhash64",
        "damerau_levenshtein", "unicode_normalize"))
  }

  test("registered functions resolve and evaluate in SQL") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT vector_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                     array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS c,
        |       vector_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d,
        |       simhash64(array(CAST(5 AS BIGINT), CAST(5 AS BIGINT))) AS s
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 0.6) < 1e-6)
    assert(r.getDouble(1) == 6.0)
    assert(r.getLong(2) == 5L) // identical tokens -> signature = hash bits
    // DESCRIBE FUNCTION works through the ExpressionInfo
    val desc = spark.sql("DESCRIBE FUNCTION vector_cosine").collect().mkString
    assert(desc.contains("vector_cosine"))
  }
}
