package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions hook must make the native functions
  * available to a fresh session configured with spark.sql.extensions —
  * no programmatic registration call.
  */
class ExtensionsSpec extends SparkSpec {

  test("extension-injected functions resolve in SQL") {
    // newSession shares the SparkContext but extensions are per-builder;
    // build a dedicated session with the extension class name.
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT vector_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                     array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS c,
          |       vector_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d,
          |       simhash64(array(CAST(5 AS BIGINT), CAST(5 AS BIGINT))) AS s
          |""".stripMargin).collect()(0)
      assert(math.abs(r.getDouble(0) - 0.6) < 1e-6)
      assert(r.getDouble(1) == 6.0)
      assert(r.getLong(2) == 5L) // both tokens identical -> signature = hash bits
    } finally {
      // do not stop: the SparkContext is shared with the suite session
    }
  }
}
