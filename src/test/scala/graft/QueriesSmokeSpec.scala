package graft

/** Every registered query must run on sf0.001 and (except inherently
  * empty-able ones) produce rows. Oracle-level value checks happen in the
  * driver's DuckDB gate; `tools/check_oracle.py` replicates it locally.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has column-name parity with its oracle") {
    // The driver's compare sorts columns by name; a missing alias on either
    // side is an automatic hash mismatch. Guard the contract statically.
    val qs = SparkEntry.queries
    for ((name, _) <- SparkEntry.oracleSql)
      assert(qs.contains(name), s"oracle without query: $name")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs on sf0.001") {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      // persist hygiene: a gate query must not leave cached RDDs behind
      // in a long-lived session
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name leaked persists: $leaked")
    }
  }
}
