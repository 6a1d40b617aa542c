package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the testdata contract and the adaptive `ts` decode — the round-6
  * failure mode (driver regenerated `events.parquet` with a different
  * timestamp encoding; the fixed decode broke 18 gates with an opaque
  * mid-plan error) must now surface as one clear message up front.
  */
class TablesContractSpec extends SparkSpec {

  test("assertContract passes on the shipped testdata") {
    Tables.assertContract(spark, sf0001)
  }

  test("events.ts normalizes to session-zoned TimestampType") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    // sanity: timestamps are in the generated era, not 1970 (the r6
    // micros-read-as-nanos symptom) and not year ~56k (nanos-as-micros)
    val yr = df.agg(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts decoded into era ${yr.getInt(0)}..${yr.getInt(1)}")
  }

  test("normalizeTs adapts per physical encoding") {
    val spark0 = spark
    import spark0.implicits._
    val us = 1700000000000000L // 2023-11-14T22:13:20Z in epoch micros
    // epoch-nanos long → truncate to micros
    val fromNanos = Tables.normalizeTs(
      Seq(us * 1000L + 999L).toDF("ts"))
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(unix_micros(col("ts"))).head().getLong(0) == us)
    // NTZ micros → relabeled (session is UTC)
    val fromNtz = Tables.normalizeTs(
      Seq(us).toDF("raw").select(timestamp_micros(col("raw"))
        .cast(TimestampNTZType).as("ts")))
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head().getLong(0) == us)
    // already TimestampType → untouched
    val asIs = Tables.normalizeTs(
      Seq(us).toDF("raw").select(timestamp_micros(col("raw")).as("ts")))
    assert(asIs.select(unix_micros(col("ts"))).head().getLong(0) == us)
  }

  test("normalizeTs fails loudly on an undecodable encoding") {
    val spark0 = spark
    import spark0.implicits._
    val e = intercept[IllegalStateException] {
      Tables.normalizeTs(Seq("2024-01-01").toDF("ts"))
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("assertContract reports a perturbed schema with a clear message") {
    // stage a copy of the testdata with events.user_id renamed away
    val dir = java.nio.file.Files.createTempDirectory("graft-contract")
    for (t <- Tables.All if t != "events")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/$t.parquet"),
        dir.resolve(s"$t.parquet"))
    spark.read.parquet(s"$sf0001/events.parquet")
      .withColumnRenamed("user_id", "uid")
      .write.parquet(dir.resolve("events.parquet").toString)
    val e = intercept[IllegalStateException] {
      Tables.assertContract(spark, dir.toString)
    }
    assert(e.getMessage.contains("testdata contract drift"))
    assert(e.getMessage.contains("events"))
    assert(e.getMessage.contains("user_id"))
  }
}
