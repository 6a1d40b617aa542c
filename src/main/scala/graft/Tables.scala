package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Access to the driver-generated testdata tables (TESTDATA.md).
  *
  * All readers go through here so that scan-level concerns (nanosecond
  * timestamps, column pruning, session defaults) live in one place.
  */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain parquet scan. Catalyst prunes columns / pushes filters from here. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` carries a nanosecond-precision parquet timestamp which Spark
    * cannot represent natively; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so `ts` arrives as a Long of
    * epoch nanos. This view exposes `ts` as a proper microsecond TimestampType
    * (truncating, like every engine with us-precision timestamps does).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Session defaults shared by Verify / Bench / tests: tuned for local[N]
    * but written the way a 1000-executor cluster session would be (AQE on,
    * explicit shuffle parallelism, UTC).
    */
  def sessionBuilder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.ui.enabled", "false")
}
