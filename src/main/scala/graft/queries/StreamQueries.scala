package graft.queries

import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming gate queries: a REAL Structured Streaming execution inside
  * the correctness gate — file-stream source over the stored events
  * parquet, watermarked hourly window aggregation, memory sink — with a
  * DuckDB batch oracle. Stream/batch agreement is the correctness
  * contract of an incremental pipeline.
  */
object StreamQueries {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_stream_hourly" -> ((s: SparkSession, dir: String) => {
      // the file-stream source needs a directory: stage the events file
      // into one (at scale the source IS a landing directory)
      val staged = java.nio.file.Files.createTempDirectory("graft-stream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val stream = s.readStream
        .schema(eventsSchema)
        .parquet(staged.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // decimal-cast inside the streaming agg: partial aggregation order
      // must not affect the emitted double
      val agg = stream
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).as("tv"))
      val q = agg
        .select(col("win.start").as("hour_start"), col("event_type"), col("n"),
          col("tv").cast(DecimalType(38, 2)).cast("double").as("total_value"))
        .writeStream
        .format("memory")
        .queryName("s01_stream_hourly_sink")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("s01_stream_hourly_sink")
        .orderBy("event_type", "hour_start")
    }))

  val oracle: Map[String, String] = Map(
    "s01_stream_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
        |    AS total_value
        |FROM events
        |GROUP BY hour_start, event_type
        |ORDER BY event_type, hour_start""".stripMargin)
}
