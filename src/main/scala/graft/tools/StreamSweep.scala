package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Streaming-throughput sweep — the last unmeasured surface after the
  * batch kernels ([[ScaleSweep]]), adversarial density
  * ([[AdversarialSweep]]), and the load path ([[LoadSweep]]).
  *
  * The bench's s-gates deliberately run at gate scale where micro-batch
  * machinery dominates (~2–4 s each regardless of data), so they say
  * nothing about streaming THROUGHPUT. This tool scales the events
  * corpus ×k (id-offset copies, timestamps unchanged so the window
  * state stays fixed while data grows), stages each corpus as k files
  * consumed over several micro-batches (maxFilesPerTrigger), and times
  * three pipelines to AvailableNow drain against a noop sink (no sink
  * cost in the reading):
  *
  *  1. stateless — projection + filter (raw ingest path)
  *  2. windowed agg — watermark + hourly window × event_type (update
  *     mode; the s01 kernel's stateful shape)
  *  3. stream dedup — watermarked dropDuplicates on event_id (the s03
  *     shape; state grows with distinct keys in the watermark horizon)
  *
  * Claim under test: drain time grows linearly in rows (rows/sec flat
  * or rising as fixed micro-batch cost amortizes), state size bounded
  * by windows × types, not by rows. Output: one JSON line per
  * (pipeline, k) to SPARK_GRAFT_STREAM_OUT (default stream_sweep.json).
  */
object StreamSweep {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = thunk()
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "stream_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = "target/streamsweep"
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[stream] $line"); results += line }

    // ---- staged corpora: one file per copy; ids offset, ts unchanged
    val events = Tables(spark, "/root/testdata/sf0.1", "events")
    val scales = Seq(1, 10, 40)
    scales.foreach { k =>
      (0 until k).foreach { i =>
        events.select(
            (col("event_id") + lit(i * 100000000L)).as("event_id"),
            col("ts"), (col("user_id") + lit(i * 10000000L)).as("user_id"),
            col("event_type"), col("value"))
          .coalesce(1)
          .write.mode(if (i == 0) "overwrite" else "append")
          .parquet(s"$work/ev_x$k")
      }
    }
    val schema = spark.read.parquet(s"$work/ev_x1").schema

    def drain(k: Int, tag: String, mode: String = "update")
             (pipe: DataFrame => DataFrame): Unit =
      withShufflePartitions(spark, 4) {
        val src = spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", math.max(1, k / 4))
          .parquet(s"$work/ev_x$k")
        val rows = 100000L * k
        val (sec, _) = timed(() => {
          val q = pipe(src.transform(Tables.normalizeTs(_))).writeStream
            .format("noop")
            .option("checkpointLocation",
              java.nio.file.Files
                .createTempDirectory(s"graft-ss-$tag-$k").toString)
            .outputMode(mode)
            .trigger(Trigger.AvailableNow())
            .start()
          if (!q.awaitTermination(600000)) {
            q.stop(); throw new IllegalStateException(s"$tag x$k hung")
          }
        })
        val rps = (rows / sec).toLong
        record(s"""{"pipeline":"$tag","scale":"x$k","rows":$rows,""" +
          s""""sec":$sec,"rows_per_sec":$rps}""")
      }

    // warmup: smallest corpus through the stateful shape (JIT + codegen)
    drain(1, "warmup") { s =>
      s.withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }
    results.remove(0)

    scales.foreach { k =>
      drain(k, "stateless") { s =>
        s.filter(col("value") > 10.0)
          .select(col("event_id"), col("user_id"), col("event_type"),
            (col("value") * 2).as("v2"))
      }
      drain(k, "windowed_agg") { s =>
        s.withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("tv"))
      }
      drain(k, "stream_dedup") { s =>
        s.withWatermark("ts", "2 hours").dropDuplicates("event_id")
      }
      // the CUSTOM-STATE path: the hand-rolled flatMapGroupsWithState
      // sessionizer (s02's kernel) — per-user state, event-time
      // timeouts, micros-exact gap arithmetic
      drain(k, "fmgws_sessionize", mode = "append") { s =>
        import spark.implicits._
        graft.streaming.EventStream.sessionize(
          s.select("event_id", "ts", "user_id", "event_type", "value")
            .as[graft.streaming.EventStream.Event],
          gapMillis = 30 * 60 * 1000L).toDF()
      }
      // the state-BACKEND knob: the dedup pipeline holds one state row
      // per distinct key inside the watermark horizon (all of them
      // here), which is exactly where the in-heap HDFS-backed store
      // stops scaling and RocksDB (off-heap, spill-to-disk) takes over
      // on a real cluster — measure both at every point
      val prevProvider =
        spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        drain(k, "stream_dedup_rocksdb") { s =>
          s.withWatermark("ts", "2 hours").dropDuplicates("event_id")
        }
      } finally {
        prevProvider match {
          case Some(p) =>
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None =>
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[stream] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
