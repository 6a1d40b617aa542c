package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming surface over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY §1.1: streaming absent); this module
  * is the engine's scale-out ingestion path: the same aggregations the
  * batch query surface exposes (q15_events_hourly), expressed as an
  * incremental plan with watermarks, plus stateful sessionization via
  * `flatMapGroupsWithState` — the two canonical streaming shapes a
  * training-data pipeline needs (rollups and user/session assembly).
  *
  * Tests drive these with MemoryStream; production swaps the source for
  * `spark.readStream.format("kafka"|"parquet")` — the transform plans are
  * source-agnostic DataFrames.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long,
                              total_value: Double)

  /** Per-user session accumulator; `start`/`last` are epoch MICROS —
    * `Timestamp.getTime` alone truncates to milliseconds, and the events
    * tables carry microsecond precision, so gap arithmetic must run in
    * micros to agree with a batch `epoch_us` oracle.
    */
  final case class SessionState(start: Long, last: Long, n: Long,
                                total: Double)

  /** Exact epoch micros of a Timestamp. */
  private def microsOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Micros-precision Timestamp (inverse of `microsOf`). */
  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Hourly tumbling-window counts/sums per event type with a watermark:
    * the streaming twin of the batch `q15_events_hourly` query. Late data
    * beyond `watermarkDelay` is dropped; windows finalize (Append mode)
    * once the watermark passes window end.
    */
  def hourlyAgg(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("win.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-user sessionization with an inactivity gap: events group into a
    * session until `gap` of silence; each closed session emits one row.
    * Custom state via flatMapGroupsWithState with event-time timeout —
    * state is per-user and bounded, so this scales horizontally with the
    * number of distinct users, not the event volume.
    */
  def sessionize(events: Dataset[Event], gapMillis: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMillis * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, tsOfMicros(s.start),
              tsOfMicros(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => microsOf(e.ts))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = microsOf(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, tsOfMicros(s.start),
                    tsOfMicros(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout is in MILLIS; round up so it lands strictly
              // after the exact micros gap. CLAMPED to the current
              // watermark: when a later micro-batch delivers rows for a
              // session whose last+gap is already behind the advanced
              // watermark (out-of-order replay, allowed-late data),
              // Spark rejects a timeout earlier than the watermark with
              // an error — the session must instead time out at the
              // next opportunity. Found by the r8 StreamSweep's
              // multi-batch identical-timestamp replay; the gates'
              // chronological staging never reaches this.
              val timeoutMs = (s.last + gapUs) / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(timeoutMs, state.getCurrentWatermarkMs() + 1L))
            }
            closed.reverseIterator
          }
      }
  }

  /** Per-user running-totals state for [[runningTotals]]. `lastUs` is
    * epoch micros; `cents` keeps the value sum as an exact integer
    * (events carry 2-decimal values), so the accumulated total is
    * independent of arrival order and batch boundaries — stream/batch
    * agreement holds bit-for-bit.
    */
  final case class TotalsState(n: Long, lastUs: Long, cents: Long)

  final case class TotalsOut(user_id: Long, n_events: Long, last_us: Long,
                             total_cents: Long)

  /** Per-user running totals via `mapGroupsWithState` — the
    * one-output-per-key stateful shape (each micro-batch emits every
    * touched user's UPDATED totals; Update output mode). State is one
    * small record per distinct user: bounded by the key cardinality, not
    * event volume — the profile/feature-store maintenance pattern. The
    * final emission per user equals the batch aggregate over all
    * batches, which is what the gate oracles.
    */
  def runningTotals(events: Dataset[Event]): Dataset[TotalsOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[TotalsState, TotalsOut](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[TotalsState]) =>
          var s = state.getOption.getOrElse(TotalsState(0L, Long.MinValue, 0L))
          rows.foreach { e =>
            s = TotalsState(s.n + 1L, math.max(s.lastUs, microsOf(e.ts)),
              s.cents + math.round(e.value * 100.0))
          }
          state.update(s)
          TotalsOut(userId, s.n, s.lastUs, s.cents)
      }
  }

  /** Streaming near-dup filter: drop events whose props fingerprint was
    * already seen for the user (dropDuplicates with watermark — bounded
    * state, the streaming version of exact dedup).
    */
  def dedupStream(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Wire a streaming DataFrame to a parquet sink directory with a
    * checkpoint — the load path of the warehouse, incremental.
    */
  def toParquetSink(stream: DataFrame, path: String, checkpoint: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                    org.apache.spark.sql.streaming.Trigger.AvailableNow()) =
    stream.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)

  /** Batch replay of the streaming hourly aggregation over the stored
    * events table — used to check stream/batch agreement.
    */
  def hourlyAggBatch(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
}
