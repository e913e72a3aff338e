package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming twin of the batch pipeline (SURVEY.md §2.10).
  *
  * The reference's "predict the expected load in the next minute"
  * (/root/reference/README.md:19) presumes continuously arriving log data;
  * these transforms run identically on a batch DataFrame or a streaming one
  * (`spark.readStream`) — same code path, which is the point: the batch
  * oracle pins the semantics, the streaming twin adds watermark + state.
  *
  * State at scale: session_window state is keyed by (user, session) and
  * bounded by the watermark — late data beyond 10 min is dropped, closed
  * sessions are evicted from the state store each micro-batch. Per-minute
  * window counts hold one row of state per open minute.
  */
object StreamSessions {

  /** Streaming sessionization: 15-min gap session_window per user with a
    * 10-min watermark. Append-mode emits each session once, when the
    * watermark passes session end + gap. */
  def sessionize(events: DataFrame,
                 gap: String = "15 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("hit_count"),
        approx_count_distinct(col("event_type")).as("approx_unique_types"),
        min(unix_micros(col("ts"))).as("first_hit_us"),
        max(unix_micros(col("ts"))).as("last_hit_us"))
      .select(col("user_id"), col("first_hit_us"), col("last_hit_us"),
        col("hit_count"), col("approx_unique_types"))

  /** Streaming per-minute load (tumbling window + watermark) — the live
    * feature/label feed for the load forecaster. */
  def loadPerMinute(events: DataFrame,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("requests"))
      .select(unix_micros(col("w.start")).as("minute_us"), col("requests"))

  /** Sliding smoothed load: 5-minute window advancing by 1 minute. */
  def slidingLoad(events: DataFrame,
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes", "1 minute").as("w"))
      .agg(count(lit(1)).as("requests"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("requests"))

  /** Exactly-once-per-event-id dedup bounded by the watermark (messy/
    * replayed input, R:61). */
  def dedupEvents(events: DataFrame,
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming value histogram (update-mode running bucket counts) — the
    * live twin of [[graft.ops.Analytics.valueHistogram]]'s bucketing: each
    * micro-batch folds into at most 10 grouped states, so state size is
    * CONSTANT regardless of stream length (the aggregation-state shape
    * that needs no watermark to stay bounded). */
  def valueHistogram(events: DataFrame): DataFrame =
    events
      .groupBy(least(floor(col("value") / 50.0), lit(9.0)).cast("long")
        .as("bucket"))
      .agg(count(lit(1)).as("n"))
}
