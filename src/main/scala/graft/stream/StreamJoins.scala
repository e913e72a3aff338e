package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY.md §2.10 coverage): event-time-bounded
  * attribution between two live streams — the classic view→click shape.
  *
  * Spark requires watermarks on BOTH sides plus an event-time range
  * condition in the join so each side's buffered state is bounded: a view
  * can be evicted once the click watermark passes view_ts + horizon, a
  * click once the view watermark passes click_ts. Without the range bound
  * the join state grows without limit — the unbounded-state trap this
  * transform exists to demonstrate avoiding. Runs identically on batch
  * DataFrames (watermark is a no-op there), which is what the equivalence
  * test pins.
  *
  * At scale the join is a state-store hash join keyed by user_id — both
  * streams shuffle on user_id once and state per key is bounded by the
  * attribution horizon, so it scales horizontally like any keyed state.
  */
object StreamJoins {

  /** Attribute each click to every view by the same user within
    * `horizon` BEFORE the click (inner join). Expects `event_id, ts,
    * user_id, event_type` on both inputs.
    *
    * `joinType = "leftOuter"` gives the UNCONVERTED-view variant: a view
    * with no click inside its horizon is emitted with null click columns —
    * but only once the click-side watermark has passed view_ts + horizon,
    * because until then a matching click could still arrive. That
    * watermark-gated null emission is the semantics outer stream-stream
    * joins exist for (funnel drop-off feeds, retargeting queues). */
  def viewClickAttribution(views: DataFrame, clicks: DataFrame,
                           horizon: String = "5 minutes",
                           watermark: String = "10 minutes",
                           joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val c = clicks
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    v.join(c,
        col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
  }
}
