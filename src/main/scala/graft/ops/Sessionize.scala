package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization — the reference's central abstraction.
  *
  * "Sessionize the web log by IP" (/root/reference/README.md:9-10) with a
  * time-window gap, default 15 minutes (/root/reference/README.md:43).
  * A session is a maximal run of hits from one user where consecutive hits
  * are <= `gap` apart; a hit whose distance from the previous hit is
  * STRICTLY GREATER than the gap starts a new session (SURVEY.md §7.5.2).
  *
  * Implementation is the classic lag + running-sum window composite:
  *   new_session = (ts - lag(ts) > gap)  ;  session_id = running sum of flags
  * which is a single hash-partition-by-user shuffle; the downstream
  * groupBy(user, session_id) reuses the same partitioning (no second
  * shuffle for the user-keyed aggregation — Catalyst's EnsureRequirements
  * sees hash(user) satisfies hash(user, session_id)'s co-partitioning need
  * only via AQE; regardless, only ONE wide exchange feeds both the window
  * and the aggregate at 100 TB the partition key is the user/IP, which
  * distributes evenly except for bot IPs — AQE skew-join/agg handles those,
  * and the gap logic itself is O(hits-per-user) per key).
  *
  * All timestamp math is done on epoch-microsecond longs so results are
  * bit-identical to the DuckDB oracle despite the ns-parquet / µs-Spark
  * precision mismatch (FIXTURES.md §A note).
  */
object Sessionize {

  val DefaultGapSec: Long = 15 * 60

  /** Adds `ts_us` (epoch µs), `session_id` (1-based, per user) to `df`.
    *
    * @param user      user/IP identity column
    * @param ts        event-time column (TimestampType)
    * @param tieBreak  deterministic secondary sort key for duplicate
    *                  timestamps (e.g. event_id) — keeps Spark and the
    *                  oracle's lag() aligned
    * @param gapSec    inactivity gap in seconds; strictly-greater starts a
    *                  new session
    */
  def withSessionIds(df: DataFrame, user: Column, ts: Column,
                     tieBreak: Column, gapSec: Long = DefaultGapSec): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts, tieBreak)
    val tsUs = unix_micros(ts)
    val gapUs = gapSec * 1000000L
    val prevUs = lag(tsUs, 1).over(w)
    val newSess = when(prevUs.isNull || tsUs - prevUs > gapUs, 1L).otherwise(0L)
    df.withColumn("ts_us", tsUs)
      .withColumn("session_id",
        sum(newSess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Dynamic-gap variant: the inactivity gap is a per-row Column (e.g. a
    * per-segment policy — bots shorter, logged-in users longer), the batch
    * twin of stream.DynamicSessions. Same single hash-by-user shuffle. */
  def withSessionIdsDynamic(df: DataFrame, user: Column, ts: Column,
                            tieBreak: Column, gapUs: Column): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts, tieBreak)
    val tsUs = unix_micros(ts)
    val prevUs = lag(tsUs, 1).over(w)
    val newSess = when(prevUs.isNull || tsUs - prevUs > gapUs, 1L).otherwise(0L)
    df.withColumn("ts_us", tsUs)
      .withColumn("session_id",
        sum(newSess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-(user, session) aggregate — the `sessions` relation of SURVEY §1.3:
    * start/end (epoch µs), duration seconds, hit count, distinct-item count
    * (Goal 3's "count a hit to a unique URL only once per session",
    * /root/reference/README.md:14).
    */
  def sessions(df: DataFrame, user: Column, ts: Column, tieBreak: Column,
               item: Column, gapSec: Long = DefaultGapSec): DataFrame = {
    withSessionIds(df, user, ts, tieBreak, gapSec)
      .groupBy(user.as("user_id"), col("session_id"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("hit_count"),
        countDistinct(item).as("unique_item_count"))
      .withColumn("duration_sec",
        (col("session_end_us") - col("session_start_us")) / lit(1000000.0))
  }

  /** Shared oracle-SQL fragment: DuckDB CTE producing the same sessions
    * relation from `events` (user_id ≈ client IP, event_type ≈ URL).
    * Mirrors the strictly-greater gap rule and the (ts, event_id) tie-break.
    */
  def oracleSessionsCte(gapSec: Long = DefaultGapSec): String = {
    val gapUs = gapSec * 1000000L
    s"""WITH hits AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
       |  FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > $gapUs THEN 1 ELSE 0 END AS new_sess
       |  FROM hits
       |), numbered AS (
       |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM flagged
       |), sessions AS (
       |  SELECT user_id, session_id,
       |         min(ts_us) AS session_start_us,
       |         max(ts_us) AS session_end_us,
       |         count(*) AS hit_count,
       |         count(DISTINCT event_type) AS unique_item_count,
       |         -- 1e6 not 1000000.0: scientific notation is DOUBLE in both
       |         -- Spark SQL and DuckDB, while an exact literal is DECIMAL
       |         -- in Spark SQL (q_sql_sessionize runs this same text)
       |         (max(ts_us) - min(ts_us)) / 1e6 AS duration_sec
       |  FROM numbered GROUP BY user_id, session_id
       |)""".stripMargin
  }
}
