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
  * distributes evenly except for bot IPs. AQE can NOT fix a hot window
  * key — its skew handling splits join/rebalance partitions, never a
  * Window.partitionBy group (measured: a 30%-hot bot at 100× costs +10%
  * with AQE on, all of it one serialized sort task) — the remedy is
  * [[sessionsSalted]], the time-block two-phase rewrite below.
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

  /** Skew-proof two-phase sessionizer — the salting recipe for hot keys
    * (bot IPs). AQE cannot split a WINDOW partition (its skew handling
    * applies to joins and rebalance reads, not `Window.partitionBy`), so
    * one bot owning 30% of a 10M-row stream still serializes 3M rows
    * through one [[withSessionIds]] sort task. Phase 1 salts the window
    * key with a TIME BLOCK — partition (user, floor(ts/block)) — and
    * sessionizes each block locally, spreading hit-grain work over
    * users×blocks tasks; phase 2 re-applies the SAME strictly-greater
    * gap rule to the per-block LOCAL SESSIONS (session-grain rows,
    * orders of magnitude fewer than hits — a bot's hits collapse to its
    * session count), stitching sessions that span block boundaries.
    * Correct for ANY block size: consecutive locals within one block are
    * already > gap apart by construction, so the phase-2 flag over
    * (start − prev_end) reproduces the hit-level flags exactly, and
    * blocks smaller than the gap just yield longer merge chains, which
    * the running sum collapses. `collect_set(item)` per local session is
    * bounded by the item alphabet, never hits (the streaming
    * sessionizer's argument). Output ≡ [[sessions]] row for row —
    * hash-proven by q_sessionize_salted against the SAME DuckDB CTE, and
    * measured in BASELINE.md's skew table. */
  def sessionsSalted(df: DataFrame, user: Column, ts: Column,
                     tieBreak: Column, item: Column,
                     gapSec: Long = DefaultGapSec,
                     blockSec: Long = 86400L): DataFrame = {
    val gapUs = gapSec * 1000000L
    val hits = df.select(user.as("user_id"), unix_micros(ts).as("ts_us"),
        tieBreak.as("tie"), item.as("item"))
      .withColumn("blk", floor(col("ts_us") / lit(blockSec * 1000000L)))
    val wLoc = Window.partitionBy(col("user_id"), col("blk"))
      .orderBy(col("ts_us"), col("tie"))
    val prevUs = lag(col("ts_us"), 1).over(wLoc)
    val loc = hits
      .withColumn("new_sess",
        when(prevUs.isNull || col("ts_us") - prevUs > gapUs, 1L)
          .otherwise(0L))
      .withColumn("loc_sid", sum(col("new_sess")).over(
        wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("blk"), col("loc_sid"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("hits"), collect_set(col("item")).as("items"))
    val wU = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    val prevEnd = lag(col("end_us"), 1).over(wU)
    loc
      .withColumn("new_chain",
        when(prevEnd.isNull || col("start_us") - prevEnd > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_chain")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("start_us")).as("session_start_us"),
        max(col("end_us")).as("session_end_us"),
        sum(col("hits")).as("hit_count"),
        size(array_distinct(flatten(collect_list(col("items")))))
          .cast("long").as("unique_item_count"))
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
