package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

/** The §2.10 streaming family's entry into the driver's rows+schema+hash
  * CORRECTNESS gate (previously spec-only by declared design): a query that
  * runs the streaming sessionizer through the FULL Structured-Streaming
  * runtime — file micro-batch source → session_window state store →
  * foreachBatch sink — as a one-shot replay (Trigger.AvailableNow) of the
  * events table, persists the result, and is hash-compared to a DuckDB
  * oracle that re-derives the same sessions from `events` directly. Any
  * drift between the streaming execution mode and the batch/independent
  * semantics (state merge, window coalescing, output timing) breaks the
  * hash — the reference's continuous-arrival presumption
  * (/root/reference/README.md:19) proven equivalent across execution modes.
  */
object StreamQueries {

  /** Per-process work dir (same discipline as ElbQueries.OracleInputDir:
    * checkout-relative, pid-suffixed so concurrent JVMs never race). */
  private val base: String = {
    val b = sys.env.getOrElse("GRAFT_ORACLE_INPUT_DIR",
      s"${sys.props("user.dir")}/target/oracle_inputs")
    s"$b/p${ProcessHandle.current().pid()}"
  }

  /** (session, dir)s whose replay already ran in this process — the stream
    * executes once; later constructions reuse the persisted result. */
  private val ran =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Streaming 15-min session_window sessionization of the events replay.
    *
    * Complete output mode: a FINITE replay's final micro-batch rewrites
    * the whole session state, so no tail session is withheld waiting for a
    * watermark that will never advance (the append-mode pitfall on bounded
    * input); each foreachBatch overwrite leaves the last — complete —
    * state as the persisted result. On an unbounded stream the same
    * aggregation runs in append mode with a watermark and bounded state
    * ([[StreamSessions.sessionize]], spec-pinned batch≡stream); THIS query
    * pins the semantics against an independent engine. `collect_set` size
    * (exact, order-insensitive) stands in for count(DISTINCT), which
    * streaming aggregation does not support; item sets here are bounded by
    * the event-type alphabet, never corpus-proportional. */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    val out = s"$base/stream_sessions.parquet"
    if (ran.add((s, dir))) {
      val replay = s"$base/stream_replay"
      val chk = s"$base/stream_chk"
      graft.Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .write.mode("overwrite").parquet(replay)
      val src = s.readStream
        .schema(StructType(Seq(
          StructField("user_id", LongType),
          StructField("ts", TimestampType),
          StructField("event_type", StringType))))
        .parquet(replay)
      val sess = src
        .groupBy(col("user_id"), session_window(col("ts"), "15 minutes"))
        .agg(
          min(unix_micros(col("ts"))).as("session_start_us"),
          max(unix_micros(col("ts"))).as("session_end_us"),
          count(lit(1)).as("hit_count"),
          size(collect_set(col("event_type"))).cast("long").as("unique_types"))
        .select(col("user_id"), col("session_start_us"),
          col("session_end_us"), col("hit_count"), col("unique_types"))
      val q = sess.writeStream
        .outputMode("complete")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.coalesce(1).write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out).orderBy(col("user_id"), col("session_start_us"))
  }

  /** Streaming enrichment: stream–static inner join (the OTHER core
    * streaming surface next to stateful aggregation — the dimension is a
    * plain batch DataFrame broadcast into every micro-batch) of the events
    * replay against the customer dim, then a tumbling 1-hour windowed
    * aggregation per (nation, event_type). Complete output mode for the
    * same bounded-replay reason as [[streamSessionize]]; everything here
    * is arrival-order-insensitive (inner join + commutative aggregates),
    * so the result is deterministic regardless of micro-batch slicing and
    * hash-comparable to a DuckDB oracle that re-derives it relationally.
    * At scale the static side is the classic broadcast dim; the stream
    * side shuffles once on the (nation, window, type) grain. */
  def streamEnrich(s: SparkSession, dir: String): DataFrame = {
    val out = s"$base/stream_enrich.parquet"
    if (ranEnrich.add((s, dir))) {
      val replay = s"$base/enrich_replay"
      val chk = s"$base/enrich_chk"
      graft.Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .write.mode("overwrite").parquet(replay)
      val dim = graft.Tables(s, dir, "customer")
        .select(col("c_custkey").as("user_id"),
          col("c_nationkey").cast("long").as("nation"))
      val src = s.readStream
        .schema(StructType(Seq(
          StructField("user_id", LongType),
          StructField("ts", TimestampType),
          StructField("event_type", StringType))))
        .parquet(replay)
      val agg = src.join(dim, "user_id")
        .groupBy(col("nation"), window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
        .select(col("nation"), unix_micros(col("window.start")).as("window_us"),
          col("event_type"), col("n_events"), col("first_us"), col("last_us"))
      val q = agg.writeStream
        .outputMode("complete")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.coalesce(1).write.mode("overwrite").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out)
      .orderBy(col("nation"), col("window_us"), col("event_type"))
  }

  private val ranEnrich =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Streaming exactly-once ingestion dedup: at-least-once delivery (every
    * third event delivered TWICE, the second copy in a separate file so
    * `maxFilesPerTrigger=1` lands it in a LATER micro-batch) pushed through
    * `dropDuplicates(event_id)`'s key state store in append mode — each key
    * is emitted exactly once across ALL micro-batches, so the union of the
    * per-batch appends is the duplicate-free relation regardless of batch
    * slicing. The cross-batch arrival is the point: the second copy only
    * disappears if the state store remembered the first batch's keys.
    * Kafka-consumer at-least-once → exactly-once, the standard ingestion
    * front door for every pipeline in this repo.
    *
    * The persisted event-grain relation is compacted to a per-type summary
    * of exact integer sums — any lost or double-emitted row breaks
    * count/sum/min/max vs the DuckDB oracle, which reads the ORIGINAL
    * events table (dedup must restore it exactly). Unbounded key state is
    * the documented bounded-replay trade: on an unbounded stream the same
    * query runs `dropDuplicatesWithinWatermark` with state eviction
    * ([[StreamSessions]] spec family). */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val out = s"$base/stream_dedup.parquet"
    if (ranDedup.add((s, dir))) {
      val replay = s"$base/dedup_replay"
      val chk = s"$base/dedup_chk"
      val ev = graft.Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      ev.coalesce(1).write.mode("overwrite").parquet(replay)
      ev.filter(col("event_id") % 3 === 0)
        .coalesce(1).write.mode("append").parquet(replay)
      val src = s.readStream
        .schema(StructType(Seq(
          StructField("event_id", LongType),
          StructField("user_id", LongType),
          StructField("ts", TimestampType),
          StructField("event_type", StringType))))
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
      val q = src.dropDuplicates("event_id").writeStream
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_ids"),
        sum(col("user_id")).as("sum_users"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  private val ranDedup =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_sessionize" -> (streamSessionize _),
    "q_stream_enrich" -> (streamEnrich _),
    "q_stream_dedup" -> (streamDedup _),
  )

  /** session_window's half-open interval: new session when gap >= 15 min
    * (the same boundary rule q_session_window's batch twin pins). */
  val oracleSql: Map[String, String] = Map(
    "q_stream_sessionize" ->
      """WITH hits AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 900000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM hits
        |), numbered AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, min(ts_us) AS session_start_us,
        |       max(ts_us) AS session_end_us,
        |       count(*) AS hit_count,
        |       count(DISTINCT event_type) AS unique_types
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,
    // tumbling window start = epoch µs floored to the hour; ts > 0 so
    // integer division is the floor on both engines
    "q_stream_enrich" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
        |       epoch_us(e.ts) // 3600000000 * 3600000000 AS window_us,
        |       e.event_type,
        |       count(*) AS n_events,
        |       min(epoch_us(e.ts)) AS first_us,
        |       max(epoch_us(e.ts)) AS last_us
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2, 3
        |ORDER BY nation, window_us, event_type""".stripMargin,
    // dedup must restore the ORIGINAL relation exactly: the oracle never
    // sees the duplicated replay, only `events` itself
    "q_stream_dedup" ->
      """SELECT event_type,
        |       count(*) AS n_events,
        |       CAST(sum(event_id) AS BIGINT) AS sum_ids,
        |       CAST(sum(user_id) AS BIGINT) AS sum_users,
        |       min(event_id) AS min_id,
        |       max(event_id) AS max_id
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )
}
