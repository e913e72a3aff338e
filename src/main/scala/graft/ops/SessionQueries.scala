package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Flagship query set — the reference's four processing goals
  * (/root/reference/README.md:9-16) run on the driver's `events` table
  * (`user_id` plays client IP, `event_type` plays URL, TESTDATA.md).
  * Every query has an exact DuckDB oracle twin.
  */
object SessionQueries {

  private def events(s: SparkSession, dir: String) = Tables(s, dir, "events")

  /** Goal 1 (R:9-10): the full sessions relation, 15-min inactivity gap. */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(events(s, dir),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("user_id"), col("session_id"), col("session_start_us"),
        col("session_end_us"), col("hit_count"), col("unique_item_count"),
        col("duration_sec"))
      .orderBy(col("user_id"), col("session_id"))

  /** Goal 1 through the SQL-API surface: the SAME session-CTE text the
    * DuckDB oracle runs, executed via `spark.sql` over a temp view — the
    * only dialect difference is the epoch-µs spelling (`unix_micros` vs
    * `epoch_us`), patched textually. Covers the parser→analyzer entry
    * path; the plan Catalyst produces is the same lag+running-sum window
    * pipeline as the DataFrame flagship, so this also pins that the two
    * API surfaces cannot drift apart semantically. */
  def sqlSessionize(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events")
    val cte = Sessionize.oracleSessionsCte()
      .replace("epoch_us(ts)", "unix_micros(ts)")
    s.sql(
      s"""$cte
         |SELECT user_id, session_id, session_start_us, session_end_us,
         |       hit_count, unique_item_count, duration_sec
         |FROM sessions ORDER BY user_id, session_id""".stripMargin)
  }

  /** The analysis behind the gap parameter (R:43 — "you can determine the
    * best session window time on your own"): the distribution of per-user
    * consecutive-hit gaps. The p50/p90/p99 and the fraction of gaps beyond
    * 15 minutes quantify how sharply user activity bimodalizes around the
    * chosen threshold. Same single hash-by-user exchange as the
    * sessionizer, collapsing to one row. */
  def sessionGapDist(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap_us, 0.5)") / 1e6, 6).as("p50_s"),
        round(expr("percentile(gap_us, 0.9)") / 1e6, 6).as("p90_s"),
        round(expr("percentile(gap_us, 0.99)") / 1e6, 6).as("p99_s"),
        round(avg(when(col("gap_us") > 900000000L, 1.0).otherwise(0.0)), 6)
          .as("frac_over_15min"))
  }

  /** Goal 2 (R:12): average session time, seconds. Single-hit sessions
    * count with duration 0 (SURVEY §1.3.2). Rounded to 6 dp for
    * float-summation-order parity with the oracle. */
  def avgSessionTime(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(events(s, dir),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .agg(round(avg(col("duration_sec")), 6).as("avg_session_sec"),
           count(lit(1)).as("n_sessions"))

  /** Goal 3 (R:14): unique URL (event_type) visits per session. */
  def uniquePerSession(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(events(s, dir),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("user_id"), col("session_id"),
        col("unique_item_count").as("unique_urls"))
      .orderBy(col("user_id"), col("session_id"))

  /** Goal 4 (R:16): most engaged — IPs with the longest sessions.
    * Top 20 by duration; deterministic tie-break on (user_id, session_id). */
  def topEngaged(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(events(s, dir),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("user_id"), col("session_id"), col("duration_sec"),
        col("hit_count"))
      .orderBy(col("duration_sec").desc, col("user_id"), col("session_id"))
      .limit(20)

  /** Per-IP engagement features (R:21/23 feature prep): session count, mean
    * duration, mean unique URLs — the regression input for the MLE goals. */
  def ipFeatures(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(events(s, dir),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(col("duration_sec")), 6).as("mean_duration_sec"),
        round(avg(col("unique_item_count")), 6).as("mean_unique_urls"),
        sum(col("hit_count")).as("total_hits"))
      .orderBy(col("user_id"))

  /** Streaming-ready twin of Goal 1 via Spark's native session_window
    * (SURVEY §2.5): identical gap semantics except the window is
    * half-open [start, last+gap), so a hit at EXACTLY gap distance starts
    * a new session (>= vs the lag-form's >) — oracle mirrors that. */
  def sessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "15 minutes").as("sw"))
      .agg(count(lit(1)).as("hit_count"),
        countDistinct(col("event_type")).as("unique_urls"),
        min(unix_micros(col("ts"))).as("first_hit_us"),
        max(unix_micros(col("ts"))).as("last_hit_us"))
      .select(col("user_id"), col("first_hit_us"), col("last_hit_us"),
        col("hit_count"), col("unique_urls"))
      .orderBy(col("user_id"), col("first_hit_us"))

  /** Sessions with the URL set materialized (SURVEY §1.3 `urls array`):
    * collect_set per session, sorted and CSV-joined so the oracle compare
    * is container-representation-free. */
  def sessionUrls(s: SparkSession, dir: String): DataFrame =
    Sessionize.withSessionIds(events(s, dir),
        col("user_id"), col("ts"), col("event_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("hit_count"),
        concat_ws(",", sort_array(collect_set(col("event_type")))).as("urls_csv"))
      .orderBy(col("user_id"), col("session_id"))

  /** Dynamic-gap sessionization in batch (the oracle-checkable twin of
    * stream.DynamicSessions): 5-min gap for user_id % 10 == 0 ("fast"
    * segment), 15-min otherwise. */
  def sessionizeDynamic(s: SparkSession, dir: String): DataFrame = {
    val gapUs = when(col("user_id") % 10 === 0, lit(5L * 60 * 1000000))
      .otherwise(lit(15L * 60 * 1000000))
    Sessionize.withSessionIdsDynamic(events(s, dir),
        col("user_id"), col("ts"), col("event_id"), gapUs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("hit_count"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Per-minute load with lag features — the exact relational feature prep
    * of ml.Predict.loadForecast, exposed as an oracle-checked query
    * (R:19: the engine's contribution is the feature pipeline). */
  def loadFeatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perMin = events(s, dir)
      .groupBy(unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("requests"))
    val w = Window.orderBy(col("minute_us"))
    perMin
      .select(col("minute_us"), col("requests"),
        lag(col("requests"), 1).over(w).as("lag1"),
        lag(col("requests"), 2).over(w).as("lag2"),
        lag(col("requests"), 3).over(w).as("lag3"),
        round(avg(col("requests")).over(w.rowsBetween(-5, -1)), 6).as("ma5"),
        round(col("requests") / lit(60.0), 6).as("label_req_per_sec"))
      .orderBy(col("minute_us"))
  }

  /** Goal 1 under a HOT KEY (bot IP): the salted two-phase sessionizer
    * ([[Sessionize.sessionsSalted]]) — identical output to [[sessionize]]
    * proven by hash against the SAME DuckDB session CTE; the point is the
    * PLAN (time-block-salted window, no serialized hot-user sort task —
    * measured in BASELINE.md's skew table at 100×/30%-hot). */
  def sessionizeSalted(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionsSalted(events(s, dir),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("user_id"), col("session_id"), col("session_start_us"),
        col("session_end_us"), col("hit_count"), col("unique_item_count"),
        col("duration_sec"))
      .orderBy(col("user_id"), col("session_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize" -> (sessionize _),
    "q_sessionize_salted" -> (sessionizeSalted _),
    "q_sql_sessionize" -> (sqlSessionize _),
    "q_session_gap_dist" -> (sessionGapDist _),
    "q_avg_session_time" -> (avgSessionTime _),
    "q_unique_urls_per_session" -> (uniquePerSession _),
    "q_top_engaged" -> (topEngaged _),
    "q_ip_features" -> (ipFeatures _),
    "q_session_window" -> (sessionWindow _),
    "q_session_urls" -> (sessionUrls _),
    "q_sessionize_dynamic" -> (sessionizeDynamic _),
    "q_load_features" -> (loadFeatures _),
  )

  private val cte = Sessionize.oracleSessionsCte()

  val oracleSql: Map[String, String] = Map(
    "q_sessionize" ->
      s"""$cte
         |SELECT user_id, session_id, session_start_us, session_end_us,
         |       hit_count, unique_item_count, duration_sec
         |FROM sessions ORDER BY user_id, session_id""".stripMargin,

    // the salted two-phase plan must reconstruct the SAME sessions
    // relation — one oracle text, two physical strategies
    "q_sessionize_salted" ->
      s"""$cte
         |SELECT user_id, session_id, session_start_us, session_end_us,
         |       hit_count, unique_item_count, duration_sec
         |FROM sessions ORDER BY user_id, session_id""".stripMargin,

    "q_session_gap_dist" ->
      """WITH g AS (
        |  SELECT epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT count(*) AS n_gaps,
        |  round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_s,
        |  round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_s,
        |  round(quantile_cont(gap_us, 0.99) / 1e6, 6) AS p99_s,
        |  round(avg(CASE WHEN gap_us > 900000000 THEN 1.0 ELSE 0.0 END), 6)
        |    AS frac_over_15min
        |FROM g WHERE gap_us IS NOT NULL""".stripMargin,

    // SQL-API twin: literally the same text both engines run
    "q_sql_sessionize" ->
      s"""$cte
         |SELECT user_id, session_id, session_start_us, session_end_us,
         |       hit_count, unique_item_count, duration_sec
         |FROM sessions ORDER BY user_id, session_id""".stripMargin,

    "q_avg_session_time" ->
      s"""$cte
         |SELECT round(avg(duration_sec), 6) AS avg_session_sec,
         |       count(*) AS n_sessions
         |FROM sessions""".stripMargin,

    "q_unique_urls_per_session" ->
      s"""$cte
         |SELECT user_id, session_id, unique_item_count AS unique_urls
         |FROM sessions ORDER BY user_id, session_id""".stripMargin,

    "q_top_engaged" ->
      s"""$cte
         |SELECT user_id, session_id, duration_sec, hit_count
         |FROM sessions
         |ORDER BY duration_sec DESC, user_id, session_id LIMIT 20""".stripMargin,

    "q_sessionize_dynamic" ->
      """WITH hits AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN user_id % 10 = 0 THEN 300000000 ELSE 900000000 END AS gap_us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > gap_us THEN 1 ELSE 0 END AS new_sess
        |  FROM hits
        |), numbered AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, min(ts_us) AS session_start_us,
        |       max(ts_us) AS session_end_us, count(*) AS hit_count
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_load_features" ->
      """WITH pm AS (
        |  SELECT epoch_us(date_trunc('minute', ts)) AS minute_us, count(*) AS requests
        |  FROM events GROUP BY 1)
        |SELECT minute_us, requests,
        |  lag(requests, 1) OVER w AS lag1,
        |  lag(requests, 2) OVER w AS lag2,
        |  lag(requests, 3) OVER w AS lag3,
        |  round(avg(requests) OVER (ORDER BY minute_us ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 6) AS ma5,
        |  round(requests / 60.0, 6) AS label_req_per_sec
        |FROM pm WINDOW w AS (ORDER BY minute_us)
        |ORDER BY minute_us""".stripMargin,

    "q_session_urls" ->
      s"""$cte
         |SELECT user_id, session_id, count(*) AS hit_count,
         |       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS urls_csv
         |FROM numbered GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "q_ip_features" ->
      s"""$cte
         |SELECT user_id, count(*) AS n_sessions,
         |       round(avg(duration_sec), 6) AS mean_duration_sec,
         |       round(avg(unique_item_count), 6) AS mean_unique_urls,
         |       CAST(sum(hit_count) AS BIGINT) AS total_hits
         |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,

    // session_window's half-open interval: new session when gap >= 15 min.
    "q_session_window" ->
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
        |SELECT user_id, min(ts_us) AS first_hit_us, max(ts_us) AS last_hit_us,
        |       count(*) AS hit_count, count(DISTINCT event_type) AS unique_urls
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, first_hit_us""".stripMargin,
  )
}
