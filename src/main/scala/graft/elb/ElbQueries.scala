package graft.elb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sessionize

/** The reference's four goals executed end-to-end on the ELB pipeline:
  * synthetic raw lines (the stripped blob's stand-in) → quote-aware parse →
  * 15-min-gap sessionization by client IP (NOT ip:port — README.md:9,42;
  * SURVEY §1.3.3) → goal aggregates.
  *
  * Deterministic (fixed seed) but generated in-memory, so these have no
  * DuckDB oracle over the driver tables — the driver records rows-only;
  * exact semantics are pinned by ElbSpec against computable expectations
  * (the generator's session structure is known by construction).
  */
object ElbQueries {

  private def parsedRequests(s: SparkSession): DataFrame = {
    import s.implicits._
    // 60 clients × 4 sessions × 6 hits, 1-in-50 lines malformed
    val lines = Synthetic.generate(seed = 42L, nClients = 60,
      sessionsPerClient = 4, hitsPerSession = 6, malformedEvery = 50)
    // gz text would arrive as 1 partition (non-splittable) — repartition
    // immediately, as the 100 TB path requires (SURVEY §7.5.3)
    LogParser.requests(lines.toDF("value").repartition(8))
  }

  /** Goal 1: full sessions relation on parsed ELB data. */
  def elbSessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(parsedRequests(s),
        col("client_ip"), col("ts"), col("client_port"), col("url"))
      .select(col("user_id").as("client_ip"), col("session_id"),
        col("session_start_us"), col("session_end_us"),
        col("hit_count"), col("unique_item_count").as("unique_urls"),
        col("duration_sec"))
      .orderBy(col("client_ip"), col("session_id"))

  /** Goals 2-4 in one result: avg session time, total sessions, and the
    * most-engaged IP (longest single session). */
  def elbGoals(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(parsedRequests(s),
        col("client_ip"), col("ts"), col("client_port"), col("url"))
      .agg(
        round(avg(col("duration_sec")), 6).as("avg_session_sec"),
        count(lit(1)).as("n_sessions"),
        round(max(col("duration_sec")), 6).as("max_session_sec"),
        max_by(col("user_id"), struct(col("duration_sec"), col("user_id")))
          .as("most_engaged_ip"))

  /** Quarantine accounting: parsed vs rejected line counts — the
    * messy-data contract (README.md:61). */
  def elbParseStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Synthetic.generate(seed = 42L, nClients = 60,
      sessionsPerClient = 4, hitsPerSession = 6, malformedEvery = 50)
      .toDF("value").repartition(8)
    LogParser.parse(lines)
      .groupBy(col("_corrupt"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("client_ip")).as("n_ips"))
      .orderBy(col("_corrupt"))
  }

  /** Classic LB operations metrics on the parsed log: per-minute request
    * count, error rate (5xx), null-safe latency aggregates and exact p95
    * backend latency — timeout lines (-1 sentinels → null) excluded from
    * latency but counted in traffic, exactly the messy-data posture R:61
    * demands. */
  def elbOpsMetrics(s: SparkSession, dir: String): DataFrame =
    parsedRequests(s)
      .groupBy(unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("requests"),
        round(avg(when(col("elb_status") >= 500, 1.0).otherwise(0.0)), 6)
          .as("error_rate"),
        count(col("backend_time_sec")).as("n_with_latency"),
        round(avg(col("backend_time_sec")), 6).as("avg_backend_sec"),
        round(expr("percentile(backend_time_sec, 0.95)"), 6).as("p95_backend_sec"),
        sum(col("sent_bytes")).as("bytes_out"))
      .orderBy(col("minute_us"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_elb_sessionize" -> (elbSessionize _),
    "q_elb_goals" -> (elbGoals _),
    "q_elb_parse_stats" -> (elbParseStats _),
    "q_elb_ops_metrics" -> (elbOpsMetrics _),
  )

  /** No oracle entries: inputs are generated in-memory, not driver tables. */
  val oracleSql: Map[String, String] = Map.empty
}
