package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pins the `observe()` surface — audit metrics piggybacked on the SAME
  * pass as the real work. At 100 TB this is the difference between "one
  * scan that also reports row counts / null tallies / value bounds" and
  * a second full scan per audit metric: the expectation-suite idea
  * (`q_expectations`) attached to a production job's own action instead
  * of its own query. */
class ObservabilitySpec extends SparkSpec {

  test("batch observe() collects audit metrics in the work pass itself") {
    val obs = Observation("audit")
    val ev = Tables(spark, sf001, "events")
    // the "real work": a filtered aggregate; the observation rides along
    val out = ev.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_users"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .count()
    assert(out > 0)
    val m = obs.get
    // the observation saw the FULL pre-filter relation, in the same job
    assert(m("n_rows") === 1000L) // sf0.001 events row count
    assert(m("null_users") === 0L)
    assert(m("min_id") === 0L && m("max_id") === 999L)
  }

  test("streaming observe() surfaces per-batch metrics in query progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("event_id", "event_type")
      .observe("ingest", count(lit(1)).as("n_in"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_err"))
      .filter(col("event_type") =!= "error")
      .writeStream.format("memory").queryName("obs_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, "view"), (2L, "error"), (3L, "click"))
      q.processAllAvailable()
      val p = q.recentProgress.filter(_.observedMetrics.containsKey("ingest"))
      assert(p.nonEmpty, "no progress carried the observation")
      val row = p.last.observedMetrics.get("ingest")
      // pre-filter truth per batch: 3 in, 1 error — even though the sink
      // only received 2 rows (the dead-letter accounting pattern)
      assert(row.getAs[Long]("n_in") === 3L)
      assert(row.getAs[Long]("n_err") === 1L)
      assert(spark.table("obs_stream").count() === 2L)
    } finally q.stop()
  }
}
