package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.stream.StreamSessions

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String)

case class EvV(event_id: Long, ts: java.sql.Timestamp, value: Double)

/** Batch ≡ streaming equivalence on replayed fixtures (SURVEY §5.3 /
  * §7.5.5): the same session_window aggregation must produce the same
  * sessions whether the events arrive as a table or as a stream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(): Seq[Ev] = {
    // 3 users x 3 sessions x 4 hits, gaps well clear of the boundary
    val base = ts("2015-07-22 09:00:00").getTime
    (for {
      u <- 0 until 3
      s <- 0 until 3
      h <- 0 until 4
    } yield {
      val t = base + u * 1000L + s * 40 * 60 * 1000L + h * 60 * 1000L
      Ev(u * 100L + s * 10 + h, new java.sql.Timestamp(t), u.toLong,
        if (h % 2 == 0) "view" else "click")
    }) :+
      // watermark pusher: a far-future event so every real session closes
      Ev(9999L, new java.sql.Timestamp(base + 7L * 24 * 3600 * 1000), 999L, "view")
  }

  test("streaming session_window equals batch session_window") {
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents()
    val ms = MemoryStream[Ev]
    ms.addData(events)
    val q = StreamSessions.sessionize(ms.toDF())
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Append).start()
    try { q.processAllAvailable() } finally q.stop()

    val streamed = spark.table("stream_sessions")
      .filter(col("user_id") =!= 999L)
      .select("user_id", "first_hit_us", "last_hit_us", "hit_count")
      .orderBy("user_id", "first_hit_us").collect()

    val batch = events.toDF()
      .filter(col("user_id") =!= 999L)
      .groupBy(col("user_id"), session_window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("hit_count"),
        min(unix_micros(col("ts"))).as("first_hit_us"),
        max(unix_micros(col("ts"))).as("last_hit_us"))
      .select("user_id", "first_hit_us", "last_hit_us", "hit_count")
      .orderBy("user_id", "first_hit_us").collect()

    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.length === 9, "3 users x 3 sessions")
  }

  test("chained windowed aggs: two state stores, rollup gated by watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val src = ms.toDF().toDF("user_id", "ts")
    val lvl1 = src.withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val hourly = lvl1
      .groupBy(window(window_time(col("window")), "1 hour"))
      .agg(count(lit(1)).as("n_user_buckets"), sum(col("n")).as("n_events"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("n_user_buckets"), col("n_events"))
    val q = hourly.writeStream.format("memory").queryName("chained_mem")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 10: user 1 has buckets 10:00(2 hits) + 10:15(1); user 2 one
      ms.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")),
        (1L, ts("2024-01-01 10:15:00")), (2L, ts("2024-01-01 10:40:00")))
      q.processAllAvailable()
      assert(spark.table("chained_mem").count() === 0,
        "hour emitted before the watermark passed its end")
      // advance the watermark past 11:00 → hour 10 finalizes end-to-end
      ms.addData((3L, ts("2024-01-01 12:05:00")))
      q.processAllAvailable()
      ms.addData((3L, ts("2024-01-01 12:06:00")))
      q.processAllAvailable()
      val rows = spark.table("chained_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val hour10 = ts("2024-01-01 10:00:00").getTime * 1000L
      assert(rows === Seq((hour10, 3L, 4L)),
        s"unexpected chained emission: $rows")
      // the defining property: ONE query, TWO stateful operators
      assert(q.lastProgress.stateOperators.length === 2,
        "chained aggregation did not run as two stateful operators")
    } finally q.stop()
  }

  test("q_stream_chained equals the batch two-level rollup under the cutoff") {
    val streamed = graft.stream.StreamQueries.streamChained(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables(spark, sf001, "events")
    val wmUs = ev.agg(expr("max(unix_micros(ts)) div 1000 * 1000"))
      .head().getLong(0)
    val batch = ev
      .groupBy(expr("unix_micros(ts) div 600000000").as("bkt"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hr", expr("bkt div 6"))
      .filter((col("hr") + 1L) * 3600000000L <= wmUs)
      .groupBy(col("hr"))
      .agg(count(lit(1)).as("nb"), sum(col("n")).as("ne"), max(col("n")).as("mx"))
      .select((col("hr") * 3600000000L).as("hour_us"), col("nb"), col("ne"), col("mx"))
      .orderBy(col("hour_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("late data beyond watermark is dropped from streaming per-minute load") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2015-07-22 09:00:00").getTime
    val ms = MemoryStream[Ev]
    val q = StreamSessions.loadPerMinute(ms.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("stream_load")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData(Ev(1, new java.sql.Timestamp(base), 1, "view"))
      q.processAllAvailable()
      // advance watermark far past base
      ms.addData(Ev(2, new java.sql.Timestamp(base + 3600 * 1000), 1, "view"))
      q.processAllAvailable()
      // straggler: 1h late, beyond the 10-min watermark → dropped
      ms.addData(Ev(3, new java.sql.Timestamp(base + 1000), 1, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("stream_load").collect()
    val firstMinute = out.filter(_.getLong(0) === base * 1000L)
    assert(firstMinute.length === 1 && firstMinute.head.getLong(1) === 1L,
      s"late row must not re-open the closed minute: ${out.mkString(",")}")
  }

  test("dynamic-gap flatMapGroupsWithState sessionizer closes sessions correctly") {
    import graft.stream.DynamicSessions
    import graft.stream.DynamicSessions.Hit
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2015-07-22 09:00:00").getTime * 1000L // µs
    val min = 60L * 1000000
    def hit(u: Long, tUs: Long) = Hit(u, tUs, new java.sql.Timestamp(tUs / 1000))
    val ms = MemoryStream[Hit]
    // user 1 (gap 15 min): hits at 0,10min → one session; then 40min → second
    // user 10 (gap 5 min via defaultGapUs): hits at 0,10min → TWO sessions
    val hitsDf = ms.toDF().withWatermark("ts", "1 minute").as[Hit]
    val q = DynamicSessions.sessionize(hitsDf)
      .writeStream.format("memory").queryName("dyn_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData(
        hit(1, base), hit(1, base + 10 * min), hit(1, base + 40 * min),
        hit(10, base), hit(10, base + 10 * min))
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark → all sessions close
      ms.addData(hit(999, base + 100L * 24 * 60 * min))
      q.processAllAvailable()
      ms.addData(hit(998, base + 200L * 24 * 60 * min))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dyn_sessions")
      .filter(org.apache.spark.sql.functions.col("user_id") < 900)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      (1L, base, base + 10 * min, 2L),            // 10-min gap < 15-min gap
      (1L, base + 40 * min, base + 40 * min, 1L), // 30-min gap splits
      (10L, base, base, 1L),                      // fast user: 5-min gap
      (10L, base + 10 * min, base + 10 * min, 1L)))
  }

  test("dynamic-gap sessionizer: batch and streaming agree on real events") {
    import graft.stream.DynamicSessions
    import graft.stream.DynamicSessions.Hit
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables(spark, sf001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => Hit(r.getLong(0), r.getLong(1),
        new java.sql.Timestamp(r.getLong(1) / 1000)))
    val ms = MemoryStream[Hit]
    val q = DynamicSessions.sessionize(
        ms.toDF().withWatermark("ts", "1 minute").as[Hit])
      .writeStream.format("memory").queryName("dyn_events")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData(ev.toSeq)
      q.processAllAvailable()
      val far = ev.map(_.ts_us).max + 365L * 24 * 3600 * 1000000
      ms.addData(Hit(999999L, far, new java.sql.Timestamp(far / 1000)))
      q.processAllAvailable()
      ms.addData(Hit(999998L, far + 1000000, new java.sql.Timestamp(far / 1000 + 1000)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dyn_events")
      .filter(col("user_id") < 999000L)
      .select("user_id", "session_start_us", "session_end_us", "hit_count")
      .orderBy("user_id", "session_start_us").collect()
    val batch = graft.ops.SessionQueries.sessionizeDynamic(spark, sf001)
      .select("user_id", "session_start_us", "session_end_us", "hit_count")
      .orderBy("user_id", "session_start_us").collect()
    assert(streamed.length === batch.length,
      s"stream=${streamed.length} batch=${batch.length}")
    assert(streamed.toSeq === batch.toSeq)
  }

  test("transformWithState keeps running per-user totals across micro-batches") {
    import graft.stream.ActivityProcessor
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Double)]
      val q = ActivityProcessor.runningTotals(ms.toDS())
        .writeStream.format("memory").queryName("tws_totals")
        .outputMode(OutputMode.Update).start()
      try {
        ms.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
        q.processAllAvailable()
        ms.addData((1L, 2.5), (2L, 1.0)) // state must carry over
        q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("tws_totals").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(last(1L) === (1L, 3L, 17.5))
      assert(last(2L) === (2L, 2L, 2.0))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState ListState keeps a bounded last-k trail per user") {
    import graft.stream.RecentEvents
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, String)]
      val q = RecentEvents.lastK(ms.toDS(), k = 3)
        .writeStream.format("memory").queryName("tws_recent")
        .outputMode(OutputMode.Update).start()
      try {
        ms.addData((1L, "view"), (1L, "click"), (2L, "view"))
        q.processAllAvailable()
        ms.addData((1L, "purchase"), (1L, "error")) // must trim to last 3
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_recent").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // batch 1 emissions
      assert(rows.contains((1L, "view>click")))
      assert(rows.contains((2L, "view")))
      // batch 2: user 1's trail is the TRIMMED last 3 across batches
      assert(rows.contains((1L, "click>purchase>error")))
      assert(!rows.exists(_._2.contains("view>click>purchase")),
        "state was not trimmed to k")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState tracks per-user type counts across batches") {
    import graft.stream.TypeCounts
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, String)]
      val q = TypeCounts.dominantType(ms.toDS())
        .writeStream.format("memory").queryName("tws_dominant")
        .outputMode(OutputMode.Update).start()
      try {
        ms.addData((1L, "view"), (1L, "view"), (1L, "click"))
        q.processAllAvailable()
        // clicks catch up: 2-2 tie must break to 'click' (lexicographic)
        ms.addData((1L, "click"))
        q.processAllAvailable()
        // and overtake
        ms.addData((1L, "click"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_dominant").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.contains((1L, "view", 2L)))   // batch 1
      assert(rows.contains((1L, "click", 2L)))  // batch 2: deterministic tie
      assert(rows.contains((1L, "click", 3L)))  // batch 3: map state carried
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timers close sessions when watermark passes") {
    import graft.stream.SessionCloser
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, java.sql.Timestamp)]
      val gapMs = 15 * 60 * 1000L
      val q = SessionCloser.closedSessions(ms.toDS(), gapMs)
        .writeStream.format("memory").queryName("tws_closed")
        .outputMode(OutputMode.Append).start()
      try {
        // user 1: two hits; user 2: one hit — no closures yet
        ms.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")),
          (2L, ts("2024-01-01 10:10:00")))
        q.processAllAvailable()
        assert(spark.table("tws_closed").count() === 0)
        // watermark jumps past 10:05+15m → user 1's timer fires; user 2's
        // (10:10+15m = 10:25) does not
        ms.addData((3L, ts("2024-01-01 10:21:00")))
        q.processAllAvailable()
        // one more micro-batch so the timer-emitted rows reach the sink
        ms.addData((3L, ts("2024-01-01 10:21:30")))
        q.processAllAvailable()
        val closed = spark.table("tws_closed").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(closed.contains(
          (1L, ts("2024-01-01 10:20:00").getTime, 2L)),
          s"user 1 session not closed: ${closed.mkString(",")}")
        assert(!closed.exists(_._1 == 2L), "user 2 closed too early")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("file-based streaming source: readStream over parquet equals batch") {
    // the production shape: a directory of parquet files consumed as a
    // stream (new files picked up per micro-batch)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val batchDf = Tables(spark, sf001, "events").select("event_id", "ts", "user_id")
    batchDf.write.mode("overwrite").parquet(dir)
    val streamDf = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
    val q = graft.stream.StreamSessions.loadPerMinute(streamDf, watermark = "0 seconds")
      .writeStream.format("memory").queryName("file_stream_load")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("file_stream_load")
      .orderBy("minute_us").collect()
    val batch = batchDf
      .groupBy(unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("requests"))
      .orderBy("minute_us").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming value histogram: running bucket counts equal the batch histogram") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2015-07-22 09:00:00")
    val values = Seq(10.0, 25.0, 60.0, 75.0, 120.0, 9999.0, 470.0)
    val ms = MemoryStream[EvV]
    val q = StreamSessions.valueHistogram(ms.toDF())
      .writeStream.format("memory").queryName("stream_hist")
      .outputMode(OutputMode.Complete).start()
    try {
      // two micro-batches: counts must accumulate across them
      ms.addData(values.take(4).zipWithIndex.map { case (v, i) => EvV(i, base, v) })
      q.processAllAvailable()
      ms.addData(values.drop(4).zipWithIndex.map { case (v, i) => EvV(100 + i, base, v) })
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_hist")
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === Seq((0L, 2L), (1L, 2L), (2L, 1L), (9L, 2L)),
      "two width-50 buckets of 2, one of 1, and the clamped tail holding 9999 and 470")
  }

  test("streaming Misra-Gries heavy hitters accumulate across micro-batches") {
    // the custom mergeable sketch as a STREAMING aggregation: complete-mode
    // state is the bounded counter map, merged across micro-batches by the
    // Aggregator's merge path — the always-on frequent-items monitor shape.
    // 5 distinct keys <= capacity 8, so the running summary must stay EXACT
    // regardless of how the stream is batched.
    implicit val sqlCtx = spark.sqlContext
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.MisraGries(8),
      org.apache.spark.sql.Encoders.STRING)
    val data = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
      Seq("a", "b", "c")
    val ms = MemoryStream[String]
    val q = ms.toDF().select(col("value").as("k"))
      .agg(mg(col("k")).as("hh"))
      .select(explode(col("hh")).as(Seq("key", "est")))
      .writeStream.format("memory").queryName("stream_hh")
      .outputMode(OutputMode.Complete).start()
    try {
      ms.addData(data.take(20))
      q.processAllAvailable()
      ms.addData(data.drop(20))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_hh").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(streamed === truth)
  }

  test("Trigger.AvailableNow drains a backfill in rate-limited batches then stops") {
    // the bounded-backfill mode: process everything currently in the
    // source — throttled by maxFilesPerTrigger so one giant directory
    // does not become one giant micro-batch — then terminate on its own.
    // At scale this is how a streaming pipeline replays history with the
    // same code and bounded per-batch memory, no manual stop.
    val dir = java.nio.file.Files.createTempDirectory("graft_avail_now").toString
    val ev = Tables(spark, sf001, "events").select("event_id", "ts", "user_id")
    // several files so the 1-file-per-trigger limit forces multiple batches
    ev.repartition(4).write.mode("overwrite").parquet(dir)
    val streamDf = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    var batches = 0
    val q = streamDf.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (df.count() > 0) batches += 1; ()
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query should self-terminate")
    assert(batches > 1, s"maxFilesPerTrigger=1 over 4 files should take >1 batch, got $batches")
  }

  test("stream-stream view->click attribution equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2015-07-22 09:00:00").getTime
    def ev(id: Long, offsetSec: Long, user: Long, typ: String) =
      Ev(id, new java.sql.Timestamp(base + offsetSec * 1000), user, typ)
    val views = Seq(
      ev(1, 0, 1, "view"), ev(2, 600, 1, "view"),   // u1: two views, 10 min apart
      ev(3, 0, 2, "view"),                          // u2: one view
      ev(4, 0, 3, "view"),                          // u3: view, click too late
      // watermark pusher closes all windows
      ev(99, 7200, 999, "view"))
    val clicks = Seq(
      ev(11, 120, 1, "click"),  // joins view 1 only (within 5 min)
      ev(12, 660, 1, "click"),  // joins view 2 only (11 min after view 1)
      ev(13, 299, 2, "click"),  // boundary: 4:59 after view 3 — joins
      ev(14, 301, 3, "click"),  // boundary: 5:01 after view 4 — no join
      ev(98, 7200, 998, "click"))
    val msV = MemoryStream[Ev]
    val msC = MemoryStream[Ev]
    val q = graft.stream.StreamJoins
      .viewClickAttribution(msV.toDF(), msC.toDF())
      .writeStream.format("memory").queryName("stream_attr")
      .outputMode(OutputMode.Append).start()
    try {
      msV.addData(views)
      msC.addData(clicks)
      q.processAllAvailable()
    } finally q.stop()

    val cols = Seq("user_id", "view_id", "click_id", "lag_us")
    val streamed = spark.table("stream_attr")
      .select(cols.head, cols.tail: _*)
      .orderBy(cols.map(col): _*).collect()
    // identical code path on batch inputs (watermark is a no-op in batch)
    val batch = graft.stream.StreamJoins
      .viewClickAttribution(views.toDF(), clicks.toDF())
      .select(cols.head, cols.tail: _*)
      .orderBy(cols.map(col): _*).collect()

    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 11L), (2L, 12L), (3L, 13L)),
      "boundary: click at +4:59 attributes, +5:01 does not")
  }

  test("left-outer stream-stream join emits unmatched views after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2015-07-22 09:00:00").getTime
    def ev(id: Long, offsetSec: Long, user: Long, typ: String) =
      Ev(id, new java.sql.Timestamp(base + offsetSec * 1000), user, typ)
    val msV = MemoryStream[Ev]
    val msC = MemoryStream[Ev]
    val q = graft.stream.StreamJoins
      .viewClickAttribution(msV.toDF(), msC.toDF(), joinType = "leftOuter")
      .writeStream.format("memory").queryName("stream_attr_outer")
      .outputMode(OutputMode.Append).start()
    try {
      msV.addData(
        ev(1, 0, 1, "view"),   // converts: click at +2 min
        ev(2, 0, 2, "view"))   // never clicked -> null emission
      msC.addData(ev(11, 120, 1, "click"))
      q.processAllAvailable()
      // watermark pushers on BOTH sides: the null row for view 2 may only
      // be emitted once the click watermark passes view_ts + horizon
      msV.addData(ev(99, 7200, 999, "view"))
      msC.addData(ev(98, 7200, 998, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("stream_attr_outer")
      .filter(col("user_id") < 900)
      .select("view_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows === Set((1L, 11L), (2L, -1L)),
      "matched view joins its click; unmatched view emits null after watermark")
  }

  test("stream-static join enriches a stream with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2015-07-22 09:00:00").getTime
    // static dim: event_type -> weight (broadcast per micro-batch; no
    // watermark needed on the static side)
    val dim = Seq(("view", 1), ("click", 5)).toDF("event_type", "weight")
    val ms = MemoryStream[Ev]
    val enriched = ms.toDF().join(dim, Seq("event_type"))
      .groupBy(col("user_id"))
      .agg(sum(col("weight")).as("score"))
    val q = enriched.writeStream.format("memory").queryName("stream_enriched")
      .outputMode(OutputMode.Complete).start()
    try {
      ms.addData(
        Ev(1, new java.sql.Timestamp(base), 1, "view"),
        Ev(2, new java.sql.Timestamp(base + 1000), 1, "click"),
        Ev(3, new java.sql.Timestamp(base + 2000), 2, "view"),
        Ev(4, new java.sql.Timestamp(base + 3000), 2, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_enriched")
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 6L), (2L, 2L)))
  }

  test("restart from checkpoint recovers aggregation state without reprocessing") {
    // the operational contract a 24/7 pipeline stands on: after a stop
    // (deploy, crash), a NEW query started on the same checkpoint must
    // (a) resume from committed source offsets — batch-1 rows are NOT
    // read again (asserted via numInputRows of the restarted query) — and
    // (b) still carry batch-1 counts in its state store.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val ms = MemoryStream[String]
    def start(name: String) = ms.toDF().groupBy(col("value")).count()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete).start()
    val q1 = start("ckpt_run1")
    try {
      ms.addData("a", "a", "b")
      q1.processAllAvailable()
    } finally q1.stop()
    ms.addData("a", "c")
    val q2 = start("ckpt_run2")
    try {
      q2.processAllAvailable()
      val replayed = q2.recentProgress.map(_.numInputRows).sum
      assert(replayed === 2,
        s"restart must resume from committed offsets (only batch 2's 2 rows), read $replayed")
    } finally q2.stop()
    val counts = spark.table("ckpt_run2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
      "batch-1 state must survive the restart")
  }

  test("stream-static left-anti join dedups arriving docs against the corpus") {
    // the streaming twin of q_incremental_dedup: content hashes of the
    // standing corpus are the static side; arriving documents whose
    // xxhash64(text) already exists are dropped in-flight. left_anti is a
    // supported stream-static join type, so ingest dedup needs no state
    // store at all — the corpus side is just a (re-read-per-batch) table.
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.createDataset(Seq("seen one", "seen two")).toDF("text")
      .select(xxhash64(col("text")).as("h"))
    val ms = MemoryStream[(Long, String)]
    val dedup = ms.toDF().toDF("id", "text")
      .withColumn("h", xxhash64(col("text")))
      .join(corpus, Seq("h"), "left_anti")
    val q = dedup.writeStream.format("memory").queryName("stream_ingest")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData((1L, "seen one"), (2L, "novel alpha"))
      q.processAllAvailable()
      ms.addData((3L, "seen two"), (4L, "novel beta"), (5L, "novel alpha"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("stream_ingest").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    // 5 passes too: stream-side dedup across batches is a separate concern
    // (dropDuplicatesWithinWatermark, pinned below) — anti join only
    // filters against the STATIC corpus
    assert(out === Seq(2L, 4L, 5L))
  }

  test("dropDuplicatesWithinWatermark dedups replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2015-07-22 09:00:00").getTime
    val ms = MemoryStream[Ev]
    val q = StreamSessions.dedupEvents(ms.toDF())
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData(
        Ev(1, new java.sql.Timestamp(base), 1, "view"),
        Ev(1, new java.sql.Timestamp(base + 5), 1, "view"), // replay
        Ev(2, new java.sql.Timestamp(base + 10), 1, "view"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("stream_dedup").count() === 2)
  }

  test("foreachBatch parquet sink is idempotent under batch redelivery") {
    // Structured Streaming guarantees foreachBatch AT-LEAST-once delivery:
    // after a failure the last batch is re-run with the SAME batchId. The
    // exactly-once sink pattern is therefore "write to a path keyed by
    // batchId in overwrite mode" — redelivery lands on the same path and
    // replaces, never appends. The test writes every batch TWICE to
    // simulate redelivery and asserts zero duplication.
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val base = ts("2015-07-22 09:00:00").getTime
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val path = s"$out/batch_id=$id"
        df.write.mode("overwrite").parquet(path)
        df.write.mode("overwrite").parquet(path) // simulated redelivery
        ()
      }
      .start()
    try {
      ms.addData(Ev(1, new java.sql.Timestamp(base), 1, "view"),
        Ev(2, new java.sql.Timestamp(base + 1000), 1, "click"))
      q.processAllAvailable()
      ms.addData(Ev(3, new java.sql.Timestamp(base + 2000), 2, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(out) // batch_id becomes a partition column
    assert(back.count() === 3)
    assert(back.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(back.select("batch_id").distinct().count() === 2, "two micro-batches")
  }

  test("driver streaming query (q_stream_sessionize) equals batch session_window") {
    import graft.stream.StreamQueries
    // the oracle-gated streaming replay must equal the same session_window
    // aggregation run as a plain batch query over the identical events
    val st = StreamQueries.streamSessionize(spark, sf001).collect().toSeq
    val batch = Tables(spark, sf001, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "15 minutes"))
      .agg(min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("hit_count"),
        countDistinct(col("event_type")).as("unique_types"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("hit_count"), col("unique_types"))
      .orderBy(col("user_id"), col("session_start_us")).collect().toSeq
    assert(st === batch)
    assert(st.size === 968) // independent DuckDB literal over sf0.001
  }

  test("driver streaming query (q_stream_enrich) equals the batch join+window") {
    import graft.stream.StreamQueries
    // the stream-static join + tumbling-window replay must equal the same
    // plan run as a plain batch query over the identical inputs
    val st = StreamQueries.streamEnrich(spark, sf001).collect().toSeq
    val dim = Tables(spark, sf001, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_nationkey").cast("long").as("nation"))
    val batch = Tables(spark, sf001, "events")
      .join(dim, "user_id")
      .groupBy(col("nation"), window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .select(col("nation"), unix_micros(col("window.start")).as("window_us"),
        col("event_type"), col("n_events"), col("first_us"), col("last_us"))
      .orderBy(col("nation"), col("window_us"), col("event_type"))
      .collect().toSeq
    assert(st === batch)
    assert(st.size === 988) // independent DuckDB literal over sf0.001
    assert(st.map(_.getLong(3)).sum === 1000L) // every event joins a customer
  }

  test("driver streaming query (q_stream_dedup) removes cross-batch duplicates") {
    import graft.stream.StreamQueries
    // the at-least-once replay delivers 1000 + 334 rows (every third event
    // twice, the copies in a later micro-batch); the state-store dedup must
    // restore the original relation's exact integer aggregates
    val st = StreamQueries.streamDedup(spark, sf001).collect().toSeq
    val batch = Tables(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_ids"),
        sum(col("user_id")).as("sum_users"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type")).collect().toSeq
    assert(st === batch)
    // had ANY duplicate survived, the total would exceed the corpus size
    assert(st.map(_.getLong(1)).sum === 1000L)
  }

  test("driver streaming query (q_stream_join) equals the batch interval self-join") {
    import graft.stream.StreamQueries
    // views arrive in micro-batch 0, purchases in micro-batch 1, so every
    // emitted pair was matched through the join state store across batches
    val st = StreamQueries.streamJoin(spark, sf001).collect().toSeq
    val ev = Tables(spark, sf001, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("buy_user"),
        col("ts").as("buy_ts"))
    val batch = v.join(b,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("user_id"), col("view_id"), col("buy_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("buy_ts")).as("buy_us"))
      .orderBy(col("user_id"), col("view_id"), col("buy_id"))
      .collect().toSeq
    assert(st === batch)
    assert(st.size === 22) // independent DuckDB literal over sf0.001
  }

  test("driver streaming query (q_stream_late) drops exactly the watermark-closed late rows") {
    import graft.stream.StreamQueries
    // batch 0 = on-time even event_ids (establishes the cutoff), batch 1 =
    // on-time odd, batch 2 = every fifth event, judged against batch 0's
    // watermark: max(batch-0 ts) truncated to ms, minus 6 h. At sf0.001
    // exactly 2 of the 200 late rows have a 1-hour window still open.
    val st = StreamQueries.streamLate(spark, sf001).collect().toSeq
    assert(st.size === 711) // independent DuckDB literal over sf0.001
    assert(st.map(_.getLong(2)).sum === 802L) // 800 on-time + 2 accepted late
    // re-derive relationally with the documented cutoff
    val ev = Tables(spark, sf001, "events")
    val onTime = ev.filter(col("event_id") % 5 =!= 0)
    val cutoff = onTime.filter(col("event_id") % 2 === 0)
      .agg((floor(max(unix_micros(col("ts"))) / 1000L) * 1000L -
        21600000000L).as("w"))
    val okLate = ev.filter(col("event_id") % 5 === 0).crossJoin(cutoff)
      .filter((floor(unix_micros(col("ts")) / 3600000000L) + 1) * 3600000000L > col("w"))
      .drop("w")
    val batch = onTime.select(col("event_id"), col("ts"), col("event_type"))
      .union(okLate.select(col("event_id"), col("ts"), col("event_type")))
      .groupBy((floor(unix_micros(col("ts")) / 3600000000L) * 3600000000L).as("window_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_ids"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("window_us"), col("event_type"))
      .collect().toSeq
    assert(st === batch)
  }

  test("driver streaming query (q_stream_state) carries state across three micro-batches") {
    import graft.stream.StreamQueries
    // event_id mod 3 splits every user's rows across the three files, so
    // the per-user aggregates only match the plain GROUP BY if the state
    // store's carried value was folded correctly in every batch
    val st = StreamQueries.streamState(spark, sf001).collect().toSeq
    val batch = Tables(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_ids"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .orderBy(col("user_id")).collect().toSeq
    assert(st === batch)
    assert(st.size === 15) // independent DuckDB literal over sf0.001
    assert(st.map(_.getLong(1)).sum === 1000L)
  }

  test("driver state-store read (q_stream_state_read) reconstructs the batch GROUP BY") {
    import graft.stream.StreamQueries
    // the statestore batch source reads the checkpoint the drained query
    // left behind; the persisted state — not the emitted rows — must equal
    // the relational aggregate
    val st = StreamQueries.streamStateRead(spark, sf001).collect().toSeq
    val batch = Tables(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_ids"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .orderBy(col("user_id")).collect().toSeq
    assert(st === batch)
    assert(st.size === 15) // independent DuckDB literal over sf0.001
    assert(st.map(_.getLong(1)).sum === 1000L)
  }

  test("state-metadata source exposes a checkpoint's operator and partitioning") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val chk = java.nio.file.Files
      .createTempDirectory("graft_statemeta_").toString
    val ms = MemoryStream[Ev]
    ms.addData(mkEvents())
    val q = ms.toDF().groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("statemeta_probe")
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", chk)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val meta = spark.read.format("state-metadata").load(chk)
      .select("operatorId", "operatorName", "stateStoreName", "numPartitions")
      .collect()
    assert(meta.length === 1)
    assert(meta(0).getLong(0) === 0L)
    assert(meta(0).getString(1) === "stateStoreSave")
    assert(meta(0).getString(2) === "default")
    // the session's shuffle-partition setting is the state partition count
    assert(meta(0).getInt(3) ===
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // and the statestore source re-reads exactly the per-user counts —
    // positionally: the value row keeps the BUFFER field names (`count`),
    // not the query's output aliases
    val st = spark.read.format("statestore").load(chk)
    val valField = st.select(col("value.*")).columns.head
    val got = st.select(col("key.user_id"),
        col(s"value.`$valField`").cast("long").as("n"))
      .orderBy("user_id").collect().toSeq
    val want = mkEvents().toDF().groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).orderBy("user_id").collect().toSeq
    assert(got === want)
  }

  test("driver streaming query (q_stream_tws) equals the batch per-user dominant type") {
    import graft.stream.StreamQueries
    // transformWithState MapState counts on RocksDB, accumulated across
    // three micro-batches, must reproduce the relational argmax exactly
    val st = StreamQueries.streamTypedState(spark, sf001).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("n").desc, col("event_type"))
    val batch = Tables(spark, sf001, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("n"))
      .orderBy(col("user_id")).collect().toSeq
    assert(st === batch)
    assert(st.size === 15) // independent DuckDB literal over sf0.001
    assert(st.map(_.getLong(2)).sum === 258L)
    // the provider override must not leak into the session
    assert(spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").forall(
      !_.contains("RocksDB")))
  }

  test("driver streaming query (q_stream_timer) closes exactly the watermark-passed users") {
    import graft.stream.StreamQueries
    // rows are processed before expired timers in a batch, so a user
    // active in the second half re-arms past batch 0's watermark and
    // closes exactly once with its FULL history; only users whose last
    // hit + 15 min lies beyond the final watermark stay open
    val st = StreamQueries.streamTimer(spark, sf001).collect().toSeq
    val per = Tables(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hits"),
        max(floor(unix_micros(col("ts")) / 1000L)).as("last_ms"))
    val wm = per.agg(max(col("last_ms")).as("w"))
    val batch = per.crossJoin(broadcast(wm))
      .filter(col("last_ms") + 900000L < col("w"))
      .select(col("user_id"), (col("last_ms") + 900000L).as("close_at_ms"),
        col("n_hits"))
      .orderBy(col("user_id"), col("close_at_ms")).collect().toSeq
    assert(st === batch)
    assert(st.size === 14) // independent DuckDB literal: 15 users, 1 open
    // every close carries the user's complete event count — a mid-stream
    // double-close (timers-before-rows) would split these totals
    assert(st.map(_.getLong(0)).distinct.size === st.size)
  }

  test("driver streaming query (q_stream_cdc) merges to the relational last-write-wins state") {
    import graft.stream.StreamQueries
    // the change stream arrives in non-time order across three batches;
    // the versioned foreachBatch merge must still land on the per-user
    // (ts, event_id) argmax — arrival order is compared, never trusted
    val st = StreamQueries.streamCdc(spark, sf001).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("last_us").desc, col("last_event_id").desc)
    val batch = Tables(spark, sf001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("last_us"),
        col("event_id").as("last_event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn").orderBy(col("user_id")).collect().toSeq
    assert(st === batch)
    assert(st.size === 15) // independent DuckDB literal over sf0.001
  }

  test("driver streaming query (q_stream_v2src) equals the batch read of the custom source") {
    import graft.stream.StreamQueries
    // the rate-limited micro-batch drain of the DSv2 generator must land
    // on the same aggregates as one batch read of the identical source
    val st = StreamQueries.streamV2Source(spark, sf001).collect().toSeq
    val batch = spark.read.format("graft.sources.EventsSource")
      .option("rows", 20000L).option("partitions", 8).load()
      .withColumn("cents", (col("event_id") * 7919L) % 10000L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_ids"),
        sum(col("user_id")).as("sum_users"), sum(col("cents")).as("sum_cents"),
        min(col("ts_us")).as("min_us"), max(col("ts_us")).as("max_us"))
      .orderBy(col("event_type")).collect().toSeq
    assert(st === batch)
    assert(st.size === 5)
    assert(st.map(_.getLong(1)).sum === 20000L)
    assert(st.map(_.getLong(2)).sum === 20000L * 19999L / 2)
  }

  test("driver streaming query (q_stream_sliding) equals the batch sliding-window agg") {
    import graft.stream.StreamQueries
    val st = StreamQueries.streamSliding(spark, sf001).collect().toSeq
    val batch = Tables(spark, sf001, "events")
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_ids"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .select(unix_micros(col("window.start")).as("window_us"),
        col("event_type"), col("n_events"), col("sum_ids"),
        col("min_id"), col("max_id"))
      .orderBy(col("window_us"), col("event_type")).collect().toSeq
    assert(st === batch)
    assert(st.size === 3011) // independent DuckDB literal over sf0.001
    // every event lands in exactly four overlapping windows
    assert(st.map(_.getLong(2)).sum === 4000L)
  }

  test("driver streaming left-outer join emits nulls only beyond the watermark") {
    import graft.stream.StreamQueries
    val rows = StreamQueries.streamOuter(spark, sf001).collect()
    // independent DuckDB literals over sf0.001: 22 matched pairs, 157
    // watermark-proven null emissions, and (188 views total) 9 views in
    // the final-watermark tail provably WITHHELD
    assert(rows.length === 179)
    assert(rows.count(_.isNullAt(2)) === 157)
    val views = Tables(spark, sf001, "events")
      .filter(col("event_type") === "view").count()
    assert(views === 188L)
    val matchedViews = rows.filter(!_.isNullAt(2)).map(_.getLong(1)).distinct
    assert(views - matchedViews.length - 157 === 9L)
  }

  test("driver bounded-state dedup (withinWatermark) restores the exact relation") {
    import graft.stream.StreamQueries
    val st = StreamQueries.streamDedupWm(spark, sf001).collect().toSeq
    val batch = Tables(spark, sf001, "events")
      .groupBy(col("event_type"),
        floor(unix_micros(col("ts")) / lit(7L * 86400L * 1000000L)).as("wk"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_ids"),
        sum(col("user_id")).as("sum_users"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"), col("wk")).collect().toSeq
    assert(st === batch)
    assert(st.size === 25) // independent DuckDB literal over sf0.001
    // both replay halves actually re-delivered rows: the tail (state-hit)
    // and the stale half (late-filtered) each cover > 0 source rows
    val ev = Tables(spark, sf001, "events")
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    assert(ev.filter(unix_micros(col("ts")) >= maxUs - 6L * 86400000000L)
      .count() > 0)
    assert(ev.filter(unix_micros(col("ts")) < maxUs - 8L * 86400000000L)
      .count() > 0)
  }

  test("transformWithState TTL: value state survives within the TTL and resets after") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Long)]
      // ProcessingTime time mode keeps scheduling no-data batches (that is
      // how TTL/timers advance without input), so processAllAvailable never
      // observes a quiescent stream — throttle the trigger and poll the
      // sink for the expected emission count instead
      val q = graft.stream.ExpiringCounts
        .countsSinceActive(ms.toDS(), java.time.Duration.ofSeconds(8))
        .toDF().writeStream.format("memory").queryName("ttl_counts")
        .outputMode(OutputMode.Update)
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("200 milliseconds"))
        .start()
      def awaitRows(n: Long): Unit = {
        val deadline = System.nanoTime() + 120L * 1000000000L
        while (spark.table("ttl_counts").count() < n
            && System.nanoTime() < deadline) Thread.sleep(100)
        assert(spark.table("ttl_counts").count() >= n,
          s"sink never reached $n rows")
      }
      try {
        ms.addData((1L, 10L), (1L, 11L))
        awaitRows(1) // n = 2
        ms.addData((1L, 12L))
        awaitRows(2) // within TTL: state alive, n = 3 (8 s absorbs cold-start batch latency)
        Thread.sleep(10000) // let the 8 s TTL lapse (processing time)
        ms.addData((1L, 13L))
        awaitRows(3) // state expired: count restarts at 1
      } finally q.stop()
      val ns = spark.table("ttl_counts")
        .filter(col("user_id") === 1L).select("n_since_active")
        .collect().map(_.getLong(0)).toSeq
      assert(ns === Seq(2L, 3L, 1L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("checkpoint restart recovers the offset log and state store exactly") {
    // deterministic twin of the racy mid-drain q_stream_resume gate query:
    // phase A drains exactly files 0-1 (AvailableNow terminates at its
    // snapshot), files 2-3 arrive while the query is DOWN, and the phase-B
    // restart must (a) continue batch ids from the recovered offset log,
    // (b) read ONLY the new files, and (c) fold them into the recovered
    // aggregation state — exact batch counts, no timing race
    val work = java.nio.file.Files.createTempDirectory("graft_resume").toFile
    val replay = new java.io.File(work, "replay").getAbsolutePath
    val chk = new java.io.File(work, "chk").getAbsolutePath
    val out = new java.io.File(work, "out.parquet").getAbsolutePath
    val all = (0L until 1000L).map(i => (i, i % 7L))
    def shard(k: Int): Unit = {
      all.filter(_._1 % 4 == k).toDF("event_id", "user_id")
        .coalesce(1)
        .write.mode(if (k == 0) "overwrite" else "append").parquet(replay)
      // strictly increasing mtimes: FileStreamSource orders files by
      // ms-resolution mtime, and same-ms writes would tie
      for (f <- new java.io.File(replay).listFiles()
           if f.getName.startsWith("part-") && f.lastModified() > 1750000000000L)
        f.setLastModified(1700000000000L + k * 60000L)
    }
    def start() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(replay)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"event_id").as("s"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.coalesce(1).write.mode("overwrite").parquet(out)
      }.start()
    shard(0); shard(1)
    val q1 = start(); q1.awaitTermination()
    assert(q1.recentProgress.count(_.numInputRows > 0) === 2,
      "phase A = exactly one batch per file")
    shard(2); shard(3)
    val q2 = start(); q2.awaitTermination()
    val p2 = q2.recentProgress.filter(_.numInputRows > 0)
    assert(p2.length === 2, "restart processed ONLY the two new files")
    assert(p2.map(_.batchId).min === 2,
      "batch ids continue from the recovered offset log")
    assert(p2.map(_.numInputRows).sum === all.count(t => t._1 % 4 >= 2),
      "no phase-A row was re-read after restart")
    val fin = spark.read.parquet(out).orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = all.groupBy(_._2).map { case (u, xs) =>
      (u, xs.size.toLong, xs.map(_._1).sum) }.toSeq.sortBy(_._1)
    assert(fin === exp)
  }
}
