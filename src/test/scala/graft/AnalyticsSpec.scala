package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics

/** Semantics pins for the analytics operators on crafted rows — the DuckDB
  * oracle proves engine parity on the fixture tables; these prove the
  * DEFINITIONS are the intended ones (step ordering in the funnel, cohort
  * assignment, tail-bucket clamping) on inputs built to exercise each rule.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = "2015-07-22"

  // `Tables`' events path expects the driver fixtures' ns-precision INT64
  // `ts` (it computes `ts div 1000` then timestamp_micros) — crafted
  // fixtures must write the same shape: epoch-NANOSECOND longs.
  private def evDf(rows: (Long, String, String, Long)*) =
    rows.toDF("user_id", "time", "event_type", "event_id")
      .select(col("event_id"),
        (unix_micros(to_timestamp(col("time"))) * 1000).as("ts"),
        col("user_id"), col("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"))

  test("funnel counts only strictly ordered view->click->purchase steps") {
    // u1: full ordered funnel. u2: click BEFORE its first view — the click
    // must not count, so u2 converts to 'viewed' only. u3: purchase before
    // click — purchase must not count even though both event types exist.
    val ev = evDf(
      (1L, s"$day0 10:00:00", "view", 1L),
      (1L, s"$day0 10:05:00", "click", 2L),
      (1L, s"$day0 10:10:00", "purchase", 3L),
      (2L, s"$day0 09:00:00", "click", 4L),
      (2L, s"$day0 09:30:00", "view", 5L),
      (3L, s"$day0 08:00:00", "view", 6L),
      (3L, s"$day0 08:10:00", "purchase", 7L),
      (3L, s"$day0 08:20:00", "click", 8L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    ev.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.funnel(spark, tmp).collect().head
    assert(out.getAs[Long]("n_user_days") === 3)
    assert(out.getAs[Long]("n_viewed") === 3)
    assert(out.getAs[Long]("n_clicked") === 2)   // u1 + u3 (click after view)
    assert(out.getAs[Long]("n_purchased") === 1) // u1 only
  }

  test("intervalUnion merges overlapping 5-min intervals, keeps disjoint islands") {
    // u1: 10:00 and 10:02 overlap -> one island [10:00,10:07) = 420s;
    // 10:20 stands alone -> [10:20,10:25) = 300s. u2: single event.
    val ev = evDf(
      (1L, s"$day0 10:00:00", "view", 1L),
      (1L, s"$day0 10:02:00", "click", 2L),
      (1L, s"$day0 10:20:00", "view", 3L),
      (2L, s"$day0 12:00:00", "view", 4L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_iv").toString
    ev.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.intervalUnion(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((2L, 720000000L)))
    assert(out(2L) === ((1L, 300000000L)))
  }

  test("intervalUnion: an interval touching the running max exactly does not split") {
    // second interval starts EXACTLY at the first's end (10:05): st > prevMax
    // is false at equality, so [10:00,10:05) + [10:05,10:10) fuse into one
    // island of 600s — half-open adjacency merges, by design
    val ev = evDf(
      (1L, s"$day0 10:00:00", "view", 1L),
      (1L, s"$day0 10:05:00", "view", 2L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_iv2").toString
    ev.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.intervalUnion(spark, tmp).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L && out.head.getLong(2) === 600000000L)
  }

  test("funnel resets at day boundaries (user-day grain)") {
    // same user: view on day 1, click on day 2 — the day-2 click has no
    // same-day prior view, so no user-day converts past 'viewed'
    val ev = evDf(
      (1L, s"$day0 23:50:00", "view", 1L),
      (1L, "2015-07-23 00:10:00", "click", 2L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_funnel2").toString
    ev.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.funnel(spark, tmp).collect().head
    assert(out.getAs[Long]("n_user_days") === 2)
    assert(out.getAs[Long]("n_viewed") === 1)
    assert(out.getAs[Long]("n_clicked") === 0)
  }

  test("retention assigns each user to its first-seen day's cohort") {
    val ev = evDf(
      (1L, s"$day0 10:00:00", "view", 1L),       // u1 cohort day0
      (1L, "2015-07-24 10:00:00", "view", 2L),   // u1 active at offset 2
      (2L, "2015-07-23 10:00:00", "view", 3L),   // u2 cohort day1
      (2L, "2015-07-24 10:00:00", "view", 4L))   // u2 active at offset 1
    val tmp = java.nio.file.Files.createTempDirectory("graft_ret").toString
    ev.write.parquet(s"$tmp/events.parquet")
    val rows = Analytics.retention(spark, tmp)
      .select("cohort_day_us", "day_offset", "n_active")
      .as[(Long, Int, Long)].collect().toSeq
    assert(rows.length === 4)
    val byCohort = rows.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toSet).toMap
    val Seq(c0, c1) = byCohort.keys.toSeq.sorted
    assert(byCohort(c0) === Set(0 -> 1L, 2 -> 1L), "u1: day0 cohort, active offsets 0 and 2")
    assert(byCohort(c1) === Set(0 -> 1L, 1 -> 1L), "u2: day1 cohort, active offsets 0 and 1")
  }

  test("histogram clamps the overflow tail into the last bucket") {
    val ev = (Seq.fill(3)(25.0) ++ Seq(75.0, 9999.0, 460.0))
      .zipWithIndex.map { case (v, i) =>
        (i.toLong, ts(s"$day0 10:00:00").getTime * 1000000L, 1L, "view", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_hist").toString
    ev.write.parquet(s"$tmp/events.parquet")
    val rows = Analytics.valueHistogram(spark, tmp)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(rows(0L) === 3)
    assert(rows(1L) === 1)
    assert(rows(9L) === 2, "9999.0 and 460.0 both land in the tail bucket")
  }

  test("periodogram concentrates power at the true period of an impulse train") {
    // impulses every 60 minutes for 10 days: all cos/sin arguments at
    // period 60 are multiples of 2π → power = n² exactly (coherent sum);
    // the coprime control period (97) stays near zero (incoherent walk).
    val n = 240
    val minutes = (0 until n).map(i => i.toLong * 60).toDF("m")
    val rows = Analytics.periodogramOn(minutes, Seq(60, 97))
      .select("period", "power").as[(Int, Double)].collect().toMap
    assert(math.abs(rows(60) - n.toDouble * n) < 1e-3,
      s"coherent power should be n²=${n * n}, got ${rows(60)}")
    assert(rows(97) < n.toDouble,
      s"incoherent control should stay far below n², got ${rows(97)}")
  }

  test("twap weights by holding time, not event count") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_twap").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    // v=10 held 23h then v=100 held 1h: twap = (10·23 + 100)/24 = 13.75
    // while the naive event mean is 55
    val rows = Seq(
      (1L, "2024-01-05 00:00:00", 1L, "view", 10.0),
      (2L, "2024-01-05 23:00:00", 1L, "view", 100.0))
      .map { case (id, t, u, e, v) => (id, us(t), u, e, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val r = Analytics.twap(spark, tmp).collect().head
    assert(r.getDouble(r.fieldIndex("twap")) == 13.75)
    assert(r.getDouble(r.fieldIndex("event_mean")) == 55.0)
  }

  test("rank correlations are bounded and mutually consistent") {
    val r = Analytics.rankCorr(spark, sf001).collect().head
    val rho = r.getDouble(r.fieldIndex("spearman_rho"))
    val tau = r.getDouble(r.fieldIndex("kendall_tau"))
    assert(rho >= -1.0 && rho <= 1.0)
    assert(tau >= -1.0 && tau <= 1.0)
    // revenue and customer count are strongly linked per nation: both
    // statistics must agree on a clearly positive association
    assert(rho > 0.5 && tau > 0.3, s"rho=$rho tau=$tau")
    assert(r.getLong(r.fieldIndex("n_groups")) == 25L)
    spark.catalog.clearCache()
  }

  test("compaction plan conserves rows and strictly shrinks the file count") {
    val rows = Analytics.compactionPlan(spark, sf001).collect()
    assert(rows.nonEmpty)
    val totalRows = rows.map(_.getLong(rows.head.fieldIndex("n_rows"))).sum
    val nEvents = graft.Tables(spark, sf001, "events").count()
    assert(totalRows == nEvents, "every input row lands in exactly one group")
    val filesBefore = rows.head.getLong(rows.head.fieldIndex("files_before"))
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_files"))).sum
      == filesBefore)
    assert(rows.head.getLong(rows.head.fieldIndex("files_after"))
      < filesBefore, "compaction must reduce file count")
    spark.catalog.clearCache()
  }

  test("srm fires on a corrupted assignment and stays quiet on a clean one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_srm").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    // 30 users, ALL divisible by 3: observed ratio 1.0 vs design 1/3
    val rows = (1 to 30).map(i =>
      (i.toLong, us("2024-01-05 10:00:00") + i, i * 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val r = Analytics.srm(spark, tmp).collect().head
    assert(r.getDouble(r.fieldIndex("observed_ratio")) == 1.0)
    assert(r.getBoolean(r.fieldIndex("srm_detected")))
    assert(r.getDouble(r.fieldIndex("p_value")) < 0.001)
  }

  test("backtest: mape is the mean of the per-cutoff errors; trend beats naive here") {
    val rows = Analytics.backtest(spark, sf001).collect()
    assert(rows.nonEmpty)
    val mape = rows.head.getDouble(rows.head.fieldIndex("mape"))
    val apes = rows.map(_.getDouble(rows.head.fieldIndex("ape")))
    assert(math.abs(mape - apes.sum / apes.length) < 1e-4)
    assert(apes.forall(_ >= 0.0))
    // expanding-window trend should beat last-value naive on this
    // steadily-sized synthetic stream
    val mapeNaive = rows.head.getDouble(rows.head.fieldIndex("mape_naive"))
    assert(mape < mapeNaive, s"trend $mape vs naive $mapeNaive")
  }

  test("shapley attribution satisfies the efficiency axiom") {
    val rows = Analytics.shapleyAttribution(spark, sf001).collect()
    assert(rows.length == 4)
    val phiSum = rows.map(_.getDouble(rows.head.fieldIndex("shapley"))).sum
    val vFull = rows.head.getDouble(rows.head.fieldIndex("v_full"))
    val vEmpty = rows.head.getDouble(rows.head.fieldIndex("v_empty"))
    // Shapley efficiency: the values exactly split v(all) - v(empty)
    assert(math.abs(phiSum - (vFull - vEmpty)) < 4e-6,
      s"sum $phiSum vs ${vFull - vEmpty}")
    val shares = rows.map(_.getDouble(rows.head.fieldIndex("share"))).sum
    assert(math.abs(shares - 1.0) < 4e-6)
    spark.catalog.clearCache()
  }

  test("markov attribution: removal effect isolates the converting channel") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mkv").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    // user 1: view → purchase (converts); user 2: click → END.
    // Chain: p(START→view)=p(START→click)=.5, p(view→CONV)=1 → base=.5;
    // removing view kills ALL conversion (effect 1), removing click
    // changes nothing (effect 0); absent channels get effect 0.
    val rows = Seq(
      (1L, "2024-01-05 10:00:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-05 10:01:00", 1L, "purchase", 1.0, "{}"),
      (3L, "2024-01-05 10:00:00", 2L, "click", 1.0, "{}"))
      .map { case (id, t, u, e, v, p) => (id, us(t), u, e, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.markovAttribution(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("view").getDouble(out("view").fieldIndex("conv_base")) == 0.5)
    assert(out("view").getDouble(out("view").fieldIndex("removal_effect")) == 1.0)
    assert(out("click").getDouble(out("click").fieldIndex("removal_effect")) == 0.0)
    assert(out("signup").getDouble(out("signup").fieldIndex("removal_effect")) == 0.0)
    assert(out("view").getDouble(out("view").fieldIndex("attribution_share")) == 1.0)
    spark.catalog.clearCache()
  }

  test("als step strictly reduces rmse and matches the 1-rating closed form") {
    val rows = Analytics.alsStep(spark, sf001).collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    assert(r0.getDouble(r0.fieldIndex("rmse_after"))
      < r0.getDouble(r0.fieldIndex("rmse_before")),
      "one ALS half-step must fit better than zero factors")

    // closed-form cross-check on a 1-customer / 1-item corpus:
    // u = (vv' + lambda I)^-1 v r, computed independently in the JVM
    val tmp = java.nio.file.Files.createTempDirectory("graft_als").toString
    import spark.implicits._
    Seq((10L, 7L, "F", 1.0, ts("2024-01-05 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$tmp/orders.parquet")
    Seq((10L, 42L, 1L, 1, math.E - 1.0, 1.0, 0.0, 0.0, "N", "O",
      ts("2024-01-06 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$tmp/lineitem.parquet")
    def f(k: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"als$k-42".getBytes).map("%02x".format(_)).mkString.take(7)
      (java.lang.Long.parseLong(h, 16) % 2001 - 1000) / 1000.0
    }
    val (v1, v2) = (f(1), f(2))
    val r = math.log(1.0 + (math.E - 1.0)) // = 1 exactly up to libm
    val det = (v1 * v1 + 0.1) * (v2 * v2 + 0.1) - v1 * v2 * v1 * v2
    val eu1 = ((v2 * v2 + 0.1) * (v1 * r) - v1 * v2 * (v2 * r)) / det
    val eu2 = ((v1 * v1 + 0.1) * (v2 * r) - v1 * v2 * (v1 * r)) / det
    val out = Analytics.alsStep(spark, tmp).collect().head
    assert(math.abs(out.getDouble(out.fieldIndex("u1")) - eu1) < 1e-6)
    assert(math.abs(out.getDouble(out.fieldIndex("u2")) - eu2) < 1e-6)
    spark.catalog.clearCache()
  }

  test("cuped: a perfectly predictive covariate removes all variance") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cuped").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    // y = 2x exactly per user → theta = 2, adjusted variance 0, 100% win
    val rows = Seq(
      (1L, "2024-01-05 10:00:00", 1L, 1.0), (2L, "2024-01-20 10:00:00", 1L, 2.0),
      (3L, "2024-01-05 10:00:00", 2L, 2.0), (4L, "2024-01-20 10:00:00", 2L, 4.0),
      (5L, "2024-01-05 10:00:00", 3L, 3.0), (6L, "2024-01-20 10:00:00", 3L, 6.0))
      .map { case (id, t, u, v) => (id, us(t), u, "purchase", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val r = Analytics.cuped(spark, tmp).collect().head
    assert(r.getDouble(r.fieldIndex("theta")) == 2.0)
    assert(r.getDouble(r.fieldIndex("var_adj")) == 0.0)
    assert(r.getDouble(r.fieldIndex("var_reduction_pct")) == 100.0)
  }

  test("mann-whitney: fully separated samples give the extreme U") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mw").toString
    val cust = (1 to 8).map(i => (i.toLong, f"Customer#$i%09d", 0L, 0.0,
      if (i <= 4) "BUILDING" else "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    // every BUILDING order value above every MACHINERY one
    val ords = (1 to 8).map(i => (100L + i, i.toLong, "F",
      if (i <= 4) 1000.0 + i else 10.0 + i,
      ts("2024-01-05 10:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    cust.write.parquet(s"$tmp/customer.parquet")
    ords.write.parquet(s"$tmp/orders.parquet")
    val r = Analytics.mannWhitney(spark, tmp).collect().head
    // ranks 5..8 all BUILDING → R1 = 26, U = 26 - 10 = 16 = n1·n2 (max)
    assert(r.getLong(r.fieldIndex("u")) == 16L)
    assert(r.getDouble(r.fieldIndex("z")) > 2.0)
    assert(r.getDouble(r.fieldIndex("p_value")) < 0.05)
    spark.catalog.clearCache()
  }

  test("ks test: fully separated samples reach D = 1, fixture literals pinned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ks").toString
    // every click value strictly below every view value → sup|F1-F2| = 1
    val ev = ((1 to 6).map(i => (i.toLong, ts("2024-01-05 10:00:00"),
      i.toLong, "click", i * 1.0, "{}")) ++
      (7 to 15).map(i => (i.toLong, ts("2024-01-05 10:00:00"),
        i.toLong, "view", 100.0 + i, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.parquet(s"$tmp/events.parquet")
    val r = Analytics.ksTest(spark, tmp).collect().head
    assert(r.getLong(0) === 6L && r.getLong(1) === 9L)
    assert(r.getLong(2) === 54L) // d_num = n1*n2 ⇒ D = 1 exactly
    assert(r.getDouble(3) === 1.0)
    // fixture: independent DuckDB literals over sf0.001
    val f = Analytics.ksTest(spark, sf001).collect().head
    assert((f.getLong(0), f.getLong(1), f.getLong(2)) === ((210L, 188L, 2552L)))
    assert(f.getDouble(3) === 2552.0 / (210L * 188L))
    spark.catalog.clearCache()
  }

  test("bh rejection set is a prefix of the p-value ranking") {
    val all = Analytics.benjaminiHochberg(spark, sf001).collect()
    val byRk = all.sortBy(_.getInt(all.head.fieldIndex("rk")))
    val ps = byRk.map(_.getDouble(byRk.head.fieldIndex("p_value")))
    assert(ps.zip(ps.drop(1)).forall { case (a, b) => a <= b })
    val rej = byRk.map(_.getBoolean(byRk.head.fieldIndex("rejected")))
    assert(!rej.zip(rej.drop(1)).exists { case (a, b) => !a && b },
      "step-up rule: rejections form a prefix")
    spark.catalog.clearCache()
  }

  test("erlang c: M/M/1 identity holds and waiting decays monotonically") {
    val rows = Analytics.erlangC(spark, sf001).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 12)
    val a = rows.head.getDouble(rows.head.fieldIndex("a_erlangs"))
    // classic M/M/1 special case: P(wait) = rho = A when c = 1 (A < 1)
    if (a < 1.0)
      assert(rows.head.getDouble(rows.head.fieldIndex("p_wait")) == a)
    val pw = rows.map(_.getDouble(rows.head.fieldIndex("p_wait")))
    assert(pw.zip(pw.drop(1)).forall { case (x, y) => x >= y },
      "more servers can never increase waiting")
    // SLO flag is monotone: once met, stays met
    val slo = rows.map(_.getBoolean(rows.head.fieldIndex("meets_slo")))
    assert(!slo.zip(slo.drop(1)).exists { case (x, y) => x && !y })
  }

  test("bot flags: metronome client flagged, irregular human not") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bot").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    val t0 = us("2024-01-05 10:00:00")
    // user 1: exactly 10s apart, 30 events → CV = 0, rate 6/min (both
    // flags); user 2: 30 events with erratic gaps → CV ≈ 1, slow rate
    val human = Seq(1L, 5, 2, 9, 3, 60, 7, 31, 2, 44, 11, 90, 4, 2, 17,
      120, 9, 33, 6, 21, 2, 75, 13, 41, 8, 3, 29, 55, 10)
      .scanLeft(0L)(_ + _ * 1000000000L) // gap seconds → ns
    val rows = ((1 to 30).map(i =>
      (i.toLong, t0 + i * 10000000000L, 1L, "view", 1.0, "{}")) ++
      human.zipWithIndex.map { case (off, i) =>
        (100L + i, t0 + off, 2L, "view", 1.0, "{}") })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.botFlags(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val bot = out(1L)
    assert(bot.getDouble(bot.fieldIndex("cv")) == 0.0)
    assert(bot.getBoolean(bot.fieldIndex("flag_regular")))
    assert(bot.getBoolean(bot.fieldIndex("flag_rate")))
    val hum = out(2L)
    assert(hum.getDouble(hum.fieldIndex("cv")) > 0.3)
    assert(!hum.getBoolean(hum.fieldIndex("flag_regular")))
    assert(!hum.getBoolean(hum.fieldIndex("flag_rate")))
  }

  test("user recs never recommend an owned item; scores descend per user") {
    val recs = Analytics.userRecs(spark, sf001).collect()
    assert(recs.nonEmpty)
    val owned = graft.Tables(spark, sf001, "orders")
      .join(graft.Tables(spark, sf001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    recs.foreach { r =>
      val cust = r.getLong(r.fieldIndex("cust"))
      val cand = r.getLong(r.fieldIndex("cand"))
      assert(!owned.contains((cust, cand)), s"recommended owned: $cust/$cand")
      assert(r.getDouble(r.fieldIndex("score")) > 0.0)
    }
    recs.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(rs.head.fieldIndex("rk")))
      val sc = byRank.map(_.getDouble(byRank.head.fieldIndex("score")))
      assert(sc.zip(sc.drop(1)).forall { case (a, b) => a >= b })
    }
    spark.catalog.clearCache()
  }

  test("wilson lcb is a strict shrinkage of the raw rate") {
    val rows = Analytics.wilsonRank(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getDouble(r.fieldIndex("p_hat"))
      val lcb = r.getDouble(r.fieldIndex("wilson_lcb"))
      assert(lcb < p || (p == 0.0 && lcb <= 0.0), s"${r.getString(0)}")
      assert(lcb >= -1e-9 && lcb <= 1.0)
    }
  }

  test("ab power: sample size is in the analytic ballpark for p~0.2, mde 1pp") {
    val r = Analytics.abPower(spark, sf001).collect().head
    val p = r.getDouble(r.fieldIndex("p_baseline"))
    assert(p > 0.1 && p < 0.3, s"baseline $p")
    val n = r.getLong(r.fieldIndex("n_per_arm"))
    assert(n > 15000 && n < 45000, s"n/arm $n")
    assert(r.getLong(r.fieldIndex("n_total")) == 2 * n)
  }

  test("sprt stops at the first boundary crossing of an all-success run") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sprt").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    // 20 straight successes: LLR climbs by 0.182322/trial and first
    // clears ln(19) = 2.944439 at trial ceil(2944439/182322) = 17
    val rows = (1 to 20).map(i =>
      (i.toLong, us("2024-01-05 10:00:00") + i * 1000000L, 1L,
        "purchase", 60.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.sprt(spark, tmp).collect()
    assert(out.length == 1, "only the decision row (no %250 probe in 20 trials)")
    val r = out.head
    assert(r.getLong(r.fieldIndex("trial_no")) == 17L)
    assert(r.getDouble(r.fieldIndex("llr")) == 3.099474) // 17 * 0.182322
    assert(r.getString(r.fieldIndex("state")) == "accept_h1")
    assert(r.getBoolean(r.fieldIndex("is_decision")))
    spark.catalog.clearCache()
  }

  test("did recovers a constructed treatment effect exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_did").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    // treated = user 3 (3 % 3 == 0), control = user 1; control flat at
    // mean 5 both periods, treated jumps 5 → 15 post ⇒ DiD = 10 exactly;
    // each cell holds {m-1, m+1} so every cell variance is 1 and
    // se = sqrt(4 * 1/2) = sqrt(2)
    val rows = Seq(
      (1L, "2024-01-05 10:00:00", 1L, 4.0), (2L, "2024-01-06 10:00:00", 1L, 6.0),
      (3L, "2024-01-20 10:00:00", 1L, 4.0), (4L, "2024-01-21 10:00:00", 1L, 6.0),
      (5L, "2024-01-05 10:00:00", 3L, 4.0), (6L, "2024-01-06 10:00:00", 3L, 6.0),
      (7L, "2024-01-20 10:00:00", 3L, 14.0), (8L, "2024-01-21 10:00:00", 3L, 16.0))
      .map { case (id, t, u, v) => (id, us(t), u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.did(spark, tmp).collect()
    assert(out.length == 4)
    assert(out.forall(_.getDouble(out.head.fieldIndex("did")) == 10.0))
    assert(out.forall(r => math.abs(r.getDouble(r.fieldIndex("se"))
      - math.sqrt(2.0)) < 1e-5))
  }

  test("jackknife matches the hand computation on two equal groups") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jk").toString
    // nations {0: 10, 20}, {1: 30, 40}: grand mean 25; deletion means
    // 35 and 15; SE = sqrt((G-1)/G * sum((m_g - 25)^2)) = sqrt(100) = 10;
    // pseudovalues 2*25-35=15 and 2*25-15=35
    val cust = Seq((1L, "Customer#000000001", 0L, 0.0, "BUILDING"),
      (2L, "Customer#000000002", 0L, 0.0, "BUILDING"),
      (3L, "Customer#000000003", 1L, 0.0, "BUILDING"),
      (4L, "Customer#000000004", 1L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ords = Seq((10L, 1L, 10.0), (11L, 2L, 20.0), (12L, 3L, 30.0),
      (13L, 4L, 40.0)).map { case (o, c, p) =>
      (o, c, "F", p, ts("2015-07-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    cust.write.parquet(s"$tmp/customer.parquet")
    ords.write.parquet(s"$tmp/orders.parquet")
    val rows = Analytics.jackknife(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getDouble(rows(0L).fieldIndex("mean_excl")) == 35.0)
    assert(rows(1L).getDouble(rows(1L).fieldIndex("mean_excl")) == 15.0)
    assert(rows(0L).getDouble(rows(0L).fieldIndex("pseudovalue")) == 15.0)
    assert(rows(1L).getDouble(rows(1L).fieldIndex("pseudovalue")) == 35.0)
    assert(rows.values.forall(_.getDouble(rows(0L).fieldIndex("jk_se")) == 10.0))
  }

  test("itemCf counts co-purchases at basket (distinct-part) grain") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cf").toString
    // c10 buys part 1 twice across two orders: basket grain must dedup it,
    // so co(1,2)=3 customers (c10,c11,c12), co(1,3)=co(2,3)=1 (< support)
    val ords = Seq((100L, 10L), (101L, 10L), (102L, 11L), (103L, 12L),
      (104L, 13L)).map { case (o, c) =>
      (o, c, "F", 1.0, ts("2015-07-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val li = Seq((100L, 1L), (100L, 2L), (101L, 1L), (101L, 3L),
      (102L, 1L), (102L, 2L), (103L, 1L), (103L, 2L), (104L, 4L))
      .zipWithIndex.map { case ((o, p), i) =>
        (o, p, 1L, i, 1.0, 10.0, 0.0, 0.0, "N", "O", ts("2015-07-02 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    ords.write.parquet(s"$tmp/orders.parquet")
    li.write.parquet(s"$tmp/lineitem.parquet")
    val rows = Analytics.itemCf(spark, tmp).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(r.fieldIndex("i1")), r.getLong(r.fieldIndex("i2")),
      r.getLong(r.fieldIndex("co"))) == ((1L, 2L, 3L)))
    assert(r.getLong(r.fieldIndex("n1")) == 3L) // part 1: c10,c11,c12
    assert(r.getLong(r.fieldIndex("n2")) == 3L)
    assert(r.getDouble(r.fieldIndex("cosine")) == 1.0)
    spark.catalog.clearCache()
  }

  test("itemCf basket cap: inactive on the fixture, truncates a bot basket") {
    import org.apache.spark.sql.functions._
    // half of the cap ≡ plain proof (the other half is the unchanged
    // q_item_cf/q_user_recs gate hashes): every fixture basket is
    // strictly below the cap, so the guard provably drops nothing there
    val maxBasket = graft.Tables(spark, sf001, "orders")
      .join(graft.Tables(spark, sf001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxBasket < Analytics.cfBasketCap,
      s"fixture max basket $maxBasket must stay below the cap " +
        s"${Analytics.cfBasketCap} for the cap ≡ plain gate proof")

    // and on a synthetic bot: one customer owning cap+50 items is
    // truncated to exactly cap items before the pair join — the
    // single-key quadratic guard actually fires
    val tmp = java.nio.file.Files.createTempDirectory("graft_cfcap").toString
    val cap = Analytics.cfBasketCap
    val ords = Seq((200L, 77L)).map { case (o, c) =>
      (o, c, "F", 1.0, ts("2015-07-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val li = (1L to (cap + 50L)).zipWithIndex.map { case (p, i) =>
      (200L, p, 1L, i.toLong, 1.0, 10.0, 0.0, 0.0, "N", "O",
        ts("2015-07-02 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    ords.write.parquet(s"$tmp/orders.parquet")
    li.write.parquet(s"$tmp/lineitem.parquet")
    // deterministic truncation: exactly `cap` items survive, and they
    // are the cap LOWEST item ids (the documented rule)
    val kept = Analytics.baskets(spark, tmp)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(kept.size === cap, s"bot basket must truncate to $cap")
    assert(kept === (1L to cap.toLong))
    spark.catalog.clearCache()
  }
}
