package graft

import org.apache.spark.sql.functions._

import graft.elb.{ElbQueries, LogParser, Synthetic}
import graft.ops.Sessionize

/** Goal-level verification of the flagship ELB pipeline (reference Goals
  * 1-4, /root/reference/README.md:9-16) against an INDEPENDENT
  * implementation: a regex mini-parser + plain-Scala fold sessionizer over
  * the same raw lines. Nothing here shares code with LogParser (from_csv)
  * or Sessionize (window functions), so agreement pins both.
  *
  * The generator's contract (Synthetic.scala: intra-session gaps 10-120 s,
  * inter-session gaps 16-60 min, at most one malformed replacement per
  * 6-hit session) guarantees EXACTLY nClients * sessionsPerClient sessions
  * under a 15-minute-gap sessionizer — asserted, not assumed.
  */
class ElbSpec extends SparkSpec {

  private val nClients = 60
  private val sessionsPerClient = 4
  private val hitsPerSession = 6
  private val malformedEvery = 50
  private val gapUs = 15L * 60 * 1000000

  private lazy val rawLines = Synthetic.generate(seed = 42L,
    nClients = nClients, sessionsPerClient = sessionsPerClient,
    hitsPerSession = hitsPerSession, malformedEvery = malformedEvery)

  /** Independent mini-parse: (ts epoch-µs, client ip, client port, url) for
    * well-formed lines, None for corrupt — mirrors LogParser's corrupt rule
    * (essential trio ts/ip/url must materialize) without sharing any code. */
  private def miniParse(line: String): Option[(Long, String, Int, String)] = {
    val re = """^(\S+) \S+ ([0-9.]+):(\d+) .*"(?:GET|POST) (\S+) HTTP""".r
    re.findFirstMatchIn(line).flatMap { m =>
      try {
        val inst = java.time.Instant.parse(m.group(1))
        val us = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        Some((us, m.group(2), m.group(3).toInt, m.group(4)))
      } catch { case _: java.time.format.DateTimeParseException => None }
    }
  }

  private case class Sess(ip: String, sid: Long, startUs: Long, endUs: Long,
                          hits: Long, uniqueUrls: Long) {
    def durationSec: Double = (endUs - startUs) / 1000000.0
  }

  /** Plain-Scala fold sessionizer: strictly-greater-than-gap starts a new
    * session; 1-based ids per ip in (ts, port) order. */
  private def foldSessionize(
      hits: Seq[(Long, String, Int, String)]): Seq[Sess] =
    hits.groupBy(_._2).toSeq.flatMap { case (ip, hs) =>
      val sorted = hs.sortBy(h => (h._1, h._3))
      val sids = sorted.scanLeft((0L, Option.empty[Long])) {
        case ((sid, prev), h) =>
          (if (prev.forall(p => h._1 - p > gapUs)) sid + 1 else sid, Some(h._1))
      }.drop(1).map(_._1)
      sorted.zip(sids).groupBy(_._2).map { case (sid, rows) =>
        val ts = rows.map(_._1._1)
        Sess(ip, sid, ts.min, ts.max, rows.size.toLong,
          rows.map(_._1._4).distinct.size.toLong)
      }
    }

  private lazy val expectedHits = rawLines.flatMap(miniParse)
  private lazy val expectedSessions = foldSessionize(expectedHits)

  test("generator contract: exactly nClients * sessionsPerClient sessions") {
    assert(expectedSessions.size === nClients * sessionsPerClient)
  }

  test("elbSessionize matches the independent fold sessionizer row-for-row") {
    val got = ElbQueries.elbSessionize(spark, sf001).collect().map { r =>
      Sess(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) -> r.getDouble(6)
    }
    val want = expectedSessions
      .sortBy(s => (s.ip, s.sid)).map(s => s -> s.durationSec)
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gs, gd), (ws, wd)) =>
      assert(gs === ws)
      assert(gd === wd)
    }
  }

  test("elbGoals aggregates match independent computation") {
    val r = ElbQueries.elbGoals(spark, sf001).head()
    // exact-integer-µs semantics: int64 sum, one division by the count,
    // one by 1e6 — mirror the same op order so the doubles are identical
    val dursUs = expectedSessions.map(s => s.endUs - s.startUs)
    val expAvg = (dursUs.sum.toDouble / dursUs.size) / 1000000.0
    val expMax = dursUs.max.toDouble / 1000000.0
    // max_by(ip, struct(duration_us, ip)): longest session, ties to larger ip
    val expIp = expectedSessions.maxBy(s => (s.endUs - s.startUs, s.ip)).ip
    assert(r.getDouble(r.fieldIndex("avg_session_sec")) === expAvg)
    assert(r.getLong(r.fieldIndex("n_sessions")) === expectedSessions.size.toLong)
    assert(r.getDouble(r.fieldIndex("max_session_sec")) === expMax)
    assert(r.getString(r.fieldIndex("most_engaged_ip")) === expIp)
  }

  test("quarantine accounting: floor(n/malformedEvery) lines rejected") {
    val total = nClients * sessionsPerClient * hitsPerSession
    val expCorrupt = total / malformedEvery
    assert(rawLines.size === total)
    assert(expectedHits.size === total - expCorrupt)
    val stats = ElbQueries.elbParseStats(spark, sf001).collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(stats(false) === (total - expCorrupt).toLong)
    assert(stats(true) === expCorrupt.toLong)
  }

  test("events round trip: format→parse→sessionize equals direct sessionization") {
    val ev = Tables(spark, sf001, "events")
    // zero lines may be lost in the text round trip; the formatter is the
    // SAME helper the production query uses (ElbQueries.eventsAsElbLines),
    // so this test exercises exactly what q_elb_roundtrip runs
    val parsed = LogParser.requests(ElbQueries.eventsAsElbLines(ev))
    assert(parsed.count() === ev.count())

    val direct = Sessionize.sessions(
        ev.withColumn("client_ip", format_string("10.%d.%d.%d",
          expr("user_id div 65536 % 256"), expr("user_id div 256 % 256"),
          expr("user_id % 256"))),
        col("client_ip"), col("ts"), col("event_id"), col("event_type"))
      .select(col("user_id").as("client_ip"), col("session_id"),
        col("session_start_us"), col("session_end_us"),
        col("hit_count"), col("unique_item_count").as("unique_urls"),
        col("duration_sec"))
      .orderBy(col("client_ip"), col("session_id"))
    val rt = ElbQueries.elbRoundtripSessions(spark, sf001).collect().toSeq
    assert(rt === direct.collect().toSeq)
  }

  test("goals round trip reproduces the independent DuckDB aggregates") {
    // literals from an offline DuckDB run of the twin SQL over sf0.001
    // (exact-integer-µs path: unrounded, bit-identical on both engines)
    val r = ElbQueries.elbGoalsRoundtrip(spark, sf001).collect().head
    assert(r.getDouble(0) === 13.91440613946281) // avg_session_sec
    assert(r.getLong(1) === 968L)                // n_sessions
    assert(r.getDouble(2) === 799.177398)        // max_session_sec
    assert(r.getString(3) === "10.0.0.14")       // most_engaged_ip
  }

  test("varied-line ops round trip: sentinel, status, and byte fields survive the parse") {
    val ops = ElbQueries.elbOpsRoundtrip(spark, sf001)
    val agg = ops.agg(
      count(lit(1)), sum(col("requests")), sum(col("n_with_latency")),
      round(sum(col("error_rate") * col("requests")) / sum(col("requests")), 6))
      .collect().head
    assert(agg.getLong(0) === 988L)  // distinct minutes (DuckDB literal)
    assert(agg.getLong(1) === 1000L) // no line lost in the round trip
    assert(agg.getLong(2) === 989L)  // 11 timeout sentinels -> null latency
    // ~the event_id%50 share; the per-minute rates are rounded to 6dp
    // before this re-weighting, so compare with tolerance
    assert(math.abs(agg.getDouble(3) - 0.02) < 1e-4)
  }
}
