package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.EventOps

/** Pins the assumptions behind EventOps' composite ordering keys.
  *
  * q_minmax_by orders by `CAST(round(value*1000) AS BIGINT) * 1e12 +
  * event_id` — value-ordered iff event_id < 1e12 and overflow-free iff
  * |value| <= ~9.2e3. Both engines share the formula, so oracle parity
  * CANNOT catch a violated assumption; these tests can.
  */
class EventOpsSpec extends SparkSpec {

  test("minmax_by key assumptions hold on the fixture: event_id < 1e12, |value| bounded") {
    val b = Tables(spark, sf001, "events")
      .agg(max(col("event_id")).as("max_id"), max(abs(col("value"))).as("max_abs"))
      .head()
    assert(b.getAs[Long]("max_id") < 1000000000000L)
    assert(b.getAs[Double]("max_abs") <= 9000.0)
  }

  test("URL canonicalization folds case/port/tracking/fragment/param-order") {
    import spark.implicits._
    // parse_url primitives behave as the canonicalizer assumes
    val r = Seq("HTTPS://Host.EXAMPLE.com:443/p/x?v=1&ref=2&utm_source=f#frag")
      .toDF("url")
      .select(
        expr("parse_url(url, 'PROTOCOL')"), expr("parse_url(url, 'HOST')"),
        expr("parse_url(url, 'PATH')"), expr("parse_url(url, 'QUERY')"),
        expr("parse_url(url, 'REF')")).head()
    assert(r.getString(0) === "HTTPS")
    assert(r.getString(1) === "Host.EXAMPLE.com") // port stripped, case kept
    assert(r.getString(2) === "/p/x")
    assert(r.getString(3) === "v=1&ref=2&utm_source=f") // fragment excluded
    assert(r.getString(4) === "frag")
    // the query: every canonical URL is normalized, variants collapse
    val rows = graft.ops.EventOps.urlCanon(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val cu = row.getString(0)
      assert(cu === cu.toLowerCase, s"case survived: $cu")
      assert(!cu.contains(":443") && !cu.contains("#") && !cu.contains("utm_")
        && !cu.contains("gclid"), s"noise survived: $cu")
      assert(cu.contains("?ref=") && cu.contains("&v="), s"params unsorted: $cu")
    }
    assert(rows.exists(_.getLong(2) > 1L), "no variants collapsed anywhere")
  }

  test("XML roundtrip: attribute + element parse re-derives the base columns") {
    import spark.implicits._
    // the query itself must agree with the relational truth
    val viaXml = graft.ops.EventOps.xmlRoundtrip(spark, sf001).collect()
    val direct = Tables(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_ids"))
      .orderBy(col("event_type"))
      .collect()
    assert(viaXml.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    // and to_xml is from_xml's inverse on a struct (escaping included)
    val row = Seq(("a<b&c", 7L)).toDF("s", "v")
      .select(expr("to_xml(struct(s, v))").as("doc"))
      .select(expr("from_xml(doc, 's STRING, v BIGINT')").as("p"))
      .select(col("p.s"), col("p.v")).head()
    assert(row.getString(0) === "a<b&c" && row.getLong(1) === 7L)
  }

  test("loadInterpolate: knowns kept exactly, holes bounded by their bracketing knowns") {
    val rows = EventOps.loadInterpolate(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._3) && rows.exists(!_._3), "fixture should have both holes and knowns")
    // every hole strictly between two knowns must lie within [min, max] of
    // its bracketing known values (linear blend property); edge holes must
    // equal the single available neighbor
    val n = rows.length
    var i = 0
    while (i < n) {
      val (_, v, hole) = rows(i)
      if (hole) {
        val prev = rows.take(i).reverse.find(!_._3).map(_._2)
        val next = rows.drop(i + 1).find(!_._3).map(_._2)
        (prev, next) match {
          case (Some(p), Some(nx)) =>
            assert(v >= math.min(p, nx) - 1 && v <= math.max(p, nx) + 1,
              s"hole at index $i: $v outside [$p, $nx]")
          case (Some(p), None) => assert(v === p)
          case (None, Some(nx)) => assert(v === nx)
          case _ => fail("hole with no known neighbor")
        }
      }
      i += 1
    }
  }

  test("minmax_by widened key agrees with true (value, event_id) struct ordering") {
    val got = EventOps.minMaxBy(spark, sf001)
      .select(col("user_id"), col("cheapest_type"), col("priciest_type"))

    // independent oracle: rank rows by the struct (value, event_id) — the
    // ordering the composite BIGINT key is supposed to encode
    val e = Tables(spark, sf001, "events")
      .withColumn("k", struct(round(col("value") * 1000).cast("long"), col("event_id")))
    val asc = Window.partitionBy(col("user_id")).orderBy(col("k").asc)
    val desc = Window.partitionBy(col("user_id")).orderBy(col("k").desc)
    val want = e
      .withColumn("ra", row_number().over(asc))
      .withColumn("rd", row_number().over(desc))
      .groupBy(col("user_id"))
      .agg(max(when(col("ra") === 1, col("event_type"))).as("cheapest_type"),
        max(when(col("rd") === 1, col("event_type"))).as("priciest_type"))

    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("asof nearest picks the closer signup and breaks exact ties backward") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_asofn").toString
    def us(t: String) = ts(t).getTime * 1000L * 1000L
    // signup at 10:00 and 10:10; purchase 10:03 → prev closer (3 < 7);
    // purchase 10:08 → next closer (2 < 5); purchase 10:05 → exact tie
    // 5/5 → backward wins
    val rows = Seq(
      (1L, "2024-01-05 10:00:00", 1L, "signup"),
      (2L, "2024-01-05 10:03:00", 1L, "purchase"),
      (3L, "2024-01-05 10:05:00", 1L, "purchase"),
      (4L, "2024-01-05 10:08:00", 1L, "purchase"),
      (5L, "2024-01-05 10:10:00", 1L, "signup"))
      .map { case (id, t, u, e) => (id, us(t), u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$tmp/events.parquet")
    val out = EventOps.asofNearest(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(r.fieldIndex("nearest_signup_us")),
        r.getLong(r.fieldIndex("gap_us"))))).toMap
    val s0 = us("2024-01-05 10:00:00") / 1000L
    val s1 = us("2024-01-05 10:10:00") / 1000L
    assert(out(2L) == ((s0, 180000000L)))
    assert(out(4L) == ((s1, 120000000L)))
    assert(out(3L) == ((s0, 300000000L)), "tie breaks to the earlier signup")
  }

  test("dtw: warping never exceeds L1; identical curves align at zero") {
    val out = EventOps.dtwLoad(spark, sf001).collect()
    assert(out.length === 10) // C(5,2) event-type pairs
    out.foreach { r =>
      val (dtw, l1) = (r.getLong(r.fieldIndex("dtw")), r.getLong(r.fieldIndex("l1")))
      assert(dtw >= 0L && dtw <= l1,
        s"${r.getString(0)}/${r.getString(1)}: dtw=$dtw l1=$l1")
    }
    // the min-plus prefix-scan DP is the classic recurrence: a shifted
    // copy of a spiky curve aligns to (near) zero under warping while L1
    // stays large — checked through the same production expression by
    // feeding a constructed two-type event table
    val tmp = s"target/oracle_inputs/p${ProcessHandle.current().pid()}/dtwspec"
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, minute: Long, et: String) =
      (id, new java.sql.Timestamp(base + minute * 60000L), 1L, et, 1.0, "{}")
    // type A: bursts at minutes 0..9 and 32..41; type B: same bursts
    // shifted by 2 minutes inside a 64-minute span (one bucket at T=32)
    val rows = ((0L to 9L) ++ (32L to 41L)).flatMap(m =>
      Seq(ev(m, m, "a"), ev(100 + m, m + 2, "b"))) :+
      ev(999, 63, "a") :+ ev(998, 63, "b") // pin the span
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = EventOps.dtwLoad(spark, tmp).collect()
    assert(r.length === 1)
    val (dtw, l1) = (r(0).getLong(r(0).fieldIndex("dtw")),
      r(0).getLong(r(0).fieldIndex("l1")))
    assert(dtw < l1 / 2, s"warping must absorb the shift: dtw=$dtw l1=$l1")
  }
}
