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
}
