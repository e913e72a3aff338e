package graft

import org.apache.spark.sql.functions._

import graft.ops.EventOps
import graft.plans.AsOfJoinOps

/** The native as-of join operator (graft.plans.AsOfJoinExec): merge edge
  * cases on crafted partitions, equality with the union+window twin on real
  * data, and the physical contract (exec node present, one hash exchange
  * per side, no window, no row-exploding join).
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def join(l: org.apache.spark.sql.DataFrame,
                   r: org.apache.spark.sql.DataFrame) =
    AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")

  test("nearest-<= semantics: ties match, later rows don't, missing keys null") {
    val left = Seq(
      (1L, 100L), // exact tie with right (1,100) -> matches it, not (1,50)
      (1L, 99L),  // between 50 and 100 -> matches 50
      (1L, 10L),  // before all right rows -> null
      (2L, 500L), // key with no right rows at all -> null
      (3L, 7L)    // matches key 3's single row at 7 (tie)
    ).toDF("k", "t")
    val right = Seq(
      (1L, 50L, "a"), (1L, 100L, "b"), (1L, 200L, "c"),
      (3L, 7L, "d"), (4L, 1L, "e")
    ).toDF("rk", "rt", "payload")
    val got = join(left, right).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getString(4))).toMap
    assert(got((1L, 100L)) === "b")
    assert(got((1L, 99L)) === "a")
    assert(got((1L, 10L)) === null)
    assert(got((2L, 500L)) === null)
    assert(got((3L, 7L)) === "d")
  }

  test("multiple left rows per key advance the candidate monotonically") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L)).toDF("k", "t")
    val right = Seq((1L, 5L, "r5"), (1L, 20L, "r20"), (1L, 35L, "r35"))
      .toDF("rk", "rt", "payload")
    val got = join(left, right).collect()
      .map(r => r.getLong(1) -> r.getString(4)).toMap
    assert(got === Map(10L -> "r5", 20L -> "r20", 30L -> "r20", 40L -> "r35"))
  }

  test("null right times never match; null left time matches nothing") {
    val left = Seq((1L, Some(10L)), (1L, None)).toDF("k", "t")
    val right = Seq((1L, None, "rnull"), (1L, Some(5L), "r5"))
      .toDF("rk", "rt", "payload")
    val got = join(left, right).collect()
      .map(r => (if (r.isNullAt(1)) -1L else r.getLong(1)) ->
        (if (r.isNullAt(4)) null else r.getString(4))).toMap
    assert(got(10L) === "r5")
    assert(got(-1L) === null)
  }

  test("null left time matches nothing even when a right time is Long.MinValue") {
    // regression: the old Long.MinValue sentinel for a null left bound let a
    // right row at exactly MinValue satisfy rTime <= sentinel and match
    val left = Seq((1L, None), (1L, Some(0L))).toDF("k", "t")
    val right = Seq((1L, Some(Long.MinValue), "rmin")).toDF("rk", "rt", "payload")
    val got = join(left, right).collect()
      .map(r => (if (r.isNullAt(1)) -1L else r.getLong(1)) ->
        (if (r.isNullAt(4)) null else r.getString(4))).toMap
    assert(got(-1L) === null, "null left time must never match")
    assert(got(0L) === "rmin", "a real left time still matches the MinValue row")
  }

  test("forward direction: nearest >= match, ties match, earlier rows don't") {
    val left = Seq(
      (1L, 100L), // tie with right (1,100) -> matches it
      (1L, 101L), // next is 200
      (1L, 300L), // nothing at or after 300 -> null
      (2L, 5L)    // no right rows for key 2 -> null
    ).toDF("k", "t")
    val right = Seq((1L, 50L, "a"), (1L, 100L, "b"), (1L, 200L, "c"))
      .toDF("rk", "rt", "payload")
    val got = AsOfJoinOps.asofJoin(left, right,
        Seq("k"), Seq("rk"), "t", "rt", forward = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getString(4))).toMap
    assert(got((1L, 100L)) === "b")
    assert(got((1L, 101L)) === "c")
    assert(got((1L, 300L)) === null)
    assert(got((2L, 5L)) === null)
  }

  test("forward keeps the matching right row available for later left rows") {
    // both left rows at 10 and 20 should see the SAME right row at 30 —
    // a consumed match would leave the second left row unmatched
    val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 30L, "r30")).toDF("rk", "rt", "payload")
    val got = AsOfJoinOps.asofJoin(left, right,
        Seq("k"), Seq("rk"), "t", "rt", forward = true).collect()
      .map(r => r.getLong(1) -> r.getString(4)).toMap
    assert(got === Map(10L -> "r30", 20L -> "r30"))
  }

  test("matches the union+window as-of twin on real events (sf0.001)") {
    val native = EventOps.asofNative(spark, sf001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    val windowed = EventOps.asofSignup(spark, sf001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(native.nonEmpty)
    assert(native === windowed)
  }

  test("plan: AsOfJoinExec with one hash exchange per side, no window/BNLJ") {
    val df = EventOps.asofNative(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(2000))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx === 2, s"expected 2 hash exchanges, got $hashEx:\n${p.take(3000)}")
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoop"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("disjoint column names are required (self-join exprId safety)") {
    val l = Seq((1L, 2L)).toDF("k", "t")
    val r = Seq((1L, 2L)).toDF("k", "rt")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoinOps.asofJoin(l, r, Seq("k"), Seq("k"), "t", "rt")
    }
    assert(ex.getMessage.contains("share column names"))
  }
}
