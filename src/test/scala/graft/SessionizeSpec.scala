package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Sessionize

/** Pins the gap-sessionization semantics of SURVEY §1.3 / §7.5.2 and the
  * §5.3 ScalaCheck invariants. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def sessionsOf(rows: Seq[(Long, java.sql.Timestamp, String)],
                         gapSec: Long = 900) = {
    val df = rows.toDF("user_id", "ts", "url")
    Sessionize.sessions(df, col("user_id"), col("ts"), col("url"),
      col("url"), gapSec)
  }

  test("gap boundary: exactly 15 min stays in session; over 15 min splits") {
    val base = ts("2015-07-22 09:00:00")
    val atGap = new java.sql.Timestamp(base.getTime + 15 * 60 * 1000) // == gap
    val overGap = new java.sql.Timestamp(base.getTime + 15 * 60 * 1000 + 1)
    val same = sessionsOf(Seq((1L, base, "a"), (1L, atGap, "b")))
    assert(same.count() === 1, "gap == 15 min must NOT split (strictly greater)")
    val split = sessionsOf(Seq((1L, base, "a"), (1L, overGap, "b")))
    assert(split.count() === 2, "gap > 15 min must split")
  }

  test("single-hit session has duration 0 and counts as a session") {
    val out = sessionsOf(Seq((1L, ts("2015-07-22 09:00:00"), "a"))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("duration_sec") === 0.0)
    assert(r.getAs[Long]("hit_count") === 1L)
  }

  test("duplicate timestamps for one user stay in one session") {
    val t0 = ts("2015-07-22 09:00:00")
    val out = sessionsOf(Seq((1L, t0, "a"), (1L, t0, "b"), (1L, t0, "a")))
    assert(out.count() === 1)
    assert(out.head().getAs[Long]("unique_item_count") === 2L)
  }

  test("result invariant under input order shuffling") {
    val rows = (0 until 50).map { i =>
      (i % 3L, new java.sql.Timestamp(ts("2015-07-22 09:00:00").getTime
        + (i * 7 * 60 * 1000L)), s"u${i % 5}")
    }
    val sorted = sessionsOf(rows).orderBy("user_id", "session_id").collect()
    val shuffled = sessionsOf(scala.util.Random.shuffle(rows))
      .orderBy("user_id", "session_id").collect()
    assert(sorted.toSeq === shuffled.toSeq)
  }

  test("gap extremes: huge gap = 1 session/user; zero-ish gap = 1 per distinct ts") {
    val rows = (0 until 20).map { i =>
      (1L, new java.sql.Timestamp(ts("2015-07-22 09:00:00").getTime + i * 60000L), "u")
    }
    assert(sessionsOf(rows, gapSec = 86400).count() === 1)
    assert(sessionsOf(rows, gapSec = 0).count() === 20)
  }

  test("scalacheck invariants: partition of hits, gap bounds, counts") {
    val gapSec = 900L
    val genHits = for {
      nUsers <- Gen.choose(1, 4)
      n <- Gen.choose(1, 60)
      pairs <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, nUsers.toLong - 1)
        // offsets that straddle the gap boundary on purpose
        stepSec <- Gen.oneOf(1L, 60L, 899L, 900L, 901L, 3600L)
      } yield (u, stepSec))
    } yield {
      var acc = 0L
      pairs.map { case (u, step) =>
        acc += step
        (u, new java.sql.Timestamp(1437555600000L + acc * 1000L), s"u$acc")
      }
    }
    val prop = Prop.forAll(genHits) { rows =>
      val out = sessionsOf(rows).collect()
      val totalHits = out.map(_.getAs[Long]("hit_count")).sum
      val uniqueLeHits = out.forall(r =>
        r.getAs[Long]("unique_item_count") <= r.getAs[Long]("hit_count"))
      // per user: sessions ordered, inter-session gap > gapSec
      val interSessionGapsOk = out.groupBy(_.getAs[Long]("user_id")).forall {
        case (_, ss) =>
          val sorted = ss.sortBy(_.getAs[Long]("session_id"))
          sorted.zip(sorted.drop(1)).forall { case (a, b) =>
            b.getAs[Long]("session_start_us") - a.getAs[Long]("session_end_us") > gapSec * 1000000L
          }
      }
      totalHits == rows.size && uniqueLeHits && interSessionGapsOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("salted two-phase sessionizer equals the naive sessionizer row for row") {
    val ev = Tables(spark, sf001, "events")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_id"), col("session_start_us"),
        col("session_end_us"), col("hit_count"), col("unique_item_count"))
      .orderBy(col("user_id"), col("session_id")).collect().toSeq
    val naive = canon(Sessionize.sessions(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type")))
    // 1-hour blocks: far smaller than the fixture's activity span, so
    // plenty of sessions genuinely cross block boundaries here
    val salted = canon(Sessionize.sessionsSalted(ev, col("user_id"),
      col("ts"), col("event_id"), col("event_type"), blockSec = 3600L))
    assert(naive === salted)
    assert(naive.nonEmpty)
  }

  test("salted sessionizer stitches a session spanning many blocks (block < gap)") {
    // one user hitting every 10 min for 6 hours: ONE session, but with
    // 15-min blocks (block SMALLER than the 15-min gap) it is cut into
    // many single-hit local sessions whose merge chain must collapse
    val t0 = 1700000000000000L
    val hits = (0 until 37).map { i =>
      (7L, new java.sql.Timestamp((t0 + i * 600000000L) / 1000L), s"u${i % 3}")
    }
    val df = hits.toDF("user_id", "ts", "url")
    val out = Sessionize.sessionsSalted(df, col("user_id"), col("ts"),
      col("url"), col("url"), gapSec = 900L, blockSec = 900L).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("hit_count") === 37L)
    assert(out.head.getAs[Long]("unique_item_count") === 3L)
    assert(out.head.getAs[Long]("session_end_us")
      - out.head.getAs[Long]("session_start_us") === 36L * 600000000L)
  }

  test("batch session_window agrees with lag-based sessionizer on events") {
    val ev = Tables(spark, sf001, "events")
    val lagBased = Sessionize.sessions(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"))
    val sw = ev.groupBy(col("user_id"),
        session_window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("hit_count"))
    // identical session counts (no event in the data sits exactly on the
    // boundary, where the two variants legitimately differ)
    assert(lagBased.count() === sw.count())
  }
}
