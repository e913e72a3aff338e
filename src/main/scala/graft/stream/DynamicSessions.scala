package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state streaming sessionization (SURVEY §2.10 "dynamic gap per
  * user"): flatMapGroupsWithState keeps one open session per user and a
  * per-user gap (e.g. bots get a shorter gap), something the built-in
  * session_window (static gap) cannot express.
  *
  * State is one small record per ACTIVE user and is evicted by event-time
  * timeout once the watermark passes last-hit + gap — bounded regardless of
  * total user cardinality, which is what makes it safe at 100 TB: state ∝
  * concurrently-active users, not history. Input must carry a watermark on
  * its event-time column.
  */
object DynamicSessions {

  /** `ts` is the watermarked event-time column (must survive projection up
    * to the stateful operator — Spark's streaming checker requires it);
    * `ts_us` carries the same instant as epoch µs for state arithmetic. */
  case class Hit(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  case class OpenSession(start_us: Long, last_us: Long, hits: Long)
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           session_end_us: Long, hit_count: Long)

  /** Default policy: 15 min, except a 5-min gap for flagged "fast" users
    * (stand-in for per-segment/bot-aware gaps). */
  def defaultGapUs(userId: Long): Long =
    if (userId % 10 == 0) 5L * 60 * 1000000 else 15L * 60 * 1000000

  def sessionize(hits: Dataset[Hit],
                 gapUsFor: Long => Long = defaultGapUs)
      : Dataset[ClosedSession] = {
    import hits.sparkSession.implicits._
    hits.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[Hit], state: GroupState[OpenSession]) =>
          val gapUs = gapUsFor(user)
          val out = Seq.newBuilder[ClosedSession]
          if (state.hasTimedOut) {
            // watermark passed last + gap: close and evict
            state.getOption.foreach { s =>
              out += ClosedSession(user, s.start_us, s.last_us, s.hits)
            }
            state.remove()
          } else {
            var cur = state.getOption
            // within a micro-batch events need ordering (Spark does not
            // sort the group iterator)
            events.toSeq.sortBy(_.ts_us).foreach { h =>
              cur match {
                case Some(s) if h.ts_us - s.last_us <= gapUs =>
                  cur = Some(s.copy(last_us = math.max(s.last_us, h.ts_us),
                    hits = s.hits + 1))
                case Some(s) =>
                  out += ClosedSession(user, s.start_us, s.last_us, s.hits)
                  cur = Some(OpenSession(h.ts_us, h.ts_us, 1))
                case None =>
                  cur = Some(OpenSession(h.ts_us, h.ts_us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes last + gap
              state.setTimeoutTimestamp((s.last_us + gapUs) / 1000 + 1)
            }
          }
          out.result().iterator
      }
  }
}
