package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** transformWithState EVENT-TIME TIMERS: emit a session-closed record when
  * the watermark passes last-hit + gap — the push-based complement to
  * DynamicSessions' timeout-on-next-read. Each input batch re-arms ONE
  * timer per user (delete + register, so stale timers never accumulate);
  * when it fires, the state is emitted and cleared. State per key is one
  * (lastMs, n) pair + one timer — O(active users), evicted on close.
  */
object SessionCloser {

  case class Agg(last_ms: Long, n_hits: Long)
  case class Closed(user_id: Long, close_at_ms: Long, n_hits: Long)

  class Proc(gapMs: Long) extends StatefulProcessor[Long, (Long, Timestamp), Closed] {
    @transient private var agg: ValueState[Agg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[Agg]("agg", Encoders.product[Agg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
                                 timerValues: TimerValues): Iterator[Closed] = {
      var cur = Option(agg.get()).getOrElse(Agg(Long.MinValue, 0L))
      rows.foreach { case (_, ts) =>
        cur = Agg(math.max(cur.last_ms, ts.getTime), cur.n_hits + 1)
      }
      agg.update(cur)
      // re-arm: exactly one live timer per key
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(cur.last_ms + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Closed] = {
      // A timer can fire with absent state (e.g. a replayed timer after
      // checkpoint recovery interleaving with an already-cleared session);
      // dereferencing unconditionally would NPE and kill the query.
      Option(agg.get()) match {
        case Some(cur) =>
          agg.clear()
          Iterator.single(Closed(key, expiredTimerInfo.getExpiryTimeInMs, cur.n_hits))
        case None => Iterator.empty
      }
    }
  }

  /** watermarked (user_id, ts) → closed-session records, pushed by the
    * watermark rather than pulled by the user's next event. */
  def closedSessions(events: Dataset[(Long, Timestamp)], gapMs: Long): Dataset[Closed] = {
    import events.sparkSession.implicits._
    events
      .toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new Proc(gapMs), TimeMode.EventTime(),
        OutputMode.Append(), Encoders.product[Closed])
  }
}
