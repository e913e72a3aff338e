package graft.stream

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** transformWithState with STATE TTL — the remaining typed-state surface
  * next to ValueState (ActivityProcessor), ListState (RecentEvents),
  * MapState (TypeCounts) and event-time timers (SessionCloser): a per-key
  * running counter whose state EXPIRES `ttl` after its last write
  * (processing time). An inactive key's value self-evicts and its next
  * event restarts the count from zero — the recent-activity/profile-store
  * pattern where the state store is bounded by RECENTLY ACTIVE keys
  * rather than all keys ever seen (both the retention/GDPR shape and the
  * state-size bound an unbounded keyspace needs at scale; watermarks
  * can't express this because it is processing-time recency, not
  * event-time lateness). TTL needs `TimeMode.ProcessingTime` and the
  * RocksDB provider, like every transformWithState pipeline here.
  * Semantics pinned in StreamingSpec (alive within TTL, reset after).
  */
object ExpiringCounts {

  case class Seen(user_id: Long, n_since_active: Long)

  class Proc(ttl: Duration) extends StatefulProcessor[Long, (Long, Long), Seen] {
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig(ttl))
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[Seen] = {
      val cur = if (n.exists()) n.get() else 0L
      val upd = cur + rows.size
      n.update(upd)
      Iterator.single(Seen(key, upd))
    }
  }

  /** (user_id, event_id) stream → per-user count of events since the key
    * was last considered active (state self-expires after `ttl`). */
  def countsSinceActive(events: Dataset[(Long, Long)],
                        ttl: Duration): Dataset[Seen] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new Proc(ttl), TimeMode.ProcessingTime(),
        OutputMode.Update(), Encoders.product[Seen])
  }
}
