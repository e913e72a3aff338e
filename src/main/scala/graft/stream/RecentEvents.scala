package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** transformWithState with LIST state (vs ActivityProcessor's ValueState):
  * a bounded last-k event trail per user — the "recent activity" feature a
  * serving layer reads next to the batch-computed profile.
  *
  * State discipline at scale: the list is re-`put` trimmed to k every
  * batch, so per-key state is O(k) forever regardless of stream length —
  * unbounded append-only ListState is the classic state-store leak. Same
  * RocksDB provider requirement as ActivityProcessor.
  */
object RecentEvents {

  case class Recent(user_id: Long, path: String)

  class Proc(k: Int) extends StatefulProcessor[Long, (Long, String), Recent] {
    @transient private var recent: ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[String]("recent", Encoders.STRING,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[Recent] = {
      rows.foreach(r => recent.appendValue(r._2))
      val trimmed = recent.get().toArray.takeRight(k)
      recent.put(trimmed) // re-bound state to O(k)
      Iterator.single(Recent(key, trimmed.mkString(">")))
    }
  }

  /** events (user_id, event_type) → last-k trail per user per batch. */
  def lastK(events: Dataset[(Long, String)], k: Int = 3): Dataset[Recent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new Proc(k), TimeMode.None(), OutputMode.Update(),
        Encoders.product[Recent])
  }
}
