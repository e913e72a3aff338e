package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** transformWithState with MAP state — completing the typed-state triad
  * next to ActivityProcessor (ValueState) and RecentEvents (ListState):
  * per-user per-event-type running counts, emitting the user's current
  * dominant type each batch (ties break to the lexicographically smallest
  * type, so output is deterministic under any batch split).
  *
  * State is O(|event_types|) per user — a bounded alphabet, not stream
  * length — and MapState updates touch ONLY the incoming keys (RocksDB
  * point writes), unlike a ValueState[Map] which rewrites the whole map
  * per batch. That per-key-update locality is why MapState is the right
  * store for wide profiles at scale.
  */
object TypeCounts {

  case class Dominant(user_id: Long, top_type: String, n: Long)

  class Proc extends StatefulProcessor[Long, (Long, String), Dominant] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[Dominant] = {
      rows.foreach { case (_, et) =>
        val cur = if (counts.containsKey(et)) counts.getValue(et) else 0L
        counts.updateValue(et, cur + 1L)
      }
      val (top, n) = counts.iterator().toSeq
        .sortBy { case (t, c) => (-c, t) }.head
      Iterator.single(Dominant(key, top, n))
    }
  }

  /** events (user_id, event_type) → current dominant type per user. */
  def dominantType(events: Dataset[(Long, String)]): Dataset[Dominant] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Update(),
        Encoders.product[Dominant])
  }
}
