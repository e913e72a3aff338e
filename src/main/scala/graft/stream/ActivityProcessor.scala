package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** transformWithState coverage (Spark 4's successor to
  * (flat)MapGroupsWithState): a running per-user activity profile kept in
  * typed ValueState, emitting an updated row per user per micro-batch.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`)
  * — which is also the right provider at scale: state lives off-heap/disk
  * per executor, bounded by changelog checkpointing, instead of the
  * HDFS-backed in-memory map.
  */
object ActivityProcessor {

  case class Activity(user_id: Long, n_events: Long, total_value: Double)
  case class Update(user_id: Long, n_events: Long, total_value: Double)

  class Proc extends StatefulProcessor[Long, (Long, Double), Update] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Activity] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[Activity]("activity",
        Encoders.product[Activity], org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                                 timerValues: TimerValues): Iterator[Update] = {
      var acc = Option(state.get()).getOrElse(Activity(key, 0L, 0.0))
      rows.foreach { case (_, v) =>
        acc = acc.copy(n_events = acc.n_events + 1, total_value = acc.total_value + v)
      }
      state.update(acc)
      Iterator.single(Update(key, acc.n_events, acc.total_value))
    }
  }

  /** events (user_id, value) → running per-user totals across batches. */
  def runningTotals(events: Dataset[(Long, Double)]): Dataset[Update] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Update(),
        Encoders.product[Update])
  }
}
