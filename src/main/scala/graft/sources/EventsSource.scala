package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 batch source (SURVEY §2.1 "custom source", the
  * (c)-tier extension path): a deterministic synthetic event generator
  * planned as `partitions` range-split `InputPartition`s with
  * column pruning pushed into the reader
  * (`SupportsPushDownRequiredColumns`) — pruned fields are never
  * materialized, not merely dropped — plus filter pushdown
  * (`SupportsPushDownFilters`, range predicates shrink the planned id
  * space) and complete aggregate pushdown
  * (`SupportsPushDownAggregates`: ungrouped COUNT(*)/MIN/MAX(event_id)
  * answered in O(1) from the pruned range without reading a row — the
  * footer-statistics shortcut a real columnar source implements).
  *
  *   spark.read.format("graft.sources.EventsSource")
  *     .option("rows", 100000).option("partitions", 32).load()
  *
  * Scale shape: generation is embarrassingly parallel (each partition owns
  * a disjoint id range, no driver materialization, no shuffle); the same
  * layout a 1000-executor cluster would use to synthesize load. Values are
  * a pure function of the row id, so tests can assert exact aggregates.
  */
class EventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new EventsTable

  override def supportsExternalMetadata(): Boolean = false
}

object EventsSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val eventTypes: Array[String] =
    Array("view", "click", "purchase", "signup", "error")

  // deterministic per-row derivations (Knuth multiplicative scatter)
  def userId(i: Long): Long = (i * 2654435761L) % 1000L
  def eventType(i: Long): String = eventTypes(((i * 31L) % 5L).toInt)
  def tsUs(i: Long): Long = 1700000000000000L + i * 250000L // 4 rows/sec
  def value(i: Long): Double = ((i * 7919L) % 10000L) / 100.0
}

class EventsTable extends Table with SupportsRead {
  override def name(): String = "graft_events"
  override def schema(): StructType = EventsSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("partitions", 4),
      options.getLong("rowsPerBatch", 1000L))
}

class EventsScanBuilder(rows: Long, parts: Int, rowsPerBatch: Long = 1000L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var required: StructType = EventsSource.fullSchema
  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var aggKinds: Option[Seq[String]] = None
  private var aggGroup: Option[String] = None // id-periodic grouping column
  private var partial = false  // does Spark still need its own sort/limit?

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** event_id is the row id, so range predicates on it shrink the
    * generated id space itself — whole InputPartitions are never planned,
    * the custom-source analogue of parquet row-group pruning. Fully
    * honored filters are NOT returned as residuals. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("event_id", _: Long) => true
      case GreaterThanOrEqual("event_id", _: Long) => true
      case LessThan("event_id", _: Long) => true
      case LessThanOrEqual("event_id", _: Long) => true
      case EqualTo("event_id", _: Long) => true
      case IsNotNull("event_id") => true // non-nullable: vacuously true
      case _ => false
    }
    // v + 1 overflows at Long.MaxValue; since consumed filters are not
    // re-checked by Spark, a wrapped bound would silently drop every row.
    // Ids live in [0, rows) with rows <= Long.MaxValue, so id = MaxValue
    // never exists: `> MaxValue` / `= MaxValue` match nothing (lo pinned to
    // MaxValue >= hi gives the empty range) and `<= MaxValue` constrains
    // nothing (skip the tightening instead of wrapping hi negative).
    ours.foreach {
      case GreaterThan("event_id", v: Long) =>
        lo = if (v == Long.MaxValue) Long.MaxValue else math.max(lo, v + 1)
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("event_id", v: Long) =>
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v)
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case IsNotNull(_) => ()
    }
    accepted = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  private def isEventId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("event_id"))
      case _ => false
    }

  /** Grouping columns answerable in O(groups) from range arithmetic:
    * every generated column that is a pure function of `i mod P` maps each
    * residue class to ONE group — event_type (period 5: (i*31) % 5 ≡
    * i % 5) and user_id (period 1000: (i*K) % 1000 depends only on
    * i % 1000, and K = 2654435761 is coprime to 1000 so residues map to
    * values bijectively). Ungrouped is the empty-name case. */
  private def supportedGroup(agg: Aggregation): Option[String] =
    agg.groupByExpressions match {
      case Array() => Some("")
      case Array(nr: NamedReference)
          if nr.fieldNames.sameElements(Array("event_type")) => Some("event_type")
      case Array(nr: NamedReference)
          if nr.fieldNames.sameElements(Array("user_id")) => Some("user_id")
      case _ => None
    }

  /** COUNT(*) / MIN(event_id) / MAX(event_id) — ungrouped, or grouped by
    * an id-PERIODIC column (see [[supportedGroup]]) — are O(1)-per-group
    * functions of the (filter-pruned) id range: the aggregate is answered
    * WITHOUT scanning a single row, the custom-source analogue of
    * answering COUNT(*)/per-partition-value aggregates from parquet
    * footer + partition statistics. Spark pushes filters first, so the
    * pushed range is already applied. Anything else (other grouping,
    * other columns, AVG/SUM) declines and takes the normal scan +
    * engine-aggregate path. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    supportedGroup(agg).isDefined && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isEventId(m.column)
        case m: Max => isEventId(m.column)
        case _ => false
      }

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    aggKinds = Some(agg.aggregateExpressions.toSeq.map {
      case _: CountStar => "count"
      case _: Min => "min"
      case _: Max => "max"
    })
    aggGroup = supportedGroup(agg).filter(_.nonEmpty)
    true
  }

  /** LIMIT n over an unordered relation may return ANY n rows — truncate
    * the planned id space to its first n ids. Fully pushed (the scan
    * returns exactly min(n, available) rows), so Spark drops its own
    * Limit. Filters push before limits, so the truncation applies to the
    * already-pruned range. */
  override def pushLimit(limit: Int): Boolean = {
    if (aggKinds.isDefined) return false
    val clo = math.max(lo, 0L)
    hi = math.min(hi, clo + limit)
    partial = false
    true
  }

  /** ORDER BY event_id LIMIT n: ids generate in ascending order and the
    * planned ranges are ascending, so ASC top-N is the range's first n
    * ids, completely pushed (Spark drops sort + limit). DESC top-N prunes
    * to the LAST n ids but rows still emit ascending, so it pushes
    * PARTIALLY — Spark keeps its sort over the ≤ n surviving rows. Any
    * other sort key declines. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (aggKinds.isDefined || orders.length != 1) return false
    val onEventId = orders(0).expression match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("event_id"))
      case _ => false
    }
    if (!onEventId) return false
    val clo = math.max(lo, 0L)
    val chi = math.min(hi, rows)
    if (orders(0).direction == SortDirection.ASCENDING) {
      hi = math.min(chi, clo + limit)
      partial = false
    } else {
      lo = math.max(clo, chi - limit)
      partial = true
    }
    true
  }

  override def isPartiallyPushed(): Boolean = partial

  override def build(): Scan = {
    val (clo, chi) = (math.max(lo, 0L), math.min(hi, rows))
    (aggKinds, aggGroup) match {
      case (Some(kinds), Some(g)) => new EventsGroupedAggScan(clo, chi, kinds, g)
      case (Some(kinds), None) => new EventsAggScan(clo, chi, kinds)
      case _ => new EventsScan(clo, chi, parts, required, rowsPerBatch)
    }
  }
}

/** Completely-pushed-down global aggregate over the generated id range:
  * one partition, one row, zero per-row work. Null min/max on an empty
  * range matches SQL global-aggregate-on-empty semantics. */
class EventsAggScan(lo: Long, hi: Long, kinds: Seq[String])
    extends Scan with Batch {
  private val schema = StructType(kinds.zipWithIndex.map {
    case ("count", i) => StructField(s"count_star_$i", LongType, nullable = false)
    case (k, i) => StructField(s"${k}_event_id_$i", LongType, nullable = true)
  })
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_events_agg[range=[$lo,$hi), agg=[${kinds.mkString(",")}]]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(EventsRange(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsAggReaderFactory(lo, hi, kinds)
}

class EventsAggReaderFactory(lo: Long, hi: Long, kinds: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val n = math.max(0L, hi - lo)
        val values: Seq[Any] = kinds.map {
          case "count" => n
          case "min" => if (n == 0L) null else lo
          case "max" => if (n == 0L) null else hi - 1
        }
        InternalRow.fromSeq(values)
      }
      override def close(): Unit = ()
    }
  }
}

/** Completely-pushed-down GROUP BY over an id-periodic column: each
  * group's COUNT/MIN/MAX over the pruned range [lo,hi) is O(1) arithmetic
  * on its residue class — O(groups) total (5 for event_type, ≤1000 for
  * user_id), zero rows generated. Residue classes with no id in the range
  * emit nothing, matching GROUP BY's no-empty-groups semantics. Output is
  * group column first, then aggregates, the positional layout Spark
  * expects from a complete grouped pushdown. */
class EventsGroupedAggScan(lo: Long, hi: Long, kinds: Seq[String], group: String)
    extends Scan with Batch {
  private val groupField = group match {
    case "event_type" => StructField("event_type", StringType, nullable = false)
    case "user_id" => StructField("user_id", LongType, nullable = false)
  }
  private val schema = StructType(groupField +: kinds.zipWithIndex.map {
    case ("count", i) => StructField(s"count_star_$i", LongType, nullable = false)
    case (k, i) => StructField(s"${k}_event_id_$i", LongType, nullable = true)
  })
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_events_grouped_agg[range=[$lo,$hi), group=$group, agg=[${kinds.mkString(",")}]]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(EventsRange(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsGroupedAggReaderFactory(lo, hi, kinds, group)
}

class EventsGroupedAggReaderFactory(lo: Long, hi: Long, kinds: Seq[String],
                                    group: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val period = if (group == "event_type") 5L else 1000L
    // one row per residue class with ≥ 1 id in [lo,hi): the class's first
    // id, last id, and count are closed-form (lo ≥ 0 — build() clamps)
    val rows: IndexedSeq[InternalRow] = (0L until period).flatMap { r =>
      val first = lo + (((r - lo % period) % period + period) % period)
      if (first >= hi) None
      else {
        val count = (hi - 1 - first) / period + 1
        val last = first + period * (count - 1)
        val gv: Any =
          if (group == "event_type")
            UTF8String.fromString(EventsSource.eventType(first))
          else EventsSource.userId(first)
        val aggs: Seq[Any] = kinds.map {
          case "count" => count
          case "min" => first
          case "max" => last
        }
        Some(InternalRow.fromSeq(gv +: aggs))
      }
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

class EventsScan(lo: Long, hi: Long, parts: Int, required: StructType,
                 rowsPerBatch: Long = 1000L)
    extends Scan with Batch with SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Runtime (post-planning) state: DPP-style filters arrive AFTER the scan
  // is built but BEFORE planInputPartitions — the batch-only late-pruning
  // window. rlo/rhi narrow the planned range; idSet, when every IN element
  // is understood, restricts generation to EXACTLY the matching ids (the
  // custom-source analogue of dynamic partition pruning skipping
  // partitions a runtime join key set can never hit).
  private var rlo = lo
  private var rhi = hi
  private var idSet: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("event_id"))

  /** Runtime filters are a correctness-preserving REDUCTION (the join
    * still re-checks its keys), so the conservative action on anything
    * not understood is a no-op — over-returning is safe, under-returning
    * never happens because ids are only dropped on a fully-decoded IN/=
    * whose value set is complete. */
  override def filter(predicates: Array[Predicate]): Unit = predicates.foreach { p =>
    def isEventId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("event_id"))
        case _ => false
      }
    def applyIds(vals: Array[Long]): Unit = {
      val inRange = vals.filter(v => v >= rlo && v < rhi).distinct.sorted
      idSet = Some(idSet.fold(inRange)(prev => prev.filter(inRange.toSet)))
      if (inRange.isEmpty) { rlo = 0L; rhi = 0L }
      else {
        rlo = math.max(rlo, inRange.head)
        rhi = math.min(rhi, inRange.last + 1L)
      }
    }
    def longOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[Long] =
      e match {
        case l: Literal[_] => l.value() match {
          case v: java.lang.Long => Some(v.longValue())
          case _ => None
        }
        case _ => None
      }
    (p.name(), p.children()) match {
      case ("IN", cs) if cs.nonEmpty && isEventId(cs.head) =>
        val vals = cs.tail.flatMap(longOf)
        if (vals.length == cs.length - 1) applyIds(vals) // every element decoded
      case ("=", Array(c, l)) if isEventId(c) =>
        longOf(l).foreach(v => applyIds(Array(v)))
      case _ => () // unknown/partial predicate: safe no-op
    }
  }

  /** Same generator as a MICRO-BATCH stream: offsets are positions in the
    * id space, each trigger drains ≤ rowsPerBatch ids (rate limiting),
    * resuming from the checkpointed offset after restart — the offset
    * bookkeeping a real log/queue source (Kafka-style) implements.
    * Pruning/pushdown from the ScanBuilder applies to the stream too. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventsMicroBatchStream(lo, hi, parts, required, rowsPerBatch)
  override def description(): String =
    s"graft_events[range=[$lo,$hi), partitions=$parts, cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = idSet match {
    case Some(ids) =>
      if (ids.isEmpty) Array.empty
      else {
        val step = math.max(1, (ids.length + parts - 1) / parts)
        ids.grouped(step).map(a => EventsIdSet(a): InputPartition).toArray
      }
    case None =>
      val n = math.max(0L, rhi - rlo)
      if (n == 0L) return Array.empty
      val step = math.max(1L, (n + parts - 1) / parts)
      (rlo until rhi by step)
        .map(s => EventsRange(s, math.min(s + step, rhi)): InputPartition)
        .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(required.fieldNames)
}

case class EventsRange(start: Long, end: Long) extends InputPartition

/** Exact id list from a fully-decoded runtime IN filter — generation
  * touches ONLY these ids. */
case class EventsIdSet(ids: Array[Long]) extends InputPartition

/** Offset = position in the id space; json is just the long. */
case class EventsOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

class EventsMicroBatchStream(lo: Long, hi: Long, parts: Int,
                             required: StructType, rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = EventsOffset(lo)

  override def deserializeOffset(json: String): Offset =
    EventsOffset(json.trim.toLong)

  /** Trigger.AvailableNow end target, captured ONCE at trigger start (the
    * Kafka-source shape): the engine keeps firing rate-limited batches
    * until the offset reaches this snapshot, then terminates — even if a
    * live source kept appending past it. Here the id space is static so
    * the snapshot is always `hi`, but the capture point is the contract;
    * without this interface the engine's generic AvailableNow wrapper
    * snapshots the FIRST rate-limited latestOffset as its end and stops
    * after one batch (the pre-round-12 processAllAvailable workaround). */
  @volatile private var availableNowEnd: Long = hi
  override def prepareForTriggerAvailableNow(): Unit = { availableNowEnd = hi }

  /** Without admission control the whole id space would land in one
    * micro-batch; with it, each trigger admits ≤ rowsPerBatch ids and the
    * stream self-terminates once the offset reaches hi (bounded replay —
    * the Kafka-source rate-limiting shape). */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventsOffset].pos
    EventsOffset(math.min(availableNowEnd, s + rowsPerBatch))
  }

  override def reportLatestOffset(): Offset = EventsOffset(hi)

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventsOffset].pos
    val e = end.asInstanceOf[EventsOffset].pos
    if (e <= s) return Array.empty
    val n = e - s
    val step = math.max(1L, (n + parts - 1) / parts)
    (s until e by step)
      .map(b => EventsRange(b, math.min(b + step, e)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(required.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class EventsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  // materialize ONLY the pruned-to fields, in requested order
  private def row(i: Long): InternalRow = {
    val values: Array[Any] = fields.map {
      case "event_id" => i
      case "user_id" => EventsSource.userId(i)
      case "event_type" => UTF8String.fromString(EventsSource.eventType(i))
      case "ts_us" => EventsSource.tsUs(i)
      case "value" => EventsSource.value(i)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case EventsRange(start, end) =>
        new PartitionReader[InternalRow] {
          private var i = start - 1
          override def next(): Boolean = { i += 1; i < end }
          override def get(): InternalRow = row(i)
          override def close(): Unit = ()
        }
      case EventsIdSet(ids) =>
        new PartitionReader[InternalRow] {
          private var k = -1
          override def next(): Boolean = { k += 1; k < ids.length }
          override def get(): InternalRow = row(ids(k))
          override def close(): Unit = ()
        }
    }
}
