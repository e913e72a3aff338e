package graft.sources

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DSv2 SINK — the write half of the (c)-tier source story: the
  * full two-phase commit protocol. Each task's `DataWriter` accumulates
  * row count + a sum over the first LongType column; `commit()` ships
  * them to the driver as `WriterCommitMessage`s, and ONLY the driver-side
  * `BatchWrite.commit` publishes the aggregate — a task that fails or is
  * speculatively re-executed contributes nothing until the job-level
  * commit, which is exactly the atomicity contract a real table format
  * implements (task state lives in the messages, so abort = drop them).
  *
  * The published result lands in a process-local registry keyed by
  * option("name") — an audit/stats sink for tests and pipelines that need
  * write-side totals without a second scan (single-JVM by design; a real
  * sink would write files + a manifest in commit()).
  */
object AuditSink {
  case class Stats(rows: Long, sum: Long)
  val results: ConcurrentHashMap[String, Stats] = new ConcurrentHashMap
}

class AuditSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: actual schema arrives via getTable

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new AuditTable(schema)
}

class AuditTable(writeSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft_audit_sink"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val slot = info.options.getOrDefault("name", "default")
    val sumIdx = info.schema().fields.indexWhere(_.dataType == LongType)
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // overwrite == fresh slot
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(slot, sumIdx)
      }
    }
  }
}

case class AuditTaskStats(rows: Long, sum: Long) extends WriterCommitMessage

class AuditBatchWrite(slot: String, sumIdx: Int) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(sumIdx)

  /** Job-level commit: the ONLY place results become visible. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val stats = messages.collect { case AuditTaskStats(r, s) => (r, s) }
    AuditSink.results.put(slot,
      AuditSink.Stats(stats.map(_._1).sum, stats.map(_._2).sum))
  }

  /** Abort: uncommitted task state exists only in the dropped messages. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class AuditWriterFactory(sumIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        if (sumIdx >= 0 && !record.isNullAt(sumIdx)) sum += record.getLong(sumIdx)
      }
      override def commit(): WriterCommitMessage = AuditTaskStats(rows, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
