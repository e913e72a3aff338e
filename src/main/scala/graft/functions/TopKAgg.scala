package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a NATIVE mergeable aggregate (`TypedImperativeAggregate`
  * — the same machinery as Spark's `percentile_approx`/`collect_list`,
  * object-hash aggregated): each task keeps a bounded k-element min-heap
  * per group, partial aggregation combines heaps map-side, and only k
  * (value, id) pairs per group per task ever cross the wire.
  *
  * This is the scale counterpoint to the window formulation
  * (`q_window_topk_group`'s rank-over-partition): a window must shuffle and
  * sort EVERY row of the corpus by (group, value); the heap aggregate
  * shuffles ≤ k·groups·tasks rows and never sorts more than k elements at
  * once. At 100 TB with k=3 that is the difference between a full-corpus
  * exchange and kilobytes per task.
  *
  * Ordering is total — (value DESC, id ASC) — so results are deterministic
  * under any partitioning and the DuckDB row_number twin hash-matches
  * exactly. Output: array<struct<value double, id long>> sorted best-first.
  */
case class TopKByValue(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "top-k requires k > 0")

  // min-heap: head = WORST kept entry (lowest value; among equal values the
  // highest id), so one compare decides eviction.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(
      heap: mutable.PriorityQueue[(Double, Long)], v: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((v, id))
    else {
      val (wv, wid) = heap.head
      // better than the worst kept = higher value, or equal value + lower id
      if (v > wv || (v == wv && id < wid)) {
        heap.dequeue()
        heap.enqueue((v, id))
      }
    }
  }

  override def update(
      heap: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      offer(heap, v.asInstanceOf[Double], id.asInstanceOf[Long])
    heap
  }

  override def merge(
      heap: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (v, id) => offer(heap, v, id) }
    heap
  }

  override def eval(heap: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = heap.toArray.sortBy { case (v, id) => (-v, id) }
    new GenericArrayData(best.map { case (v, id) => InternalRow(v, id) })
  }

  override def serialize(heap: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { heap.enqueue((in.readDouble(), in.readLong())); i += 1 }
    heap
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}
