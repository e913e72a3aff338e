package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native AS-OF join — the whole-operator (c)-tier extension of SURVEY §7.4:
  * for every left row, the single right row with the same key and the
  * LARGEST right time ≤ the left time (backward, the default), or the
  * SMALLEST right time ≥ it (`forward = true`). LEFT OUTER either way:
  * unmatched lefts keep null right columns.
  *
  * Spark has no as-of join operator; the composable workaround (union both
  * sides + `last(..., ignoreNulls)` window — [[graft.ops.EventOps.asofSignup]])
  * materializes and window-scans the UNION of both relations. This operator
  * instead asks Catalyst for co-partitioned, (key, time)-sorted children —
  * the same `requiredChildDistribution`/`requiredChildOrdering` contract
  * SortMergeJoin uses, so EnsureRequirements plans ONE hash exchange per
  * side (reused if the data is already bucketed that way) — and then
  * streams each partition pair with an O(|L|+|R|) two-pointer merge
  * holding exactly ONE buffered candidate row, never a per-key row set and
  * never a window frame. At 100 TB that is the floor: two keyed shuffles,
  * zero row explosion, constant per-partition state.
  *
  * Time expressions must be LongType (epoch micros; cast upstream). Right
  * rows with null time never match; a null left time matches nothing.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false) extends BinaryNode {

  require(leftKeys.length == rightKeys.length,
    "as-of join needs the same number of keys on both sides")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    s"as-of join times must be LongType (epoch micros), got " +
      s"${leftTime.dataType}/${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `spark.experimental.extraStrategies` (imperative sessions) or
  * [[graft.functions.GraftExtensions]] (declarative config). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned (key, time)-sorted children, one
  * forward pass per partition pair. Backward (nearest ≤) buffers exactly
  * one candidate row per key — the only hot-path allocation is a copy per
  * candidate UPDATE, not per row; forward (nearest ≥) needs no buffering
  * at all: the first unconsumed same-key right row IS the answer. Key
  * projections and the output row reuse their buffers exactly like
  * SortMergeJoinExec. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeB = BindReferences.bindReference(leftTime, left.output)
      val rTimeB = BindReferences.bindReference(rightTime, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      // head of the unconsumed right stream (rows reuse buffers — key is
      // re-projected after every advance, the candidate alone is copied)
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTime: java.lang.Long = null
      def advanceRight(): Unit = {
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKey = rKeyProj(rRow)
          val t = rTimeB.eval(rRow)
          rTime = if (t == null) null else t.asInstanceOf[Long]
        } else { rRow = null; rKey = null; rTime = null }
      }
      advanceRight()

      var cand: InternalRow = null   // backward: latest right row for candKey
      var candKey: UnsafeRow = null  // owned copy

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val ltRaw = lTimeB.eval(lRow)
        val ltNull = ltRaw == null
        val lt: Long = if (ltNull) 0L else ltRaw.asInstanceOf[Long]
        if (forward) {
          // consume right rows that can never match this or any later left
          // row (key behind, null time, or time strictly before lt); the
          // head left standing IS the nearest >= match — no buffering
          var advancing = rRow != null
          while (advancing) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0 || (c == 0 && (rTime == null || (!ltNull && rTime < lt)))) {
              advanceRight()
              advancing = rRow != null
            } else advancing = false
          }
          val matched =
            !ltNull && rRow != null && keyOrd.compare(rKey, lKey) == 0
          resultProj(joined(lRow, if (matched) rRow else nullRight))
        } else {
          // a null left time matches nothing: !ltNull gates both the
          // consume/candidate branch and the final match (no MinValue
          // sentinel — a right row at exactly Long.MinValue must not match)
          var advancing = rRow != null
          while (advancing) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0 || (c == 0 && (rTime == null || (!ltNull && rTime <= lt)))) {
              if (c == 0 && !ltNull && rTime != null && rTime <= lt) {
                cand = rRow.copy()
                if (candKey == null || keyOrd.compare(candKey, lKey) != 0)
                  candKey = lKey.copy()
              }
              advanceRight()
              advancing = rRow != null
            } else advancing = false
          }
          val matched = !ltNull &&
            cand != null && candKey != null && keyOrd.compare(candKey, lKey) == 0
          resultProj(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }
}

/** Programmatic entry point (the DataFrame-level API). */
object AsOfJoinOps {

  /** LEFT OUTER as-of join of `left` to `right` on equal `keys` with the
    * nearest `rightTime` ≤ `leftTime`. Column names must be disjoint
    * across the two sides (alias upstream — also what guarantees distinct
    * expression ids, since Catalyst's self-join deduplication only knows
    * built-in join nodes). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftTime: String, rightTime: String,
               forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val overlap = lPlan.output.map(_.name).toSet
      .intersect(rPlan.output.map(_.name).toSet)
    require(overlap.isEmpty,
      s"as-of join sides share column names ${overlap.mkString(", ")}; " +
        "alias one side first")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
        leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
        attr(lPlan, leftTime), attr(rPlan, rightTime), forward))
  }
}
