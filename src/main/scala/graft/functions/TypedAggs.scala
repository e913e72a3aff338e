package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF coverage (SURVEY §2.4/§2.9): the documented pattern
  * for mergeable aggregation state when no built-in exists. Sum-of-squares
  * keeps the oracle twin trivial (sum(x*x)); the same skeleton carries any
  * commutative-monoid sketch (the buffer must merge associatively — that is
  * what makes it shuffle-safe map-side combinable at 100 TB).
  */
object SumSq extends Aggregator[Double, Double, Double] {
  override def zero: Double = 0.0
  override def reduce(b: Double, a: Double): Double = b + a * a
  override def merge(b1: Double, b2: Double): Double = b1 + b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Misra–Gries heavy-hitters summary as a mergeable typed `Aggregator` —
  * the single-pass frequent-items sketch for 100 TB streams where a full
  * `groupBy(key).count` shuffle is not affordable. The buffer is a bounded
  * map of at most `capacity` counters:
  *
  *   - reduce: increment the key's counter; on overflow past `capacity`,
  *     subtract the (capacity+1)-th largest counter value from every
  *     counter and drop the non-positive ones (the classic decrement step,
  *     Misra & Gries 1982).
  *   - merge: add counters pointwise, then apply the same compression —
  *     this is what makes the sketch shuffle-safe (partial aggregation
  *     map-side, merge at the final reducer). Merging preserves the error
  *     bound (Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Guarantees, with n = stream length: every key with true frequency
  * > n/(capacity+1) survives in the summary, and each surviving estimate
  * satisfies `true - n/(capacity+1) <= est <= true` (estimates never
  * overcount). When the observed distinct-key count never exceeds
  * `capacity`, no decrement ever fires and the summary is EXACT — that is
  * the mode `q_heavy_hitters` runs in, which is what lets it carry a full
  * DuckDB group-by-count oracle; the approximation guarantee under
  * overflow is pinned by `SketchSpec`.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    compress(b.updated(key, b.getOrElse(key, 0L) + 1L))

  override def merge(b1: Map[String, Long],
                     b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    compress(small.foldLeft(large) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    })
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  /** Decrement step: if more than `capacity` counters live, subtract the
    * (capacity+1)-th largest value from all and drop the non-positive —
    * O(size log size) only when an overflow actually occurs. */
  private def compress(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      val kth = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      m.collect { case (k, v) if v > kth => k -> (v - kth) }
    }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
