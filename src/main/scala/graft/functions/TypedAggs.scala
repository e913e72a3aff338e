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
/** KMV (k-minimum-values) distinct-count sketch as a mergeable typed
  * `Aggregator` — the theta-sketch-style summary that, unlike HLL
  * (`approx_count_distinct`), supports SET ALGEBRA after aggregation:
  * union (merge the value lists, keep the k smallest) and intersection
  * (count common values below the union's k-th minimum) estimates compose
  * from already-computed per-group sketches, no re-scan of the data.
  *
  * The buffer is the sorted array of the k smallest DISTINCT hash values
  * seen (inputs are pre-hashed to signed 64-bit, e.g. xxhash64; signed
  * order equals unsigned order after the +2^63 shift applied at estimate
  * time). reduce inserts in O(log k + k) only when the value beats the
  * current k-th min; merge is a bounded sorted-merge — associative and
  * commutative, so the sketch is shuffle-safe map-side combinable
  * (Beyer et al. SIGMOD'07; Agarwal et al. PODS'12 mergeability).
  *
  * Estimator (uniform hashes u_(1..k) on (0,1)): E[u_(k)] = k/(n+1), so
  * n̂ = (k−1)/u_(k). Downstream SQL applies it with higher-order array
  * functions over the returned sketch — see Analytics.kmvUsers. */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 1, "k must be > 1")

  override def zero: Array[Long] = Array.empty

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, h)
    if (idx >= 0) b                                   // already present
    else if (b.length < k) {
      val out = new Array[Long](b.length + 1)
      val ins = -idx - 1
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(b, ins, out, ins + 1, b.length - ins)
      out
    } else if (h >= b(k - 1)) b                       // not among k smallest
    else {
      val ins = -idx - 1
      val out = new Array[Long](k)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
      out
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // bounded sorted merge of two distinct-sorted arrays, keep k smallest
    val out = new Array[Long](math.min(k, b1.length + b2.length))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue; var hasLast = false
    while (n < out.length && (i < b1.length || j < b2.length)) {
      val take =
        if (i >= b1.length) { val v = b2(j); j += 1; v }
        else if (j >= b2.length) { val v = b1(i); i += 1; v }
        else if (b1(i) <= b2(j)) { val v = b1(i); i += 1; v }
        else { val v = b2(j); j += 1; v }
      if (!hasLast || take != last) { out(n) = take; n = n + 1; last = take; hasLast = true }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

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
