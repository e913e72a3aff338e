package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
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
