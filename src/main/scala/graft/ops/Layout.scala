package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-layout clustering helpers for multi-dimensional data skipping.
  *
  * A 1-D sorted layout (repartitionByRange + sortWithinPartitions) gives
  * disjoint per-file ranges on ONE key; predicates on any other key still
  * touch every file. Interleaving the bits of two bucketed keys into a
  * Z-order (Morton) key and range-laying-out on THAT bounds each file's
  * span in BOTH dimensions (a contiguous Z-range of L cells spans
  * ≲ 2·√L per axis), so row-group min/max stats prune on either
  * predicate — the lakehouse clustering idea with nothing beyond built-in
  * bitwise expressions, fully codegen'd.
  */
object Layout {

  /** Morton key: interleave the low `bits` of two non-negative integer
    * columns (a in the odd bit positions, b in the even). Inputs must
    * already be bucketed to [0, 2^bits). */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Z-order-clustered relayout into `n` files on the interleaved key. */
  def zorderBy(df: DataFrame, n: Int, a: Column, b: Column, bits: Int): DataFrame = {
    val z = zValue(a, b, bits)
    df.withColumn("_z", z)
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
