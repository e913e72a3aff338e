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

  /** Hilbert key of two bucketed non-negative integer columns (inputs in
    * [0, 2^bits)) as a new column `out` — the stronger clustering curve:
    * consecutive Hilbert cells are ALWAYS Manhattan-distance 1 apart
    * (Morton jumps up to 2^bits−1 at quadrant seams), so a contiguous
    * key-range maps to one connected blob, not two distant sub-squares.
    * Same aligned-block guarantee as Morton (an aligned 4^k-cell range is
    * an exact 2^k×2^k square — the curve is a quadtree traversal), so
    * everything [[zValue]] buys for min/max skipping holds with better
    * range-scan locality.
    *
    * Standard xy2d (Gray-code quadrant + rotate; Hilbert 1891, the usual
    * iterative form): per level s = 2^i from the top, the quadrant index
    * is the Gray code of (rx, ry) — 0,1,3,2 — and the lower levels see
    * (x, y) reflected into the quadrant's frame. One projection per
    * level (a fold of `withColumns`), all integer CASE arithmetic, fully
    * codegen'd; no UDF, no loop at row scope. */
  def withHilbert(df: DataFrame, a: Column, b: Column, bits: Int, out: String): DataFrame = {
    val n1 = (1L << bits) - 1
    val start = df
      .withColumn("_hx", a.cast("long"))
      .withColumn("_hy", b.cast("long"))
      .withColumn(out, lit(0L))
    val folded = (0 until bits).reverse.foldLeft(start) { (cur, i) =>
      val s = 1L << i
      val x = col("_hx"); val y = col("_hy")
      val rx = shiftright(x, i).bitwiseAND(lit(1L))
      val ry = shiftright(y, i).bitwiseAND(lit(1L))
      // (3*rx) xor ry without engine bitwise-xor: the Gray-code order
      val quad = when(ry === 1L, when(rx === 1L, lit(2L)).otherwise(lit(1L)))
        .otherwise(when(rx === 1L, lit(3L)).otherwise(lit(0L)))
      // rotate/reflect the frame for the lower levels (flip is within the
      // FULL grid, n1 — only the low bits matter to later levels)
      val nx = when(ry === 1L, x).otherwise(when(rx === 0L, y).otherwise(lit(n1) - y))
      val ny = when(ry === 1L, y).otherwise(when(rx === 0L, x).otherwise(lit(n1) - x))
      cur.withColumns(Map(
        out -> (col(out) + lit(s * s) * quad),
        "_hx2" -> nx, "_hy2" -> ny))
        .drop("_hx", "_hy")
        .withColumnRenamed("_hx2", "_hx")
        .withColumnRenamed("_hy2", "_hy")
    }
    folded.drop("_hx", "_hy")
  }
}
