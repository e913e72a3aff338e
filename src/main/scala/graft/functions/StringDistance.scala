package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Static string-distance kernels called from generated code — the same
  * shape as Spark's built-in `levenshtein` (a static
  * `UTF8String.levenshteinDistance` call inside whole-stage codegen): the
  * DP/match loops are far too large to inline as generated Java, but a
  * single static call keeps the enclosing projection inside one codegen
  * span. Semantics are pinned to DuckDB's builtins of the same name so the
  * driver's oracle can hash-match real similarity joins:
  *
  *  - `jaroWinkler` — Jaro similarity with the standard Winkler prefix
  *    bonus (scaling 0.1, prefix cap 4) applied only above the classic 0.7
  *    boost threshold (probed: DuckDB returns plain Jaro 0.5 for a
  *    prefix-2 pair at 0.5, so the bonus is gated, not unconditional).
  *  - `damerauLevenshtein` — the FULL Damerau–Levenshtein (Lowrance–Wagner
  *    with the alphabet last-seen table), not the restricted
  *    optimal-string-alignment variant: probed `damerau_levenshtein('CA',
  *    'ABC') = 2` (OSA would say 3), so a matching implementation must
  *    allow edits between transposed characters.
  *  - `hamming` — positionwise mismatches; generalized to unequal lengths
  *    by counting the overhang as mismatches (DuckDB errors there; query
  *    fixtures only compare equal-length keys).
  *
  * All three operate on UTF-16 chars, identical to code points for the
  * ASCII/BMP fixture names they target.
  */
object StringDistances {

  def jaroWinkler(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    val n = a.length
    val m = b.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val aMatch = new Array[Boolean](n)
    val bMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var halfTrans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    val md = matches.toDouble
    val jaro = (md / n + md / m + (md - halfTrans / 2.0) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val cap = math.min(4, math.min(n, m))
      var p = 0
      while (p < cap && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }

  def damerauLevenshtein(l: UTF8String, r: UTF8String): Int = {
    val a = l.toString
    val b = r.toString
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is offset by +1 relative to the usual Levenshtein matrix: row/col 0
    // hold the `inf` sentinel the transposition lookback reads when a
    // character has no earlier occurrence.
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val lastRow = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var lastCol = 0
      j = 1
      while (j <= m) {
        val rowOfB = {
          val v = lastRow.get(b.charAt(j - 1))
          if (v == null) 0 else v.intValue()
        }
        val colOfA = lastCol
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; lastCol = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(rowOfB)(colOfA) + (i - rowOfB - 1) + 1 + (j - colOfA - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      lastRow.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  def hamming(l: UTF8String, r: UTF8String): Int = {
    val a = l.toString
    val b = r.toString
    val n = math.min(a.length, b.length)
    var diff = math.max(a.length, b.length) - n
    var i = 0
    while (i < n) {
      if (a.charAt(i) != b.charAt(i)) diff += 1
      i += 1
    }
    diff
  }
}

/** jaro_winkler(string, string) → double in [0, 1]. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringDistances.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** damerau_levenshtein(string, string) → int; full (unrestricted) variant. */
case class DamerauLev(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.damerauLevenshtein(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringDistances.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** hamming(string, string) → int; overhang counts as mismatches. */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistances.hamming(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringDistances.hamming($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
