package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC — the rsync/LBFS family; the dedup
  * literature's shift-robust alternative to fixed-grid chunks): a chunk
  * boundary falls wherever the polynomial hash of the trailing `w`-char
  * window hits 0 mod `mask`. Because boundaries depend only on LOCAL
  * content, inserting or deleting text early in a document moves every
  * fixed-grid chunk but leaves all CDC chunks beyond the edit identical —
  * which is what lets span-level dedup survive boilerplate injection.
  *
  * The hash is deliberately the NAIVE windowed polynomial
  * `Σ_{j=0..w-1} code(c[i−j])·Bʲ mod P` — O(len·w) instead of rolling
  * O(len), but spelled term-by-term so [[CdcParams.oracleHashSql]] can
  * generate the byte-identical DuckDB twin from the same constants (the
  * generated-oracle pattern of languageId): both engines compute the same
  * exact integers, so the driver hash-matches chunk fingerprints, not just
  * counts. With code ≤ 0x10FFFF and 8 terms each < codeMax·P, the sum
  * stays far below 2⁶³ — no per-term modulo needed on either engine.
  */
object CdcParams {
  val B = 257L
  val P = 2147483647L // 2^31 − 1, prime
  val w = 8
  val mask = 64L // expected chunk length ≈ mask chars

  /** B^j mod P for j = 0..w−1 — the shared constants. */
  val powers: Array[Long] = {
    val a = new Array[Long](w)
    a(0) = 1L
    var j = 1
    while (j < w) { a(j) = a(j - 1) * B % P; j += 1 }
    a
  }

  /** DuckDB boundary predicate over 1-based position `i` (window is chars
    * i−w+1..i of `text`), generated from the same constants as the JVM
    * loop in [[CdcBoundaries]]. */
  def oracleHashSql(text: String, i: String): String = {
    val terms = (0 until w).map { j =>
      s"CAST(ascii(substring($text, $i - $j, 1)) AS BIGINT) * ${powers(j)}"
    }.mkString(" + ")
    s"(($terms) % $P) % $mask = 0"
  }
}

/** cdc_ends(text) → sorted array<int> of 1-based INCLUSIVE chunk end
  * positions: every boundary position (window-hash ≡ 0 mod mask) plus the
  * document end. Chunks are then the segments between consecutive ends —
  * `substring(text, prev_end + 1, end − prev_end)`. Empty text → [0] kept
  * as a single degenerate end so downstream lag logic needs no special
  * case (substring(·, 1, 0) = '' on both engines). Cold path, one eval
  * per document (CodegenFallback, like the shingle expressions). */
case class CdcBoundaries(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import CdcParams._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val ends = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = w // 1-based position of the window's last char
    while (i <= n) {
      var h = 0L
      var j = 0
      while (j < w) { h += s.charAt(i - 1 - j).toLong * powers(j); j += 1 }
      if (h % P % mask == 0L && i != n) ends += i
      i += 1
    }
    ends += n // document end always closes the last chunk
    new GenericArrayData(ends.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
