package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernels — the canonicalization pass that runs
  * BEFORE any text dedup in a training-data pipeline (two byte-different
  * encodings of the same accented word must hash identically before
  * MinHash/SimHash/exact dedup can see them as duplicates; reference
  * behavior: the near-dup MLE goals of /root/reference/README.md:47-52
  * presuppose canonical text). Same static-kernel shape as
  * [[StringDistances]]: one static call per row inside whole-stage codegen.
  *
  * Semantics are pinned to DuckDB's builtins so the driver oracle can
  * hash-match the normalized strings themselves (not just flags):
  *
  *  - `nfc` — Unicode NFC canonical composition, `java.text.Normalizer`
  *    ≡ DuckDB `nfc_normalize` (both implement UAX #15; probed on
  *    combining-mark sequences: 'a'+U+0301 → U+00E1 in both).
  *  - `stripAccents` — NFD decompose then drop non-spacing marks (Mn),
  *    ≡ DuckDB `strip_accents` (utf8proc STRIPMARK; probed: 'áéîñü çō' →
  *    'aeinu co', 'Ā ş ž' → 'A s z'). For Latin input the surviving
  *    characters are ASCII, so no recomposition step is needed for
  *    equivalence.
  */
object TextNormalizers {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and ASCII-only
    // strings (the overwhelming majority of real corpora) allocate nothing
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) s
    else {
      val sb = new java.lang.StringBuilder(d.length)
      i = 0
      while (i < d.length) {
        val c = d.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** graft_nfc(string) → string: Unicode NFC canonical composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    TextNormalizers.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalizers.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** graft_strip_accents(string) → string: NFD + drop non-spacing marks. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    TextNormalizers.stripAccents(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalizers.stripAccents($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
