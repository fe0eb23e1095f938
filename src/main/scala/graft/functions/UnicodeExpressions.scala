package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as native codegen expressions — the
  * first cleaning step of every LLM text pipeline: the SAME user text
  * arrives both precomposed (é = U+00E9) and decomposed
  * (e + U+0301), and every downstream exact-dedup hash, shingle, and
  * equality join silently misses unless the corpus is normalized
  * first.
  *
  *  - [[NfcNormalize]]: Unicode NFC (canonical composition, UAX#15 —
  *    java.text.Normalizer, the same algorithm DuckDB's
  *    `nfc_normalize` implements via utf8proc, so the oracle gate is
  *    byte-exact).
  *  - [[StripAccents]]: the accent-folding recipe (NFD decompose,
  *    drop ALL combining-mark code points — Mn, Mc, Me, including
  *    supplementary-plane marks — then recompose) matching DuckDB's
  *    utf8proc-STRIPMARK `strip_accents` — the search/linkage
  *    canonicalization (München -> Munchen) fed to q149-style fuzzy
  *    matching.
  *
  * Both are UnaryExpressions with `doGenCode` delegating to a static
  * kernel, so a 100 TB normalization pass stays inside whole-stage
  * codegen next to the tokenizers. ASCII fast path: the dominant case
  * (already-NFC ASCII bytes) returns the input UNCHANGED with zero
  * allocation — only rows containing non-ASCII pay the JDK Normalizer.
  */
abstract class UnicodeUnary extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
}

case class NfcNormalize(child: Expression) extends UnicodeUnary {
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(s: Any): Any =
    UnicodeExpressions.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeExpressions.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnicodeUnary {
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(s: Any): Any =
    UnicodeExpressions.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeExpressions.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeExpressions {

  import org.apache.spark.sql.{Column, GraftBridge}

  /** Column wrappers (the DataFrame-API face of the expressions). */
  def nfcCol(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
  def stripAccentsCol(c: Column): Column =
    GraftBridge.column(StripAccents(GraftBridge.expression(c)))

  /** All-ASCII bytes are NFC by definition and accent-free — the
    * dominant corpus case skips the JDK entirely. */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    // iterate by CODE POINT, not UTF-16 unit: a supplementary-plane
    // mark (e.g. U+1D165 MUSICAL SYMBOL COMBINING STEM) is a surrogate
    // pair whose per-char category is SURROGATE, so a char loop would
    // pass it through; and utf8proc's STRIPMARK (what DuckDB's
    // strip_accents runs) drops ALL mark categories — Mn, Mc, Me —
    // not just non-spacing marks
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
