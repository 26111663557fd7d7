package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[UnicodeNormalize]] — a top-level object so the
  * generated (Janino) code can call it through the Scala static forwarder
  * `graft.functions.UnicodeNorm.nfc(...)`.
  *
  * Real crawl corpora mix NFC and NFD encodings of the same text ("café"
  * as 4 codepoints vs 5), and byte-level tokenize/shingle/hash operators
  * silently treat them as distinct — deflating dedup recall and inflating
  * vocabulary counts. The reference engine is ASCII-only (reference
  * `mapreduce/mapreduce.go:33-35`) so it never faces this; the extension
  * surface must. Canonical composition (NFC) before any tokenize/shingle
  * makes equal-looking text byte-equal; the DuckDB oracle replays it with
  * its built-in `nfc_normalize`.
  *
  * Cost discipline for the 100 TB hot path: the overwhelmingly common
  * case (pure-ASCII document) pays ONE vectorized byte scan
  * (`UTF8String.isFullAscii`, no allocation) and returns the input
  * buffer unchanged. Non-ASCII text pays a second quick-check
  * (`Normalizer.isNormalized`, allocation-free for already-NFC text
  * beyond the String view) and only genuinely denormalized text pays the
  * compose + re-encode.
  */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }

  /** Compatibility composition — additionally folds width/ligature/
    * superscript compatibility variants (ﬁ → fi, ２ → 2). NOT applied on
    * the oracle-checked default path (DuckDB has no NFKC builtin to
    * replay it); exposed for callers who want the more aggressive fold.
    */
  def nfkc(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
    }
}

/** Codegen'd Unicode normalization (NFC by default, NFKC on request).
  * Stays inside whole-stage codegen — the generated code is a single
  * static call into [[UnicodeNorm]], whose ASCII fast path is an
  * allocation-free byte scan. Null-intolerant: null in, null out.
  */
case class UnicodeNormalize(child: Expression, compatibility: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = if (compatibility) "nfkc_normalize" else "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  private def kernel: String = if (compatibility) "nfkc" else "nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (compatibility) UnicodeNorm.nfkc(s) else UnicodeNorm.nfc(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.UnicodeNorm.$kernel($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
