package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of one word under an ordered merge-rule list: start
  * from single characters (Unicode code points — the same axis as SQL
  * `substr`) and apply each rule `(a, b) → ab` in TRAINING ORDER with the
  * leftmost-first fold (scan left to right; when the accumulator ends in
  * `a` and the next piece is `b`, fuse them — so "aaa" under (a,a) becomes
  * ["aa", "a"], never ["a", "aa"]). This is the standard deterministic
  * apply rule, and exactly the `list_reduce` fold the DuckDB oracle runs.
  *
  * Why a kernel expression: the rule list changes every training round
  * (k rounds of grow-by-one), and an expression tree over rule literals
  * would be re-janino-compiled per round — the same per-codebook
  * anti-pattern [[SubspaceCodes]] replaced for PQ. The rules ride as a
  * reference object, so the generated source (one `compute` call) is
  * identical across rounds and compiles once ever.
  */
case class BpeSegments(child: Expression, rules: Array[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segments"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  /** The per-row kernel — called from both eval paths. */
  def compute(w: UTF8String): ArrayData = {
    val word = w.toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    var pieces: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var r = 0
    while (r < rules.length) {
      val (a, b) = rules(r)
      val out = scala.collection.mutable.ArrayBuffer[String](pieces(0))
      var i = 1
      while (i < pieces.length) {
        if (out.last == a && pieces(i) == b) out(out.length - 1) = a + b
        else out += pieces(i)
        i += 1
      }
      pieces = out.toArray
      r += 1
    }
    new GenericArrayData(pieces.map(UTF8String.fromString): Array[Any])
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSegments", this, classOf[BpeSegments].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {

  /** BPE pieces of a word under ordered merge rules (see [[BpeSegments]]). */
  def bpeSegments(word: Column, rules: Array[(String, String)]): Column =
    ColumnBridge.column(BpeSegments(ColumnBridge.expression(word), rules))
}
