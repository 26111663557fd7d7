package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** 128-bit fingerprints of every k-token window of a token array — the
  * per-document kernel of exact-substring dedup (see
  * [[graft.operators.Dedup.duplicatedNgramSpans]]).
  *
  * Output row i is the fingerprint of tokens [i, i+k): two xxhash64
  * chains, each seeded differently and folded token-by-token
  * (`h = xxh64(token, h)`), so token BOUNDARIES are part of the hash —
  * ["ab","c"] and ["a","bc"] cannot collide by concatenation — and two
  * windows agree iff their token sequences agree (up to 128-bit hash
  * collision, ~1e-20 per pair; at 1e12 windows the expected number of
  * colliding PAIRS is still ~1e-5, which is why the downstream group-by
  * can key on the fingerprint instead of shipping the k-token text
  * through the shuffle — 16 bytes per window instead of k words).
  *
  * Why an expression and not `transform(sequence(...), i ->
  * hash(slice(toks, i+1, k)))`: a free reference to the token array
  * inside a higher-order-function lambda re-evaluates it PER ELEMENT
  * (higher-order functions are interpreted, no common-subexpression
  * elimination), turning the regex split quadratic in document length.
  * The kernel evaluates its child once and walks it in O(n·k).
  */
case class NgramFingerprints(child: Expression, k: Int, seedA: Long, seedB: Long)
    extends UnaryExpression {

  require(k >= 1, "window length must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ngram_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${dt.simpleString}")
  }

  /** The per-row kernel — called from both eval paths. O(n·k) hash folds,
    * no allocation beyond the output. A null token contributes a fixed
    * sentinel fold (distinct from any real token's bytes-hash), so null
    * and "" stay distinguishable.
    */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = math.max(n - k + 1, 0)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      var h1 = seedA
      var h2 = seedB
      var j = i
      while (j < i + k) {
        if (toks.isNullAt(j)) {
          h1 = XXH64.hashInt(-1, h1)
          h2 = XXH64.hashInt(-1, h2)
        } else {
          val t = toks.getUTF8String(j)
          h1 = XXH64.hashUTF8String(t, h1)
          h2 = XXH64.hashUTF8String(t, h2)
        }
        j += 1
      }
      out(i) = InternalRow(h1, h2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramFp", this, classOf[NgramFingerprints].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramExpressions {
  /** Distinct chain seeds; any fixed distinct pair works (the chains never
    * have to match an external implementation — fingerprints are internal
    * shuffle keys, only window POSITIONS surface in results).
    */
  val SeedA = 0x9E3779B97F4A7C15L
  val SeedB = 0xC2B2AE3D27D4EB4FL

  /** Column form of [[NgramFingerprints]] with the default seed pair. */
  def ngramFingerprints(tokens: Column, k: Int): Column =
    ColumnBridge.column(
      NgramFingerprints(ColumnBridge.expression(tokens), k, SeedA, SeedB))
}
