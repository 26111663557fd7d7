package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** PORTABLE fixed-point natural logarithm — `ln_f(x) ≈ 2^20 · ln(x)` for an
  * integer `x ≥ 1`, computed entirely in int64 arithmetic so every engine
  * (Spark, DuckDB, anything with 64-bit integers) produces the SAME integer.
  *
  * Why: the exact-hash correctness gate rules out float `ln()` — it is only
  * 1-ulp-accurate on the JVM vs correctly-rounded in C libm, which diverges
  * on ~0.1% of arguments (see TextAnalysis.tfIdfTopTerms). But the round-11
  * operators genuinely NEED logarithms: DSIR importance weights are
  * log-likelihood ratios, LM quality scores are summed surprisals, and
  * Gumbel-top-k sampling is a double log of a uniform draw. The fix is to
  * DEFINE the logarithm as a fixed integer algorithm — power-of-2 extraction
  * plus an atanh series in 20-bit fixed point — and implement that same
  * definition on both sides of the gate. Accuracy vs the real `ln` is
  * ~3e-5 absolute (series truncation + integer-division truncation), which
  * is irrelevant for scoring/ranking semantics; bit-equality across engines
  * is what matters, and that is exact.
  *
  * The defined algorithm (F = 20, S = 2^20 = 1048576, LN2F = round(S·ln 2)
  * = 726817; all divisions truncate, all operands non-negative):
  *
  *   e  = floor(log2 x)                      (bit length − 1, exact)
  *   mf = x·2^(20−e) truncated into [S, 2S)  (the mantissa, 20-bit fixed pt)
  *   zf = ((mf − S)·S) div (mf + S)          (z = (m−1)/(m+1) ∈ [0, 1/3))
  *   ln m ≈ 2·(z + z³/3 + z⁵/5 + z⁷/7 + z⁹/9)   (atanh series; z² < 1/9 so
  *                                            the dropped z¹¹/11 term < 6e-7)
  *   ln_f = e·LN2F + 2·(zf + t3/3 + t5/5 + t7/7 + t9/9)
  *
  * Implemented as a native Catalyst expression (doGenCode emits the ~10
  * straight-line long ops) so the per-row call sites — Gumbel keys over the
  * corpus, surprisal per LM row — stay inside whole-stage codegen instead
  * of expanding to a ~700-node Column tree per call. [[FixedPointLn.lnFRef]]
  * is the plain-Scala reference the specs compare against, and
  * [[FixedPointLn.lnFSql]] emits the identical arithmetic as DuckDB lateral
  * column aliases for the oracle side.
  *
  * Null in → null out; x < 1 → null (the domain guard: callers add-1-smooth
  * their counts, so a null here means a bug upstream, and a poisoned NULL
  * is louder in the hash gate than a wrong number).
  */
case class FixedPointLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ln_fixed"

  // Exact-BIGINT check by design: the expression itself never casts (a
  // silent DOUBLE→BIGINT truncation here would corrupt the fixed-point
  // contract). Integral-literal ergonomics — `SELECT ln_fixed(5)` — are
  // handled by the SQL registration lambda, which wraps narrower INTEGRAL
  // children in an explicit up-cast (GraftExtensions); the Column helper
  // `lnF` does the same.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.simpleString}")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    if (x < 1L) null else FixedPointLn.lnFRef(x): java.lang.Long
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val e = ctx.freshName("e")
      val mf = ctx.freshName("mf")
      val zf = ctx.freshName("zf")
      val z2 = ctx.freshName("z2")
      val t3 = ctx.freshName("t3")
      val t5 = ctx.freshName("t5")
      val t7 = ctx.freshName("t7")
      val t9 = ctx.freshName("t9")
      s"""
         |if ($x < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $e = 63 - java.lang.Long.numberOfLeadingZeros($x);
         |  long $mf = ($e >= 20) ? ($x >>> ($e - 20)) : ($x << (20 - $e));
         |  long $zf = (($mf - 1048576L) * 1048576L) / ($mf + 1048576L);
         |  long $z2 = ($zf * $zf) / 1048576L;
         |  long $t3 = ($zf * $z2) / 1048576L;
         |  long $t5 = ($t3 * $z2) / 1048576L;
         |  long $t7 = ($t5 * $z2) / 1048576L;
         |  long $t9 = ($t7 * $z2) / 1048576L;
         |  ${ev.value} =
         |    $e * 726817L + 2L * ($zf + $t3 / 3L + $t5 / 5L + $t7 / 7L + $t9 / 9L);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FixedPointLn =
    copy(child = newChild)
}

object FixedPointLn {

  /** Fixed-point fractional bits and scale: values are `round-ish(2^20·ln x)`. */
  val F: Int = 20
  val Scale: Long = 1L << F // 1048576

  /** round(2^20 · ln 2) — the exact-integer ln of one octave. */
  val Ln2F: Long = 726817L

  /** `ln_f(x)` as a Column (native codegen'd expression). */
  def lnF(x: Column): Column =
    ColumnBridge.column(FixedPointLn(ColumnBridge.expression(x.cast("long"))))

  /** Plain-Scala reference implementation (specs + driver-side uses). */
  def lnFRef(x: Long): Long = {
    require(x >= 1L, s"ln_fixed domain is x >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val mf = if (e >= F) x >>> (e - F) else x << (F - e)
    val zf = ((mf - Scale) * Scale) / (mf + Scale)
    val z2 = (zf * zf) / Scale
    val t3 = (zf * z2) / Scale
    val t5 = (t3 * z2) / Scale
    val t7 = (t5 * z2) / Scale
    val t9 = (t7 * z2) / Scale
    e * Ln2F + 2L * (zf + t3 / 3L + t5 / 5L + t7 / 7L + t9 / 9L)
  }

  /** The SAME arithmetic as a DuckDB lateral-alias column chain: emits the
    * intermediate columns `<out>_e .. <out>_t9` and the final `<out>`,
    * suitable for splicing into `SELECT <existing cols>, <lnFSql(...)> FROM
    * ...`. `x` must be a BIGINT-typed SQL expression that is ≥ 1 whenever
    * the row matters (callers add-1-smooth; DuckDB would raise on bin() of
    * a negative, which is the loud-failure analogue of the NULL above).
    * DuckDB's `//` truncates toward zero exactly like Java long division on
    * the non-negative operands used here, and `bin()` renders minimal
    * binary, so `length(bin(x)) − 1` is the bit length − 1.
    */
  def lnFSql(x: String, out: String): String =
    s"""length(bin($x)) - 1 AS ${out}_e,
       |  CASE WHEN ${out}_e >= 20 THEN ($x) // (1::BIGINT << (${out}_e - 20))
       |       ELSE ($x) * (1::BIGINT << (20 - ${out}_e)) END AS ${out}_mf,
       |  ((${out}_mf - 1048576) * 1048576) // (${out}_mf + 1048576) AS ${out}_zf,
       |  (${out}_zf * ${out}_zf) // 1048576 AS ${out}_z2,
       |  (${out}_zf * ${out}_z2) // 1048576 AS ${out}_t3,
       |  (${out}_t3 * ${out}_z2) // 1048576 AS ${out}_t5,
       |  (${out}_t5 * ${out}_z2) // 1048576 AS ${out}_t7,
       |  (${out}_t7 * ${out}_z2) // 1048576 AS ${out}_t9,
       |  ${out}_e * 726817 + 2 * (${out}_zf + ${out}_t3 // 3 + ${out}_t5 // 5
       |    + ${out}_t7 // 7 + ${out}_t9 // 9) AS $out""".stripMargin
}
