package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** PORTABLE fixed-point exponential — `exp_f(y) ≈ 2^20 · exp(y / 2^20)`
  * for a fixed-point `y ≥ 0`, computed entirely in int64 arithmetic so
  * every engine produces the SAME integer. The inverse companion to
  * [[FixedPointLn]]: together they give bit-portable `x^(p/q)` as
  * `exp_f((ln_f(x) · q) div p)` — the temperature-scaled source-mixture
  * knob ([[graft.operators.Sampling.temperatureSchedule]]) is the
  * flagship caller, where float `pow()` would diverge between JVM and
  * DuckDB on the exact-hash gate.
  *
  * The defined algorithm (F = 20, S = 2^20; LN2F = 726817 =
  * [[FixedPointLn.Ln2F]]; all divisions truncate, all operands
  * non-negative):
  *
  *   e = y div LN2F                      (whole octaves, exact shift later)
  *   r = y mod LN2F                      (residual, r/S < ln 2 < 0.6932)
  *   u_0 = S;  u_k = (u_{k-1} · r) div (S·k)   for k = 1..8
  *   exp(r/S) ≈ (u_0 + … + u_8) / S      (Taylor; dropped tail r⁹/9! < 1e-7·S)
  *   exp_f = (Σ u_k) << e
  *
  * Relative accuracy vs the real exp is ~1e-5 (series truncation +
  * integer-division truncation) — irrelevant for mixture shares, while
  * bit-equality across engines is exact. Intermediate bounds: every
  * u_{k-1}·r < 2^21·2^20 = 2^41, and Σ u_k < 2·S, so the shift stays in
  * int64 for e ≤ 41 — i.e. arguments up to ln_f(2^41). Larger e — like a
  * negative y — is outside the domain and yields NULL (the poisoned-NULL
  * contract of [[FixedPointLn]]: louder in the hash gate than a silently
  * wrapped number).
  */
case class FixedPointExp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "exp_fixed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.simpleString}")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val y = input.asInstanceOf[Long]
    if (y < 0L || y / FixedPointLn.Ln2F > FixedPointExp.MaxOctaves) null
    else FixedPointExp.expFRef(y): java.lang.Long
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, y => {
      val e = ctx.freshName("e")
      val r = ctx.freshName("r")
      val u = ctx.freshName("u")
      val s = ctx.freshName("s")
      val k = ctx.freshName("k")
      s"""
         |if ($y < 0L || $y / 726817L > ${FixedPointExp.MaxOctaves}L) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $e = $y / 726817L;
         |  long $r = $y % 726817L;
         |  long $u = 1048576L;
         |  long $s = 1048576L;
         |  for (int $k = 1; $k <= 8; $k++) {
         |    $u = ($u * $r) / (1048576L * $k);
         |    $s += $u;
         |  }
         |  ${ev.value} = $s << $e;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FixedPointExp =
    copy(child = newChild)
}

object FixedPointExp {

  /** Largest whole-octave shift that keeps `(Σ u_k) << e` inside int64. */
  val MaxOctaves: Long = 41L

  /** Taylor terms past u_0 — enough for < 1e-7·S tail at r/S < ln 2. */
  val Terms: Int = 8

  /** `exp_f(y)` as a Column (native codegen'd expression). */
  def expF(y: Column): Column =
    ColumnBridge.column(FixedPointExp(ColumnBridge.expression(y.cast("long"))))

  /** Plain-Scala reference implementation (specs + driver-side uses). */
  def expFRef(y: Long): Long = {
    require(y >= 0L && y / FixedPointLn.Ln2F <= MaxOctaves,
      s"exp_fixed domain is 0 <= y <= ${MaxOctaves}*ln_f(2), got $y")
    val e = y / FixedPointLn.Ln2F
    val r = y % FixedPointLn.Ln2F
    var u = FixedPointLn.Scale
    var s = FixedPointLn.Scale
    var k = 1
    while (k <= Terms) {
      u = (u * r) / (FixedPointLn.Scale * k)
      s += u
      k += 1
    }
    s << e.toInt
  }

  /** The SAME arithmetic as a DuckDB lateral-alias column chain: emits the
    * intermediates `<out>_e, <out>_r, <out>_u1..u8` and the final `<out>`.
    * `y` must be a BIGINT-typed SQL expression in the valid domain
    * whenever the row matters (callers construct y from ln_f of positive
    * counts, so it is). Same truncating `//` correspondence as
    * [[FixedPointLn.lnFSql]].
    */
  def expFSql(y: String, out: String): String = {
    val terms = (1 to Terms).map { k =>
      val prev = if (k == 1) "1048576" else s"${out}_u${k - 1}"
      s"($prev * ${out}_r) // ${1048576L * k} AS ${out}_u$k"
    }.mkString(",\n  ")
    s"""($y) // 726817 AS ${out}_e,
       |  ($y) % 726817 AS ${out}_r,
       |  $terms,
       |  (1048576 + ${(1 to Terms).map(k => s"${out}_u$k").mkString(" + ")})
       |    * (1::BIGINT << ${out}_e) AS $out""".stripMargin
  }
}
