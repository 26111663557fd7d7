package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Probe-side membership test of a Bloom bitmap — the `might_contain`
  * half of a runtime join filter (see [[graft.operators.RuntimeFilter]]).
  * The bitmap rides along as a REFERENCE OBJECT in the task binary (the
  * same mechanism Spark's planner-injected `BloomFilterAggregate` result
  * uses), so the probe pays ONE scan-stage filter — no joins, no
  * shuffles — and the generated code is k inline bit tests, inside
  * whole-stage codegen.
  *
  * The children ARE the k position expressions, the same Column code the
  * build side folds into the bitmap ([[graft.operators.RuntimeFilter
  * .bloomXxPositions]]) — build/probe agreement is structural, which is
  * the no-false-negative guarantee; no JVM mirror of the hash family is
  * needed. A null position (null probe key) returns false: a null key
  * can never satisfy the downstream equi-join, so dropping the row is
  * result-preserving, matching the semi-join digest path.
  */
case class BloomPositionsSet(positions: Seq[Expression], bits: Array[Long])
    extends Expression {

  override def children: Seq[Expression] = positions
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_positions_set"

  override def checkInputDataTypes(): TypeCheckResult =
    positions.find(_.dataType != LongType) match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint positions, got ${e.dataType.simpleString}")
      case None if positions.nonEmpty => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(s"$prettyName requires >= 1 position")
    }

  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    var i = 0
    while (i < positions.length) {
      val v = positions(i).eval(input)
      if (v == null) return false
      val p = v.asInstanceOf[Long]
      if ((bits((p >>> 6).toInt) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val init = code"boolean ${ev.value} = true;"
    val tests = positions.map(_.genCode(ctx)).map { e =>
      code"""
        if (${ev.value}) {
          ${e.code}
          if (${e.isNull} ||
              ($ref[(int)(${e.value} >>> 6)] & (1L << (${e.value} & 63))) == 0L) {
            ${ev.value} = false;
          }
        }"""
    }
    ev.copy(code = tests.foldLeft(init)(_ + _), isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(positions = newChildren)
}

object BloomExpressions {

  /** `true` iff every position column's bit is set in `bits`. */
  def positionsSet(positions: Seq[Column], bits: Array[Long]): Column =
    ColumnBridge.column(BloomPositionsSet(
      positions.map(ColumnBridge.expression), bits))
}
