package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{FloatVecDot, HyperplaneBuckets}

/** Session-extension entry point: registers the engine's native SQL
  * functions so `spark.sql("SELECT vec_dot(a, b) ...")` works. Activate
  * with `spark.sql.extensions=graft.GraftExtensions` (spark-submit /
  * config) or programmatically via [[GraftFunctions.register]].
  *
  * This is the full extent of custom planner surface the engine needs: per
  * SURVEY §4, every reference behavior maps to built-in Catalyst machinery,
  * so there are no custom Rules or Strategies — only scalar expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def requireArity(
      name: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      n: Int): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name takes $n argument(s), got ${exprs.length}")

  /** (identifier, info, builder) triples for every native function. */
  val descriptors: Seq[(
      FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    (
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      exprs => {
        requireArity("vec_dot", exprs, 2)
        FloatVecDot(exprs(0), exprs(1))
      }),
    (
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_norm"),
      exprs => {
        // without the check, extra args would be SILENTLY ignored (a
        // wrong-but-plausible sqrt(dot(a,a)) for vec_norm(a, b))
        requireArity("vec_norm", exprs, 1)
        org.apache.spark.sql.catalyst.expressions.Sqrt(
          FloatVecDot(exprs(0), exprs(0)))
      }),
    // hyperplane_buckets(v, tables, planes) — tables/planes must be int
    // literals (they shape the kernel, not per-row data)
    (
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      exprs => {
        // arity FIRST — exprs(0) below would otherwise throw a bare
        // IndexOutOfBoundsException on a 0-arg call
        requireArity("hyperplane_buckets", exprs, 3)
        // validated here, at analysis time: a non-foldable arg would
        // otherwise crash eval() with an obscure unevaluable error, and a
        // fractional literal would silently truncate to the wrong kernel
        def intLiteral(pos: Int, name: String): Int = {
          val e = exprs(pos)
          if (!e.foldable) throw new IllegalArgumentException(
            s"hyperplane_buckets: $name must be an integer literal, got ${e.sql}")
          e.eval() match {
            case i: java.lang.Integer => i.intValue()
            case l: java.lang.Long if l.longValue().isValidInt => l.intValue()
            case s: java.lang.Short => s.intValue()
            case b: java.lang.Byte => b.intValue()
            case other => throw new IllegalArgumentException(
              s"hyperplane_buckets: $name must be an integer literal, got $other")
          }
        }
        HyperplaneBuckets(
          exprs(0),
          tables = intLiteral(1, "tables"),
          planes = intLiteral(2, "planes"))
      }),
    // ln_fixed(x) — the portable fixed-point logarithm (2^20·ln x as an
    // exact int64; see graft.functions.FixedPointLn for the definition
    // and why exact-hash gates cannot use float ln())
    (
      FunctionIdentifier("ln_fixed"),
      new ExpressionInfo(
        classOf[graft.functions.FixedPointLn].getName, "ln_fixed"),
      exprs => {
        requireArity("ln_fixed", exprs, 1)
        graft.functions.FixedPointLn(integralToLong(exprs(0)))
      }),
    // exp_fixed(y) — the inverse companion (2^20·exp(y/2^20) as an exact
    // int64); with ln_fixed it gives bit-portable x^(p/q)
    (
      FunctionIdentifier("exp_fixed"),
      new ExpressionInfo(
        classOf[graft.functions.FixedPointExp].getName, "exp_fixed"),
      exprs => {
        requireArity("exp_fixed", exprs, 1)
        graft.functions.FixedPointExp(integralToLong(exprs(0)))
      }),
    // nfc_normalize(s) / nfkc_normalize(s) — canonical / compatibility
    // Unicode composition (same name + semantics as DuckDB's builtin, so
    // SQL written against the oracle engine runs here unchanged)
    (
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.UnicodeNormalize].getName, "nfc_normalize"),
      exprs => {
        requireArity("nfc_normalize", exprs, 1)
        graft.functions.UnicodeNormalize(exprs(0))
      }),
    (
      FunctionIdentifier("nfkc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.UnicodeNormalize].getName, "nfkc_normalize"),
      exprs => {
        requireArity("nfkc_normalize", exprs, 1)
        graft.functions.UnicodeNormalize(exprs(0), compatibility = true)
      }))

  /** `SELECT ln_fixed(5)` / `exp_fixed(5)` must analyze: narrower integral
    * children (TINYINT..INT) up-cast losslessly to BIGINT here, like the
    * built-in numeric functions coerce. Anything non-integral still hits
    * the expressions' exact-BIGINT check — a silent DOUBLE truncation
    * would corrupt the fixed-point contract.
    */
  private def integralToLong(
      e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.LongType)
      case _ => e
    }

  /** Register into an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, id, info, builder)
    }
}
