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

  /** (identifier, info, builder) triples for every native function. */
  val descriptors: Seq[(
      FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    (
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      exprs => FloatVecDot(exprs(0), exprs(1))),
    (
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_norm"),
      exprs => org.apache.spark.sql.catalyst.expressions.Sqrt(
        FloatVecDot(exprs(0), exprs(0)))),
    // hyperplane_buckets(v, tables, planes) — tables/planes must be int
    // literals (they shape the kernel, not per-row data)
    (
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      exprs => {
        // validated here, at analysis time: a non-foldable arg would
        // otherwise crash eval() with an obscure unevaluable error, and a
        // fractional literal would silently truncate to the wrong kernel
        def intLiteral(pos: Int, name: String): Int = {
          if (exprs.length != 3) throw new IllegalArgumentException(
            s"hyperplane_buckets(v, tables, planes) takes 3 arguments, got ${exprs.length}")
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
      }))

  /** Register into an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, id, info, builder)
    }
}
