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
      exprs => HyperplaneBuckets(
        exprs(0),
        tables = exprs(1).eval().asInstanceOf[Number].intValue(),
        planes = exprs(2).eval().asInstanceOf[Number].intValue())))

  /** Register into an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, id, info, builder)
    }
}
