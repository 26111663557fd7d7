package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the join must be provably shuffle-free (the
  * whole point of paying the bucketed write), and the answer must equal
  * the plain shuffled join's.
  */
class BucketingSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join on the bucket key plans no Exchange on either side") {
    // broadcast would hide the shuffle question entirely; AQE re-plans
    // around the assertion — pin both off for the plan check
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = Bucketing.ordersPerCustomerCoLocated(spark, sf("sf0.001"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // the WHOLE plan is exchange-free: the join reuses the bucketing,
      // and the per-customer aggregation reuses the join's partitioning
      // (it groups by the bucket key) — scan to answer without one shuffle
      assert(!p.contains("Exchange"),
        s"bucketed join + bucket-keyed agg must not shuffle:\n$p")
      assert(df.count() > 0)
    }
  }

  test("co-located answer == plain shuffled join answer") {
    val dir = sf("sf0.001")
    val co = Bucketing.ordersPerCustomerCoLocated(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(Relational.cents(col("o_totalprice"))).cast("double") / 100.0).as("total_spend"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(co.nonEmpty)
    assert(co === plain)
  }
}
