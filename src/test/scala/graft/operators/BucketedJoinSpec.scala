package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing — the 100 TB co-located join strategy: two fact tables
  * bucketed + sorted on the join key join WITHOUT any shuffle exchange
  * (each bucket pair joins locally). On a real deployment `orders` and
  * `lineitem` would be written this way once and every subsequent join on
  * orderkey becomes shuffle-free.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong % 97, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bk_left")
    right.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bk_right")
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: broadcast would hide the bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it is correct
      assert(joined.count() === left.join(right, "k").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
