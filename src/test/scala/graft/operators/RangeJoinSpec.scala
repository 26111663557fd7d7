package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed range join: must equal the brute-force theta join on every
  * boundary case, and must never plan an all-pairs loop.
  */
class RangeJoinSpec extends SparkSpec {

  private def pointsDF(ts: Long*) = {
    import spark.implicits._
    ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("pt_us", "point_id")
  }

  test("bucketed range join == brute-force theta join, boundaries included") {
    import spark.implicits._
    val bucket = 100L
    // intervals crossing bucket edges, nested, empty, negative-length, and
    // one spanning many buckets
    val intervals = Seq(
      (0L, 50L, 150L),   // crosses one bucket edge
      (1L, 90L, 110L),   // short, crosses edge
      (2L, 100L, 200L),  // starts exactly on an edge
      (3L, 120L, 120L),  // empty: matches nothing
      (4L, 130L, 125L),  // negative: matches nothing
      (5L, 0L, 1000L),   // spans 10 buckets
      (6L, 199L, 201L)   // contains an exact end-boundary point
    ).toDF("iv_id", "start_us", "end_us")
    // points at interval starts (inclusive), ends (exclusive), edges
    val points = pointsDF(50L, 99L, 100L, 109L, 110L, 149L, 150L, 199L, 200L, 999L, 1000L)
    val got = EventAnalytics.bucketedRangeJoin(points, intervals, bucket)
      .select("point_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.join(
      intervals, col("pt_us") >= col("start_us") && col("pt_us") < col("end_us"))
      .select("point_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
    // spot-check the contract: start inclusive, end exclusive
    val p200 = got.collect { case (p, iv) if p == 8L => iv } // pt_us = 200
    assert(p200 === Set(5L, 6L)) // in [0,1000) and [199,201), NOT [100,200)
  }

  test("campaignStats == brute-force window join on driver events") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val got = EventAnalytics.campaignStats(events)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val t0 = events.agg(min(unix_micros(col("ts")))).head().getLong(0)
    val brute = (0L until EventAnalytics.NCampaigns.toLong).flatMap { i =>
      val s = t0 + i * EventAnalytics.CampaignStepUs
      val e = s + EventAnalytics.CampaignLenUs
      val in = events.where(unix_micros(col("ts")) >= s && unix_micros(col("ts")) < e)
      val n = in.count()
      if (n == 0) None
      else Some((i, n, in.select("user_id").distinct().count()))
    }.toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("points join intervals through the bucket equi-join, never an all-pairs loop") {
    val p = graft.SparkEntry.queries("q_range_join")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    // the point-interval join is a hash/merge equi-join on rj_bucket; the
    // only nested-loop allowed is the 8-row x 1-row window constructor
    // (the tfidf broadcast-count shape), which PlanSpec's global
    // no-CartesianProduct sweep already polices
    assert(p.contains("Join [rj_bucket"), s"expected an equi-join on rj_bucket:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
