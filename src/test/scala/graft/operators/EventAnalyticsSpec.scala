package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the funnel and cohort operators' branches the driver
  * data cannot isolate: out-of-order steps, exact-tie boundaries, and
  * mid-funnel dropouts.
  */
class EventAnalyticsSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
  }

  test("funnelSteps: order-sensitive — steps only count strictly after the previous one") {
    val events = ev(Seq(
      // user 1: clean view(10) -> click(20) -> purchase(30)
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "purchase"),
      // user 2: purchase BEFORE the view never counts; the later click does
      (4L, 5L, 2L, "purchase"), (5L, 10L, 2L, "view"), (6L, 15L, 2L, "click"),
      // user 3: click exactly AT the view time is not strictly after
      (7L, 10L, 3L, "view"), (8L, 10L, 3L, "click"),
      // user 4: no view at all -> every step NULL
      (9L, 10L, 4L, "click"), (10L, 20L, 4L, "purchase"),
      // user 5: two views; the funnel anchors on the FIRST, so the click
      // between them still converts
      (11L, 10L, 5L, "view"), (12L, 15L, 5L, "click"), (13L, 20L, 5L, "view")))
    val got = EventAnalytics.funnelSteps(events)
      .collect()
      .map(r => r.getLong(0) -> (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .toMap
    assert(got(1L) === Seq(Some(10L), Some(20L), Some(30L)))
    assert(got(2L) === Seq(Some(10L), Some(15L), None))
    assert(got(3L) === Seq(Some(10L), None, None))
    assert(got(4L) === Seq(None, None, None))
    assert(got(5L) === Seq(Some(10L), Some(15L), None))
    assert(got.size === 5)
  }

  test("sessionPaths: ordered per-session type sequences, ranked by frequency") {
    val gapUs = 31L * 60L * 1000000L // > 30 min => new session
    val events = ev(Seq(
      // user 1, session 1: view > click ; session 2 (after the gap): view
      (1L, 1000000L, 1L, "view"), (2L, 2000000L, 1L, "click"),
      (3L, 2000000L + gapUs, 1L, "view"),
      // user 2, one session: view > click (same pattern as user 1's first)
      (4L, 1000000L, 2L, "view"), (5L, 3000000L, 2L, "click"),
      // user 3: same-timestamp events order by event_id
      (6L, 5000000L, 3L, "purchase"), (7L, 5000000L, 3L, "error")))
    val got = EventAnalytics.sessionPaths(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "view>click" -> 2L,
      "view" -> 1L,
      "purchase>error" -> 1L))
  }

  test("cohortRetention: cells count distinct users per (cohort week, offset)") {
    val wk = EventAnalytics.WeekUs
    val events = ev(Seq(
      // users 1+2 start week 0; user 1 is active weeks 0 and 1, user 2
      // only week 0 (two events -> still ONE distinct user in the cell)
      (1L, 1L, 1L, "view"), (2L, wk + 5L, 1L, "view"),
      (3L, 2L, 2L, "view"), (4L, 3L, 2L, "click"),
      // user 3 starts week 1, active weeks 1 and 3
      (5L, wk + 1L, 3L, "view"), (6L, 3 * wk + 1L, 3L, "view")))
    val got = EventAnalytics.cohortRetention(events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }
}
