package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def frame(rows: (Long, Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "k", "t", "v")
  }

  test("asOfJoin picks the latest right row at or before each left ts") {
    val left = frame((100L, 1L, 10L, 0.0), (101L, 1L, 5L, 0.0), (102L, 1L, 2L, 0.0))
    val right = frame((200L, 1L, 3L, 1.5), (201L, 1L, 7L, 2.5), (202L, 1L, 11L, 3.5))
    val got = EventAnalytics.asOfJoin(
      left, right, key = "k", ts = "t", tie = "id", col("id").as("rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got === Map(
      100L -> Some(201L), // t=10: latest right at t=7
      101L -> Some(200L), // t=5: right at t=3 (t=7 is later)
      102L -> None)) // t=2: nothing at or before
  }

  test("asOfJoin tie semantics: equal ts counts; max tie id wins among equals") {
    val left = frame((100L, 1L, 5L, 0.0))
    val right = frame((200L, 1L, 5L, 1.0), (201L, 1L, 5L, 2.0), (199L, 1L, 4L, 3.0))
    val got = EventAnalytics.asOfJoin(
      left, right, key = "k", ts = "t", tie = "id", col("id").as("rid"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(100L -> 201L)) // equal-ts rows eligible; largest id
  }

  test("asOfJoin never crosses keys") {
    val left = frame((100L, 1L, 10L, 0.0))
    val right = frame((200L, 2L, 5L, 1.0))
    val got = EventAnalytics.asOfJoin(
      left, right, key = "k", ts = "t", tie = "id", col("id").as("rid"))
      .collect()
    assert(got.length === 1 && got(0).isNullAt(4))
  }

  test("salted as-of join equals unsalted at every bucket width (incl. boundary ties)") {
    // rows deliberately ON bucket boundaries (t = 0, 4, 8) and straddling
    // them, plus equal-ts ties, so seed ordering and carry-across-bucket
    // are all exercised
    val left = frame(
      (100L, 1L, 10L, 0.0), (101L, 1L, 5L, 0.0), (102L, 1L, 2L, 0.0),
      (103L, 1L, 4L, 0.0), (104L, 2L, 8L, 0.0), (105L, 2L, 0L, 0.0))
    val right = frame(
      (200L, 1L, 3L, 1.5), (201L, 1L, 7L, 2.5), (202L, 1L, 11L, 3.5),
      (203L, 1L, 4L, 4.5), (204L, 2L, 4L, 5.5), (205L, 2L, 8L, 6.5))
    def result(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
    val unsalted = result(EventAnalytics.asOfJoin(
      left, right, key = "k", ts = "t", tie = "id", col("id").as("rid")))
    // width 1: every row its own bucket (pure carry); width 4: boundaries
    // at the planted ts; width 1000: single bucket (degenerates to unsalted)
    for (width <- Seq(1L, 4L, 1000L)) {
      val salted = result(EventAnalytics.asOfJoinSalted(
        left, right, key = "k", ts = "t", tie = "id", col("id").as("rid"),
        bucketWidth = width))
      assert(salted === unsalted, s"bucketWidth=$width diverged")
    }
  }

  test("salted purchase-attribution equals the unsalted operator on driver data") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.where(col("event_type") === "click")
    val payload = struct(col("event_id").as("click_id"), col("value").as("click_value"))
    def result(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof.click_id"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val unsalted = result(EventAnalytics.asOfJoin(
      purchases, clicks, key = "user_id", ts = "ts", tie = "event_id", payload))
    val salted = result(EventAnalytics.asOfJoinSalted(
      purchases, clicks, key = "user_id", ts = "ts", tie = "event_id", payload,
      bucketWidth = 3600000000L)) // 1-hour buckets over timestamp micros
    assert(salted === unsalted)
  }

  test("salted as-of join converts ts per SIDE (timestamp right vs numeric-micros left)") {
    import spark.implicits._
    // left carries raw epoch-MICROS longs, right carries real timestamps:
    // both must land on the same micro axis (a naive cast('long') on a
    // timestamp yields SECONDS and shifts that side to bucket ~0)
    val left = Seq((100L, 1L, 5000000L, 0.0)).toDF("id", "k", "t", "v")
    val right = Seq(
      (200L, 1L, new java.sql.Timestamp(3000L), 1.5), // 3s = 3e6 us <= 5e6
      (201L, 1L, new java.sql.Timestamp(7000L), 2.5)) // 7s: later, excluded
      .toDF("id", "k", "t", "v")
    val got = EventAnalytics.asOfJoinSalted(
      left, right, key = "k", ts = "t", tie = "id", col("id").as("rid"),
      bucketWidth = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(100L -> 200L))
  }

  test("asOfJoin + salted match brute force on randomized data incl. NULL payloads") {
    import spark.implicits._
    // dense key/ts collisions force every tie rule; payload is NULL for
    // ~half the right rows, so the "most recent right row's payload, even
    // if NULL" contract (no fallback to older rows) is exercised
    val rnd = new scala.util.Random(7)
    val left = (0 until 150).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, 0.0))
    val right = (0 until 150).map(i =>
      (2000L + i, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, rnd.nextDouble()))
    val leftDf = left.toDF("id", "k", "t", "v")
    val rightDf = right.toDF("id", "k", "t", "v")
    val payload = when(col("v") > 0.5, col("id")) // NULL payload ~half the time
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
    val expected = left.map { case (lid, k, lt, _) =>
      val best = right.filter(r => r._2 == k && r._3 <= lt)
        .sortBy(r => (r._3, r._1)).lastOption // max (t, id) among eligible
      lid -> best.flatMap(b => if (b._4 > 0.5) Some(b._1) else None)
    }.toMap
    val unsalted = run(EventAnalytics.asOfJoin(
      leftDf, rightDf, key = "k", ts = "t", tie = "id", payload.as("rid")))
    assert(unsalted === expected)
    for (width <- Seq(1L, 7L, 100L)) {
      val salted = run(EventAnalytics.asOfJoinSalted(
        leftDf, rightDf, key = "k", ts = "t", tie = "id", payload.as("rid"),
        bucketWidth = width))
      assert(salted === expected, s"bucketWidth=$width diverged from brute force")
    }
  }

  test("purchaseAttribution equals a driver-side brute force (driver data)") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val got = EventAnalytics.purchaseAttribution(events)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    val raw = events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = raw.filter(_._4 == "click").groupBy(_._2)
    val expected = raw.filter(_._4 == "purchase").map { case (id, u, us, _) =>
      val best = clicksByUser.getOrElse(u, Array.empty)
        .filter(_._3 <= us)
        // latest ts, then largest event_id — the operator's tie rule
        .sortBy(c => (c._3, c._1))
        .lastOption.map(_._1)
      id -> best
    }.toMap
    assert(got === expected)
    assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty))
  }
}
