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
