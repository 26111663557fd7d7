package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Batch-equivalence for the streaming paths (SURVEY §7.3): the streaming
  * hourly aggregation run to completion must equal the batch query, row for
  * row — same grouping keys, same exact-cents aggregates.
  */
class EventStreamsSpec extends SparkSpec {

  private def canon(rows: Array[Row]): Set[String] =
    rows.map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")).toSet

  test("streaming hourly stats (AvailableNow, complete mode) == batch hourly stats") {
    val dir = sf("sf0.001")
    val streamed = EventStreams.hourlyStatsToBatch(spark, dir).collect()
    val batch = graft.operators.EventAnalytics
      .hourlyStats(graft.Tables.events(spark, dir)).collect()
    assert(streamed.nonEmpty)
    assert(canon(streamed) === canon(batch))
  }

  test("streaming dedup drops duplicate event ids within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(minute: Int) = new java.sql.Timestamp(86400000L + minute * 60000L)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStreams.dedupedEvents(
      input.toDF().toDF("event_id", "ts").withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2)))
      q.processAllAvailable()
      input.addData((2L, ts(3)), (3L, ts(4)))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L)) // one row per id, across batches
    } finally q.stop()
  }

  test("session windows cover all events with plausible session counts") {
    val dir = sf("sf0.001")
    val sessions = EventStreams.runToBatch(
      spark, dir, EventStreams.sessionStats(_), s"stream_sessions_${System.nanoTime()}")
      .collect()
    val batchSessions = graft.operators.EventAnalytics
      .sessionCounts(graft.Tables.events(spark, dir))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every event lands in exactly one session window
    val nEvents = sessions.map(_.getLong(2)).sum
    assert(nEvents === batchSessions.values.map(_._2).sum)
    // per-user session-window count equals the batch gaps-and-islands count
    val perUser = sessions.groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    assert(perUser === batchSessions.view.mapValues(_._1).toMap)
  }
}
