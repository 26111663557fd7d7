package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulSessionsSpec extends SparkSpec {
  import StatefulSessions._

  // offset from epoch 0: a row whose event time equals the initial
  // watermark (0) is dropped as late by the stateful operator
  private val Base = 24L * 3600 * 1000
  private def ts(minute: Int): Timestamp = new Timestamp(Base + minute * 60000L)

  test("flatMapGroupsWithState closes sessions on gap breaks and watermark timeouts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val sessionsDs = sessions(
      input.toDS().withWatermark("ts", "0 seconds").as[Event])
    val q = sessionsDs.writeStream
      .format("memory")
      .queryName("stateful_sessions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: user 1 has two events 5 min apart (one session), then a
      // 40-min gap breaks it; user 2 has a single event
      input.addData(
        Event(1L, ts(0)), Event(1L, ts(5)), Event(1L, ts(45)),
        Event(2L, ts(10)))
      q.processAllAvailable()
      // batch 2: advance the watermark far enough to time out everything
      input.addData(Event(3L, ts(1000)))
      q.processAllAvailable()
      input.addData(Event(3L, ts(2000)))
      q.processAllAvailable()

      val got = spark.table("stateful_sessions").as[Session].collect()
        .map(s => (s.user_id, (s.start.getTime - Base) / 60000,
          (s.end.getTime - Base) / 60000, s.n_events))
        .toSet
      // user 1: session [0,5] with 2 events (closed by the in-batch gap
      // break), session [45,45] closed by timeout; user 2: [10,10]
      assert(got.contains((1L, 0L, 5L, 2L)))
      assert(got.contains((1L, 45L, 45L, 1L)))
      assert(got.contains((2L, 10L, 10L, 1L)))
    } finally q.stop()
  }
}
