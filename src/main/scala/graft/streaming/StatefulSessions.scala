package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state generalization of `session_window` for when the session
  * logic doesn't fit a gap window (per-session aggregates, custom close
  * conditions, enrichment). This is the Spark-native analog of the
  * reference's only extension point (`reduceF` sees all values for a key,
  * reference `mapreduce/mapreduce.go:88`): the user function sees each
  * user's events plus evolving state, and the framework owns shuffling,
  * state storage, checkpointing, and timeout bookkeeping.
  *
  * Scale notes: state is per-user (grouped shuffle), sized O(1) per key —
  * just (start, last, count) — and closed sessions leave the store via
  * event-time timeout as the watermark advances, so state is bounded by
  * concurrently-open sessions, not history. That bound is what makes this
  * run indefinitely on an unbounded stream.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /** Per-user state update: extend the open session with events inside the
    * gap, emit+restart on a gap break, emit on event-time timeout (the
    * watermark passed the session's close point).
    */
  def updateUser(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    def toSession(s: SessionState): Session =
      Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)

    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession).iterator
      state.remove()
      return out
    }
    var closed = List.empty[Session]
    var cur = state.getOption
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        // strict `< GapMs`: an event at exactly last+gap opens a NEW
        // session, matching session_window's end-exclusive [t, t+gap)
        // windows and the batch gaps-and-islands query (>= gap → new)
        case Some(s) if t - s.last < GapMs =>
          cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
        case Some(s) =>
          closed ::= toSession(s)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close the session when the watermark passes last+gap
      state.setTimeoutTimestamp(s.last + GapMs)
    }
    closed.reverseIterator
  }

  /** Wire the update function into a watermarked stream of events. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val oe = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUser)
  }
}
