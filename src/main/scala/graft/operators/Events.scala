package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` table (FIXTURES.md §B): JSON
  * extraction, time-bucketed aggregation, and sessionization. The streaming
  * twins of these queries live in [[graft.streaming.EventStreams]] and share
  * the same aggregation expressions, so the DuckDB oracle validates both
  * (SURVEY §7.3 "streaming state").
  */
object EventAnalytics {

  /** JSON property extraction + per-type aggregate. `get_json_object` is a
    * codegen'd builtin; at scale prefer `from_json` with an explicit schema
    * once the props shape is known (single parse, typed struct).
    */
  def perTypeStats(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"),
        (sum(get_json_object(col("props"), "$.k").cast("long")).cast("double")
          / count(get_json_object(col("props"), "$.k"))).as("avg_k"))

  /** Tumbling 1-hour aggregation, batch form. `date_trunc` (not `window()`)
    * keeps it directly SQL-comparable; the streaming form uses
    * `window(col("ts"), "1 hour")` over the same aggregates.
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))

  /** Sessionization (gaps-and-islands): a new session starts when a user is
    * idle for `gapMinutes` or longer. Per-user window — scales with the
    * busiest user's event count, not the table. Millisecond-truncated
    * epochs keep the arithmetic identical across engines.
    *
    * Boundary semantics are `>= gap` (an event at exactly last+gap opens a
    * new session) to match Spark's `session_window`, whose windows are
    * end-exclusive `[t, t+gap)` — so the batch, streaming, and custom-state
    * sessionizations all agree, including at the exact-gap boundary.
    */
  def sessionCounts(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val ms = unix_millis(col("ts"))
    val prevMs = lag(ms, 1).over(w)
    val newSession = when(prevMs.isNotNull && ms - prevMs >= gapMinutes * 60000L, 1L).otherwise(0L)
    events
      .select(col("user_id"), newSession.as("new_session"))
      .groupBy("user_id")
      .agg(
        (lit(1L) + sum("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }
}
