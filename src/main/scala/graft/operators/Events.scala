package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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
  /** As-of join — for each left row, attach the payload of the single most
    * recent right row with the same `key` and `right.ts <= left.ts` (NULL
    * if none); ties at equal ts prefer the right row, and among right rows
    * at the same ts the largest `tie` id wins — total, deterministic
    * semantics.
    *
    * Spark has no native as-of join. The scalable composition is the union
    * trick: tag both sides, order each key's rows by (ts, side, tie), and
    * carry the latest right payload forward with `last(ignoreNulls)` over a
    * running window — ONE shuffle on the key, work linear in rows. The
    * alternatives all break at scale: a `l.ts >= r.ts` range join
    * replicates every left row across all earlier right rows (quadratic in
    * the busiest key, and Spark plans the non-equi conjunct as a post-join
    * filter), and `mapPartitions` abandons codegen. Flink's temporal join
    * and kdb's `aj` lower to this same sorted-merge shape. Skew bound: one
    * key's rows sort within one task — same bound as any per-key window;
    * AQE handles moderate skew, and [[asOfJoinSalted]] is the implemented
    * time-bucket salting escape hatch for a pathological key.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, key: String, ts: String, tie: String,
      rightPayload: Column, payloadName: String = "asof"): DataFrame = {
    val payloadType = right.select(rightPayload.as("p")).schema("p").dataType
    val lrowType = StructType(left.schema.fields)
    // the payload is wrapped in a single-field struct before the window:
    // struct(x) is non-null even when x is null, so last(ignoreNulls) skips
    // ONLY "no right row yet" markers — a most-recent right row whose
    // payload is NULL yields NULL (it does not fall back to an older row),
    // exactly the documented contract
    val wrappedType = StructType(Seq(StructField("v", payloadType)))
    val l = left.select(
      col(key).as("k"), col(ts).as("t"), col(tie).as("o"), lit(1).as("is_left"),
      lit(null).cast(wrappedType).as("p"),
      struct(left.columns.map(col): _*).as("lrow"))
    val r = right.select(
      col(key).as("k"), col(ts).as("t"), col(tie).as("o"), lit(0).as("is_left"),
      struct(rightPayload.as("v")).as("p"), lit(null).cast(lrowType).as("lrow"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("is_left").asc, col("o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof_w", last(col("p"), ignoreNulls = true).over(w))
      .where(col("is_left") === 1)
      .select(col("lrow.*"), col("_asof_w")("v").as(payloadName))
  }

  /** [[asOfJoin]] with TIME-BUCKET SALTING — the skew escape hatch for a
    * pathological hot key whose full history would otherwise sort inside
    * ONE task. Same semantics, bit-for-bit (spec-asserted against the
    * unsalted form at every bucket width), different parallelism bound:
    * the carry-forward window partitions by (key, time-bucket), so a hot
    * key's work splits across its buckets.
    *
    * Two-pass shape, still linear in rows:
    *   1. per (key, bucket): the latest right payload of the bucket — one
    *      hash-agg (`max_by`, map-side combined);
    *   2. a bucket-LEVEL carry-forward (per key over bucket ids — rows =
    *      distinct non-empty buckets, thousands at most, never row-scale)
    *      computes each bucket's seed = latest right payload of all
    *      STRICTLY EARLIER buckets;
    *   3. per (key, bucket): the original union + carry-forward window,
    *      with the seed injected as a virtual right row at the bucket
    *      start that sorts before every real row (is_left = −1).
    *
    * Choose `bucketWidth` so the hottest key's densest bucket fits a task;
    * the cost is one extra shuffle of the (small) seed frame. `ts` may be
    * a timestamp (bucketed in micros) or any numeric (bucketed raw).
    */
  def asOfJoinSalted(
      left: DataFrame, right: DataFrame, key: String, ts: String, tie: String,
      rightPayload: Column, payloadName: String = "asof",
      bucketWidth: Long = 3600000000L): DataFrame = {
    val payloadType = right.select(rightPayload.as("p")).schema("p").dataType
    val wrappedType = StructType(Seq(StructField("v", payloadType)))
    val lrowType = StructType(left.schema.fields)
    val tieType = left.schema(tie).dataType
    // the ts→long conversion is derived PER SIDE: a timestamp on one side
    // and raw numeric micros on the other must land on the same axis
    // (cast("long") on a timestamp would yield epoch SECONDS and silently
    // shift that side's rows to bucket ~0). Only TimestampType and
    // integral ts are accepted: cast("long") on a fractional ts would
    // TRUNCATE sub-integer ordering (diverging from the unsalted join,
    // which orders raw values), so fractional axes are rejected loudly
    // rather than silently reordered.
    def tn(schema: org.apache.spark.sql.types.StructType)(c: Column): Column =
      schema(ts).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case dt @ (org.apache.spark.sql.types.ByteType |
                   org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType |
                   org.apache.spark.sql.types.LongType) => c.cast("long")
        case dt => throw new IllegalArgumentException(
          s"asOfJoinSalted: ts column '$ts' must be TimestampType or an " +
            s"integral type (got ${dt.simpleString}) — fractional/other axes " +
            "would lose sub-integer ordering under bucketing; use asOfJoin " +
            "or convert the axis to integral units first")
      }
    val l = left.select(
      col(key).as("k"), tn(left.schema)(col(ts)).as("t"), col(tie).as("o"), lit(1).as("is_left"),
      lit(null).cast(wrappedType).as("p"),
      struct(left.columns.map(col): _*).as("lrow"))
      // exact integral floor-div: double division would round 2^60-scale
      // micros before flooring and misbucket boundary rows
      .withColumn("b", expr(s"(t - pmod(t, ${bucketWidth}L)) div ${bucketWidth}L"))
    val r = right.select(
      col(key).as("k"), tn(right.schema)(col(ts)).as("t"), col(tie).as("o"), lit(0).as("is_left"),
      struct(rightPayload.as("v")).as("p"), lit(null).cast(lrowType).as("lrow"))
      // exact integral floor-div: double division would round 2^60-scale
      // micros before flooring and misbucket boundary rows
      .withColumn("b", expr(s"(t - pmod(t, ${bucketWidth}L)) div ${bucketWidth}L"))
    // pass 1: latest right payload per (key, bucket)
    val bucketLast = r.groupBy("k", "b")
      .agg(max_by(col("p"), struct(col("t"), col("o"))).as("bp"))
    // pass 2: seed per occupied (key, bucket) = latest payload of earlier
    // buckets (bucket-level rows only — this window is never row-scale)
    val wCarry = Window.partitionBy("k").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = l.select("k", "b").union(r.select("k", "b")).distinct()
      .join(bucketLast, Seq("k", "b"), "left")
      .withColumn("p", last(col("bp"), ignoreNulls = true).over(wCarry))
      .select(
        col("k"), (col("b") * bucketWidth).as("t"),
        lit(null).cast(tieType).as("o"), lit(-1).as("is_left"),
        col("p"), lit(null).cast(lrowType).as("lrow"), col("b"))
    // pass 3: the unsalted window, partitioned by (key, bucket); the seed's
    // (bucket-start t, is_left = -1) sorts before every real row in it
    val w = Window.partitionBy("k", "b")
      .orderBy(col("t").asc, col("is_left").asc, col("o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r).unionByName(seeds)
      .withColumn("_asof_w", last(col("p"), ignoreNulls = true).over(w))
      .where(col("is_left") === 1)
      .select(col("lrow.*"), col("_asof_w")("v").as(payloadName))
  }

  /** Attribution via [[asOfJoin]]: each purchase event gets the user's most
    * recent prior-or-concurrent click (id + value; NULLs when the user
    * never clicked before buying). Timestamps surface as epoch micros —
    * integer-portable across engines.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.where(col("event_type") === "click")
    asOfJoin(
      purchases, clicks, key = "user_id", ts = "ts", tie = "event_id",
      struct(col("event_id").as("click_id"), col("value").as("click_value")))
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("asof.click_id").as("click_id"),
        col("asof.click_value").as("click_value"))
  }

  /** Top patterns returned by [[sessionPaths]]. */
  val SessionPathsK = 20

  /** Session path mining: each session's ordered event-type sequence as a
    * `">"`-joined string, with the most common patterns ranked — the "what
    * do users actually do in a visit" rollup funnels are built from. Same
    * gaps-and-islands sessionization (and gap rule) as [[sessionCounts]];
    * within a session events order by (ms, event_id) — a total,
    * engine-portable order.
    *
    * Shape: two per-user windows (lag, running sum — one shuffle, the
    * sessionization cost already paid by any session query), a per-session
    * hash-agg whose state is the session's own events, and a pattern
    * count + top-k (TakeOrdered). Path strings are bounded by session
    * length, never by user history.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
      k: Int = SessionPathsK): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val ms = unix_millis(col("ts"))
    val prevMs = lag(ms, 1).over(w)
    val newSession =
      when(prevMs.isNotNull && ms - prevMs >= gapMinutes * 60000L, 1L).otherwise(0L)
    val tagged = events.select(
      col("user_id"), col("event_id"), col("event_type"),
      ms.as("ms"), newSession.as("new_s"))
    val w2 = Window.partitionBy("user_id").orderBy(asc("ms"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("sid", sum("new_s").over(w2))
      .groupBy("user_id", "sid")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ms"), col("event_id"), col("event_type")))),
        x => x("event_type"))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(k)
  }

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

  /** BUCKETED RANGE JOIN: point-in-interval join (`start_us <= pt_us <
    * end_us`) with NO equi key — the join shape Spark's planner can only
    * express as a broadcast-nested-loop (every point × every interval) or,
    * worse, a cartesian product. The fix is the standard range-bucketing
    * rewrite (Flink's interval join and Databricks' range-join hint do the
    * same): quantize the time axis into `bucketUs`-wide buckets, map each
    * point to its ONE bucket, explode each interval to the buckets it
    * overlaps, equi-join on bucket, and re-check the exact predicate.
    *
    * Correctness: a (point, interval) match meets in exactly one bucket —
    * the point's — so no post-join dedup is needed. Scale: the equi-join
    * hash-shuffles both sides uniformly by bucket (points are never
    * replicated; intervals replicate ×(len/bucketUs + 1), so pick
    * `bucketUs` near the median interval length), and the planner is free
    * to broadcast a small interval side — either way there is no
    * all-pairs loop. PlanSpec pins the no-BNLJ/no-cartesian shape.
    *
    * `points` must expose `pt_us`, `intervals` must expose `start_us` /
    * `end_us` (epoch-micros longs); all other columns pass through.
    * Empty/negative-length intervals match nothing, like the predicate.
    */
  def bucketedRangeJoin(
      points: DataFrame, intervals: DataFrame, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val pts = points.withColumn("rj_bucket", expr(s"pt_us div ${bucketUs}L"))
    val ivs = intervals
      .where(col("end_us") > col("start_us"))
      .withColumn("rj_bucket", explode(sequence(
        expr(s"start_us div ${bucketUs}L"),
        expr(s"(end_us - 1) div ${bucketUs}L"))))
    pts.join(ivs, Seq("rj_bucket"))
      .where(col("pt_us") >= col("start_us") && col("pt_us") < col("end_us"))
      .drop("rj_bucket")
  }

  /** Constants for [[campaignStats]], interpolated into the DuckDB oracle
    * so the two engines cannot silently desync: 8 overlapping 6-hour
    * campaign windows every 4 hours from the stream's first event, bucket
    * width 1 hour (≈ median window length / 6 → ×7 interval replication,
    * zero point replication).
    */
  val NCampaigns = 8
  val CampaignStepUs: Long = 4L * 3600L * 1000000L
  val CampaignLenUs: Long = 6L * 3600L * 1000000L
  val RangeBucketUs: Long = 3600L * 1000000L

  /** Ordered conversion funnel: for each user, the time of their first
    * step-1 event, then the first step-2 event STRICTLY AFTER it, then the
    * first step-3 event strictly after that, and so on — NULL from the
    * first step the user never completes. This is the order-sensitive
    * funnel (a purchase before any view does not count), not a mere
    * per-type min.
    *
    * Shape: one keyed aggregation per step plus one keyed join per step —
    * every shuffle is on `user_id`, no window over raw events is needed, so
    * the bound is the busiest user's per-type event count under a hash
    * aggregate (map-side combined), never a whole-history sort. Timestamps
    * surface as epoch micros — exact integer comparisons on both engines.
    */
  def funnelSteps(
      events: DataFrame,
      steps: Seq[String] = FunnelSteps): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    val us = unix_micros(col("ts"))
    val users = events.select(col("user_id")).distinct()
    // stepFrames(i) = (user_id, step{i+1}_us) for users who reached step i+1
    val stepFrames = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val name = s"step${i + 1}_us"
        val ev = events.where(col("event_type") === step)
          .select(col("user_id"), us.as("e_us"))
        val reached = acc match {
          case Nil => ev
          case prev :: _ =>
            val prevName = s"step${i}_us"
            ev.join(prev, "user_id").where(col("e_us") > col(prevName))
              .select(col("user_id"), col("e_us"))
        }
        reached.groupBy("user_id").agg(min(col("e_us")).as(name)) :: acc
    }.reverse
    stepFrames.foldLeft(users)((acc, f) => acc.join(f, Seq("user_id"), "left"))
  }

  /** Default funnel: the product's view → click → purchase path. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Epoch-week length in micros for [[cohortRetention]]. */
  val WeekUs: Long = 7L * 86400L * 1000000L

  /** Cohort retention: users are grouped into weekly cohorts by their FIRST
    * event (integer epoch-week index), and each (cohort, week-offset) cell
    * counts the distinct users of that cohort active that many weeks later.
    * Week indexes are exact integer floor-divisions of epoch micros, so the
    * cells are bit-identical across engines.
    *
    * Two shuffles: min-per-user (map-side combined), then the cell
    * count-distinct — both keyed, both uniform (cohort cells can't be
    * skewed beyond the cohort's own size). At 100 TB the first-event frame
    * is |users| rows, ~3 orders below the event count.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    // exact integral floor-div (Spark `/` on longs is DOUBLE division —
    // lossless today but not an integer-axis contract; `div` is)
    val week = expr(s"unix_micros(ts) div ${WeekUs}L")
    val firsts = events
      .groupBy("user_id")
      .agg(min(week).as("cohort_week"))
    events
      .select(col("user_id"), week.as("event_week"))
      .join(firsts, "user_id")
      .groupBy(col("cohort_week"), (col("event_week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Per-campaign event/user counts via [[bucketedRangeJoin]]: campaign
    * windows are derived from min(event time) (1-row agg, broadcast — the
    * tfidf n_docs pattern), events are the points. Overlapping windows
    * mean one event legitimately lands in up to two campaigns.
    */
  def campaignStats(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val t0 = events.agg(min(unix_micros(col("ts"))).as("t0"))
    val windows = spark.range(NCampaigns).toDF("campaign_id")
      .crossJoin(broadcast(t0))
      .select(
        col("campaign_id"),
        (col("t0") + col("campaign_id") * CampaignStepUs).as("start_us"),
        (col("t0") + col("campaign_id") * CampaignStepUs + CampaignLenUs).as("end_us"))
    val points = events.select(
      unix_micros(col("ts")).as("pt_us"), col("event_id"), col("user_id"))
    bucketedRangeJoin(points, windows, RangeBucketUs)
      .groupBy("campaign_id", "start_us", "end_us")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }
}
