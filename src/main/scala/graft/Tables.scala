package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md /
  * FIXTURES.md §B). One parquet file per table under `<sfDir>/`.
  *
  * Scale note: parquet scans here go through Spark's vectorized reader with
  * predicate pushdown + column pruning — every query below should show
  * `PushedFilters` / a narrow `ReadSchema` in `.explain("formatted")` when it
  * filters or projects. At 100 TB the same code works unchanged; only
  * `spark.sql.files.maxPartitionBytes` (default 128 MB) governs split size.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** All table reads funnel through here, so [[Chaos]]'s conf-gated
    * fault-injection stage (off by default; [[ChaosRun]] only) covers
    * every query without touching any operator.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Chaos.maybe(spark, spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** The events parquet's `ts` physical layout has varied across driver
    * generations — INT64 TIMESTAMP(NANOS) (rounds ≤ 9) and INT64
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 10+) — so the reader
    * normalizes BOTH to the engine's one event-time type, TIMESTAMP_LTZ in
    * the UTC session:
    *
    *  - NANOS: Spark's vectorized reader has no nanos type; the legacy
    *    conf surfaces raw long nanos, floor-divided to micros — integral
    *    `div`, not `/`, because epoch-nanos (~1.7e18) exceed double's 2^53
    *    exact range. Matches DuckDB's own nanos→micros truncation.
    *  - MICROS (NTZ): a plain cast; under the UTC session time zone the
    *    naive datetime maps to the same epoch micros DuckDB's `epoch_us`
    *    computes, so oracle parity is preserved without touching the SQL.
    *
    * The nanosAsLong conf is set statically in [[Sessions.local]]; the set
    * here is an idempotent safety net for externally-built sessions. It is
    * session-global (Spark exposes no per-read option for it) and a no-op
    * for every non-nanos layout and every other table.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ (or date-like): one cast, UTC-pinned session
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
