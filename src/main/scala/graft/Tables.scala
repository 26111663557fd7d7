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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** The driver's events parquet stores `ts` as INT64 TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects. Read it as raw long nanos
    * (legacy conf) and floor-divide to a microsecond timestamp — integral
    * `div`, not `/`, because epoch-nanos (~1.7e18) exceed double's 2^53
    * exact range. Matches DuckDB's own nanos→micros truncation.
    *
    * The nanosAsLong conf is set statically in [[Sessions.local]]; the set
    * here is an idempotent safety net for externally-built sessions. It is
    * session-global (Spark exposes no per-read option for it) — by design:
    * nanos-as-long is this engine's uniform treatment of INT64 nano
    * timestamps, not a per-table toggle, and it is a no-op for every other
    * table (none carries nano timestamps).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
