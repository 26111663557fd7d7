package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout + partition pruning — at 100 TB the
  * cheapest byte is the one never read, and the first-order lever is a
  * partition layout matched to the dominant predicate (almost always
  * event date for append-only event/training data). A `event_date=...`
  * directory layout turns a one-day query over a 30-day corpus into a
  * 1/30th scan BEFORE any row-level work: the date filter binds at file
  * listing (`PartitionFilters` in the plan), row groups of other days are
  * never opened.
  *
  * Two pruning modes, both spec-asserted (PartitionedLayoutSpec):
  *   - STATIC: a literal date predicate prunes at plan time;
  *   - DYNAMIC (DPP): a join against a filtered dimension prunes at run
  *     time — Spark builds the dim's date set first and injects it as a
  *     `dynamicpruning` subquery into the fact scan. This is what keeps
  *     star-schema joins from scanning the whole fact table when the
  *     filter lives on the dimension.
  *
  * Partition-count sizing at scale: daily partitions of a 100 TB / year
  * corpus are ~270 GB each — split further (hour, or date × source
  * bucket) only when a partition exceeds what a stage should scan;
  * NEVER partition by high-cardinality keys (user_id) — millions of tiny
  * files is the classic small-files failure.
  */
object PartitionedLayout {

  /** Rewrite the events table date-partitioned (`event_date=YYYY-MM-DD/`
    * directories). One-time layout cost, amortized over every
    * date-filtered read — the same bargain as [[graft.operators.Bucketing]]
    * for join keys, here for scan predicates.
    */
  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** The date every SF's events cover (driver testdata spans all of
    * January 2024), shared with the oracle SQL.
    */
  val ProbeDate = "2024-01-15"

  /** Per-type stats for ONE day off the partitioned layout: the date
    * literal prunes at the file listing, so 29/30 of the table is never
    * read. The partitioned copy is written to a temp dir per call (tiny at
    * test SF; in production the table IS stored this way and the write
    * disappears).
    */
  def dailyStatsPruned(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_partitioned")
    writeDatePartitioned(events, tmp.toString)
    graft.streaming.EventStreams.deleteRecursivelyOnExit(tmp)
    readDatePartitioned(spark, tmp.toString, events)
      .where(col("event_date") === lit(ProbeDate).cast("date"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
  }

  /** Read the partitioned layout back with an explicit schema (an empty
    * partitioned dir has no files to infer from — the empty-partition
    * case a real lake hits on day one).
    */
  def readDatePartitioned(spark: SparkSession, path: String, like: DataFrame): DataFrame =
    spark.read
      .schema(like.withColumn("event_date", to_date(col("ts"))).schema)
      .parquet(path)
}
