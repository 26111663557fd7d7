package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (co-located) joins — the standing 100 TB lever this library's
  * scale notes keep pointing at, made concrete: write both join sides
  * bucketed AND sorted by the join key, and every subsequent equi-join on
  * that key is a zero-shuffle, zero-sort merge join. At 100 TB the shuffle
  * of a fact table is THE dominant cost of a repeated join (every run
  * re-partitions terabytes across the cluster network); bucketing moves
  * that cost to a one-time write, amortized across every downstream join,
  * aggregation, or incremental batch that keys on the same column.
  *
  * Mechanics: `bucketBy(n, key)` hashes rows into `n` files per partition
  * by Spark's `HashPartitioning(key, n)`; because both tables carry the
  * same output partitioning in the catalog, the planner proves the join's
  * distribution requirement is already met and plans `SortMergeJoin`
  * without an `Exchange` on either side (`sortBy` removes the per-task
  * sort too). BucketingSpec asserts exactly that plan shape. Bucketed
  * metadata lives in the session catalog, so reads go through
  * `spark.table`, not raw paths — same as production metastores.
  *
  * Sizing rule at scale: pick `n` so one bucket of the LARGER table fits
  * an executor's memory slice (e.g. 100 TB fact / 4096 buckets ≈ 25 GB
  * per bucket pre-compression — halve until comfortable); bucket counts
  * must match across tables to co-locate (Spark joins `n` vs `k·n`
  * buckets shuffle-free only with bucket ratio support enabled).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`, registered
    * as `name` in the session catalog (in-memory catalog offline, a Hive
    * metastore in production — same API).
    */
  def writeBucketed(
      df: DataFrame, name: String, bucketCol: String,
      nBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)

  /** Orders-per-customer over CO-LOCATED bucketed tables: one-time
    * bucketed write of both sides on the customer key, then a
    * shuffle-free merge join + partial-aggregated rollup. The registered
    * query pays the bucketing write each run (tiny at test SF); in
    * production the write amortizes over every custkey-joined workload
    * and the join itself never shuffles the fact table again.
    */
  def ordersPerCustomerCoLocated(
      spark: SparkSession, dir: String, nBuckets: Int = 8): DataFrame = {
    // nanoTime-unique names: Verify and Bench may run this several times
    // in one session; the backing files live under a temp dir cleaned at
    // JVM exit, and stale catalog entries are dropped eagerly
    val id = java.lang.Long.toHexString(System.nanoTime())
    val (cTab, oTab) = (s"c_bucketed_$id", s"o_bucketed_$id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed")
    writeBucketed(graft.Tables.customer(spark, dir), cTab, "c_custkey", nBuckets, s"$tmp/c")
    writeBucketed(graft.Tables.orders(spark, dir), oTab, "o_custkey", nBuckets, s"$tmp/o")
    graft.streaming.EventStreams.deleteRecursivelyOnExit(tmp)
    spark.table(oTab)
      .join(spark.table(cTab), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(Relational.cents(col("o_totalprice"))).cast("double") / 100.0)
          .as("total_spend"))
  }
}
