package graft

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy per-row operators (shingling, hashing).
  *
  * Parquet splits by row group; the driver's test tables are single-row-
  * group files, so a scan yields ONE partition and everything downstream
  * of it runs single-threaded until the first shuffle. `ensure` inserts a
  * round-robin repartition only when the input is too small to split into
  * the cluster-default number of tasks — on production inputs (many files /
  * row groups) the condition is false and this is a no-op, so the extra
  * shuffle exists exactly when it pays for itself.
  *
  * The split estimate comes from the OPTIMIZED LOGICAL plan's size
  * statistics (file-relation stats are the summed file lengths), divided by
  * `spark.sql.files.maxPartitionBytes` — the same quantity the physical
  * file-scan planner uses. Deliberately NOT `df.rdd.getNumPartitions`:
  * that forces full physical planning per call and pins a plan AQE can no
  * longer re-optimize.
  */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    val maxSplitBytes = JavaUtils.byteStringAsBytes(
      sess.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    // stay in BigInt: join stats multiply child sizes, so sizeInBytes can
    // exceed Long range and a .toLong would wrap negative — inserting a
    // cluster-wide shuffle exactly where this must be a no-op
    val sizeInBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = sizeInBytes / maxSplitBytes + 1
    if (estSplits < BigInt(target)) df.repartition(target) else df
  }
}
