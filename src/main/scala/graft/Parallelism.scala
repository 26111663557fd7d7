package graft

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy per-row operators (shingling, hashing).
  *
  * Parquet splits by row group; the driver's test tables are single-row-
  * group files, so a scan yields ONE partition and everything downstream
  * of it runs single-threaded until the first shuffle. `ensure` inserts a
  * round-robin repartition only when the plan's scan parallelism is below
  * the cluster default — on production inputs (many files / row groups)
  * the condition is false and this is a no-op, so the extra shuffle exists
  * exactly when it pays for itself.
  */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
