package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files compaction — the maintenance pass every streaming/append
  * pipeline owes its readers. Micro-batch sinks and per-task writers leave
  * thousands of KB-scale files; at 100 TB that is planner pain (file
  * listing), scheduler pain (one task per tiny split), and scan pain (no
  * intra-file pushdown locality). Compaction rewrites a directory into
  * size-targeted, sort-clustered files: `repartitionByRange` on the sort
  * key gives each output file a disjoint key range (tight min/max stats →
  * file skipping, same mechanism as [[ZOrderLayout]]), and the in-file sort
  * keeps row groups clusterable. Pure layout change: the row multiset is
  * untouched, so the registered query shares the uncompacted oracle.
  */
object Compaction {

  /** Output-file count for `totalBytes` of input at `targetBytes` per
    * file — at least 1.
    */
  def targetFiles(totalBytes: Long, targetBytes: Long): Int =
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt

  /** Total on-disk bytes of a path's data files (any Hadoop-visible
    * filesystem — the same listing the scan planner does).
    */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Rewrite `df` into `nFiles` range-partitioned, internally-sorted
    * parquet files at `path`.
    */
  def compact(df: DataFrame, sortCols: Seq[String], path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Registered showcase: fragment the events table into one file per
    * shuffle partition (the streaming-sink shape), compact back to a
    * byte-targeted count sorted by (ts, event_id), and answer the hourly
    * stats off the compacted copy — layout changed twice, answer
    * bit-identical to the plain table's.
    */
  def hourlyStatsCompacted(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft_compact")
    graft.streaming.EventStreams.deleteRecursivelyOnExit(base)
    val fragDir = s"$base/fragmented"
    val outDir = s"$base/compacted"
    events.repartition(64).write.mode("overwrite").parquet(fragDir)
    val frag = spark.read.parquet(fragDir)
    // 4 MB targets at test SF exercise the >1-file path; production would
    // pass ~1 GB
    val n = targetFiles(dataBytes(spark, fragDir), 4L << 20)
    compact(frag, Seq("ts", "event_id"), outDir, n)
    graft.operators.EventAnalytics.hourlyStats(spark.read.parquet(outDir))
  }
}
