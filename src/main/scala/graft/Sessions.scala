package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory — the single place the engine's session config
  * lives (Verify, Bench, and user entry points all build through here so
  * the settings cannot drift):
  *
  *   - `spark.sql.shuffle.partitions` sized to the core count rather than
  *     Spark's default 200 (on a real cluster: ~2-3x total cores, or left
  *     to AQE coalescing);
  *   - UTC session time zone so timestamp semantics match the DuckDB
  *     oracle regardless of host TZ;
  *   - AQE left ON (Spark 4 default) — at 100 TB it handles skew-join
  *     splitting and post-shuffle coalescing that we'd otherwise hand-tune.
  */
object Sessions {
  def local(
      cores: Int = 4,
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
