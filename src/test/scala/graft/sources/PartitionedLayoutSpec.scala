package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning must actually fire — static at plan time, dynamic
  * (DPP) at run time — and the pruned answer must equal the full scan's.
  */
class PartitionedLayoutSpec extends SparkSpec {

  private lazy val events = graft.Tables.events(spark, sf("sf0.001"))
  private lazy val layout: String = {
    val tmp = java.nio.file.Files.createTempDirectory("layout_spec")
    PartitionedLayout.writeDatePartitioned(events, tmp.toString)
    tmp.toString
  }

  test("static date literal prunes at the file listing (PartitionFilters)") {
    val df = PartitionedLayout
      .readDatePartitioned(spark, layout, events)
      .where(col("event_date") === lit(PartitionedLayout.ProbeDate).cast("date"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val f = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val pf = f.linesIterator.find(_.trim.startsWith("PartitionFilters")).get
    assert(pf.contains("event_date"), pf)
    assert(pf.contains("19737") || pf.contains("2024-01-15"), pf) // the date literal, pruned pre-scan
    // and the pruned answer equals filtering the unpartitioned table
    val expected = events
      .where(to_date(col("ts")) === lit(PartitionedLayout.ProbeDate).cast("date"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("dimension-side filter prunes the fact scan at runtime (DPP)") {
    import spark.implicits._
    // a 3-row date dimension with a selective attribute filter: the fact
    // side's pruning predicate only exists at run time, via the dim. The
    // dim must be file-backed — a local Seq constant-folds the filter at
    // plan time and leaves no runtime filter for DPP to reuse
    val dimDir = java.nio.file.Files.createTempDirectory("layout_dim").toString
    Seq(("2024-01-15", "keep"), ("2024-01-16", "drop"), ("2024-01-17", "drop"))
      .toDF("d_date", "d_tag")
      .select(col("d_date").cast("date").as("d_date"), col("d_tag"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = PartitionedLayout.readDatePartitioned(spark, layout, events)
    val joined = fact
      .join(dim, fact("event_date") === dim("d_date"))
      .where(col("d_tag") === "keep")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery on the fact scan:\n$plan")
    // DPP result == static filter on the kept date
    val expected = events
      .where(to_date(col("ts")) === lit("2024-01-15").cast("date"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("empty partitioned layout reads back as zero rows, not a crash") {
    val tmp = java.nio.file.Files.createTempDirectory("layout_empty")
    PartitionedLayout.writeDatePartitioned(events.limit(0), tmp.toString)
    assert(PartitionedLayout.readDatePartitioned(spark, tmp.toString, events).count() === 0)
  }
}
