package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.types._

class IOSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("io").toString

  private def sample() = {
    import spark.implicits._
    Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "score")
  }

  test("csv round-trip with explicit schema preserves rows and types") {
    val dir = tmp() + "/csv"
    IO.writeCsv(sample(), dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = IO.csv(spark, dir, schema)
    assert(back.schema === schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ===
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
  }

  test("json-lines round-trip (the reference's intermediate format, typed)") {
    val dir = tmp() + "/json"
    IO.writeJsonLines(sample(), dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = IO.jsonLines(spark, dir, schema).select("id", "name", "score")
    assert(back.count() === 3)
  }

  test("key-value text sink writes the reference's output line shape") {
    import spark.implicits._
    val dir = tmp() + "/kv"
    IO.writeKeyValueText(Seq(("hello", 3L), ("test", 3L)).toDF("word", "cnt"),
      "word", "cnt", dir)
    val lines = IO.text(spark, Seq(dir)).collect().map(_.getString(0)).toSet
    assert(lines === Set("hello 3", "test 3"))
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    val dir = tmp() + "/evolve"
    // generation 1: (id, name); generation 2 adds a column
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(dir)
    Seq((3L, "c", 0.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    val byId = merged.collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("score")).map(_.toDouble))
      .toMap
    // old-generation rows surface the new column as NULL
    assert(byId === Map(1L -> None, 2L -> None, 3L -> Some(0.5)))
  }

  test("orc round-trip preserves rows; predicates push to the orc scan") {
    val dir = tmp() + "/orc"
    IO.writeOrc(sample(), dir)
    val back = IO.orc(spark, dir).where(org.apache.spark.sql.functions.col("id") > 1L)
    assert(back.collect().map(_.getAs[Long]("id")).toSet === Set(2L, 3L))
    val f = back.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(f.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)"), f)
  }

  test("partitioned parquet write produces partition pruning on read") {
    val dir = tmp() + "/part"
    IO.writeParquet(sample(), dir, partitionBy = Seq("name"))
    val pruned = IO.parquet(spark, dir).where(org.apache.spark.sql.functions.col("name") === "beta")
    assert(pruned.collect().map(_.getAs[Long]("id")).toSeq === Seq(2L))
    val f = pruned.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(f.contains("PartitionFilters: [isnotnull(name"), f)
  }
}
