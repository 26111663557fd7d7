package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface. The reference's IO is whole-file local text in,
  * `"key value"` text lines out (reference `mapreduce/mapreduce.go:59-65,
  * 108-124`); this module reproduces that and generalizes to the formats a
  * Spark deployment actually feeds on: parquet (primary), CSV, JSON-lines,
  * and text. All readers take explicit schemas where inference would cost
  * an extra pass — at 100 TB schema inference is a full scan you don't
  * want, and parquet/CSV splits then parallelize by
  * `spark.sql.files.maxPartitionBytes`, not file count.
  */
object IO {

  // ---- readers -------------------------------------------------------

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema (no inference pass). */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JSON-lines with an explicit schema — also the reader for the
    * reference's intermediate `mr-<m>-<r>` ND-JSON format.
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Line-oriented text: one row per line, column `value` (the reference's
    * input format; `wholetext=true` reproduces its one-task-per-file model
    * — see [[graft.operators.MapReduce.textInput]]).
    */
  def text(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.text(paths: _*)

  /** ORC — the other columnar format with predicate pushdown + column
    * pruning; same scan parallelization as parquet.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ---- writers -------------------------------------------------------

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** The reference's sink shape: `"<key> <value>"` lines, one file per
    * partition (reference `mapreduce/mapreduce.go:108-124`).
    */
  def writeKeyValueText(df: DataFrame, keyCol: String, valCol: String, path: String): Unit = {
    import org.apache.spark.sql.functions._
    df.select(concat(col(keyCol), lit(" "), col(valCol).cast("string")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
  }
}
