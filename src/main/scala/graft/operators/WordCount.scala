package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference system's single built-in job: word count with a global
  * top-k report (reference `mapreduce/mapreduce.go:31-56`,
  * `master/master.go:286-311`).
  *
  * Spark plan: `FileScan → Generate(explode) → Project → Filter →
  * HashAggregate(partial) → Exchange → HashAggregate(final) →
  * TakeOrderedAndProject`. The partial aggregate IS the reference's
  * in-mapper combiner (`mapreduce.go:32-44`); `TakeOrderedAndProject` is a
  * distributed top-k (per-partition heap + driver merge), strictly better
  * than the reference's master-side global sort (`master.go:294-311`).
  * At 100 TB this plan has exactly one shuffle, whose width is the number
  * of *distinct words*, not the corpus size.
  */
object WordCount {

  /** word counts from any DataFrame with a text column → (word, cnt). */
  def counts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("raw"))
      .select(TextFunctions.normalizeWord(col("raw")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Global top-k, desc count / asc word — the tie-break is load-bearing
    * (reference `master/master.go:294-299`; golden output `README.md:103-111`).
    */
  def topK(wordCounts: DataFrame, k: Int): DataFrame =
    wordCounts.orderBy(desc("cnt"), asc("word")).limit(k)

  /** Reference-parity entry point: text files in, top-k out. */
  def run(spark: SparkSession, paths: Seq[String], k: Int): DataFrame =
    topK(counts(spark.read.text(paths: _*), "value"), k)

  /** Formatted like the reference's `mr-final.txt` lines: `"word: count"`
    * (reference `master/master.go:305-311`).
    */
  def formatted(topk: DataFrame): DataFrame =
    topk.select(concat(col("word"), lit(": "), col("cnt")).as("line"))
}
