package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: deterministic N× scale-up of a driver testdata directory,
  * for scale benchmarking beyond the largest provided SF. Each replica i
  * of a fact/dim row gets every *key* column offset by i × (max key + 1),
  * so referential integrity is preserved exactly (an sf1 lineitem row
  * joins the same replica's order/part/supplier) while non-key attributes
  * — measures, dates, text, embeddings — are copied verbatim. The result
  * is a corpus with realistic large-scale properties for THIS engine's
  * surface: 10× facts per aggregation group, 10× events per time window,
  * and heavy exact/near duplication in documents/embeddings (each text
  * now has N identical copies — the crawl-shaped duplication the dedup
  * family exists for).
  *
  * NOT for correctness runs: the DuckDB oracles run at sf0.01; this
  * output feeds `graft.Bench` only (BENCH_sf1).
  *
  *   sbt "runMain graft.ScaleUp /root/testdata/sf0.1 testdata-sf1 10"
  */
object ScaleUp {

  /** (table, key columns to offset). Keys offset by the same per-table
    * stride everywhere they appear, preserving joins within a replica.
    */
  val KeyedTables: Seq[(String, Seq[(String, String)])] = Seq(
    // table -> (column, stride-source table whose max+1 is the stride)
    "customer" -> Seq("c_custkey" -> "customer"),
    "supplier" -> Seq("s_suppkey" -> "supplier"),
    "part" -> Seq("p_partkey" -> "part"),
    "orders" -> Seq("o_orderkey" -> "orders", "o_custkey" -> "customer"),
    "lineitem" -> Seq(
      "l_orderkey" -> "orders", "l_partkey" -> "part", "l_suppkey" -> "supplier"),
    "events" -> Seq("event_id" -> "events"),
    "documents" -> Seq("doc_id" -> "documents"),
    "embeddings" -> Seq("vec_id" -> "embeddings"))

  /** Dimension tables copied once, unscaled (their keys are referenced by
    * nation/region columns that are NOT offset).
    */
  val FixedTables: Seq[String] = Seq("region", "nation")

  /** Key column whose max+1 defines each table's stride. */
  private val StrideKey = Map(
    "customer" -> "c_custkey", "supplier" -> "s_suppkey", "part" -> "p_partkey",
    "orders" -> "o_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("testdata-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local(cores = 16, appName = "graft-scaleup")
    try run(spark, srcDir, outDir, factor)
    finally spark.stop()
  }

  def run(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    // strides from the SOURCE maxima (collected once; tiny)
    val stride: Map[String, Long] = StrideKey.map { case (t, k) =>
      t -> (read(t).agg(max(col(k))).head().getLong(0) + 1L)
    }
    FixedTables.foreach { t =>
      read(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"copied $t")
    }
    KeyedTables.foreach { case (t, keys) =>
      val df = read(t)
      val types = df.schema.map(f => f.name -> f.dataType).toMap
      val reps = spark.range(factor.toLong).select(col("id").as("__rep"))
      val scaled = df.crossJoin(broadcast(reps))
        .select(df.columns.map { c =>
          keys.toMap.get(c) match {
            case Some(strideOf) =>
              (col(c) + col("__rep") * stride(strideOf)).cast(types(c)).as(c)
            case None => col(c)
          }
        }.toIndexedSeq: _*)
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"scaled $t x$factor")
    }
  }
}
