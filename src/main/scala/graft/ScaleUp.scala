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

  /** Fixed boilerplate paragraph for the skew mode — the crawl shape where
    * one cookie-consent/footer template dominates a scrape. ~50 tokens so
    * its 3-shingle set is big enough to own every MinHash band.
    */
  val Boilerplate: String =
    "this website uses cookies to ensure you get the best experience on " +
      "our website by continuing to browse the site you are agreeing to " +
      "our use of cookies and our privacy policy please review the terms " +
      "of service carefully before using this site all rights reserved " +
      "unauthorized reproduction of this material is strictly prohibited " +
      "contact the site administrator for further information about licensing"

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("testdata-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val skew = args.lift(3).contains("skew")
    val spark = Sessions.local(cores = 16, appName = "graft-scaleup")
    try run(spark, srcDir, outDir, factor, skew)
    finally spark.stop()
  }

  /** Skew-mode transform per table, applied AFTER the key-offset
    * replication — deterministic functions of the (already-unique) keys, so
    * referential integrity is untouched; only value distributions change.
    * The shapes are the adversarial ones the uniform replica can never
    * produce (VERDICT r8 #1: the guards must FIRE on measured data):
    *
    *  - documents: ⅓ of docs become ONE identical boilerplate text (the
    *    exact-duplicate flood — exercises duplicate collapse + the
    *    document-weighted bucket cap), and a DISJOINT ⅓ become the same
    *    boilerplate with a per-doc unique suffix (near-dup template family:
    *    distinct texts sharing nearly every shingle, so they co-bucket in
    *    every band WITHOUT collapsing — the bucket cap is the only guard).
    *    Family sizes at the default 10× scale-up: ~16.7k docs each, above
    *    the 10k `Dedup.DefaultMaxBucketSize`, so the caps must engage.
    *  - embeddings: 10% of vectors become one fixed hot vector (exact
    *    vector duplication — exercises the fingerprint rep-collapse in
    *    `Similarity.cosineNearDupPairs`).
    *  - orders: 10% of orders redirect to ONE hot customer (skewed
    *    customer⋈orders join + one fat aggregation group).
    *  - lineitem: 10% of lines redirect to ONE hot part (skewed big-big
    *    lineitem⋈part join — the AQE skew-join shape).
    */
  private def skewTransform(
      t: String, df: DataFrame, spark: SparkSession, srcDir: String): DataFrame = t match {
    case "documents" =>
      val skewed = when(pmod(col("doc_id"), lit(3)) === 0, lit(Boilerplate))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit(Boilerplate), lit(" ticket reference "), col("doc_id")))
        .otherwise(col("text"))
      df.withColumn("text", skewed)
        .withColumn("n_chars", length(col("text")).cast("long"))
    case "embeddings" =>
      // the hot vector is a REAL source vector (first by vec_id), so its
      // norm/labels stay realistic; one bounded collect
      val hot = spark.read.parquet(s"$srcDir/embeddings.parquet")
        .orderBy("vec_id").select("embedding").head().getSeq[Float](0)
      df.withColumn("embedding",
        when(pmod(col("vec_id"), lit(10)) === 0, typedLit(hot))
          .otherwise(col("embedding")))
    case "orders" =>
      // hot customer = the min custkey of replica 0 (always present)
      val hotCust = spark.read.parquet(s"$srcDir/orders.parquet")
        .agg(min(col("o_custkey"))).head().getLong(0)
      df.withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(10)) === 0, lit(hotCust))
          .otherwise(col("o_custkey")))
    case "lineitem" =>
      val hotPart = spark.read.parquet(s"$srcDir/lineitem.parquet")
        .agg(min(col("l_partkey"))).head().getLong(0)
      df.withColumn("l_partkey",
        when(pmod(col("l_orderkey"), lit(10)) === 1, lit(hotPart))
          .otherwise(col("l_partkey")))
    case _ => df
  }

  def run(spark: SparkSession, srcDir: String, outDir: String, factor: Int,
      skew: Boolean = false): Unit = {
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
      val out = if (skew) skewTransform(t, scaled, spark, srcDir) else scaled
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"scaled $t x$factor" + (if (skew) " (skewed)" else ""))
    }
  }
}
