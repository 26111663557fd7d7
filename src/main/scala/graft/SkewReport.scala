package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guard-engagement evidence for a (skewed) testdata directory, printed as
  * ONE JSON line — the companion to [[ScaleUp]]'s skew mode. The skewed
  * sf1 bench (SCALING.md) claims the skew guards fire rather than letting
  * a degenerate bucket go quadratic; this main measures that directly:
  *
  *  - MinHash-LSH: oversized (band, key) buckets by the document-weighted
  *    count ([[operators.Dedup.minhashBucketLoads]]) — how many buckets
  *    the cap drops, how many documents sit in them, and how few DISTINCT
  *    banded rows that leaves the self-join (the whole point: candidate
  *    work scales with the distinct column, never members²).
  *  - SimHash: the byte-band twin ([[operators.Dedup.simhashBucketLoads]]).
  *  - Embeddings: the largest identical-vector group (what
  *    `Similarity.cosineNearDupPairs` collapses to one representative).
  *  - Orders / lineitem: the hot key's share of the table (what AQE's
  *    skew-join splitting and partial aggregation absorb).
  */
object SkewReport {

  private case class BucketStats(oversized: Long, docsIn: Long, maxBucket: Long,
      distinctRows: Long)

  private def stats(loads: DataFrame): BucketStats = {
    val r = loads
      .agg(
        coalesce(sum(when(col("oversized"), 1L)), lit(0L)),
        coalesce(sum(when(col("oversized"), col("bucket_n"))), lit(0L)),
        coalesce(max(col("bucket_n")), lit(0L)),
        coalesce(sum(when(col("oversized"), col("distinct_n"))), lit(0L)))
      .head()
    BucketStats(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf1skew")
    val spark =
      Sessions.local(cores = 16, shufflePartitions = 32, appName = "graft-skewreport")
    try {
      val docs = Tables.documents(spark, dir)
      val mh = stats(operators.Dedup.minhashBucketLoads(docs))
      val sh = stats(operators.Dedup.simhashBucketLoads(docs))
      // prefix-join group card: the candidate-pair mass the EXACT miner
      // would enumerate, uncapped vs under the doc-weighted cap
      val pg = operators.Dedup.prefixGroupLoads(docs)
        .agg(
          coalesce(sum(when(col("oversized"), 1L)), lit(0L)),
          coalesce(max(col("pg_docs")), lit(0L)),
          coalesce(sum(col("pair_mass")), lit(0L)),
          coalesce(sum(when(!col("oversized"), col("pair_mass"))), lit(0L)))
        .head()
      // winnow-overlap group card: per-fingerprint doc counts and the
      // self-join pair mass, uncapped vs under the >cap-docs drop
      val wCap = operators.Dedup.WinnowBucketCap
      val wf = operators.TextAnalysis.winnowFingerprints(docs)
        .select(col("doc_id"), col("fp_hash")).distinct()
        .groupBy("fp_hash").agg(count(lit(1)).as("n"))
        .agg(
          coalesce(sum(when(col("n") > wCap, 1L)), lit(0L)),
          coalesce(max(col("n")), lit(0L)),
          coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)),
          coalesce(sum(when(col("n") <= wCap, expr("n * (n - 1) div 2"))
            .otherwise(0L)), lit(0L)))
        .head()
      val maxVecGroup = Tables.embeddings(spark, dir)
        .where(col("embedding").isNotNull)
        .groupBy(md5(col("embedding").cast("string"))).agg(count(lit(1)).as("n"))
        .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
      def hotShare(df: DataFrame, key: String): (Long, Double) = {
        val r = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
          .agg(coalesce(max("n"), lit(0L)), coalesce(sum("n"), lit(0L))).head()
        (r.getLong(0), if (r.getLong(1) == 0) 0.0 else r.getLong(0).toDouble / r.getLong(1))
      }
      val (hotCustN, hotCustShare) = hotShare(Tables.orders(spark, dir), "o_custkey")
      val (hotPartN, hotPartShare) = hotShare(Tables.lineitem(spark, dir), "l_partkey")
      println(
        s"""{"dir":"$dir","cap":${operators.Dedup.DefaultMaxBucketSize},""" +
        s""""minhash":{"oversized_buckets":${mh.oversized},"docs_in_oversized":${mh.docsIn},""" +
        s""""max_bucket_docs":${mh.maxBucket},"distinct_rows_dropped":${mh.distinctRows}},""" +
        s""""simhash":{"oversized_buckets":${sh.oversized},"docs_in_oversized":${sh.docsIn},""" +
        s""""max_bucket_docs":${sh.maxBucket},"distinct_rows_dropped":${sh.distinctRows}},""" +
        s""""prefix":{"oversized_groups":${pg.getLong(0)},"max_group_docs":${pg.getLong(1)},""" +
        s""""pair_mass_uncapped":${pg.getLong(2)},"pair_mass_capped":${pg.getLong(3)}},""" +
        s""""winnow":{"cap":$wCap,"hot_fingerprints":${wf.getLong(0)},""" +
        s""""max_fp_docs":${wf.getLong(1)},"pair_mass_uncapped":${wf.getLong(2)},""" +
        s""""pair_mass_capped":${wf.getLong(3)}},""" +
        s""""max_identical_vector_group":$maxVecGroup,""" +
        s""""hot_custkey_orders":$hotCustN,"hot_custkey_share":$hotCustShare,""" +
        s""""hot_partkey_lines":$hotPartN,"hot_partkey_share":$hotPartShare}""")
    } finally spark.stop()
  }
}
