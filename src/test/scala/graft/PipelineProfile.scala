package graft

import org.apache.spark.sql.functions._

/** Dev profiling harness (test scope, not product surface): stage-time
  * breakdown of `q_pipeline_retained` — the retention pipeline is the
  * suite's most composite query (quality gate → exact dedup → store-probed
  * LSH pairs → iterative clustering → semi joins), and its sf0.1 cost is
  * dominated by fixed per-stage overheads, not data volume. This main
  * measures each component so COVERAGE.md's cost accounting is evidence,
  * not guesswork.
  *
  *   sbt "Test/runMain graft.PipelineProfile /root/testdata/sf0.1"
  */
object PipelineProfile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(cores = 32, shufflePartitions = 32, appName = "graft-profile")
    try {
      val q = SparkEntry.queries("q_pipeline_retained")
      t("full cold") { q(spark, dir).count() }
      t("full warm") { q(spark, dir).count() }
      t("full warm2") { q(spark, dir).count() }
      val docs = Tables.documents(spark, dir)
      val store = t("store read+count") {
        val s = operators.SignatureStore.table(spark, dir); s.count(); s
      }
      val toks = split(trim(col("text")), "\\s+")
      val nStop = size(filter(toks, x => x.isin(operators.TextAnalysis.Stopwords: _*)))
      val quality = docs.where(size(toks) >= 10 && nStop > 0)
      t("quality gate") { quality.count() }
      t("exact dedup") { operators.Dedup.exactDuplicates(quality).count() }
      val pairs = t("pairs from store") {
        val p = operators.Dedup.nearDuplicatePairsFromTable(store); p.count(); p
      }
      t("pairs again (warm)") {
        operators.Dedup.nearDuplicatePairsFromTable(store).count()
      }
      t("clusters") {
        operators.Dedup.clustersFromPairs(
          docs.select(col("doc_id")), pairs.select(col("doc_a"), col("doc_b"))).count()
      }
    } finally spark.stop()
  }
}
