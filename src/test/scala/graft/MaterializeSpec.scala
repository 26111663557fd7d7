package graft

import graft.operators.{GraphAnalytics, LinkGraph}

/** The reliable-checkpoint profile: loop results must be BIT-IDENTICAL
  * whether iteration state is cut with localCheckpoint (the local
  * default) or with durable checkpoint() (the cluster profile's
  * `spark.graft.checkpoint.reliable=true`) — the mode changes failure
  * semantics on a preemptible cluster, never results.
  */
class MaterializeSpec extends SparkSpec {

  private def withReliable[A](body: => A): A = {
    spark.conf.set(Materialize.ReliableKey, "true")
    try body
    finally spark.conf.unset(Materialize.ReliableKey)
  }

  test("pageRank + TrustRank loops: reliable checkpoint() == localCheckpoint") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    def ranks(): Seq[(String, Long)] = {
      import org.apache.spark.sql.functions.col
      val edges = LinkGraph.hostEdges(docs).select(
        col("src_host").as("src"), col("dst_host").as("dst"),
        col("n_links").as("w"))
      GraphAnalytics.pageRank(edges).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    def spam(): Set[String] =
      LinkGraph.spamHosts(docs).collect().map(_.getString(0)).toSet
    val (localRanks, localSpam) = (ranks(), spam())
    val (reliableRanks, reliableSpam) = withReliable {
      // the durable mode must actually engage: a checkpoint dir appears
      val got = (ranks(), spam())
      assert(spark.sparkContext.getCheckpointDir.nonEmpty,
        "reliable mode must set a checkpoint directory")
      got
    }
    assert(reliableRanks === localRanks)
    assert(reliableSpam === localSpam)
    assert(localRanks.nonEmpty)
  }
}
