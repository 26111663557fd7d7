package graft

import org.apache.spark.sql.DataFrame

/** The iteration-state materialization seam.
  *
  * Every iterative loop in the engine (PageRank / TrustRank / TextRank
  * supersteps, k-means rounds, the funnel's staged corpus) cuts lineage
  * once per round so the plan — and its codegen — stays constant instead
  * of growing k rounds deep. HOW the cut is made is a deployment
  * decision, not an operator decision, so it lives here:
  *
  *   - DEFAULT (`localCheckpoint`): executor-memory/disk-backed, no
  *     configuration, fastest — right for local runs and benches. The
  *     cost: lineage is TRUNCATED, so on a real preemptible cluster a
  *     lost executor makes the cached blocks unrecoverable and fails the
  *     whole iteration chain (the r16 verdict's scale caveat).
  *   - RELIABLE (`spark.graft.checkpoint.reliable=true`, part of
  *     [[Sessions.clusterProfile]]): durable `checkpoint()` to the
  *     checkpoint directory (HDFS/object store on a cluster — set
  *     `spark.graft.checkpoint.dir` or call `setCheckpointDir`). An
  *     executor lost mid-loop re-reads the last round's state from
  *     storage instead of failing or recomputing the chain.
  *
  * Both modes are eager and both return a frame whose plan is a plain
  * scan of the materialized state, so results are bit-identical — the
  * spec proves it by running a loop under each mode.
  */
object Materialize {

  /** Config key: durable-checkpoint switch (cluster profile sets it). */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Config key: checkpoint directory used when none is set yet. */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Materialize one round of iteration state (see object doc). */
  def iteration(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableKey).contains("true")
    if (!reliable) df.localCheckpoint()
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirKey).getOrElse(
          System.getProperty("java.io.tmpdir") +
            s"/graft-ckpt-${sc.applicationId}")
        sc.setCheckpointDir(dir)
      }
      df.checkpoint()
    }
  }
}
