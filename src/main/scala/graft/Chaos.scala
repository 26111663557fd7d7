package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}

/** Reference-rate chaos injection (reference `worker/worker.go:36-45`: 5%
  * crash / 10% delay rolled on every worker loop iteration) as a
  * conf-gated stage at the table-scan seam — the Spark mapping of "every
  * worker rolls the dice each time it picks up a task".
  *
  * The roll is a pure function of (stage, partition, attempt): chaos is
  * deterministic across runs (a reproducible parity check, not a flaky
  * one), every retry re-rolls fresh dice exactly like the reference's
  * per-iteration roll, and a crashed task's retry therefore succeeds with
  * the same probability as any other attempt. Correctness under chaos is
  * Spark's lineage-based task retry (`spark.task.maxFailures` > 1) — the
  * counterpart of the reference master re-queueing timed-out/failed tasks
  * (`master/master.go:111-117`).
  *
  * The stage is an identity `mapPartitions` over the scan output; it
  * blocks filter pushdown past itself, which changes the PLAN but not the
  * ANSWER — [[ChaosRun]] is a correctness-parity harness, never a bench.
  */
object Chaos {

  /** Runtime conf keys gating the stage inside [[Tables.load]]. */
  val EnabledKey = "spark.graft.chaos.enabled"
  val CrashRateKey = "spark.graft.chaos.crashRate"
  val DelayRateKey = "spark.graft.chaos.delayRate"

  val crashes = new java.util.concurrent.atomic.AtomicLong(0)
  val delays = new java.util.concurrent.atomic.AtomicLong(0)

  /** Deterministic uniform [0,1) roll per (stage, partition, attempt). */
  def roll(stageId: Int, partitionId: Int, attempt: Int): Double = {
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$stageId:$partitionId:$attempt".getBytes("UTF-8"))
    val x = java.nio.ByteBuffer.wrap(bytes).getLong() & Long.MaxValue
    x.toDouble / Long.MaxValue.toDouble
  }

  /** Identity pass-through stage that crashes/delays per the rolled dice.
    * Local-mode scaled delay: 50 ms stands in for the reference's 0-5 s.
    */
  def stage(df: DataFrame, crashRate: Double, delayRate: Double): DataFrame = {
    implicit val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val ctx = TaskContext.get()
      if (ctx != null) {
        val r = roll(ctx.stageId(), ctx.partitionId(), ctx.attemptNumber())
        if (r < crashRate) {
          crashes.incrementAndGet()
          throw new RuntimeException(
            s"chaos: injected crash (stage ${ctx.stageId()} partition ${ctx.partitionId()} attempt ${ctx.attemptNumber()})")
        } else if (r < crashRate + delayRate) {
          delays.incrementAndGet()
          Thread.sleep(50)
        }
      }
      it
    }
  }

  /** Wrap `df` in a chaos stage iff the session conf enables it. */
  def maybe(spark: org.apache.spark.sql.SparkSession, df: DataFrame): DataFrame =
    if (spark.conf.get(EnabledKey, "false").toBoolean)
      stage(df,
        spark.conf.get(CrashRateKey, "0.05").toDouble,
        spark.conf.get(DelayRateKey, "0.10").toDouble)
    else df
}
