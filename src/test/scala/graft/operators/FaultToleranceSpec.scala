package graft.operators

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicBoolean

/** Fault-tolerance parity (SURVEY §5 item 5): the reference injects worker
  * crashes and asserts the golden output survives
  * (`worker/worker.go:36-45`); here a task throws on its first attempt and
  * Spark's lineage-based retry must still produce the exact result.
  */
class FaultToleranceSpec extends SparkSpec {

  test("word count survives a task failure via lineage retry") {
    import spark.implicits._
    val data = Seq("hello world hello", "world test").toDS()
    val flaky = data.mapPartitions { it =>
      if (FaultToleranceSpec.shouldFail.compareAndSet(true, false))
        throw new RuntimeException("injected task failure (first attempt only)")
      it
    }

    FaultToleranceSpec.shouldFail.set(true)
    val got = WordCount.topK(WordCount.counts(flaky.toDF("value"), "value"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq("hello" -> 2L, "world" -> 2L, "test" -> 1L))
    assert(!FaultToleranceSpec.shouldFail.get, "the failure was never injected")
  }

  test("golden output survives continuous reference-rate chaos (5% crash, 10% delay)") {
    import spark.implicits._
    // The reference injects 5% crash / 10% delay on EVERY worker loop
    // iteration (`worker/worker.go:36-45`) and the golden top-5 must
    // survive. Spark equivalent: every task of the chaos stage rolls the
    // same rates. The roll is md5(partition:attempt) — deterministic across
    // runs AND fresh per retry, like the reference's per-iteration dice.
    // With 64 partitions: partition 21 crashes on attempt 0 and succeeds on
    // its retry; 7 tasks get delayed; no task crashes twice (verified —
    // the session allows maxFailures=2).
    val golden = Seq(
      "hello world hello this is a test",   // reference input1.txt
      "world goodbye hello test test world") // reference input2.txt
    val chaotic = golden.toDS().repartition(64).mapPartitions { it =>
      val ctx = org.apache.spark.TaskContext.get()
      val roll = FaultToleranceSpec.chaosRoll(ctx.partitionId(), ctx.attemptNumber())
      if (roll < 0.05) {
        FaultToleranceSpec.crashes.incrementAndGet()
        throw new RuntimeException("chaos: injected crash")
      } else if (roll < 0.15) Thread.sleep(20) // scaled-down 0-5 s delay
      it
    }

    FaultToleranceSpec.crashes.set(0)
    val got = WordCount.topK(WordCount.counts(chaotic.toDF("value"), "value"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(
      "hello" -> 3L, "test" -> 3L, "world" -> 3L, "a" -> 1L, "goodbye" -> 1L),
      "golden README.md:103-111 output must survive chaos")
    assert(FaultToleranceSpec.crashes.get() > 0, "no crash was ever injected")
  }

  test("streaming parquet sink stays exactly-once under an injected task crash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_chaos_stream")
    val input = MemoryStream[Long]
    val flaky = input.toDS().mapPartitions { it =>
      if (FaultToleranceSpec.streamFail.compareAndSet(true, false))
        throw new RuntimeException("chaos: injected streaming task failure")
      it
    }.toDF("event_id")
    FaultToleranceSpec.streamFail.set(true)
    val q = flaky.writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(1L to 100L: _*)
      q.processAllAvailable()
    } finally q.stop()
    // task retry must not duplicate rows into the sink (manifest-commit
    // protocol) nor lose any — the reference's crash-survival contract,
    // continuous form
    val ids = spark.read.parquet(s"$tmp/out").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (1L to 100L), "exactly-once under retry")
    assert(!FaultToleranceSpec.streamFail.get, "the failure was never injected")
  }

  test("conf-gated chaos stage at the table-scan seam is an identity (and engages)") {
    import graft.{Chaos, Tables}
    val dir = sf("sf0.001")
    val clean = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // delay-only rates keep this deterministic under the test session's
    // maxFailures=2 (crash-retry parity at scale is ChaosRun's job); the
    // seam must inject — counter moves — and must not change any value
    spark.conf.set(Chaos.EnabledKey, "true")
    spark.conf.set(Chaos.CrashRateKey, "0.0")
    spark.conf.set(Chaos.DelayRateKey, "1.0")
    val before = Chaos.delays.get()
    try {
      val chaotic = Tables.lineitem(spark, dir)
        .groupBy("l_returnflag").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(chaotic === clean, "chaos stage must be a value-level identity")
      assert(Chaos.delays.get() > before, "the chaos stage never engaged")
    } finally {
      spark.conf.set(Chaos.EnabledKey, "false")
      spark.conf.unset(Chaos.CrashRateKey)
      spark.conf.unset(Chaos.DelayRateKey)
    }
  }
}

/** Shared flag on the (local-mode) executor JVM: first task attempt fails. */
object FaultToleranceSpec {
  val shouldFail = new AtomicBoolean(false)
  val streamFail = new AtomicBoolean(false)
  val crashes = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Uniform [0,1) from the first 32 bits of md5("partition:attempt") —
    * deterministic (no run-to-run flake) yet re-rolled per task attempt.
    */
  def chaosRoll(partition: Int, attempt: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$partition:$attempt".getBytes("UTF-8"))
    val bits = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    bits.toDouble / (1L << 32)
  }
}
