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
}

/** Shared flag on the (local-mode) executor JVM: first task attempt fails. */
object FaultToleranceSpec {
  val shouldFail = new AtomicBoolean(false)
}
