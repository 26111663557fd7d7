package graft.operators

import graft.{SparkSpec, Tables}

/** The train-once contract of [[ModelStore]]: stored-model scoring is
  * hash-identical to `nbScore` (ln_f integers round-trip parquet
  * exactly), the model trains at most once per corpus, and the apply
  * path runs ZERO training work — no captured plan derives the weak
  * label or aggregates class-conditional counts.
  */
class ModelStoreSpec extends SparkSpec {

  private def collectPlans[A](body: => A): (A, Seq[String]) = {
    val plans = scala.collection.mutable.Buffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val a = body
      org.apache.spark.sql.graft.ColumnBridge.waitForListenerBus(spark)
      (a, plans.synchronized(plans.toSeq))
    } finally spark.listenerManager.unregister(listener)
  }

  test("stored-model scoring: identical to nbScore, trains once, zero training work on apply") {
    val dir = sf("sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val fresh = canon(TextAnalysis.nbScore(Tables.documents(spark, dir)))

    ModelStore.score(spark, dir).collect() // first call trains + persists
    assert(ModelStore.builds(dir) === 1, "first stored call must train exactly once")

    val (got, plans) = collectPlans {
      canon(ModelStore.score(spark, dir))
    }
    assert(got === fresh, "stored-model scores must equal fresh training")
    assert(ModelStore.builds(dir) === 1, "apply path must not retrain")
    assert(plans.nonEmpty)
    // training fingerprints: the weak-label column and the class count
    // names exist ONLY in nbTrain/docStats plans, never in the scoring fold
    plans.foreach { p =>
      assert(!p.contains("is_quality"), p.take(2000))
      assert(!p.contains("n_pos"), p.take(2000))
    }
  }
}
