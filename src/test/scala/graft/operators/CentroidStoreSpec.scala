package graft.operators

import graft.{SparkSpec, Tables}

/** The train-once/apply-everywhere contract of [[CentroidStore]]:
  * stored-probe results are hash-identical to the freshly-trained forms,
  * training runs at most once per (corpus, shape), and — the 100 TB
  * point — the apply path executes ZERO k-means jobs (proven by
  * capturing every executed plan and asserting none carries the
  * training loop's fingerprints: the integer-quantization constant and
  * the dimension posexplode).
  */
class CentroidStoreSpec extends SparkSpec {

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

  // the Lloyd's-loop fingerprints: every training round aggregates
  // round(x * 2^20) sums over a posexploded embedding — neither appears
  // anywhere in an assignment/probe/rerank plan
  private def assertNoKmeans(plans: Seq[String]): Unit = {
    assert(plans.nonEmpty)
    plans.foreach { p =>
      assert(!p.contains(Similarity.MeanQuantum.toString), p.take(2000))
      assert(!p.contains("posexplode"), p.take(2000))
    }
  }

  test("stored IVF probe: hash-identical to fresh training, trains once, zero k-means jobs on apply") {
    val dir = sf("sf0.001")
    val fresh = Similarity
      .ivfTopK(Tables.embeddings(spark, dir), trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // first call trains + persists (exactly once, even if another suite
    // already touched this corpus)
    Similarity.ivfTopKStored(spark, dir).collect()
    val builds = CentroidStore.ivfBuilds(dir)
    assert(builds === 1, "first stored call must train exactly once")

    // second call: pure apply — bounded artifact read + probe
    val (got, plans) = collectPlans {
      Similarity.ivfTopKStored(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    assert(got === fresh, "stored probe must equal the freshly-trained result")
    assert(CentroidStore.ivfBuilds(dir) === builds, "apply path must not retrain")
    assertNoKmeans(plans)
  }

  test("stored PQ probe: hash-identical to fresh training, trains once, zero k-means jobs on apply") {
    val dir = sf("sf0.001")
    val fresh = ProductQuantization
      .pqTopK(Tables.embeddings(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    ProductQuantization.pqTopKStored(spark, dir).collect()
    val builds = CentroidStore.pqBuilds(dir)
    assert(builds === 1, "first stored call must train exactly once")

    val (got, plans) = collectPlans {
      ProductQuantization.pqTopKStored(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    assert(got === fresh, "stored probe must equal the freshly-trained result")
    assert(CentroidStore.pqBuilds(dir) === builds, "apply path must not retrain")
    assertNoKmeans(plans)
  }

  test("stored IVF-PQ probe: hash-identical to the joint trainer, zero k-means jobs on apply") {
    val dir = sf("sf0.001")
    val fresh = ProductQuantization
      .ivfPqTopK(Tables.embeddings(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    ProductQuantization.ivfPqTopKStored(spark, dir).collect() // build both artifacts
    val (got, plans) = collectPlans {
      ProductQuantization.ivfPqTopKStored(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    assert(got === fresh,
      "stored probe must equal the jointly-trained result (bit-identical loops)")
    assertNoKmeans(plans)
  }

  test("the persisted artifact round-trips exact float32 bits") {
    val dir = sf("sf0.001")
    val trained = Similarity.trainedCentroids(Tables.embeddings(spark, dir))
    val stored = CentroidStore.ivfCentroids(spark, dir)
    assert(stored.length === trained.length)
    trained.zip(stored).foreach { case ((ci, cv), (si, sv)) =>
      assert(ci === si)
      assert(cv.toSeq === sv.toSeq, s"cell $ci centroid bits must survive parquet")
    }
  }
}
