package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

class ObserveSpec extends SparkSpec {

  test("withRowMetrics counts rows and nulls during the job, result untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None), (5L, None)
    ).toDF("id", "s")
    val obs = new Observation("quality")
    val observed = Observe.withRowMetrics(df, obs, Seq("s"))
    // the observed frame IS the input: same rows, same schema
    val out = observed.where(col("id") > 1L).collect()
    assert(out.length === 4)
    val m = obs.get
    // metrics reflect the FULL observed frame (attached above the filter)
    assert(m("n_rows") === 5L)
    assert(m("nulls_s") === 3L)
  }

  test("metrics ride a real pipeline query without a second scan") {
    val li = graft.Tables.lineitem(spark, sf("sf0.001"))
    val obs = new Observation("ingest")
    val observed = Observe.withRowMetrics(li, obs, Seq("l_shipdate", "l_quantity"))
    val revenue = graft.operators.Relational.forecastRevenue(observed).collect()
    assert(revenue.length === 1)
    val m = obs.get
    assert(m("n_rows") === li.count())
    assert(m("nulls_l_shipdate") === 0L)
    assert(m("nulls_l_quantity") === 0L)
  }
}
