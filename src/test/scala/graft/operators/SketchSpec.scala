package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregates against exact answers. */
class SketchSpec extends SparkSpec {

  test("HLL distinct counts within 3x rsd; percentile sketch near exact") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val approx = Relational.sketchSummary(li, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(
        countDistinct("l_orderkey").as("orders"),
        countDistinct("l_partkey").as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val relOrders = math.abs(a.getLong(1) - e.getLong(1)).toDouble / e.getLong(1)
      val relParts = math.abs(a.getLong(2) - e.getLong(2)).toDouble / e.getLong(2)
      assert(relOrders <= 0.06, s"$flag orders off by $relOrders")
      assert(relParts <= 0.06, s"$flag parts off by $relParts")
      val relP50 = math.abs(a.getDouble(3) - e.getDouble(3)) / e.getDouble(3)
      assert(relP50 <= 0.01, s"$flag p50 off by $relP50")
    }
  }
}
