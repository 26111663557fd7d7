package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 50, i.toLong))
      .toDF("k", "row_id")
    val dim = (0 to 60).map(i => (i.toLong, s"dim$i")).toDF("dk", "payload")

    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "dk", col("row_id"), buckets = 8)
      .select("row_id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(plain.size === 1000)
  }
}
