package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {

  test("bloomPrune: zero false negatives, real pruning, and an unchanged join result") {
    import spark.implicits._
    // build = 20 keys, probe = 5000 keys: ~0.4% of probe is a true match
    val build = (1L to 1000L by 50).toDF("k")
    val probe = (1L to 5000L).toDF("k")
    val pruned = RuntimeFilter.bloomPrune(
      probe, "k", RuntimeFilter.bloomPositions(build, "k"))
    val kept = pruned.collect().map(_.getLong(0)).toSet
    // every true key survives
    assert((1L to 1000L by 50).forall(kept.contains))
    // the digest prunes the overwhelming majority of non-matches
    assert(kept.size < 500, s"bloom kept ${kept.size} of 5000 probe rows")
    // and the exact join result is identical with or without the filter
    val viaBloom = pruned.join(build.withColumnRenamed("k", "bk"),
      col("k") === col("bk"), "left_semi").collect().map(_.getLong(0)).toSet
    assert(viaBloom === (1L to 1000L by 50).toSet)
  }

  test("bloomBitmap/bloomPruneBitmap: zero false negatives, real pruning, adaptive m") {
    import spark.implicits._
    val build = (1L to 1000L by 50).toDF("k")
    val probe = (1L to 5000L).toDF("k")
    val m = RuntimeFilter.bloomBitsFor(20)
    val bits = RuntimeFilter.bloomBitmap(build, "k", m)
    assert(bits.length === ((m + 63) >>> 6).toInt)
    val kept = RuntimeFilter.bloomPruneBitmap(probe, "k", bits, m)
      .collect().map(_.getLong(0)).toSet
    // every true key survives (no false negatives)
    assert((1L to 1000L by 50).forall(kept.contains))
    // the bitmap prunes the overwhelming majority of non-matches
    assert(kept.size < 500, s"bitmap kept ${kept.size} of 5000 probe rows")
    // sizing: m grows with the build count and floors at BloomBits
    assert(RuntimeFilter.bloomBitsFor(20) === RuntimeFilter.BloomBits.toLong)
    assert(RuntimeFilter.bloomBitsFor(1000000) >=
      RuntimeFilter.BloomBitsPerKey.toLong * 1000000L)
  }

  test("bitmap build is parallelism-invariant (OR-merge)") {
    import spark.implicits._
    val m = RuntimeFilter.BloomBits.toLong
    val keys = (1L to 997L).toDF("k")
    val one = RuntimeFilter.bloomBitmap(keys.repartition(1), "k", m)
    val many = RuntimeFilter.bloomBitmap(keys.repartition(17), "k", m)
    assert(one.toSeq === many.toSeq)
  }

  test("urgentRevenue equals the plain join on driver data") {
    val dir = sf("sf0.001")
    val orders = graft.Tables.orders(spark, dir)
    val lineitem = graft.Tables.lineitem(spark, dir)
    val got = RuntimeFilter.urgentRevenue(orders, lineitem).collect().head
    val want = lineitem
      .join(
        orders.where(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > RuntimeFilter.UrgentMinPrice),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)),
        (sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") / 100.0))
      .collect().head
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getDouble(1) === want.getDouble(1))
    assert(got.getLong(0) > 0L)
  }
}
