package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-style runtime join pruning — the "runtime filter" every warehouse
  * engine injects for selective star joins: before shuffling a 100 TB probe
  * side, test each probe key against a compact digest of the (already
  * filtered, much smaller) build side and drop rows that cannot possibly
  * match. The exact join still runs afterwards, so false positives cost
  * only wasted shuffle bytes and the RESULT IS IDENTICAL — the filter is a
  * pass-through optimization, which is why the registered query shares the
  * plain join's oracle.
  *
  * Mechanics: k seeded 60-bit md5 hashes map each build key to k bit
  * positions in an m-position space; the ≤ m distinct positions are
  * BROADCAST (never collected — the digest frame is its own bounded
  * "bitmap"), and the probe passes through k broadcast LEFT SEMI joins,
  * one per hash — a row survives only if ALL k of its positions are set.
  * Each semi join is a codegen'd BroadcastHashJoin, so the whole test
  * pipelines inside the probe's scan stage. No false negatives: the same
  * deterministic hashes set and test the positions. Spark 3.3+'s own
  * `runtime.bloomFilter` rule injects this shape automatically when
  * statistics cooperate; building it explicitly makes the mechanism
  * visible, testable, and usable where the planner declines.
  */
object RuntimeFilter {

  /** Position-space size and hash count: m = 2^16, k = 3 → ~1.5% false
    * positives at 5k build keys, shrinking the probe to build-selectivity
    * + epsilon.
    */
  val BloomBits = 1 << 16
  val BloomHashes = 3
  val BloomSeedBase = 211

  private def position(key: Column, i: Int): Column =
    HashFunctions.md5Long(key.cast("string"), BloomSeedBase + i) % BloomBits

  /** The ≤ m distinct set positions of `build`'s keys — the Bloom bitmap
    * as a (bounded) one-column frame. One distinct hash-agg, map-side
    * combined; output cardinality is capped by the CONSTANT m regardless
    * of build size.
    */
  def bloomPositions(build: DataFrame, key: String): DataFrame =
    build.select(explode(array(
      (0 until BloomHashes).map(i => position(col(key), i)): _*)).as("p"))
      .distinct()

  /** Prune `probe` to rows whose `key` has all k positions present in
    * `positions` ([[bloomPositions]] output): k chained broadcast left-semi
    * joins = the conjunction "bit i is set for every i". AQE can't beat
    * this with its own join reordering because each semi join's build side
    * is the same tiny digest.
    */
  def bloomPrune(probe: DataFrame, probeKey: String, positions: DataFrame): DataFrame = {
    val bits = broadcast(positions)
    (0 until BloomHashes).foldLeft(probe) { (acc, i) =>
      acc.join(bits, position(col(probeKey), i) === col("p"), "left_semi")
    }
  }

  /** [[urgentRevenue]] threshold, interpolated into the oracle. */
  val UrgentMinPrice: Double = 300000.0

  /** The registered showcase: revenue of lineitems belonging to URGENT
    * high-value orders. The order filter is selective (priority × price
    * tail), so the Bloom digest of the surviving orderkeys prunes most of
    * the lineitem table BEFORE the shuffle join; the exact join then
    * removes the false positives. Answer == the plain join — optimizations
    * change plans, never results.
    */
  def urgentRevenue(orders: DataFrame, lineitem: DataFrame,
      minPrice: Double = UrgentMinPrice): DataFrame = {
    val build = orders
      .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > minPrice)
      .select(col("o_orderkey"))
    val pruned = bloomPrune(lineitem, "l_orderkey", bloomPositions(build, "o_orderkey"))
    pruned
      .join(build, col("l_orderkey") === col("o_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(Relational.cents(col("l_extendedprice"))).cast("double") / 100.0)
          .as("revenue"))
  }
}
