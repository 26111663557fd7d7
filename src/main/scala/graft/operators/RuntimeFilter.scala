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
  * Two digest shapes, same no-false-negative contract:
  *
  *  - SEMI-JOIN digest ([[bloomPositions]]/[[bloomPrune]]): k seeded
  *    60-bit md5 hashes map each build key to k bit positions in an
  *    m-position space; the ≤ m distinct positions are BROADCAST (never
  *    collected — the digest frame is its own bounded "bitmap"), and the
  *    probe passes through k broadcast LEFT SEMI joins, one per hash.
  *    Pure-relational, zero driver state.
  *  - BITMAP ([[bloomBitmap]]/[[bloomPruneBitmap]], the production shape
  *    and what [[urgentRevenue]] runs): executors OR-fold partition-local
  *    bitmaps, the driver gets ONE m-bit blob (m-bounded, never
  *    row-bounded), and the probe pays a single codegen'd scan-stage
  *    filter — one md5 per row (double hashing derives all k positions
  *    from one digest) instead of k, and no joins at all. This mirrors
  *    Spark 3.3+'s own `runtime.bloomFilter` rule
  *    (`BloomFilterAggregate` → broadcast `might_contain`), which injects
  *    the same shape automatically when statistics cooperate; building it
  *    explicitly makes the mechanism visible, testable, and usable where
  *    the planner declines.
  */
object RuntimeFilter {

  /** Minimum position-space size and hash count: m = 2^16, k = 3 → ~1.5%
    * false positives at 5k build keys. m is a FLOOR, not a constant: a
    * fixed m saturates when the build side outgrows it (measured at the
    * 10× scale-up: ~50k build keys × 3 hashes set nearly every one of 2^16
    * positions, the filter stops pruning, and the probe pays three useless
    * md5 semi-joins on top of the full join). [[bloomBitsFor]] sizes m
    * from the build count — exactly what planner-injected runtime filters
    * do from statistics — keeping ~1-2% FP at any build size.
    */
  val BloomBits = 1 << 16
  val BloomHashes = 3
  val BloomSeedBase = 211
  /** Target positions per build key (m ≈ 16·n rounded up to a power of
    * two → FP ≈ (k/16)^k ≈ 0.7% at k=3).
    */
  val BloomBitsPerKey = 16

  /** Power-of-two position-space size for a build-side key count. */
  def bloomBitsFor(nBuildKeys: Long): Long = {
    var m = BloomBits.toLong
    while (m < BloomBitsPerKey * nBuildKeys && m < (1L << 30)) m <<= 1
    m
  }

  private def position(key: Column, i: Int, m: Long): Column =
    HashFunctions.md5Long(key.cast("string"), BloomSeedBase + i) % m

  /** The ≤ m distinct set positions of `build`'s keys — the Bloom bitmap
    * as a (bounded) one-column frame. One distinct hash-agg, map-side
    * combined; output cardinality is capped by m regardless of build size.
    */
  def bloomPositions(build: DataFrame, key: String, m: Long = BloomBits.toLong): DataFrame =
    build.select(explode(array(
      (0 until BloomHashes).map(i => position(col(key), i, m)): _*)).as("p"))
      .distinct()

  /** Prune `probe` to rows whose `key` has all k positions present in
    * `positions` ([[bloomPositions]] output built with the SAME m): k
    * chained broadcast left-semi joins = the conjunction "bit i is set for
    * every i". AQE can't beat this with its own join reordering because
    * each semi join's build side is the same tiny digest.
    */
  def bloomPrune(probe: DataFrame, probeKey: String, positions: DataFrame,
      m: Long = BloomBits.toLong): DataFrame = {
    val bits = broadcast(positions)
    (0 until BloomHashes).foldLeft(probe) { (acc, i) =>
      acc.join(bits, position(col(probeKey), i, m) === col("p"), "left_semi")
    }
  }

  /** The bitmap path's k position expressions for `key`: seeded xxhash64
    * — NOT md5. The md5 convention elsewhere buys engine-portable hashes
    * for values that SURFACE IN RESULTS (minhash signatures, HLL
    * registers) so an external oracle can replay them; Bloom positions
    * never surface — the filter is pass-through — so the only
    * requirements are determinism and build/probe agreement, and the
    * codegen'd xxhash64 over the raw key (no string cast, no digest) is
    * ~7× cheaper per probe row than one md5 (measured at the 10×
    * scale-up: 7.4 s of md5 per pass over the 60 M-row probe).
    */
  private[graft] def bloomXxPositions(key: Column, m: Long): Seq[Column] =
    (0 until BloomHashes).map(i => pmod(xxhash64(lit(BloomSeedBase + i), key), lit(m)))

  /** The REAL Bloom bitmap of `build`'s keys, built distributed: executors
    * fold partitions into local `m`-bit word arrays ([[graft.functions
    * .Aggregators.BitmapOr]], word-wise OR merge), and the driver receives
    * exactly one `m/64`-Long blob — transfer bounded by m (16 KB at the
    * 2^20 typical, 128 MB at the 2^30 cap), NEVER by build rows. This is
    * the build half of a planner-injected runtime filter
    * (`BloomFilterAggregate` → broadcast literal), made explicit.
    */
  def bloomBitmap(build: DataFrame, key: String, m: Long): Array[Long] = {
    val words = ((m + 63) >>> 6).toInt
    val agg = udaf(new graft.functions.Aggregators.BitmapOr(words))
    build
      .select(explode(array(bloomXxPositions(col(key), m): _*)).as("p"))
      .agg(agg(col("p")).as("bits"))
      .head().getSeq[Long](0).toArray
  }

  /** Prune `probe` with a driver-held bitmap ([[bloomBitmap]] output built
    * with the SAME m): ONE codegen'd scan-stage filter testing all k
    * position bits per row — no semi joins, no shuffle. The position
    * expressions are the SAME Column code the build side folded in, so
    * no-false-negative is structural; the bitmap rides to executors as a
    * reference object in the task binary, exactly like a planner-injected
    * filter's broadcast sketch.
    */
  def bloomPruneBitmap(probe: DataFrame, probeKey: String, bits: Array[Long],
      m: Long): DataFrame =
    probe.where(graft.functions.BloomExpressions.positionsSet(
      bloomXxPositions(col(probeKey), m), bits))

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
      .localCheckpoint() // counted for sizing, then digested + joined
    // size the digest from the actual build count (a 1-row bounded action
    // over the filtered dim — the statistics a planner-injected filter
    // would read); results are m-independent, only pruning power changes
    val m = bloomBitsFor(build.count())
    val pruned = bloomPruneBitmap(
      lineitem, "l_orderkey", bloomBitmap(build, "o_orderkey", m), m)
    pruned
      .join(build, col("l_orderkey") === col("o_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        (sum(Relational.cents(col("l_extendedprice"))).cast("double") / 100.0)
          .as("revenue"))
  }
}
