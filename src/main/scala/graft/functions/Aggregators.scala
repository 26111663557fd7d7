package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAFs — the third extension surface next to the
  * codegen'd Catalyst expressions (`GraftExtensions`) and the operator
  * library: a user-defined AGGREGATE carries mergeable state through
  * Spark's ObjectHashAggregate, with map-side partial aggregation and the
  * same shuffle contract as a built-in agg.
  */
object Aggregators {

  /** HyperLogLog register state as a typed Aggregator: buffer = one Int
    * per register holding the MIN bit-length seen (the [[graft.operators.Sketches]]
    * encoding: min bit-length ≡ max rho; `HllW + 1` = empty sentinel, so
    * `merge` is elementwise min with no special cases). Same 60-bit seeded
    * md5 hash as `HashFunctions.md5Long(tok, HllHashSeed)`, computed here
    * on the JVM (hex-prefix parse — byte-identical to the SQL `conv`
    * path), so this UDAF and the relational explode→agg form
    * ([[graft.operators.Sketches.hllVocabByLang]]) produce the SAME
    * registers and share one DuckDB oracle.
    *
    * Why both forms exist: the relational form is pure `functions._`
    * (codegen, no object state); this one demonstrates the
    * `Aggregator`/`udaf` API and wins when the input is already typed or
    * the sketch must ride inside `Dataset.groupByKey(...).agg(...)`.
    * State is O(registers) per group either way — the 100 TB shuffle
    * carries 256 ints per (group, map task), not the tokens.
    */
  class HllRegisters(p: Int, w: Int, hashSeed: Int)
      extends Aggregator[String, Array[Int], (Int, Long)] {
    private val m = 1 << p
    private val sentinel = w + 1

    override def zero: Array[Int] = Array.fill(m)(sentinel)

    override def reduce(buf: Array[Int], tok: String): Array[Int] = {
      val gh = HllRegisters.hash60(hashSeed, tok)
      val j = (gh % m).toInt
      val b = gh >>> p
      val bl = if (b == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(b)
      if (bl < buf(j)) buf(j) = bl
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < m) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
      a
    }

    /** (n_zero_registers, denom = Σ_j 2^minb_j) — the exact-integer state
      * the raw estimate divides into; identical to the relational form's
      * columns.
      */
    override def finish(buf: Array[Int]): (Int, Long) = {
      var zeros = 0
      var denom = 0L
      var j = 0
      while (j < m) {
        if (buf(j) == sentinel) zeros += 1
        denom += 1L << buf(j)
        j += 1
      }
      (zeros, denom)
    }

    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    override def outputEncoder: Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
  }

  /** Order-independent XOR fold of 60-bit row hashes — the table-digest
    * aggregate. XOR is commutative, associative, and cannot overflow, so
    * the digest is identical at any parallelism and any row order: two
    * copies of a 100 TB table can be compared by exchanging 8 bytes per
    * group instead of re-reading either side. (A plain `sum` of hashes
    * would overflow Long at ~2^3 rows × 2^60 and ANSI mode makes overflow
    * an error, not a wrap.)
    */
  class XorDigest extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, h: Long): Long = acc ^ h
    override def merge(a: Long, b: Long): Long = a ^ b
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Dyadic-histogram state for the fixed-universe quantile sketch
    * ([[graft.operators.Sketches.quantileSketch]]): for every level
    * `l ∈ [lMin, u]` count values by bucket `v >> l` — a complete binary
    * tree over the universe `[0, 2^u)` truncated at resolution `2^lMin`.
    * The buffer is ONE flat Long array of Σ_l 2^(u−l) = 2^(u−lMin+1) − 1
    * counters (8191 at u=26, lMin=14 — 64 KB per group, fixed whatever
    * the input size); merge is elementwise addition, so the state is
    * order-independent and the finished (level, bucket, count) rows are
    * bit-identical at any parallelism — the property that lets DuckDB
    * replay every downstream rank/quantile answer exactly.
    *
    * Values outside the universe are clamped to its edges by the CALLER
    * (documented contract — the clamp must be mirrored in the oracle).
    */
  /** Deterministic level-sampling quantile sketch over FLOAT values — the
    * KLL-style geometric-weight ladder with the compaction coin replaced
    * by a fixed content hash, which is what makes the state a pure
    * function of the input MULTISET (order- and partition-invariant,
    * hence externally hash-checkable — the property random-coin KLL
    * fundamentally lacks).
    *
    * Each row carries a 60-bit hash `h` of its stable key; its LEVEL is
    * the number of trailing zero bits of `h` (capped at `maxLevel`), so
    * P(level ≥ l) = 2^-l — exactly the survival probability l rounds of
    * KLL compaction give an item. State = (exact n, cutoff lMin, the
    * items with level ≥ lMin); when the kept set exceeds `cap`, the
    * cutoff rises one level (halving the survivors in expectation) —
    * deterministic compaction. Every kept item represents 2^lMin input
    * rows.
    *
    * Invariance contract (what the DuckDB oracle replays in closed form):
    * the final state is EXACTLY n, lMin = min{l : |{x : level(x) ≥ l}| ≤
    * cap}, and the kept set {x : level(x) ≥ lMin} — regardless of row
    * order, partitioning, or merge tree. Proof shape: items are only ever
    * dropped when strictly below the current cutoff, the cutoff only
    * rises while the kept set overflows, and a partition's overflow count
    * lower-bounds the global count at the same level — so no merge order
    * can overshoot the closed-form cutoff. SketchSpec asserts the
    * invariance; rank error is O(sqrt(rank · 2^lMin)) w.h.p. over the
    * hash family (the error-envelope case).
    */
  class LevelSample(cap: Int, maxLevel: Int)
      extends Aggregator[(Long, Double), (Long, Int, Seq[(Double, Long)]), (Long, Int, Seq[(Double, Long)])] {

    private def levelOf(h: Long): Int =
      math.min(java.lang.Long.numberOfTrailingZeros(h), maxLevel)

    private def prune(st: (Long, Int, Seq[(Double, Long)])): (Long, Int, Seq[(Double, Long)]) = {
      var (n, lMin, items) = st
      while (items.size > cap) {
        lMin += 1
        items = items.filter { case (_, h) => levelOf(h) >= lMin }
      }
      (n, lMin, items)
    }

    override def zero: (Long, Int, Seq[(Double, Long)]) = (0L, 0, Vector.empty)

    override def reduce(
        st: (Long, Int, Seq[(Double, Long)]), row: (Long, Double)): (Long, Int, Seq[(Double, Long)]) = {
      val (h, v) = row
      val (n, lMin, items) = st
      if (levelOf(h) >= lMin) prune((n + 1, lMin, items :+ ((v, h))))
      else (n + 1, lMin, items)
    }

    override def merge(
        a: (Long, Int, Seq[(Double, Long)]), b: (Long, Int, Seq[(Double, Long)])): (Long, Int, Seq[(Double, Long)]) = {
      val lMin = math.max(a._2, b._2)
      val items = (a._3 ++ b._3).filter { case (_, h) => levelOf(h) >= lMin }
      prune((a._1 + b._1, lMin, items))
    }

    override def finish(st: (Long, Int, Seq[(Double, Long)])): (Long, Int, Seq[(Double, Long)]) = st

    override def bufferEncoder: Encoder[(Long, Int, Seq[(Double, Long)])] = ExpressionEncoder()
    override def outputEncoder: Encoder[(Long, Int, Seq[(Double, Long)])] = ExpressionEncoder()
  }

  class DyadicHistogram(lMin: Int, u: Int)
      extends Aggregator[Long, Array[Long], Seq[(Int, Long, Long)]] {
    private val nLevels = u - lMin + 1
    /** offsets(i) = start of level (lMin + i) in the flat buffer. */
    private val offsets: Array[Int] = {
      val o = new Array[Int](nLevels)
      var i = 1
      while (i < nLevels) { o(i) = o(i - 1) + (1 << (u - (lMin + i - 1))); i += 1 }
      o
    }
    private val size = offsets(nLevels - 1) + 1 // level u has one bucket

    override def zero: Array[Long] = new Array[Long](size)

    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      var i = 0
      while (i < nLevels) {
        buf(offsets(i) + (v >> (lMin + i)).toInt) += 1L
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < size) { a(i) += b(i); i += 1 }
      a
    }

    /** Non-empty nodes as (level, bucket, count) rows. */
    override def finish(buf: Array[Long]): Seq[(Int, Long, Long)] =
      (0 until nLevels).flatMap { i =>
        val w = 1 << (u - (lMin + i))
        (0 until w).collect {
          case b if buf(offsets(i) + b) != 0L =>
            (lMin + i, b.toLong, buf(offsets(i) + b))
        }
      }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Int, Long, Long)]] = ExpressionEncoder()
  }

  object HllRegisters {
    /** JVM mirror of `HashFunctions.md5Long(c, seed)`: first 15 hex chars
      * of md5("seed:x") parsed base-16 — 60 bits, always non-negative.
      */
    def hash60(seed: Int, x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s"$seed:$x".getBytes("UTF-8"))
      val hex = new StringBuilder(15)
      var i = 0
      while (hex.length < 15) {
        hex.append(f"${d(i) & 0xff}%02x")
        i += 1
      }
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
  }

  /** Bloom bitmap as a typed Aggregator: the buffer is the bitmap itself
    * (`m/64` Long words), `reduce` sets one bit per input POSITION row,
    * `merge` is word-wise OR — commutative, associative, idempotent, so
    * the finished bitmap is identical at any parallelism and row order.
    * This is the distributed-build half of a planner-injected runtime
    * filter (Spark's own `BloomFilterAggregate` has the same shape): the
    * executors fold their partitions into local bitmaps, the shuffle
    * carries one `m`-bit blob per map task, and the driver receives
    * exactly one bitmap — transfer bounded by m, never by the build-side
    * row count. See [[graft.operators.RuntimeFilter.bloomBitmap]].
    */
  class BitmapOr(words: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(buf: Array[Long], p: Long): Array[Long] = {
      buf((p >>> 6).toInt) |= 1L << (p & 63); buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }
}
