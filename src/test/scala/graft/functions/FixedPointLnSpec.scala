package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import FixedPointLn.{lnF, lnFRef, Ln2F, Scale}

class FixedPointLnSpec extends SparkSpec {

  // the values the round-11 operators actually feed ln_f: small smoothed
  // counts, bucket totals, 20/21-bit hash draws, corpus-scale counts
  private val samples: Seq[Long] = Seq(
    1L, 2L, 3L, 5L, 7L, 10L, 100L, 999L, 12345L, 1000000L,
    (1L << 20) - 1, 1L << 20, (1L << 20) + 1, (1L << 21) - 1,
    1000000000L, (1L << 40) - 1, 1L << 40, Long.MaxValue / 1048577)

  test("codegen'd expression matches the plain-Scala reference bit-for-bit") {
    import spark.implicits._
    val got = samples.toDF("x")
      .select(col("x"), lnF(col("x")).as("l"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    samples.foreach(x => assert(got(x) === lnFRef(x), s"x=$x"))
  }

  test("accuracy: within 1e-4 nat of the real ln over the operating range") {
    // the defined fixed-point semantics, not IEEE ln — but it must stay an
    // accurate logarithm or the scores it feeds stop meaning anything
    samples.foreach { x =>
      val err = math.abs(lnFRef(x).toDouble / Scale - math.log(x.toDouble))
      assert(err < 1e-4, s"x=$x err=$err")
    }
    assert(lnFRef(1L) === 0L)
    assert(math.abs(lnFRef(2L) - Ln2F) <= 3) // one octave ≈ LN2F exactly
  }

  test("monotone over a dense small range (ranking safety)") {
    (1L until 3000L).foldLeft(-1L) { (prev, x) =>
      val v = lnFRef(x)
      assert(v >= prev, s"x=$x")
      v
    }
  }

  test("out-of-domain and null inputs are NULL, not garbage") {
    import spark.implicits._
    val got = Seq(Some(0L), Some(-5L), None).toDF("x")
      .select(lnF(col("x")).as("l"))
      .collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("exactly the DuckDB-mirrored arithmetic (lnFSql chain replayed in Scala)") {
    // replay the SQL generator's steps literally — `//` = trunc division on
    // the non-negative operands, length(bin(x))-1 = bit length − 1 — and
    // require equality with lnFRef for every sample, so the two published
    // definitions cannot drift apart
    def sqlChain(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x) // length(bin(x))-1
      val mf = if (e >= 20) x / (1L << (e - 20)) else x * (1L << (20 - e))
      val zf = ((mf - 1048576L) * 1048576L) / (mf + 1048576L)
      val z2 = (zf * zf) / 1048576L
      val t3 = (zf * z2) / 1048576L
      val t5 = (t3 * z2) / 1048576L
      val t7 = (t5 * z2) / 1048576L
      val t9 = (t7 * z2) / 1048576L
      e * 726817L + 2L * (zf + t3 / 3L + t5 / 5L + t7 / 7L + t9 / 9L)
    }
    samples.foreach(x => assert(sqlChain(x) === lnFRef(x), s"x=$x"))
  }
}
