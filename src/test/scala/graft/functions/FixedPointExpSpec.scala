package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import FixedPointExp.{expF, expFRef, MaxOctaves}
import FixedPointLn.{lnFRef, Ln2F, Scale}

class FixedPointExpSpec extends SparkSpec {

  // the values temperatureSchedule actually feeds exp_f: ln_f of source
  // token counts scaled by 1/T, plus domain edges
  private val samples: Seq[Long] = Seq(
    0L, 1L, 100L, Ln2F - 1, Ln2F, Ln2F + 1, 3 * Ln2F,
    lnFRef(1000L), lnFRef(1000000L) / 2, lnFRef(1L << 40) / 3,
    MaxOctaves * Ln2F, MaxOctaves * Ln2F + Ln2F - 1)

  test("codegen'd expression matches the plain-Scala reference bit-for-bit") {
    import spark.implicits._
    val got = samples.toDF("y")
      .select(col("y"), expF(col("y")).as("e"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    samples.foreach(y => assert(got(y) === expFRef(y), s"y=$y"))
  }

  test("accuracy: within 1e-4 relative of the real exp over the domain") {
    samples.foreach { y =>
      val want = math.exp(y.toDouble / Scale) * Scale
      val rel = math.abs(expFRef(y) - want) / want
      assert(rel < 1e-4, s"y=$y rel=$rel")
    }
    assert(expFRef(0L) === Scale) // exp(0) = 1
    // one octave: exp_f(ln_f(2)) doubles the scale to within a few ulp
    assert(math.abs(expFRef(Ln2F) - 2 * Scale) <= 8)
  }

  test("round-trip with ln_f: exp_f(ln_f(x)) ~ x within 1e-4 relative") {
    Seq(1L, 2L, 10L, 999L, 1000000L, (1L << 20) + 7, 1L << 40).foreach { x =>
      val rt = expFRef(lnFRef(x)).toDouble / Scale
      assert(math.abs(rt - x) / x < 1e-4, s"x=$x roundtrip=$rt")
    }
  }

  test("monotone over a dense range (share-ordering safety)") {
    (0L until 3000L).map(_ * 997L).foldLeft(-1L) { (prev, y) =>
      val v = expFRef(y)
      assert(v >= prev, s"y=$y")
      v
    }
  }

  test("out-of-domain (negative, overflow-octave) and null inputs are NULL") {
    import spark.implicits._
    val got = Seq(Some(-1L), Some((MaxOctaves + 1) * Ln2F), None).toDF("y")
      .select(expF(col("y")).as("e"))
      .collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("exactly the DuckDB-mirrored arithmetic (expFSql chain replayed in Scala)") {
    // replay the SQL generator's steps literally — u_k lateral aliases,
    // `//` = trunc division on non-negative operands, final (1<<e) product
    def sqlChain(y: Long): Long = {
      val e = y / 726817L
      val r = y % 726817L
      var u = 1048576L
      var sum = 1048576L
      (1 to FixedPointExp.Terms).foreach { k =>
        u = (u * r) / (1048576L * k)
        sum += u
      }
      sum * (1L << e)
    }
    samples.foreach(y => assert(sqlChain(y) === expFRef(y), s"y=$y"))
  }

  test("exp_fixed is callable from SQL and coerces INT literals") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql(
      s"SELECT exp_fixed(0) AS one, exp_fixed(${Ln2F}L) AS two").collect()(0)
    assert(got.getLong(0) === Scale)
    assert(got.getLong(1) === expFRef(Ln2F))
  }
}
