package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def one(text: String): DataFrame = {
    import spark.implicits._
    Seq(text).toDF("t")
  }

  test("normalizeWord: lowercases then trims the exact reference charset") {
    val rows = one("ignored")
      .select(
        TextFunctions.normalizeWord(lit("\"Hello,\"")).as("a"),
        TextFunctions.normalizeWord(lit("don't")).as("b"),
        TextFunctions.normalizeWord(lit("...")).as("c"),
        TextFunctions.normalizeWord(lit("(keep)")).as("d"))
      .collect()(0)
    assert(rows.getString(0) === "hello")
    assert(rows.getString(1) === "don't") // interior apostrophe kept
    assert(rows.getString(2) === "")      // all-punct → empty
    assert(rows.getString(3) === "(keep)") // parens are NOT in the trim set
  }

  test("shingles: distinct n-grams; short docs yield empty array, not a countdown") {
    val got = one("a b c a b c")
      .select(TextFunctions.shingles(col("t"), 3).as("s"))
      .collect()(0).getSeq[String](0)
    assert(got.toSet === Set("a b c", "b c a", "c a b"))

    val short = one("a b")
      .select(TextFunctions.shingles(col("t"), 3).as("s"))
      .collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("jaccard on distinct arrays") {
    val j = one("x")
      .select(TextFunctions.jaccard(
        array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("j"))
      .collect()(0).getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }
}
