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

  // NFC composition: the same visible text in NFD (e + combining acute)
  // and NFC (precomposed U+00E9) must be ONE word and ONE shingle set — this
  // is what keeps dedup recall honest on mixed-normalization crawl data.
  private val nfdCafe = "cafe\u0301 latte order cafe\u0301 latte"
  private val nfcCafe = "caf\u00e9 latte order caf\u00e9 latte"

  test("nfc: NFD and NFC spellings tokenize and shingle identically") {
    assert(nfdCafe !== nfcCafe) // genuinely different byte strings
    import spark.implicits._
    val df = Seq(("nfd", nfdCafe), ("nfc", nfcCafe)).toDF("form", "t")
    val toks = df.select(col("form"),
        TextFunctions.tokens(col("t")).as("toks")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(toks("nfd") === toks("nfc"))
    val sh = df.select(col("form"),
        TextFunctions.shingles(col("t"), 3).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh("nfd") === sh("nfc"))
    assert(sh("nfd").nonEmpty)
  }

  test("nfc: MinHash signatures agree across normalization forms (dedup recall)") {
    import spark.implicits._
    // end-to-end through the dedup shingle->minhash path: the two forms
    // must produce IDENTICAL signatures, i.e. be certain LSH candidates
    val docs = Seq((1L, nfdCafe), (2L, nfcCafe)).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
    val sigs = sh.select(col("doc_id"),
        HashFunctions.minhash(col("sh"), 1).as("m1"),
        HashFunctions.minhash(col("sh"), 2).as("m2"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(sigs.size === 1, "NFD and NFC forms must hash identically")
  }

  test("nfc/nfkc: ASCII passthrough, compatibility fold, null, SQL surface") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    // Scala \u escapes compile to the real codepoints inside the SQL
    // text (Spark's chr() wraps mod 256, so it CANNOT build these)
    val r = spark.sql(
      s"""SELECT nfc_normalize('plain ascii') AS a,
         |  nfc_normalize('cafe\u0301') AS b,
         |  nfkc_normalize('\ufb01le \uff12') AS c,
         |  nfc_normalize(CAST(NULL AS STRING)) AS d""".stripMargin)
      .collect()(0)
    assert(r.getString(0) === "plain ascii")
    assert(r.getString(1) === "caf\u00e9")
    assert(r.getString(2) === "file 2") // ligature fi + fullwidth 2 folded
    assert(r.isNullAt(3))
  }
}
