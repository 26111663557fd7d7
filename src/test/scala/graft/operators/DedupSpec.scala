package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical normalized text, keeps min doc_id") {
    val d = docs(
      1L -> "Hello   World",
      2L -> "hello world",
      3L -> "  HELLO WORLD  ",
      4L -> "something else entirely")
    val got = Dedup.exactDuplicates(d)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 1L), (1L, 4L))) // (n_copies, keeper)
  }

  test("minhash LSH finds planted near-dup pairs and skips unrelated docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val nearDup = base.replace("delta", "DELTA-EDIT") // small edit
    val unrelated = "one two three four five six seven eight nine ten " * 5
    val d = docs(1L -> base, 2L -> nearDup, 3L -> unrelated, 4L -> base)
    val pairs = Dedup.nearDuplicatePairs(d, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated excluded
  }

  test("short docs (< 3 tokens) are excluded from LSH, not crashed on") {
    val d = docs(1L -> "tiny doc", 2L -> "", 3L -> "a b c d e f g h")
    assert(Dedup.nearDuplicatePairs(d, 0.1).count() === 0)
    val sigs = Dedup.minhashSignatures(d).where(col("mh0").isNotNull).count()
    assert(sigs === 1) // only doc 3 has shingles
  }

  test("simhash byte-banding equals brute force for hamming <= 3 (driver data)") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val banded = Dedup.simhashNearDupPairs(d, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Dedup.simhashSignatures(d)
    val brute = sigs.as("a")
      .join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("dist"))
      .where(col("dist") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute)
    assert(brute.nonEmpty) // the planted near-dups make this non-vacuous
  }
}
