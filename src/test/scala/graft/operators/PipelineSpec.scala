package graft.operators

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("sourceCurationStats: cross-source duplicates, language spread, token totals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "s1"),             // dup of doc 2 (other source)
      (2L, "a  b c ", "en", "s2"),           // normalized-equal to doc 1
      (3L, "unique words right here", "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = Pipeline.sourceCurationStats(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // s1: two docs, one of them duplicated corpus-wide, two langs, 3+4 tokens
    assert(rows("s1") === ((2L, 1L, 2L, 7L, 3.5)))
    // s2: its single doc is a duplicate of s1's
    assert(rows("s2") === ((1L, 1L, 1L, 3L, 3.0)))
  }

  test("bestOfClusterKeepers keeps the longest member, min-id on ties, singletons whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5).trim
    val other = ("one two three four five six seven eight nine ten " * 5).trim
    val docs = Seq(
      1L -> base,                                  // cluster {1,2,3}:
      2L -> (base + " " + base),                   //   longest -> keeper
      3L -> base.replace("delta", "DELTA-EDIT"),
      7L -> "solitary words matching nothing else", // singleton
      10L -> other, 11L -> other)                  // tie cluster -> min id
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(docs, threshold = 0.3)
      .select(col("doc_a"), col("doc_b"))
    val got = Pipeline.bestOfClusterKeepers(docs, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 100L, 3L)), "longest member wins its 3-cluster")
    assert(got(7L) === ((7L, 5L, 1L)), "singleton keeps itself")
    assert(got(10L) === ((10L, 50L, 2L)), "equal lengths tie-break to min id")
    assert(got.keySet === Set(1L, 7L, 10L), "one keeper row per cluster")
  }
}
