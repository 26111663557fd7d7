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
}
