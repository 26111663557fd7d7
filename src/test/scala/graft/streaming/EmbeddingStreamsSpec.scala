package graft.streaming

import graft.SparkSpec

class EmbeddingStreamsSpec extends SparkSpec {

  test("streaming incremental SemDeDup equals the batch operator (driver data)") {
    val dir = sf("sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val streamed = canon(EmbeddingStreams.semDeDupIncrementalToBatch(spark, dir))
    val batch = canon(graft.operators.Similarity.semDeDupIncremental(
      graft.Tables.embeddings(spark, dir)))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    assert(streamed.exists(!_._3), "some arriving vector should collide with the corpus")
  }
}
