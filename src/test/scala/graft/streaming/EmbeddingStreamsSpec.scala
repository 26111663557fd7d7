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

  test("streaming embedding drift equals the batch card (driver data)") {
    val dir = sf("sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Number](0).intValue, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val streamed = canon(EmbeddingStreams.embeddingDriftToBatch(spark, dir))
    val batch = canon(graft.operators.Similarity.embeddingDrift(
      graft.Tables.embeddings(spark, dir)))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
