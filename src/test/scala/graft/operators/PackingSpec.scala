package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))

  test("docOffsets is the exact exclusive prefix sum in doc_id order") {
    val rows = Packing.docOffsets(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    var expected = 0L
    rows.foreach { case (id, nTok, start) =>
      assert(start === expected, s"doc $id offset")
      assert(nTok >= 1L) // whitespace tokenizer yields [""] for empty text
      expected += nTok
    }
  }

  test("docOffsets is invariant to input partitioning (the prefix sum is, too)") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(canon(Packing.docOffsets(docs.repartition(1))) ===
      canon(Packing.docOffsets(docs.repartition(17))))
  }

  test("every packed chunk is exactly seqLen tokens except the final one; ids contiguous") {
    val chunks = Packing.packedChunkStats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val ids = chunks.map(_._1)
    assert(ids === (0L until ids.length).toArray, "chunk ids must be dense from 0")
    chunks.init.foreach { case (id, _, _, nTokens) =>
      assert(nTokens === Packing.SeqLen.toLong, s"chunk $id under-filled")
    }
    assert(chunks.last._4 >= 1L && chunks.last._4 <= Packing.SeqLen.toLong)
    // token conservation: chunks partition the concatenated stream
    val totalTok = Packing.docOffsets(docs).agg(sum("n_tok")).collect()(0).getLong(0)
    assert(chunks.map(_._4).sum === totalTok)
    // doc conservation: per-chunk starts sum to the corpus size
    assert(chunks.map(_._3).sum === docs.count())
  }

  test("packed spans tile each document's tokens exactly once") {
    val spans = Packing.packedDocSpans(docs).collect()
    spans.foreach { r =>
      val (nTok, start, first, last) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(first === start / Packing.SeqLen)
      assert(last === (start + nTok - 1) / Packing.SeqLen)
      assert(first <= last)
    }
  }

  test("mixture-schedule offsets equal the brute-force prefix sum of repeats x tokens") {
    val sched = Sampling.mixtureSchedule(docs)
    val got = Packing.scheduleOffsets(sched).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // brute-force expectation in one ordered pass on the driver
    val expect = sched.collect()
      .map(r => r.getLong(0) -> r.getLong(2) * r.getLong(3)).sortBy(_._1)
    var off = 0L
    expect.zip(got).foreach { case ((id, m), (gid, gm, gstart)) =>
      assert(gid === id && gm === m)
      assert(gstart === off, s"offset of doc $id")
      off += m
    }
    // partition invariance of the two-level sum over the schedule
    val again = Packing.scheduleOffsets(sched.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(again === got)
  }

  test("shardManifest conserves the corpus, orders heads by hash, and is " +
    "partition-invariant") {
    val got = Packing.shardManifest(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every shard populated at this scale; totals conserve the corpus
    assert(got.map(_._1).sorted.toSeq === (0L until Packing.ShardCount.toLong))
    assert(got.map(_._2).sum === docs.count())
    val totalToks = docs.select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .collect()(0).getLong(0)
    assert(got.map(_._3).sum === totalToks)
    // the head doc really is the shard's (h, doc_id) minimum
    val hs = docs.select(col("doc_id"),
      graft.functions.HashFunctions.md5Long(col("doc_id").cast("string"),
        Packing.ShardSeed).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val headByShard = hs.groupBy { case (_, h) => h % Packing.ShardCount }
      .map { case (s, rows) => s -> rows.map { case (id, h) => (h, id) }.min._2 }
    got.foreach { case (shard, _, _, _, firstDoc) =>
      assert(firstDoc === headByShard(shard), s"head of shard $shard")
    }
    // digest flips when a document's content changes, only in its shard
    val edited = docs.withColumn("text",
      when(col("doc_id") === hs.head._1, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val editedShard = hs.head._2 % Packing.ShardCount
    val after = Packing.shardManifest(edited).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    got.foreach { case (shard, _, _, digest, _) =>
      if (shard == editedShard) assert(after(shard) !== digest)
      else assert(after(shard) === digest)
    }
    // partition invariance
    val again = Packing.shardManifest(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("packWaste: exact padding accounting; packing always wastes no more than naive") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val d = Seq((1L, words(100)), (2L, words(600)), (3L, words(1500)))
      .toDF("doc_id", "text")
    val got = Packing.packWaste(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // brute force per L: naive pads each doc to a multiple of L; packed
    // pads only the stream tail
    val lens = Packing.PackWasteLens
    val toks = Seq(100L, 600L, 1500L)
    lens.foreach { l =>
      val naive = toks.map(n => ((n + l - 1) / l) * l - n).sum
      val total = toks.sum
      val packed = ((total + l - 1) / l) * l - total
      val want = (3L, total, naive, packed,
        naive * 1000 / (total + naive), packed * 1000 / (total + packed))
      assert(got(l) === want, s"L=$l")
      assert(packed <= naive) // packing can only reduce padding
    }
  }
}
