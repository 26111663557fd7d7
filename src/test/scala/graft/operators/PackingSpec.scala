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

  test("sharded export round-trip: written artifact verifies against its manifest; corruption is caught") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val manifest = Packing.shardManifest(docs)
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString
    Packing.writeShardedExport(docs, out)

    // the loop closes: every shard's recomputed count/tokens/digest/head
    // matches what the manifest predicted before the write
    val v = Packing.verifyShardedExport(spark, out, manifest).collect()
    assert(v.length === Packing.ShardCount)
    v.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
        s"shard ${r.getLong(0)} failed round-trip")
    }

    // within-shard training order is physically materialized: one shard
    // directory read alone comes back in (h, doc_id) order
    val shard0 = spark.read.parquet(s"$out/shard=0")
      .select("h", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(shard0.nonEmpty && shard0.toSeq === shard0.sortBy(identity).toSeq)

    // corruption-detection negative: flip one document's text in a copy of
    // the export — exactly that shard's digest (and only the digest: count,
    // tokens, head survive a same-length edit) must flag
    val exported = spark.read.parquet(out)
    val victim = exported.select("doc_id").head().getLong(0)
    val corruptedDir = java.nio.file.Files.createTempDirectory("graft_export_bad").toString
    import org.apache.spark.sql.functions._
    exported
      .withColumn("text",
        when(col("doc_id") === victim,
          concat(expr("substring(text, 2)"), lit("x"))).otherwise(col("text")))
      .write.mode("overwrite").partitionBy("shard").parquet(corruptedDir)
    val vBad = Packing.verifyShardedExport(spark, corruptedDir, manifest).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getBoolean(5)))).toMap
    val badShards = vBad.filter(!_._2._2).keys.toSeq
    assert(badShards.length === 1, s"expected one flagged shard, got $badShards")
    vBad.foreach { case (_, (docsMatch, _)) => assert(docsMatch) }
  }

  test("packWaste: exact padding accounting; bestfit <= naive, packed is the floor") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    // lengths chosen so every harmonic case appears: multiple docs in one
    // class (2x100: m=5 at L=512), a near-full singleton (400: m=1), and
    // oversize docs at the smaller Ls
    val toks = Seq(100L, 100L, 400L, 600L, 1500L)
    val d = toks.zipWithIndex.map { case (n, i) => (i.toLong, words(n.toInt)) }
      .toDF("doc_id", "text")
    val got = Packing.packWaste(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
    val lens = Packing.PackWasteLens
    lens.foreach { l =>
      val naive = toks.map(n => ((n + l - 1) / l) * l - n).sum
      val total = toks.sum
      val packed = ((total + l - 1) / l) * l - total
      // harmonic bestfit: ceil(count/m) bins per class, oversize naive
      val fit = toks.filter(_ <= l)
      val bestfit = fit.groupBy(n => l / n).map { case (m, ds) =>
        ((ds.size - 1) / m + 1) * l - ds.sum
      }.sum + toks.filter(_ > l).map(n => ((n + l - 1) / l) * l - n).sum
      val want = (toks.size.toLong, total, naive, bestfit, packed,
        naive * 1000 / (total + naive),
        bestfit * 1000 / (total + bestfit),
        packed * 1000 / (total + packed))
      assert(got(l) === want, s"L=$l")
      assert(packed <= bestfit && bestfit <= naive, s"L=$l ordering")
    }
  }

  /** Brute-force [[Packing.packBestFit]] over driver rows: the harmonic
    * closed form replayed literally. (doc_id -> row).
    */
  private def bruteBestFit(
      rows: Seq[(Long, Long)], seqLen: Long): Map[Long, (Long, Boolean, Option[(Long, Long, Long, Long)])] = {
    val fit = rows.filter(_._2 <= seqLen).map { case (id, n) => (id, n, seqLen / n) }
    val classes = fit.groupBy(_._3).toSeq.sortBy(_._1)
    val binBases = classes.map(_._1)
      .zip(classes.map { case (m, ds) => (ds.size - 1) / m + 1 }
        .scanLeft(0L)(_ + _).dropRight(1)).toMap
    val placedFit = classes.flatMap { case (m, ds) =>
      ds.sortBy(_._1).zipWithIndex.map { case ((id, n, _), r) =>
        (id, n, m, r.toLong / m, r.toLong % m)
      }
    }
    val offsets = placedFit.groupBy(p => (p._3, p._4)).flatMap { case (_, bin) =>
      val sorted = bin.sortBy(_._5)
      sorted.zip(sorted.scanLeft(0L)(_ + _._2).dropRight(1)).map {
        case ((id, n, m, b, slot), off) => id -> ((n, m, binBases(m) + b, slot, off))
      }
    }
    rows.map { case (id, n) =>
      if (n <= seqLen) {
        val (nn, m, binId, slot, off) = offsets(id)
        id -> ((nn, true, Some((m, binId, slot, off))))
      } else id -> ((n, false, None))
    }.toMap
  }

  test("packBestFit equals the harmonic closed form; no bin overflows, nothing splits") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    // classes m=1 (300..512), m=2 (200, 256), m=5, m=512 (1-token), plus
    // two oversize docs; ids interleaved across classes
    val lens = Seq(1L -> 300L, 2L -> 100L, 3L -> 480L, 4L -> 256L, 5L -> 200L,
      6L -> 100L, 7L -> 1L, 8L -> 600L, 9L -> 100L, 10L -> 1L, 11L -> 2000L,
      12L -> 512L, 13L -> 99L, 14L -> 101L)
    val d = lens.map { case (id, n) => (id, words(n.toInt)) }.toDF("doc_id", "text")
    val got = Packing.packBestFit(d).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))))
    }.toMap
    assert(got === bruteBestFit(lens, 512L))
    // structural invariants, independent of the brute force
    val placed = got.collect { case (id, (n, true, Some((m, bin, slot, off)))) =>
      (id, n, m, bin, slot, off) }.toSeq
    placed.groupBy(_._4).foreach { case (bin, ds) =>
      val fill = ds.map(_._2).sum
      assert(fill <= 512L, s"bin $bin overflows: $fill")          // no split, ever
      assert(ds.map(_._5).sorted === ds.indices.map(_.toLong))    // contiguous slots
      assert(ds.map(_._3).distinct.size === 1)                    // class-homogeneous
      assert(ds.size <= (512L / ds.map(_._2).max), s"bin $bin too many docs")
      // offsets are the exact prefix sums of the slot order
      val bySlot = ds.sortBy(_._5)
      bySlot.zip(bySlot.scanLeft(0L)(_ + _._2).dropRight(1)).foreach {
        case ((_, _, _, _, _, off), want) => assert(off === want)
      }
    }
    // oversize docs surfaced, not silently dropped or split
    assert(got(8L) === ((600L, false, None)) && got(11L) === ((2000L, false, None)))
    // bin ids are dense 0..nBins-1 across classes
    val bins = placed.map(_._4).distinct.sorted
    assert(bins === (0L until bins.size).toSeq)
    // partition invariance
    val again = Packing.packBestFit(d.repartition(7)).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))))
    }.toMap
    assert(again === got)
  }

  test("packBestFit reconciles with packWaste's bestfit column on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val placed = Packing.packBestFit(docs).collect()
    // card's pad_bestfit at L=512 == bins' empty space + oversize naive pad
    val fills = placed.filter(_.getBoolean(2))
      .groupBy(_.getLong(4)).map { case (_, ds) => ds.map(_.getLong(1)).sum }
    val overPad = placed.filter(!_.getBoolean(2))
      .map(r => ((r.getLong(1) + 511) / 512) * 512 - r.getLong(1)).sum
    val wantPad = fills.map(512L - _).sum + overPad
    val card = Packing.packWaste(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(card(512L) === wantPad)
    // the two-level rank matches a plain global rank (the block math is
    // an implementation detail, not a semantics change)
    assert(fills.forall(_ <= 512L))
  }
}
