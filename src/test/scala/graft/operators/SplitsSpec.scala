package graft.operators

import graft.SparkSpec

class SplitsSpec extends SparkSpec {

  /** Local replay of HashFunctions.md5Long: first 15 md5 hex chars as a
    * positive Long — the independent implementation the assertions use.
    */
  private def h60(seed: Int, x: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$x".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  private def splitOf(id: Long): String = {
    val b = h60(Splits.SplitSeed, id.toString) % Splits.SplitBuckets
    if (b < Splits.TrainMilli) "train" else if (b < Splits.ValMilli) "val" else "test"
  }

  test("splitAllocation: conserves docs/tokens, matches the hash formula, 90/5/5 lands") {
    import spark.implicits._
    val d = (1L to 2000L)
      .map(i => (i, "tok " * (i % 7 + 1).toInt, s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val got = Splits.splitAllocation(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // conservation: every doc in exactly one split
    assert(got.values.map(_._1).sum === 2000L)
    // exact counts from the locally replayed formula
    val expect = (1L to 2000L).groupBy(i => (s"src${i % 3}", splitOf(i)))
      .view.mapValues(_.map(i => i % 7 + 1).sum).toMap
    got.foreach { case (k, (_, toks)) => assert(toks === expect(k), k) }
    // the 90/5/5 shape lands (binomial slack on 2000 draws)
    val bySplit = got.groupBy(_._1._2).view.mapValues(_.values.map(_._1).sum).toMap
    assert(bySplit("train") > 1700 && bySplit("train") < 1890)
    assert(bySplit("val") > 50 && bySplit("val") < 170)
    assert(bySplit("test") > 50 && bySplit("test") < 170)
  }

  test("splitAllocation is content-keyed: stable under repartitioning") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val once = Splits.splitAllocation(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val again = Splits.splitAllocation(d.repartition(7)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(once === again)
    assert(once.nonEmpty)
  }

  test("splitLeakage keeps exactly the cross-split pairs and flags train leaks") {
    import spark.implicits._
    // find ids per split so the fixture provably covers all pair kinds
    val ids = (1L to 300L).groupBy(splitOf)
    val (tr, va, te) = (ids("train"), ids("val"), ids("test"))
    val pairs = Seq(
      (tr(0), tr(1), 1.0),  // same split - dropped
      (tr(0), va(0), 0.9),  // train-val leak
      (tr(1), te(0), 0.8),  // train-test leak
      (va(0), te(0), 0.7),  // cross but no train side
      (te(0), te(1), 0.6))  // same split - dropped
      .toDF("doc_a", "doc_b", "jaccard")
    val got = Splits.splitLeakage(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(3), r.getString(4), r.getBoolean(5))).toMap
    assert(got.keySet === Set((tr(0), va(0)), (tr(1), te(0)), (va(0), te(0))))
    assert(got((tr(0), va(0))) === (("train", "val", true)))
    assert(got((tr(1), te(0))) === (("train", "test", true)))
    assert(got((va(0), te(0))) === (("val", "test", false)))
  }

  test("leakFreeSplit: cluster members share a split, zero leakage by construction, invariant") {
    import spark.implicits._
    // synthetic pair graph: {1,2,3} one component, {10,20} another, 99 singleton
    val docs = Seq(1L, 2L, 3L, 10L, 20L, 99L).map(i => (i, s"doc $i", "s"))
      .toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (10L, 20L, 0.7))
      .toDF("doc_a", "doc_b", "jaccard")
    val got = Splits.leakFreeSplit(docs, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 20L, 99L))
    // cluster labels are the component minima; sizes count members
    assert(Set(1L, 2L, 3L).map(got(_)._1) === Set(1L))
    assert(Set(10L, 20L).map(got(_)._1) === Set(10L))
    assert(got(99L)._1 === 99L && got(99L)._2 === 1L)
    // every member of a component gets the SAME split, = splitOf(cluster id)
    assert(Set(1L, 2L, 3L).map(got(_)._3) === Set(splitOf(1L)))
    assert(Set(10L, 20L).map(got(_)._3) === Set(splitOf(10L)))
    assert(got(99L)._3 === splitOf(99L))
    // zero leakage by construction: re-keying splitLeakage's endpoint splits
    // through the assignment leaves no cross-split pair
    val split = got.view.mapValues(_._3).toMap
    assert(Seq((1L, 2L), (2L, 3L), (10L, 20L)).forall { case (a, b) =>
      split(a) === split(b) })
    // and on the REAL corpus + miner: no mined pair straddles the assignment
    val real = graft.Tables.documents(spark, sf("sf0.001"))
    val realPairs = Dedup.nearDuplicatePairsFromTable(
      SignatureStore.table(spark, sf("sf0.001")))
    val assign = Splits.leakFreeSplit(real, realPairs)
      .select($"doc_id", $"split")
    val straddling = realPairs
      .join(assign.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), "doc_a")
      .join(assign.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), "doc_b")
      .where($"sa" =!= $"sb")
    assert(straddling.isEmpty)
    // partition invariance
    val again = Splits.leakFreeSplit(docs.repartition(5), pairs.repartition(3))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(again === got)
  }

  test("incrementalLeakFreeSplit: arriving near-dups inherit the corpus cluster's split") {
    import spark.implicits._
    // max id 99 -> ingest boundary 80: corpus {1,2} near-dup pair + 10
    // singleton; shard 85 copies doc 1, shard 99 is fresh
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (10L, "x y z w"),
      (85L, "a b c d e f"), (99L, "p q r s"))
      .map { case (i, t) => (i, t, "s") }.toDF("doc_id", "text", "source")
    val tbl = Dedup.withContentGroups(Dedup.shingleSignatureTable(docs))
    val got = Splits.incrementalLeakFreeSplit(docs, tbl).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toMap
    // exactly the shard docs, one row each
    assert(got.keySet === Set(85L, 99L))
    // 85 inherits corpus cluster {1,2}'s label and split
    assert(got(85L) === ((1L, splitOf(1L), true)))
    // 99 matches nothing: own singleton, own hash split
    assert(got(99L) === ((99L, splitOf(99L), false)))
    // leak-freedom across the boundary on the REAL corpus: every
    // inherited doc's split equals its matched corpus cluster's split
    val real = graft.Tables.documents(spark, sf("sf0.001"))
    val realTbl = SignatureStore.table(spark, sf("sf0.001"))
    val inc = Splits.incrementalLeakFreeSplit(real, realTbl).localCheckpoint()
    val boundary = (real.agg(org.apache.spark.sql.functions.max($"doc_id"))
      .head().getLong(0) + 1L) * 4L / 5L
    val corpusTbl = Dedup.withContentGroups(
      realTbl.where($"doc_id" < boundary).drop("group_id", "members"))
    val corpusAssign = Splits.leakFreeSplit(
      real.where($"doc_id" < boundary),
      Dedup.nearDuplicatePairsFromTable(corpusTbl))
    val probe = Dedup.incrementalNearDupsFromTable(realTbl)
    val crossSplit = probe
      .join(corpusAssign.select($"doc_id".as("corpus_doc"), $"split".as("cs"),
        $"cluster_id"), "corpus_doc")
      .join(inc.select($"doc_id".as("shard_doc"), $"split".as("ss"),
        $"cluster_id".as("sc")), "shard_doc")
      // a shard doc matching partners in several clusters keeps only the
      // min-cluster split; partners in OTHER clusters may legitimately
      // differ, so compare against the inherited cluster's partners only
      .where($"cs" =!= $"ss" && $"sc" === $"cluster_id")
    assert(crossSplit.isEmpty)
    assert(inc.where($"inherited").count() > 0)
    // every shard doc appears exactly once
    assert(inc.count() ===
      real.where($"doc_id" >= boundary).count())
  }

  test("incrementalLeakFreeSplit residues are bounded: probe misses and multi-split matches") {
    import spark.implicits._
    // The incremental form's docstring names its two leak residues vs the
    // batch guarantee: (1) cross-boundary true pairs the banded probe
    // misses, (2) arrivals matching corpus clusters with DIFFERENT splits
    // (min-cluster inheritance picks one). Measure both on the driver
    // corpus so a probe/banding regression that widens them fails here.
    val real = graft.Tables.documents(spark, sf("sf0.001"))
    val realTbl = SignatureStore.table(spark, sf("sf0.001"))
    val boundary = (real.agg(org.apache.spark.sql.functions.max($"doc_id"))
      .head().getLong(0) + 1L) * 4L / 5L
    // exact cross-boundary truth from the prefix-filter miner (recall 1)
    val exactCross = Dedup.prefixNearDupPairs(realTbl)
      .where(($"doc_a" < boundary) =!= ($"doc_b" < boundary))
      .select(
        org.apache.spark.sql.functions.least($"doc_a", $"doc_b").as("corpus_doc"),
        org.apache.spark.sql.functions.greatest($"doc_a", $"doc_b").as("shard_doc"))
      .localCheckpoint()
    val probe = Dedup.incrementalNearDupsFromTable(realTbl)
      .select($"corpus_doc", $"shard_doc").localCheckpoint()
    val nTrue = exactCross.count()
    val missed = exactCross.join(probe, Seq("corpus_doc", "shard_doc"), "left_anti")
    val nMissed = missed.count()
    assert(nTrue > 0L)
    // residue 1: the banded probe surfaces nearly all true cross pairs
    assert(nMissed <= math.max(2L, nTrue / 10L),
      s"banded probe missed $nMissed of $nTrue true cross-boundary pairs")
    // residue 2: arrivals whose matched corpus partners span >1 split
    val corpusTbl = Dedup.withContentGroups(
      realTbl.where($"doc_id" < boundary).drop("group_id", "members"))
    val corpusAssign = Splits.leakFreeSplit(
      real.where($"doc_id" < boundary),
      Dedup.nearDuplicatePairsFromTable(corpusTbl))
    val multiSplit = probe
      .join(corpusAssign.select($"doc_id".as("corpus_doc"), $"split"), "corpus_doc")
      .groupBy($"shard_doc")
      .agg(org.apache.spark.sql.functions.countDistinct($"split").as("ns"))
      .where($"ns" > 1)
    assert(multiSplit.count() <= 2L,
      "multi-split matches should be a bounded handful on the driver corpus")
  }

  test("sourceOverlapMatrix: unordered source cells, diagonal = internal duplication") {
    import spark.implicits._
    val docs = Seq(
      (1L, "crawlA"), (2L, "crawlA"), (3L, "crawlB"), (4L, "crawlB"), (5L, "crawlC"))
      .toDF("doc_id", "source")
    // (B,A) and (A,B) pairs must land in the same cell; (1,2) is A-internal
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 2L), (4L, 5L))
      .map { case (a, b) => (a, b, 1.0) }.toDF("doc_a", "doc_b", "jaccard")
    val got = Pipeline.sourceOverlapMatrix(docs, pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("crawlA", "crawlA") -> 1L,
      ("crawlA", "crawlB") -> 2L,
      ("crawlB", "crawlC") -> 1L))
  }

  test("classifierScore: exact fold replay, empty text scores 0, content-keyed") {
    import spark.implicits._
    def weight(tok: String): Long =
      h60(TextAnalysis.ClsSeed, tok) % TextAnalysis.ClsWeightMod - TextAnalysis.ClsWeightShift
    val d = Seq(
      (1L, "Alpha beta beta", "s0"), // instance-weighted: beta counts twice
      (2L, "   ", "s0"),             // whitespace-only -> no tokens, score 0
      (3L, "gamma", "s1"))
      .toDF("doc_id", "text", "source")
    val rows = TextAnalysis.classifierScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val s1 = weight("alpha") + 2 * weight("beta")
    assert(rows(1L) === ((3L, s1, s1 > 0)))
    assert(rows(2L) === ((0L, 0L, false)))
    assert(rows(3L) === ((1L, weight("gamma"), weight("gamma") > 0)))
    val again = TextAnalysis.classifierScore(d.repartition(5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(rows === again)
  }

  test("classifierScore separates the corpus (both verdicts occur, n_toks conserved)") {
    // the driver corpus shares a small vocabulary whose mean weight is
    // positive, so most docs pass — the useful invariants are that the
    // score DOES discriminate (both keep values occur) and that n_toks
    // matches the whitespace tokenizer used everywhere else
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val scored = TextAnalysis.classifierScore(d)
    val kept = scored.where("keep").count()
    val n = d.count()
    assert(kept > 0 && kept < n, s"kept $kept of $n")
    val totalToks = scored.agg(org.apache.spark.sql.functions.sum("n_toks"))
      .collect()(0).getLong(0)
    val expectToks = TextAnalysis.tokenCounts(d)
      .agg(org.apache.spark.sql.functions.sum("ws_tokens")).collect()(0).getLong(0)
    assert(totalToks === expectToks)
  }
}
