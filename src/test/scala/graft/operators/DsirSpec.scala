package graft.operators

import graft.SparkSpec
import graft.functions.FixedPointLn.lnFRef

class DsirSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  // reference md5Long (HashFunctions.md5Long semantics: 15 hex chars of
  // md5("<seed>:<x>") as a positive long)
  private def md5Long(seed: Int, s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$s".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  private def feats(text: String): Seq[String] = {
    val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
  }

  /** Brute-force DSIR scores via lnFRef: weights trained on `train`,
    * `score` docs folded with the smoothing-floor fallback for buckets the
    * training set never saw — (doc_id -> (n_feats, logw_f)).
    */
  private def expectedScoresWith(
      train: Seq[(Long, String, String)],
      score: Seq[(Long, String, String)]): Map[Long, (Long, Long)] = {
    val b = Dsir.NumBuckets
    def fbOf(rows: Seq[(Long, String, String)]) = rows.flatMap {
      case (id, src, text) =>
        feats(text).map(f => (id, src, md5Long(Dsir.FeatureSeed, f) % b))
    }
    val trainFb = fbOf(train)
    val raw = trainFb.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tgt = trainFb.filter(t => Dsir.TargetSources.contains(t._2))
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val bigR = raw.values.sum
    val bigT = tgt.values.sum
    val lamDefault = lnFRef(bigR + b) - lnFRef(bigT + b)
    def lam(bk: Long): Long = raw.get(bk) match {
      case Some(r) =>
        lnFRef(tgt.getOrElse(bk, 0L) + 1) - lnFRef(bigT + b) -
          lnFRef(r + 1) + lnFRef(bigR + b)
      case None => lamDefault
    }
    val scoreFb = fbOf(score)
    score.map { case (id, _, _) =>
      val mine = scoreFb.filter(_._1 == id).groupBy(_._3).view.mapValues(_.size.toLong)
      id -> (mine.values.sum, mine.map { case (bk, c) => c * lam(bk) }.sum)
    }.toMap
  }

  /** The full-corpus form: trained on and scoring the same rows. */
  private def expectedScores(
      rows: Seq[(Long, String, String)]): Map[Long, (Long, Long)] =
    expectedScoresWith(rows, rows)

  private val corpus: Seq[(Long, String, String)] = Seq(
    (1L, "src0", "alpha beta alpha beta gamma"),
    (2L, "src1", "alpha beta delta"),
    (3L, "src5", "omega psi chi omega psi"),
    (4L, "src5", "alpha beta alpha"), // raw doc that LOOKS like the target
    (5L, "src6", "omega chi psi phi"),
    (6L, "src6", ""),                 // featureless: must score 0, stay in frame
    (7L, "src7", "   "))              // whitespace-only: same

  test("importanceScores match the lnFRef brute force exactly (incl. zero rows)") {
    val got = Dsir.importanceScores(docs(corpus: _*))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val want = expectedScores(corpus)
    assert(got.keySet === corpus.map(_._1).toSet)
    corpus.map(_._1).foreach { id =>
      assert(got(id) === want(id), s"doc $id")
    }
    assert(got(6L) === ((0L, 0L)))
    assert(got(7L) === ((0L, 0L)))
  }

  test("scores steer toward the target domain: target-like raw doc outranks off-target") {
    val got = Dsir.importanceScores(docs(corpus: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // doc 4 shares the target's feature mass, docs 3/5 share none
    assert(got(4L) > got(3L))
    assert(got(4L) > got(5L))
  }

  test("gumbelTopK equals the brute-force sort of logw+gumbel keys") {
    val rows = (1L to 60L).map { i =>
      val src = if (i % 3 == 0) "src0" else s"src${i % 7 + 2}"
      val text = if (i % 3 == 0) s"alpha beta tok$i" else s"omega psi tok$i"
      (i, src, text)
    }
    val scores = expectedScores(rows)
    def gumbel(id: Long): Long = {
      val h = md5Long(Dsir.GumbelSeed, id.toString) % (1L << 20)
      val nl = math.max(21L * 726817L - lnFRef(h * 2 + 1), 1L)
      20L * 726817L - lnFRef(nl)
    }
    val keys = rows.map { case (id, _, _) => id -> (scores(id)._2 + gumbel(id)) }
    val k = (rows.size + Dsir.SelectDenom - 1) / Dsir.SelectDenom
    val want = keys.sortBy { case (id, key) => (-key, id) }.take(k.toInt).toMap
    val got = Dsir.gumbelTopK(docs(rows: _*))
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(got === want)
  }

  test("incrementalScores: shard scored under corpus-frozen weights, novel buckets take the floor") {
    // ids 0..9 -> ingest split (9+1)*4/5 = 8: corpus 0..7, shard 8..9
    val corpus: Seq[(Long, String, String)] = Seq(
      (0L, "src0", "alpha beta alpha"),
      (1L, "src1", "alpha beta gamma"),
      (2L, "src5", "omega psi chi"),
      (3L, "src5", "omega chi psi phi"),
      (4L, "src6", "alpha gamma"),
      (5L, "src6", "psi phi"),
      (6L, "src7", "beta gamma"),
      (7L, "src7", "omega omega"))
    val shard: Seq[(Long, String, String)] = Seq(
      (8L, "src8", "alpha beta alpha beta"), // target-like, all-known feats
      (9L, "src8", "zzz yyy xxx"))           // entirely NOVEL features
    val all = corpus ++ shard
    val got = Dsir.incrementalScores(docs(all: _*))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val want = expectedScoresWith(corpus, shard)
    assert(got.keySet === Set(8L, 9L)) // shard rows only
    assert(got === want)
    // the novel doc's 5 features (3 uni + 2 bi) all folded the floor weight
    val b = Dsir.NumBuckets
    val bigR = corpus.map(c => feats(c._3).size.toLong).sum
    val bigT = corpus.filter(c => Dsir.TargetSources.contains(c._2))
      .map(c => feats(c._3).size.toLong).sum
    val floor = lnFRef(bigR + b) - lnFRef(bigT + b)
    assert(got(9L) === ((5L, 5L * floor)))
    // scoring a batch under frozen weights != scoring it in-corpus: the
    // full-corpus operator answers differently for the same doc
    val full = Dsir.importanceScores(docs(all: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(full(9L) !== got(9L)._2)
  }

  test("steeringReport agrees with the score and selection queries exactly") {
    val rows = (1L to 60L).map { i =>
      val src = if (i % 3 == 0) "src0" else s"src${i % 5 + 2}"
      (i, src, if (i % 3 == 0) s"alpha beta tok$i" else s"omega psi tok$i")
    }
    val d = docs(rows: _*)
    val scores = Dsir.importanceScores(d).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    val selected = Dsir.gumbelTopK(d).collect().map(_.getString(1))
    val want = scores.groupBy(_._1).map { case (src, xs) =>
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      val k = selected.count(_ == src).toLong
      src -> ((n, s, s / n, k, k * 1000 / n))
    }
    val got = Dsir.steeringReport(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === want)
    // the target-lookalike feed is the most-selected one
    assert(got("src0")._5 > 200L)
  }

  test("a corpus with features but no TargetSources rows fails loudly, not as zero scores") {
    // every doc is from an off-target feed: bigT would be NULL and the old
    // na.fill(0) path presented an all-zero "selection" as valid uniform
    // scores — the guard must surface the misconfiguration instead
    val d = docs((0L, "srcX", "alpha beta"), (1L, "srcY", "gamma delta"))
    val err = intercept[Exception] {
      Dsir.importanceScores(d).collect()
    }
    assert(err.getMessage.contains("TargetSources"))
    // the truly-degenerate corpus (no features at all) stays an honest
    // empty/zero answer, not an error: there is no model to misconfigure
    val empty = docs((0L, "srcX", "   "))
    val got = Dsir.importanceScores(empty).collect()
    assert(got.map(r => (r.getLong(2), r.getLong(3))).toSeq === Seq((0L, 0L)))
  }

  test("scores and selection are invariant under repartitioning") {
    val d = docs(corpus: _*)
    val a = Dsir.importanceScores(d).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = Dsir.importanceScores(d.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(a === b)
    val sa = Dsir.gumbelTopK(d).collect().map(_.getLong(0)).toSet
    val sb = Dsir.gumbelTopK(d.repartition(5)).collect().map(_.getLong(0)).toSet
    assert(sa === sb)
  }
}
