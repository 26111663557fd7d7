package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang")
  }

  test("stratifiedSample is content-keyed: stable under repartitioning") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val once = Sampling.stratifiedSample(d, targetPerStratum = 20L)
      .collect().map(_.getLong(0)).toSet
    val again = Sampling.stratifiedSample(d.repartition(7), targetPerStratum = 20L)
      .collect().map(_.getLong(0)).toSet
    assert(once === again)
    assert(once.nonEmpty)
  }

  test("stratifiedSample keeps small strata whole, thins large ones") {
    val rows = (1L to 5L).map(_ -> "rare") ++ (100L to 899L).map(_ -> "big")
    val got = Sampling.stratifiedSample(docs(rows: _*), targetPerStratum = 50L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("rare") === 5) // n_lang <= target -> rate 1, all kept
    // 800 docs sampled at 50/800: binomial(800, 1/16), expect ~50
    assert(byLang("big") > 20 && byLang("big") < 100)
  }

  test("stratifiedSample allocation is balanced across driver-data strata") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val perLang = Sampling.stratifiedSample(d, targetPerStratum = 20L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      // each stratum lands near min(target, n_lang), far from proportional
      assert(n <= total(lang))
      assert(n <= 3 * math.min(20L, total(lang)))
    }
  }

  test("exactStratifiedSample: exactly min(target, n) per stratum, equal to the brute-force hash sort") {
    import spark.implicits._
    val rows = (1L to 5L).map(_ -> "rare") ++ (100L to 899L).map(_ -> "big")
    val d = rows.toDF("doc_id", "lang")
    val got = Sampling.exactStratifiedSample(d, targetPerStratum = 50L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang === Map("rare" -> 5, "big" -> 50)) // EXACT, not binomial
    // equals the obvious sort: smallest (h, doc_id) per stratum
    def md5h(id: Long): Long = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Sampling.ExactSeed}:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dg.map("%02x".format(_)).mkString.substring(0, 15), 16) % (1L << 20)
    }
    val want = rows.groupBy(_._2).flatMap { case (lang, xs) =>
      xs.map(x => (x._1, lang, md5h(x._1)))
        .sortBy { case (id, _, h) => (h, id) }
        .take(50)
    }.toSet
    assert(got.toSet === want)
    val again = Sampling.exactStratifiedSample(d.repartition(7), targetPerStratum = 50L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again === got.toSet)
  }

  test("weightedSample: saturated docs always survive, light docs thin out, draw is content-keyed") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, "en", ("tok " * 300).trim)) ++ // weight 300 ≥ cap → kept
      (1001L to 1200L).map(i => (i, "en", "one two three"))             // weight 3 → p = 3/256
    val d = rows.toDF("doc_id", "lang", "text")
    val kept = Sampling.weightedSample(d).collect().map(_.getLong(0)).toSet
    assert((1L to 200L).forall(kept.contains))
    // Binomial(200, 3/256): ~2.3 expected; 30 is a >10-sigma ceiling
    assert(kept.count(_ > 1000L) < 30)
    val again = Sampling.weightedSample(d.repartition(5)).collect().map(_.getLong(0)).toSet
    assert(kept === again)
  }

  test("mixtureSchedule: small sources epoch, big ones thin, integral rates are exact") {
    import spark.implicits._
    // srcSmall: 10 docs x 5 tokens = 50; srcBig: 50 docs x 5 tokens = 250.
    // budget 300, uniform shares (500 thousandths each) -> want 150 per
    // source: srcSmall rate = 3.0 exactly (epochs 3, frac 0 -> every doc
    // repeats exactly 3x, no randomness), srcBig rate = 0.6 (epochs 0,
    // frac 600000 -> content-hash Bernoulli keep)
    val five = "a b c d e"
    val rows = (1L to 10L).map(i => (i, "srcSmall", five)) ++
      (101L to 150L).map(i => (i, "srcBig", five))
    val d = rows.toDF("doc_id", "source", "text")
    val got = Sampling.mixtureSchedule(d, budgetTokens = Some(300L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    (1L to 10L).foreach(i => assert(got(i) === 3L, s"srcSmall doc $i"))
    val bigKept = got.keys.count(_ > 100L)
    // Binomial(50, 0.6): mean 30, sigma ~3.5 — 10..48 is a wide rail
    assert(bigKept > 10 && bigKept < 49, s"srcBig kept $bigKept")
    got.keys.filter(_ > 100L).foreach(i => assert(got(i) === 1L))
    // content-keyed: identical under repartitioning
    val again = Sampling.mixtureSchedule(d.repartition(7), budgetTokens = Some(300L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === again)
  }

  test("mixtureSchedule: explicit shares drop unlisted sources; default re-balances the corpus") {
    import spark.implicits._
    val five = "a b c d e"
    val rows = (1L to 10L).map(i => (i, "srcA", five)) ++
      (101L to 110L).map(i => (i, "srcB", five))
    val d = rows.toDF("doc_id", "source", "text")
    // all weight on srcA at double budget -> srcA epochs 2, srcB absent
    val got = Sampling.mixtureSchedule(
      d, shares = Map("srcA" -> 1000L), budgetTokens = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.keySet === (1L to 10L).toSet)
    got.values.foreach(v => assert(v === 2L))
    // default on the driver corpus: every source contributes, and the
    // realized mixed token mass stays near the budget (= corpus total)
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val sched = Sampling.mixtureSchedule(docs)
    val srcs = sched.select("source").distinct().count()
    assert(srcs === docs.select("source").distinct().count())
    val mixed = sched.selectExpr("sum(n_toks * n_repeats)").head().getLong(0)
    val total = docs
      .selectExpr("sum(cast(size(split(trim(text), '\\\\s+')) as long))")
      .head().getLong(0)
    // floor-division shortfall + Bernoulli noise stay within 20%
    assert(mixed > total * 8 / 10 && mixed < total * 12 / 10, s"$mixed vs $total")
  }

  test("temperatureSchedule == brute-force fixed-point replay; T=1 natural, T→∞ uniform") {
    import spark.implicits._
    import graft.functions.{FixedPointExp, FixedPointLn}
    // skewed corpus: srcBig 60 docs x 5 toks = 300, srcSmall 10 x 5 = 50
    val five = "a b c d e"
    val rows = (1L to 60L).map(i => (i, "srcBig", five)) ++
      (101L to 110L).map(i => (i, "srcSmall", five))
    val d = rows.toDF("doc_id", "source", "text")

    def brute(tNum: Long, tDen: Long): Map[Long, Long] = {
      val srcToks = Map("srcBig" -> 300L, "srcSmall" -> 50L)
      val w = srcToks.view.mapValues(n =>
        FixedPointExp.expFRef(FixedPointLn.lnFRef(n) * tDen / tNum)).toMap
      val sumW = w.values.sum
      val total = 350L
      rows.flatMap { case (id, src, _) =>
        val share = w(src) * 1000L / sumW
        val want = total * share / 1000L
        val epochs = want / srcToks(src)
        val frac = (want % srcToks(src)) * 1000000L / srcToks(src)
        val draw = {
          val dg = java.security.MessageDigest.getInstance("MD5")
            .digest(s"${Sampling.MixtureSeed}:$id".getBytes("UTF-8"))
          java.lang.Long.parseLong(
            dg.map("%02x".format(_)).mkString.substring(0, 15), 16) % 1000000L
        }
        val nRep = epochs + (if (draw < frac) 1L else 0L)
        if (nRep > 0) Some(id -> nRep) else None
      }.toMap
    }

    // exact fixed-point replay at the default T = 2
    val got = Sampling.temperatureSchedule(d)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === brute(2L, 1L))
    // partition invariance (content-keyed draws)
    val again = Sampling.temperatureSchedule(d.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again === got)

    // T = 1 reproduces the natural proportions: budget = total, so every
    // source wants ~its own mass back (fixed-point share rounding costs at
    // most a thousandth — realized mass within 2% per source)
    val t1 = Sampling.temperatureSchedule(d, tNum = 1L, tDen = 1L)
      .collect().map(r => (r.getString(1), r.getLong(2) * r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(math.abs(t1("srcBig") - 300L) <= 6L, s"srcBig ${t1("srcBig")}")
    assert(math.abs(t1("srcSmall") - 50L) <= 2L, s"srcSmall ${t1("srcSmall")}")
    assert(t1 === brute(1L, 1L).toSeq.map { case (id, n) =>
      (if (id <= 60L) "srcBig" else "srcSmall", 5L * n)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)

    // T → ∞ flattens to the uniform mixture = mixtureSchedule's default
    // equal shares, exactly (y/T truncates to 0, exp_f(0) = S for all)
    val tInf = Sampling.temperatureSchedule(d, tNum = 1000000L, tDen = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val uniform = Sampling.mixtureSchedule(d)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(tInf === uniform)

    // monotone flattening: the minority source's realized mass grows with T
    def smallMass(tNum: Long) =
      Sampling.temperatureSchedule(d, tNum = tNum)
        .where($"source" === "srcSmall")
        .selectExpr("sum(n_toks * n_repeats)").head().getLong(0)
    assert(smallMass(1L) < smallMass(2L))
    assert(smallMass(2L) < smallMass(1000000L))

    // T < 1 is outside the contract and must refuse loudly
    intercept[IllegalArgumentException] {
      Sampling.temperatureSchedule(d, tNum = 1L, tDen = 2L)
    }

    // a source past the exp_f octave bound (n^(1/T) >= 2^42) must raise,
    // not launder into an empty schedule (synthetic frame: real text
    // cannot reach 2^50 tokens in a test)
    val huge = Seq(("srcHuge", 1L << 50)).toDF("source", "src_tokens")
    val err = intercept[Exception] {
      Sampling.temperedWeights(huge, 1L, 1L).collect()
    }
    assert(err.getMessage.contains("exp_fixed domain"))
    // and the same frame under a big-enough T is fine
    val ok = Sampling.temperedWeights(huge, 8L, 1L).collect()
    assert(ok.length === 1 && !ok(0).isNullAt(ok(0).fieldIndex("w_f")))
  }

  test("curriculumOrder: dense easy-first permutation, strided interleave, invariance") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val got = Sampling.curriculumOrder(d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = d.count()
    assert(got.length === n)
    // pos_curriculum is a permutation of 0..n-1, bucket-major: every doc in
    // a lower bucket precedes every doc in a higher one
    assert(got.map(_._4).sorted.toSeq === (0L until n))
    val byPos = got.sortBy(_._4)
    assert(byPos.map(_._2).toSeq === byPos.map(_._2).sorted.toSeq)
    // within a bucket both orders follow (h, doc_id) rank
    got.groupBy(_._2).foreach { case (b, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (0L until rows.length))
      assert(byRank.map(_._4).toSeq === byRank.map(_._4).sorted.toSeq)
      // interleave formula: rank * K + bucket
      byRank.foreach { case (_, bb, rank, _, pi) =>
        assert(pi === rank * Sampling.CurriculumBuckets + bb)
      }
      assert(b >= 0 && b < Sampling.CurriculumBuckets)
    }
    // interleaved order really mixes: the first CurriculumBuckets positions
    // by pos_interleaved contain more than one bucket (driver data spans
    // several length bands)
    val headBuckets = got.sortBy(_._5).take(Sampling.CurriculumBuckets).map(_._2).toSet
    assert(headBuckets.size > 1)
    // content-keyed: stable under repartitioning
    val again = Sampling.curriculumOrder(d.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("weightedExactSample: bottom-k A-ES keys equal the lnFRef brute force; exactly k; partition-invariant") {
    import spark.implicits._
    import graft.functions.FixedPointLn
    val rows = (1L to 300L).map(i => (i, ("w " * (i % 37 + 1).toInt).trim))
    val d = rows.toDF("doc_id", "text")
    val got = Sampling.weightedExactSample(d, k = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 50)
    def md5h(id: Long): Long = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Sampling.AesSeed}:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dg.map("%02x".format(_)).mkString.substring(0, 15), 16) % (1L << 20)
    }
    val lnS = FixedPointLn.lnFRef(1L << 20)
    val want = rows.map { case (id, text) =>
      val w = text.trim.split("\\s+").length.toLong
      val key = (lnS - FixedPointLn.lnFRef(md5h(id) + 1)) * (1L << 20) / w
      (id, w, key)
    }.sortBy { case (id, _, key) => (key, id) }.take(50).toSet
    assert(got.toSet === want)
    // k above the corpus size degrades to "all rows"
    assert(Sampling.weightedExactSample(d, k = 1000L).count() === 300L)
    // content-keyed: the selected SET is partition-invariant
    val again = Sampling.weightedExactSample(d.repartition(7), k = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === got.toSet)
    // the weighted tilt is real: selected docs average heavier than the corpus
    val corpusMean = rows.map(_._2.split(" ").length.toDouble).sum / rows.size
    val selMean = got.map(_._2.toDouble).sum / got.length
    assert(selMean > corpusMean)
  }

  test("sourceTokenBudget: hash-prefix under budget, crossing doc kept, small source whole") {
    import spark.implicits._
    val text100 = ("w " * 100).trim // 100 tokens per doc
    val rows = (1L to 30L).map(i => (i, "A", text100)) ++ // 3000 tokens
      (101L to 105L).map(i => (i, "B", text100)) // 500 tokens, under budget
    val d = rows.toDF("doc_id", "source", "text")
    // budget 1050 crosses INSIDE doc 11 of the hash order: docs 1-10
    // cover 1000 < 1050, so the 11th is kept and the 12th is not
    val got = Sampling.sourceTokenBudget(d, budget = 1050L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def md5h(id: Long): Long = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Sampling.SourceBudgetSeed}:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dg.map("%02x".format(_)).mkString.substring(0, 15), 16) % (1L << 20)
    }
    val want = rows.groupBy(_._2).flatMap { case (src, xs) =>
      var cum = 0L
      xs.map(x => (x._1, md5h(x._1))).sortBy { case (id, h) => (h, id) }
        .flatMap { case (id, _) =>
          val keep = cum < 1050L
          cum += 100L
          if (keep) Some((src, id, 100L)) else None
        }
    }.toSet
    assert(got === want)
    assert(got.count(_._1 == "B") === 5) // under-budget source untouched
    assert(got.count(_._1 == "A") === 11) // 10 whole + the crossing doc
    val again = Sampling.sourceTokenBudget(d.repartition(7), budget = 1050L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === got)
  }

  /** Re-run [[Sampling.epochAllocation]]'s waterfilling rounds in plain
    * Scala from the operator's own inputs (source, size, share, budget,
    * cap) — verifies the round/cap/leftover logic independently of the
    * fixed-point weight kernel (brute-verified in the temperature tests).
    */
  private def bruteWaterfill(
      rows: Seq[(String, Long, Long, Long, Long)], rounds: Int): Map[String, (Long, Boolean, Long)] = {
    val budget = rows.head._4
    var capped = Map.empty[String, Boolean].withDefaultValue(false)
    var alloc = Map.empty[String, Long].withDefaultValue(0L)
    for (_ <- 1 to rounds) {
      val cappedSum = rows.collect { case (s, _, _, _, _) if capped(s) => alloc(s) }.sum
      val uSm = rows.collect { case (s, _, sm, _, _) if !capped(s) => sm }.sum
      val tent = rows.map { case (s, _, sm, _, _) =>
        s -> (if (capped(s)) alloc(s)
              else if (uSm > 0) (budget - cappedSum) * sm / uSm else 0L)
      }.toMap
      rows.foreach { case (s, _, _, _, cap) =>
        if (capped(s) || tent(s) >= cap) { capped += s -> true; alloc += s -> cap }
        else alloc += s -> tent(s)
      }
    }
    val leftover = budget - rows.map(r => alloc(r._1)).sum
    rows.map { case (s, _, _, _, _) => s -> ((alloc(s), capped(s), leftover)) }.toMap
  }

  test("epochAllocation: tiny source caps at maxEpochs, surplus waterfills, budget conserved") {
    import spark.implicits._
    // tempering (T=2) flattens shares toward uniform, so the tiny
    // source's tempered target far exceeds its 4-epoch cap
    val d = Seq(
      (1L, ("tok " * 10).trim, "en", "tiny"),
      (2L, ("tok " * 500).trim, "en", "big"),
      (3L, ("tok " * 500).trim, "en", "big"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Sampling.epochAllocation(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
    val (tiny, big) = (out("tiny"), out("big"))
    // sizes, caps, budget
    assert(tiny._1 === 10L && big._1 === 1000L)
    assert(tiny._3 === 40L && big._3 === 4000L)     // cap_tokens = 4x size
    assert(tiny._7 === 2020L && big._7 === 2020L)   // budget = 2x corpus
    // the tiny source hits its cap exactly: 4 epochs, capped flag set
    assert(tiny._5 && tiny._4 === 40L && tiny._6 === 4000L)
    assert(!big._5 && big._4 < big._3)
    // exact conservation: allocations + leftover = budget
    assert(tiny._4 + big._4 + tiny._8 === 2020L && tiny._8 === big._8)
    // the full round logic replays in plain Scala from the emitted inputs
    val brute = bruteWaterfill(
      out.toSeq.map { case (s, t) => (s, t._1, t._2, t._7, t._3) },
      Sampling.EpochRounds)
    out.foreach { case (s, t) =>
      assert(brute(s) === ((t._4, t._5, t._8)), s"source $s") }
  }

  test("epochAllocation == scala waterfill replay on the sf0.001 corpus; invariants hold") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val out = Sampling.epochAllocation(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
    assert(out.nonEmpty)
    val brute = bruteWaterfill(
      out.toSeq.map { case (s, t) => (s, t._1, t._2, t._7, t._3) },
      Sampling.EpochRounds)
    out.foreach { case (s, t) =>
      assert(brute(s) === ((t._4, t._5, t._8)), s"source $s")
      assert(t._4 <= t._3)                       // alloc never beats cap
      assert(t._5 === (t._4 === t._3))           // capped <=> at-cap
      assert(t._6 <= Sampling.EpochCap * 1000L)  // epochs within the cap
    }
    val budget = out.values.head._7
    assert(out.values.map(_._4).sum + out.values.head._8 === budget)
  }

  test("counting-selection kernels == brute force over 30 seeded random frames") {
    import spark.implicits._
    // the two shared kernels now underpin four registered queries
    // (exact-k sample, source budget, domain cap, domain budgets); a
    // bucket-boundary or tie bug there corrupts several oracle rows at
    // once, so fuzz them: small hash ranges force bucket collisions,
    // same-h ties, empty buckets, and budgets landing exactly on edges.
    // Seeded Random: deterministic across runs.
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 30) {
      val nKeys = 1 + rnd.nextInt(4)
      val n = 1 + rnd.nextInt(250)
      // tok range includes 0 (r15): zero-weight rows create tn = 0
      // buckets, where cutoff uniqueness must be STRUCTURAL (the ranked
      // first qualifying bucket) — under budget <= 0 every leading empty
      // bucket satisfies the arithmetic predicate and the unranked form
      // fanned out the tie join (r14 advisor)
      val rows = (1 to n).map { i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}",
          rnd.nextInt(21).toLong, rnd.nextInt(2048).toLong)
      }
      val capFrame = rows.map(r => (r._1, r._2, r._4)).toDF("doc_id", "key", "h")
      val target = 1L + rnd.nextInt(60)
      val gotK = Sampling.smallestKPerKey(capFrame, "key", target)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val wantK = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.sortBy(r => (r._4, r._1)).take(target.toInt)
      }.map(r => (r._1, r._2, r._4)).toSet
      assert(gotK === wantK, s"smallestKPerKey trial $trial (target $target)")

      val budFrame = rows.toDF("doc_id", "key", "tok", "h")
      // budget range deliberately includes 0 and negative values: a
      // tempered per-key share can floor to 0 on a long-tailed real
      // domain distribution, and the kernel must then keep NOTHING
      // (the oracle's cum_before < budget rule), not pass the key
      // through whole.
      val budget = rnd.nextInt(253).toLong - 2L
      val gotB = Sampling.tokenBudgetByKey(budFrame, "key", budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val wantB = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (r._4, r._1))
        val cums = sorted.scanLeft(0L)(_ + _._3)
        sorted.zip(cums).collect { case (r, before) if before < budget => r }
      }.map(r => (r._1, r._2, r._3)).toSet
      assert(gotB === wantB, s"tokenBudgetByKey trial $trial (budget $budget)")
    }
  }

  test("tokenBudgetPerKey: budget 0 / negative keeps nothing, mixed with live keys") {
    import spark.implicits._
    // Deterministic frame: 3 keys x 4 docs, tok 5 each, h = doc order.
    val rows = for (k <- Seq("a", "b", "c"); i <- 1 to 4)
      yield ((k.hashCode.toLong * 10 + i), k, 5L, (i * 300).toLong)
    val frame = rows.toDF("doc_id", "key", "tok", "h")
    val budgets = Seq(("a", 0L), ("b", -7L), ("c", 12L)).toDF("key", "budget")
    val got = Sampling.tokenBudgetPerKey(frame, "key", budgets)
      .select("key", "doc_id").as[(String, Long)].collect().toSet
    // a: budget 0 -> nothing; b: negative -> nothing; c: 12 tokens ->
    // docs with cum_before 0,5,10 < 12 -> first 3 docs in h order.
    val wantC = rows.filter(_._2 == "c").sortBy(_._4).take(3)
      .map(r => ("c", r._1)).toSet
    assert(got === wantC)
  }
}
