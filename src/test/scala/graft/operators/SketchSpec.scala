package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregates against exact answers. */
class SketchSpec extends SparkSpec {

  test("hllVocabByLang: linear-counting correction from exposed state is accurate") {
    val d = Tables.documents(spark, sf("sf0.01"))
    val rows = Sketches.hllVocabByLang(d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val zeros = r.getInt(1)
      val denom = r.getLong(2)
      val raw = r.getDouble(3)
      val exact = r.getLong(4)
      // raw estimator == numerator / denom by construction
      assert(math.abs(raw - Sketches.HllNumerator / denom) < 1e-9 * raw)
      // denom accounts at least for the empty registers' 2^(W+1) terms
      assert(denom >= zeros.toLong * (1L << (Sketches.HllW + 1)))
      // small-range regime here: the client-side linear-counting
      // correction m*ln(m/V) from the exposed zero count lands near exact
      assert(zeros > 0)
      val corrected = Sketches.HllM * math.log(Sketches.HllM.toDouble / zeros)
      assert(math.abs(corrected - exact) / exact <= 0.2,
        s"${r.getString(0)}: corrected $corrected vs exact $exact")
    }
  }

  test("hllVocabByLangUdaf equals the relational form row for row") {
    val d = Tables.documents(spark, sf("sf0.01"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet
    val rel = canon(Sketches.hllVocabByLang(d))
    val agg = canon(Sketches.hllVocabByLangUdaf(d))
    assert(agg === rel)
    assert(agg.nonEmpty)
  }

  test("digestDiffBuckets: identical replicas diff empty; changes/drops localize to their bucket") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf("sf0.001"))
    // identical sides -> no differing bucket
    assert(Sketches.digestDiffBuckets(d, d).count() === 0L)
    // one planted edit -> exactly that doc's bucket flagged, counts equal
    val edited = Sketches.digestDiffBuckets(d, Sketches.tamperedReplica(d)).collect()
    assert(edited.length === 1)
    assert(edited.head.getLong(0) ===
      Sketches.TamperedDocId / Sketches.DiffBucket)
    assert(edited.head.getLong(2) === edited.head.getLong(4)) // n_a == n_b
    // a dropped row -> its bucket flagged via the row-count side
    val dropped = Sketches.digestDiffBuckets(d, d.where(col("doc_id") =!= 7L)).collect()
    assert(dropped.length === 1 && dropped.head.getLong(0) === 7L / Sketches.DiffBucket)
    assert(dropped.head.getLong(2) === dropped.head.getLong(4) + 1L)
  }

  test("rowDiff classifies added / removed / changed keys exactly") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf("sf0.001"))
    assert(Sketches.rowDiff(d, d).count() === 0L)
    val replica = Sketches.tamperedReplica(d)
      .where(col("doc_id") =!= Sketches.DroppedDocId)
    val diff = Sketches.rowDiff(d, replica).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff === Map(
      Sketches.TamperedDocId -> "changed",
      Sketches.DroppedDocId -> "removed"))
    // symmetric direction: the dropped row reads as added
    val rev = Sketches.rowDiff(replica, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rev(Sketches.DroppedDocId) === "added")
  }

  test("kmvLangOverlap: exact when the union fits in k; bounded error on driver data") {
    import spark.implicits._
    // tiny fixture: vocabularies small enough that U_k is the full union,
    // where the KMV estimator must be EXACTLY the true Jaccard
    val d = Seq(
      (1L, "a b c d", "aa"), (2L, "c d e f", "bb"), (3L, "x y c", "cc")
    ).toDF("doc_id", "text", "lang")
    val rows = Sketches.kmvLangOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.size === 3)
    rows.foreach { case (pair, (_, _, est, exact)) =>
      assert(est === exact, s"$pair: union fits in k but est $est != exact $exact")
    }
    // aa={a,b,c,d}, bb={c,d,e,f}: inter 2, union 6
    assert(rows(("aa", "bb"))._4 === 2.0 / 6.0)
    // driver data: estimator within the k=64 error envelope
    val driver = Sketches.kmvLangOverlap(Tables.documents(spark, sf("sf0.01")))
      .collect().map(r => (r.getDouble(4), r.getDouble(5)))
    assert(driver.nonEmpty)
    driver.foreach { case (est, exact) =>
      assert(math.abs(est - exact) <= 0.25, s"est $est vs exact $exact")
    }
  }

  test("kmvLangOverlap is partitioning-invariant (k smallest is order-free)") {
    val d = Tables.documents(spark, sf("sf0.001"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(canon(Sketches.kmvLangOverlap(d.repartition(1))) ===
      canon(Sketches.kmvLangOverlap(d.repartition(11))))
  }

  test("quantileSketch: rank answers exact at resolution, quantiles within one bucket") {
    val o = Tables.orders(spark, sf("sf0.01"))
    val rows = Sketches.quantileSketch(o).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.size === Sketches.QsProbeCents.size + Sketches.QsTargetPct.size)
    val cents = o.select(
      least(expr("CAST(round(o_totalprice * 100) AS BIGINT)"), lit(Sketches.QsMax)).as("c"))
      .collect().map(_.getLong(0)).sorted
    val res = 1L << Sketches.QsLMin
    Sketches.QsProbeCents.foreach { p =>
      val (est, exact) = rows(("rank", p))
      // the contract: est IS the exact rank of the probe truncated to the
      // sketch resolution — dyadic decomposition loses nothing above it
      assert(est === cents.count(_ < (p / res) * res).toLong, s"probe $p")
      assert(exact === cents.count(_ < p).toLong, s"probe $p")
      assert(est <= exact && exact - est <= cents.count(c => c / res === p / res),
        s"probe $p: est=$est exact=$exact")
    }
    Sketches.QsTargetPct.foreach { pct =>
      val (est, exact) = rows(("quantile", pct.toLong))
      val target = (pct.toLong * cents.length + 99) / 100
      assert(exact === cents(target.toInt - 1), s"pct $pct")
      // est = lower bound of the bucket holding the target rank
      assert(est <= exact && exact < est + res, s"pct $pct: est=$est exact=$exact")
    }
  }

  test("quantileSketch is partitioning-invariant (mergeable state)") {
    val o = Tables.orders(spark, sf("sf0.001"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val one = canon(Sketches.quantileSketch(o.repartition(1)))
    val many = canon(Sketches.quantileSketch(o.repartition(13)))
    assert(one === many)
    assert(one.nonEmpty)
  }

  test("kllQuantile: rank-error envelope O(sqrt(rank * 2^lMin)) holds") {
    val o = Tables.orders(spark, sf("sf0.01"))
    val rows = Sketches.kllQuantile(o).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows.size === Sketches.KllPcts.size)
    // exact reference: all values sorted (ties can't matter for rank
    // counts below, which use strict/non-strict value comparisons)
    val vs = o.select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
    val n = vs.length.toLong
    // recover the cutoff the sketch used from the closed-form contract
    def level(h: Long) = math.min(java.lang.Long.numberOfTrailingZeros(h), Sketches.KllMaxLevel)
    val hs = o.select(graft.functions.HashFunctions.md5Long(col("o_orderkey").cast("string")))
      .collect().map(_.getLong(0))
    val lMin = (0 to Sketches.KllMaxLevel + 1)
      .find(l => hs.count(level(_) >= l) <= Sketches.KllCap).get
    val w = 1L << lMin
    Sketches.KllPcts.foreach { pct =>
      val (est, exact) = (rows(pct)._1, rows(pct)._2)
      val target = (pct * n + 99) / 100
      assert(exact === vs(target.toInt - 1), s"pct $pct exact side")
      // est's true rank interval [count(< est), count(<= est)] must sit
      // within the level-sampling deviation of the target
      val lo = vs.count(_ < est).toLong
      val hi = vs.count(_ <= est).toLong
      val envelope = 8.0 * math.sqrt(w.toDouble * target) + w
      val dist = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(dist <= envelope, s"pct $pct: rank dist $dist > envelope $envelope (w=$w)")
    }
  }

  test("kllQuantileBySegment: each group equals the global sketch on that group's rows") {
    val dir = sf("sf0.001")
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val grouped = Sketches.kllQuantileBySegment(customer, orders).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(grouped.nonEmpty)
    val segs = grouped.keys.map(_._1).toSeq.distinct.sorted
    // the per-group level-sampling state depends only on the group's rows,
    // so filtering first and sketching globally must agree exactly
    segs.take(2).foreach { seg =>
      val segOrders = orders.join(
        customer.where(col("c_mktsegment") === seg).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      val global = Sketches.kllQuantile(segOrders).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      global.foreach { case (pct, ee) =>
        assert(grouped((seg, pct)) === ee, s"seg $seg pct $pct")
      }
    }
  }

  test("kllQuantile is partitioning/order-invariant (deterministic compaction)") {
    val o = Tables.orders(spark, sf("sf0.001"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val one = canon(Sketches.kllQuantile(o.repartition(1)))
    val many = canon(Sketches.kllQuantile(o.orderBy(desc("o_totalprice")).repartition(13)))
    assert(one === many)
    assert(one.nonEmpty)
  }

  test("countMinProbe: overestimate-only, zero for absent word, mostly exact") {
    val d = Tables.documents(spark, sf("sf0.01"))
    val rows = Sketches.countMinProbe(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet === Sketches.CmsProbes.toSet)
    rows.foreach { case (w, est, exact) =>
      assert(est >= exact, s"$w: CMS must never underestimate ($est < $exact)")
    }
    val (_, absentEst, absentExact) =
      rows.find(_._1 == "absentwordzzz").get
    assert(absentExact === 0L)
    // with ~31 distinct tokens in 256 buckets x 4 rows, at least one of
    // the absent word's rows should dodge every occupied bucket... but a
    // collision with ANY token in all 4 rows is possible in principle;
    // the hard guarantee is only est >= 0. The vocab-size argument makes
    // all-4-collide vanishingly unlikely AND deterministic for this data:
    assert(absentEst === 0L)
    // the real probes should be exactly counted for most words (tiny
    // vocab -> collisions rare; min-over-4-rows removes the rest)
    val exactHits = rows.count { case (_, est, exact) => est === exact }
    assert(exactHits >= rows.length - 1)
  }

  test("sketch summary: every approximation sits inside its band; exact columns match") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val rows = Relational.sketchSummary(li, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(
        countDistinct("l_orderkey").as("orders"),
        countDistinct("l_partkey").as("parts"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(rows.keySet === exact.keySet)
    exact.foreach { case (flag, e) =>
      val a = rows(flag)
      assert(a.getLong(1) === e.getLong(1), s"$flag exact_orders")
      assert(a.getLong(2) === e.getLong(2), s"$flag exact_parts")
      assert(a.getLong(3) === e.getLong(3), s"$flag n_rows")
      // the band booleans ARE the sketch-error assertion (and what the
      // DuckDB oracle hashes against literal TRUEs)
      (4 to 7).foreach(i => assert(a.getBoolean(i), s"$flag band column $i"))
      // the rail is genuinely CHECKED at this scale (n_s >= SketchRailMinN,
      // ~1/16 of each group) — the oracle recounts the same sample
      assert(a.getBoolean(8), s"$flag pct_rail_checked")
    }
  }

  test("sketch summary: pct_rail_checked is false when the sample is too small to check") {
    import spark.implicits._
    // 32 rows in one group -> ~2 sampled rows, far below SketchRailMinN:
    // the percentile bands pass (vacuously or near-vacuously) but the
    // checked flag must say so instead of letting TRUE masquerade as a
    // verified bound. HLL bands are computed WITHOUT the sample and must
    // still be real checks (exact at this cardinality).
    val li = (1 to 32).map(i => (i.toLong, i, "N", i.toLong,
        java.math.BigDecimal.valueOf(i * 100L, 2)))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_partkey",
        "l_extendedprice")
    val r = Relational.sketchSummary(li).collect()
    assert(r.length === 1)
    assert(!r.head.getBoolean(8), "tiny fixture must report unchecked rail")
    assert(r.head.getBoolean(4) && r.head.getBoolean(5),
      "HLL bands are sample-independent and exact at n=32")
  }

  test("tableDigest: order/partitioning-invariant; any single-value change flips it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha text", "en", "web"),
      (2L, "beta text", "de", "web"),
      (3L, "gamma text", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    def digests(df: org.apache.spark.sql.DataFrame) =
      Sketches.tableDigest(df).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = digests(docs)
    assert(base.keySet === Set("web", "books"))
    assert(base("web")._2 === 2L)
    // invariant under row order and partitioning
    assert(digests(docs.orderBy(desc("doc_id")).repartition(5)) === base)
    // sensitive to any value change
    val tweaked = docs.withColumn("text",
      when(col("doc_id") === 2L, lit("beta text!")).otherwise(col("text")))
    assert(digests(tweaked)("web")._1 !== base("web")._1)
    assert(digests(tweaked)("books") === base("books"))
  }

  test("hllVocabGrowth: monotone curve, last bucket == whole-corpus state, near exact") {
    val d = Tables.documents(spark, sf("sf0.001"))
    val got = Sketches.hllVocabGrowth(d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until TextAnalysis.NoveltyBuckets.toLong))
    // registers only improve with more data: denominators non-increasing,
    // estimates (and zero counts' complement) non-decreasing
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 >= a._4 && b._2 <= a._2)
    }
    // the cumulative state at the LAST bucket is the whole corpus merged —
    // identical to running the card with a single bucket
    val whole = Sketches.hllVocabGrowth(d, buckets = 1).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).head
    assert((got.last._2, got.last._3, got.last._4) === whole)
    // raw estimate lands within HLL error of the exact distinct-shingle
    // count (m=256 -> sigma ~6.5%; allow 3 sigma)
    val exact = Dedup.shingled(d)
      .select(explode(col("sh")).as("g")).distinct().count().toDouble
    assert(math.abs(got.last._4 - exact) / exact < 0.2)
  }
}
