package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainsSpec extends SparkSpec {

  /** Local replay of HashFunctions.md5Long (independent implementation). */
  private def h60(seed: Int, x: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$x".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  private def urlOf(docId: Long, source: String): String = {
    val dom = Domains.DomainBuckets / (h60(Domains.DomainSeed, docId.toString)
      % Domains.DomainBuckets + 1)
    val www = if (h60(Domains.SubSeed, docId.toString) % 2 == 0) "" else "www."
    s"https://$www$source.d$dom.com/p/$docId"
  }

  test("withUrl matches the local grammar replay; extraction round-trips") {
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val rows = Domains.urlTable(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
    val srcs = d.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (url, host, domain)) =>
      val expect = urlOf(id, srcs(id))
      assert(url === expect, s"doc $id url")
      // host = authority, domain = last two labels
      assert(host === expect.stripPrefix("https://").takeWhile(_ != '/'), s"doc $id host")
      assert(domain === host.split('.').takeRight(2).mkString("."), s"doc $id domain")
    }
  }

  test("domain ids are power-law: d1.com holds roughly half the corpus") {
    val d = graft.Tables.documents(spark, sf("sf0.01"))
    val byDom = Domains.urlTable(d).groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byDom.values.sum
    // P(dom=1) = 1/2 by construction; binomial slack on 500 draws
    assert(byDom("d1.com") > n * 2 / 5 && byDom("d1.com") < n * 3 / 5,
      s"d1.com=${byDom("d1.com")} of $n")
    // a real tail exists
    assert(byDom.size > 10)
  }

  test("domainStats: planted within-domain dups, hosts, tokens") {
    import spark.implicits._
    // ids chosen at runtime so two docs share a domain: just assert the
    // invariants the operator owes on the real corpus plus a planted dup
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val twin = d.limit(1).withColumn("doc_id", col("doc_id")) // same text, same id-hash domain
    val got = Domains.domainStats(d.unionByName(twin)).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val base = Domains.domainStats(d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // the duplicated doc's domain gains exactly one doc and >= 2 dup docs
    val dupDomain = Domains.urlTable(d.limit(1)).select("domain").head().getString(0)
    assert(got(dupDomain)._1 === base(dupDomain)._1 + 1)
    assert(got(dupDomain)._3 >= 2L, "the planted twin must count as within-domain dups")
    // untouched domains identical
    (base.keySet - dupDomain).foreach(k => assert(got(k) === base(k), k))
    // conservation: docs sum to corpus size
    assert(base.values.map(_._1).sum === d.count())
  }

  test("domainFrequencyCap equals the brute-force rank rule; partition-invariant") {
    val d = graft.Tables.documents(spark, sf("sf0.01"))
    val got = Domains.domainFrequencyCap(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: window rank per domain over the same hash
    val t = Domains.urlTable(d).select(col("domain"), col("doc_id"))
      .withColumn("h", pmod(graft.functions.HashFunctions.md5Long(
        col("doc_id").cast("string"), Domains.DomainCapSeed), lit(1L << 20)))
    val brute = t.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain")
          .orderBy(col("h").asc, col("doc_id").asc)))
      .where(col("rn") <= Domains.DomainCapDocs)
      .select("domain", "doc_id", "h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    assert(got.nonEmpty)
    // the cap actually engages on the power-law head
    val heavy = got.count(_._1 == "d1.com")
    assert(heavy === Domains.DomainCapDocs,
      s"d1.com should be capped at exactly ${Domains.DomainCapDocs} (got $heavy)")
    // partition invariance
    val again = Domains.domainFrequencyCap(d.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === got)
  }

  test("temperedDomainBudget: head truncated below its mass, tail whole, selection rule exact") {
    val d = graft.Tables.documents(spark, sf("sf0.01"))
    val got = Domains.temperedDomainBudget(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val budgets = got.map(r => r._1 -> r._4).toMap
    val totals = Domains.urlTable(d).groupBy("domain")
      .agg(org.apache.spark.sql.functions.sum("tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tempering flattens: the head domain's budget sits far below its mass
    assert(budgets("d1.com") < totals("d1.com") / 2,
      s"d1.com budget ${budgets("d1.com")} vs mass ${totals("d1.com")}")
    // and the kept set equals the brute-force first-crossing rule under
    // the operator's own budgets
    val t = Domains.urlTable(d).select(col("domain"), col("doc_id"), col("tok"))
      .withColumn("h", pmod(graft.functions.HashFunctions.md5Long(
        col("doc_id").cast("string"), Domains.DomainBudgetSeed), lit(1L << 20)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("domain")
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = t.withColumn("before", coalesce(sum("tok").over(w), lit(0L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val want = cum.filter { case (dom, _, _, before) =>
      budgets.contains(dom) && before < budgets(dom)
    }.map(r => (r._1, r._2, r._3)).toSet
    assert(got.map(r => (r._1, r._2, r._3)).toSet === want)
    // a whole-kept tail domain exists (budget >= mass)
    val keptByDom = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(keptByDom.exists { case (dom, kept) => kept === totals(dom) },
      "some tail domain must pass through whole")
    // the head domain is genuinely truncated
    assert(keptByDom("d1.com") < totals("d1.com"))
  }

  test("incrementalDomainBudget == brute-force corpus-mass-before rule; stream twin equal") {
    val d = graft.Tables.documents(spark, sf("sf0.01"))
    val got = Domains.incrementalDomainBudget(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val split = (d.agg(max("doc_id")).head().getLong(0) + 1L) * 4L / 5L
    val t = Domains.urlTable(d).select(col("domain"), col("doc_id"), col("tok"))
      .withColumn("h", pmod(graft.functions.HashFunctions.md5Long(
        col("doc_id").cast("string"), Domains.DomainBudgetSeed), lit(1L << 20)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val corpus = t.filter(_._2 < split)
    val want = t.filter(_._2 >= split).map { case (dom, id, tok, h) =>
      val before = corpus.filter(c => c._1 == dom
        && (c._4 < h || (c._4 == h && c._2 < id))).map(_._3).sum
      (dom, id, tok, before < Domains.DomainBudgetTokens)
    }.toSet
    assert(got === want)
    // both verdicts occur (the budget engages on the head, tail admits)
    assert(got.exists(_._4) && got.exists(!_._4))
    // the streaming twin answers row for row
    val streamed = graft.streaming.DocumentStreams
      .incrementalDomainBudgetToBatch(spark, sf("sf0.01")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(streamed === got)
  }

  test("domainQualityCard: milli arithmetic exact, both verdicts occur, junk corpus all-drop") {
    import spark.implicits._
    val d = graft.Tables.documents(spark, sf("sf0.01"))
    val rows = Domains.domainQualityCard(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(rows.map(_._2).sum === d.count())
    rows.foreach { case (dom, n, nk, km, nq, qm, keep) =>
      assert(km === nk * 1000 / n, s"$dom keep_milli")
      assert(qm === nq * 1000 / n, s"$dom quality_milli")
      assert(keep === (km >= Domains.DomainKeepMilli && qm >= Domains.DomainKeepMilli), dom)
    }
    // the driver corpus genuinely exercises both decisions
    assert(rows.exists(_._7) && rows.exists(!_._7))
    // an all-junk corpus (no stopwords, 3 tokens) drops every domain:
    // quality_milli is 0 regardless of the classifier draw
    val junk = (1L to 200L).map(i => (i, "zzz qqq xxx", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val jr = Domains.domainQualityCard(junk).collect()
    assert(jr.nonEmpty)
    jr.foreach { r =>
      assert(r.getLong(6) === 0L, "junk quality_milli")
      assert(!r.getBoolean(7), "junk domain must be dropped")
    }
  }

  test("domainOverlapMatrix: unordered domain cells, diagonal = internal duplication") {
    import spark.implicits._
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val doms = Domains.urlTable(d).select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // pick ids so the fixture provably covers same-domain and cross cells
    val byDom = doms.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    val bigDom = byDom.maxBy(_._2.size)
    val (a1, a2) = (bigDom._2(0), bigDom._2(1))
    val otherDom = byDom.find(_._1 != bigDom._1).get
    val b1 = otherDom._2.head
    val pairs = Seq((a1, a2, 1.0), (a1, b1, 0.9), (a2, b1, 0.8))
      .toDF("doc_a", "doc_b", "jaccard")
    val got = Domains.domainOverlapMatrix(d, pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cell = (s: String, t: String) =>
      if (s <= t) (s, t) else (t, s)
    assert(got(cell(bigDom._1, bigDom._1)) === 1L)
    assert(got(cell(bigDom._1, otherDom._1)) === 2L)
    assert(got.values.sum === 3L)
  }

  test("domainTokenBudget: first-crossing kept, later dropped, under-budget domains whole") {
    val d = graft.Tables.documents(spark, sf("sf0.01"))
    val got = Domains.domainTokenBudget(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: cumulative token mass strictly before, in (h, doc_id) order
    val t = Domains.urlTable(d).select(col("domain"), col("doc_id"), col("tok"))
      .withColumn("h", pmod(graft.functions.HashFunctions.md5Long(
        col("doc_id").cast("string"), Domains.DomainBudgetSeed), lit(1L << 20)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("domain")
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val brute = t.withColumn("before", coalesce(sum("tok").over(w), lit(0L)))
      .where(col("before") < Domains.DomainBudgetTokens)
      .select("domain", "doc_id", "tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // the budget engages: the head domain is truncated
    val head = t.where(col("domain") === "d1.com")
    val headTotal = head.agg(sum("tok")).head().getLong(0)
    val keptTotal = got.toSeq.filter(_._1 == "d1.com").map(_._3).sum
    assert(headTotal > Domains.DomainBudgetTokens)
    assert(keptTotal >= Domains.DomainBudgetTokens, "first crossing doc included")
    assert(keptTotal < headTotal, "hash-later docs dropped")
  }
}
