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
}
