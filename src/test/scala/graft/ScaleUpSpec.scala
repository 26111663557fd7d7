package graft

import org.apache.spark.sql.functions._

/** The scale-up generator is load-bearing evidence (every SCALING.md sweep
  * reads its output), so its invariants get pinned: exact replication
  * factors, referential integrity across the key offsets, and the skew
  * mode's planted distributions.
  */
class ScaleUpSpec extends SparkSpec {

  private lazy val dirs: (String, String) = {
    val uni = java.nio.file.Files.createTempDirectory("scaleup-uni").toString
    val skw = java.nio.file.Files.createTempDirectory("scaleup-skw").toString
    ScaleUp.run(spark, sf("sf0.001"), uni, factor = 2)
    ScaleUp.run(spark, sf("sf0.001"), skw, factor = 3, skew = true)
    (uni, skw)
  }

  test("uniform mode: exact row-count factors and intact referential integrity") {
    val (uni, _) = dirs
    val src = Tables.orders(spark, sf("sf0.001")).count()
    assert(Tables.orders(spark, uni).count() === 2 * src)
    // every scaled order's customer exists in the scaled customer table
    val orphans = Tables.orders(spark, uni).as("o")
      .join(Tables.customer(spark, uni).as("c"),
        col("o.o_custkey") === col("c.c_custkey"), "left_anti")
      .count()
    assert(orphans === 0L, "key offsets must preserve the FK")
    // dims are copied once, unscaled
    assert(Tables.nation(spark, uni).count() ===
      Tables.nation(spark, sf("sf0.001")).count())
  }

  test("skew mode: boilerplate families, hot keys, and n_chars consistency") {
    val (_, skw) = dirs
    val docs = Tables.documents(spark, skw)
    val n = docs.count()
    val identical = docs.where(col("text") === ScaleUp.Boilerplate).count()
    val templated = docs
      .where(col("text").startsWith(ScaleUp.Boilerplate + " ticket reference ")).count()
    // doc_id % 3 buckets: each family is a third of the corpus (exact)
    assert(identical === (0L until n).count(_ % 3 == 0))
    assert(templated === (0L until n).count(_ % 3 == 1))
    // n_chars tracks the rewritten text everywhere
    assert(docs.where(col("n_chars") =!= length(col("text"))).count() === 0L)
    // hot keys own ~10% exactly (o_orderkey/l_orderkey mod 10 marks)
    val orders = Tables.orders(spark, skw)
    val hotCust = orders.groupBy("o_custkey").count()
      .agg(max("count")).head().getLong(0)
    assert(hotCust >= orders.count() / 10, s"hot customer owns $hotCust")
    val emb = Tables.embeddings(spark, skw)
    val hotVec = emb.groupBy(md5(col("embedding").cast("string"))).count()
      .agg(max("count")).head().getLong(0)
    assert(hotVec >= emb.count() / 10, s"hot vector group $hotVec")
  }

  test("skew mode is deterministic: two runs produce identical documents") {
    val (_, skw) = dirs
    val again = java.nio.file.Files.createTempDirectory("scaleup-skw2").toString
    ScaleUp.run(spark, sf("sf0.001"), again, factor = 3, skew = true)
    val a = Tables.documents(spark, skw)
    val b = Tables.documents(spark, again)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }
}
