package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural (non-circular) checks on the integer PageRank: symmetry,
  * centrality ordering, dangling-node handling, mass bounds, and
  * partitioning-invariance — properties the oracle replay can't
  * distinguish from a consistently-wrong formula.
  */
class GraphAnalyticsSpec extends SparkSpec {
  import GraphAnalytics._

  private def edges(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  private def ranks(rows: Seq[(String, String, Long)], iters: Int = PrIters) =
    pageRank(edges(rows), iters).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("symmetric cycle: all nodes rank equally, near 1/N of total mass") {
    val pr = ranks(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    assert(pr.values.toSet.size === 1, s"cycle ranks diverged: $pr")
    // flooring loses a few units per round; stay within 100 of PrQ/3
    assert(math.abs(pr("a") - PrQ / 3) <= 100)
  }

  test("star graph: the hub everyone points at outranks every leaf") {
    val pr = ranks(Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L)))
    assert(pr("hub") > pr("a"))
    assert(pr("a") === pr("b"))
    assert(pr("a") === pr("c"))
  }

  test("dangling node keeps receiving rank; total mass never exceeds PrQ") {
    // d has no out-edges: its inbound rank is retained, not redistributed
    val pr = ranks(Seq(("a", "d", 1L), ("b", "d", 1L), ("a", "b", 1L)))
    assert(pr.keySet === Set("a", "b", "d"))
    assert(pr("d") > 0L)
    assert(pr.values.sum <= PrQ)
    assert(pr.values.sum > 0L)
  }

  test("weighted edges: the heavier continuation gets the larger share") {
    val pr = ranks(Seq(("a", "x", 9L), ("a", "y", 1L), ("x", "a", 1L), ("y", "a", 1L)))
    assert(pr("x") > pr("y"))
  }

  test("deterministic under repartitioning") {
    val es = (1 to 40).map(i => (s"n${i % 7}", s"n${(i * 3) % 7}", (i % 4) + 1L))
    val a = ranks(es)
    val b = pageRank(edges(es).repartition(7), PrIters).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("wordPageRank: connective words outrank rare ones") {
    import spark.implicits._
    val docs = (1 to 20).map(i => (i.toLong, s"common glue common glue rare$i"))
      .toDF("doc_id", "text")
    val top = GraphAnalytics.wordPageRank(docs, k = 2).collect().map(_.getString(0))
    assert(top.toSet === Set("common", "glue"))
  }

  test("wordTriangles equals brute-force triangle enumeration (shared-edge case)") {
    import spark.implicits._
    // co-occurrence graph: triangle (a,b,c) and triangle (b,c,d) sharing
    // edge b-c, plus a pendant edge d-e that joins no triangle
    val docs = Seq(
      (1L, "a b c a"), // edges a-b, b-c, a-c
      (2L, "c d b c"), // edges c-d, b-d, b-c (dup)
      (3L, "d e")      // pendant
    ).toDF("doc_id", "text")
    // brute force over the canonical edge set
    val edgeSet = Set(("a","b"),("b","c"),("a","c"),("c","d"),("b","d"),("d","e"))
    val words = edgeSet.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triples = for {
      i <- words.indices; j <- (i + 1) until words.size; l <- (j + 1) until words.size
      u = words(i); v = words(j); w = words(l)
      if edgeSet((u, v)) && edgeSet((v, w)) && edgeSet((u, w))
    } yield Seq(u, v, w)
    val expected = triples.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphAnalytics.wordTriangles(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected, s"got $got expected $expected")
    assert(expected === Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("kCoreWords peels low-degree periphery; the dense core survives with its degrees") {
    import spark.implicits._
    // K4 core {a,b,c,d} (degree 3 each) + pendant chain e-f hanging off a:
    // the chain and the a-e edge peel away within two rounds
    val docs = Seq(
      (1L, "a b c d a c"), // edges a-b, b-c, c-d, a-d, a-c
      (2L, "b d"),         // edge b-d completes K4
      (3L, "a e f")        // pendant chain: e, f never reach degree 3
    ).toDF("doc_id", "text")
    val got = GraphAnalytics.kCoreWords(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), s"got $got")
  }

  test("rankAndTrust ≡ pageRank + personalizedPageRank, bit for bit") {
    import spark.implicits._
    // deterministic pseudo-random weighted digraph with a seed subset,
    // dangling nodes (n0 only ever a target), self-contained weights
    val rnd = new scala.util.Random(7)
    val es = (1 to 60).map { _ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12) + 1}", rnd.nextInt(5) + 1L)
    }.filter { case (a, b, _) => a != b }
    val e = edges(es)
    val seeds = Seq("n1", "n4", "n9", "nMissing").toDF("id")
    val fused = rankAndTrust(e, seeds).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val pr = pageRank(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ppr = personalizedPageRank(e, seeds).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(fused.keySet === pr.keySet)
    fused.foreach { case (id, (p, t, s)) =>
      assert(p === pr(id), s"pr mismatch at $id")
      assert(t === ppr(id)._1, s"trust mismatch at $id")
      assert(s === ppr(id)._2, s"seed flag mismatch at $id")
    }
    // empty seed set: trust is identically 0 (the ppr contract)
    val noSeeds = rankAndTrust(e, Seq.empty[String].toDF("id")).collect()
    assert(noSeeds.forall(_.getLong(2) === 0L))
    assert(noSeeds.map(r => r.getString(0) -> r.getLong(1)).toMap === pr)
  }

  test("wordTriangles is partitioning-invariant and never double-counts") {
    import spark.implicits._
    // deterministic pseudo-random graph text
    val rnd = new scala.util.Random(11)
    val docs = (1 to 30).map { i =>
      (i.toLong, (1 to 12).map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(canon(GraphAnalytics.wordTriangles(docs.repartition(1))) ===
      canon(GraphAnalytics.wordTriangles(docs.repartition(13))))
  }
}
