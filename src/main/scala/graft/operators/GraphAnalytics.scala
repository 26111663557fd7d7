package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — PageRank with fixed
  * iteration count, in ALL-INTEGER arithmetic so the whole loop (seed,
  * per-edge contribution, damping) replays bit-exactly in the DuckDB
  * oracle (the same portability trick as the quantized k-means in
  * [[Similarity]]). Applied to the word-bigram graph this is
  * TextRank-style keyword ranking — the graph-centrality signal an
  * LLM-data pipeline exports next to TF-IDF.
  *
  * Reference lineage: generalizes the reference's key/value aggregation
  * loop (`mapreduce/mapreduce.go:48-56`) to a fixed-point iteration — each
  * round is one keyed join + one keyed aggregation, the canonical BSP
  * superstep (Pregel's PageRank lowered onto DataFrames).
  */
object GraphAnalytics {

  /** Score quantum: ranks live in units of 2⁻⁴⁰ of total mass. */
  val PrQ: Long = 1L << 40

  /** Edge-weight quantum: normalized out-weights live in units of 2⁻²⁰. */
  val WQ: Long = 1L << 20

  /** Damping factor 0.85 as the exact ratio 17/20. */
  val DampNum = 17
  val DampDen = 20

  /** Fixed iteration count for the registered query (unrolled in the
    * oracle, so it must stay small and static).
    */
  val PrIters = 3

  /** PageRank over a weighted directed edge list (`src`, `dst`, `w`),
    * `iters` rounds, damping = [[DampNum]]/[[DampDen]]. Returns
    * (`id`, `pr`) with `pr` an integer in [[PrQ]] units.
    *
    * INTEGER CONTRACT (what makes this oracle-replayable): edge weights
    * are first normalized per source to integer units of 1/[[WQ]]
    * (`wq = w·WQ div Σw`), every per-edge contribution is
    * `(pr·wq) div WQ` (floored BEFORE the sum, so the sum is an
    * order-independent integer), and the damped update is
    * `base + (DampNum·Σ) div DampDen` with
    * `base = (DampDen−DampNum)·PrQ div (DampDen·N)`. No doubles anywhere;
    * floor-division truncation (≤ 1 unit per edge per round) is the
    * documented, deterministic approximation. Mass lost to dangling nodes
    * (no out-edges) and to flooring is NOT redistributed — scores are
    * comparable within a run, which is what ranking needs.
    *
    * Overflow bounds: `pr ≤ PrQ = 2⁴⁰`, `wq ≤ WQ = 2²⁰` → per-edge product
    * ≤ 2⁶⁰; normalization needs `w·WQ < 2⁶³`, i.e. raw weights < 2⁴³.
    *
    * Scale shape: each round is one shuffle-join of the rank frame
    * (|nodes| rows) with the normalized edge list on `src` and one
    * hash-agg on `dst` (map-side combined) — the BSP superstep. Per-round
    * `localCheckpoint` keeps the plan (and codegen) identical across
    * rounds instead of growing a 3-round lineage. `N` is one scalar
    * driver-side count, same bounded-action class as the reference
    * master's merge step.
    */
  def pageRank(edges: DataFrame, iters: Int = PrIters): DataFrame = {
    val wsum = edges.groupBy("src").agg(sum("w").as("wsum"))
    val norm = edges.join(wsum, "src")
      .select(col("src"), col("dst"), expr(s"(w * ${WQ}L) div wsum").as("wq"))
      .transform(graft.Materialize.iteration)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .transform(graft.Materialize.iteration)
    val n = nodes.count()
    // Empty graph (e.g. an empty lake partition) is a legitimate input:
    // return the empty (id, pr) frame with the right schema instead of
    // throwing — same guard pattern as ProductQuantization's empty-seed
    // early return.
    if (n == 0) return nodes.withColumn("pr", lit(0L))
    val base = (DampDen - DampNum) * PrQ / (DampDen * n)
    var pr = nodes.withColumn("pr", lit(PrQ / n))
    for (_ <- 1 to iters) {
      val contrib = norm.join(pr, norm("src") === pr("id"))
        .select(col("dst"), expr(s"(pr * wq) div ${WQ}L").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("c"))
      pr = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(
          col("id"),
          (lit(base) +
            expr(s"($DampNum * coalesce(c, 0L)) div ${DampDen}L")).as("pr"))
        .transform(graft.Materialize.iteration)
    }
    pr
  }

  /** Personalized PageRank (TrustRank-style): identical integer contract
    * to [[pageRank]] except the teleport term is restricted to a SEED
    * set — `base = (DampDen−DampNum)·PrQ div (DampDen·S)` for the S
    * seed nodes and 0 for everyone else, and the initial mass
    * `PrQ div S` sits on the seeds. Trust therefore flows ONLY outward
    * from seeds along edges (a node unreachable from every seed within
    * `iters` hops scores exactly 0) — the Gyöngyi et al. 2004 TrustRank
    * shape, used at crawl scale to demote link-spam: rank mass a page
    * cannot trace back to a trusted set is suspect. Seeds outside the
    * node set are ignored (an isolated trusted host can't pass trust).
    * Same per-round BSP cost as [[pageRank]].
    */
  def personalizedPageRank(
      edges: DataFrame, seeds: DataFrame, iters: Int = PrIters): DataFrame = {
    val wsum = edges.groupBy("src").agg(sum("w").as("wsum"))
    val norm = edges.join(wsum, "src")
      .select(col("src"), col("dst"), expr(s"(w * ${WQ}L) div wsum").as("wq"))
      .transform(graft.Materialize.iteration)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
    // seed flag materialized once; S counts seeds that are graph nodes
    val flagged = nodes
      .join(seeds.select(col("id")).distinct().withColumn("s1", lit(true)),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("s1"), lit(false)).as("seed"))
      .transform(graft.Materialize.iteration)
    val s = flagged.where(col("seed")).count()
    if (s == 0) return flagged.select(col("id"), lit(0L).as("pr"),
      col("seed").as("is_seed"))
    val base = (DampDen - DampNum) * PrQ / (DampDen * s)
    var pr = flagged.select(col("id"), col("seed"),
      when(col("seed"), lit(PrQ / s)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = norm.join(pr, norm("src") === pr("id"))
        .select(col("dst"), expr(s"(pr * wq) div ${WQ}L").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("c"))
      pr = flagged.join(contrib, flagged("id") === contrib("dst"), "left")
        .select(
          col("id"), col("seed"),
          (when(col("seed"), lit(base)).otherwise(lit(0L)) +
            expr(s"($DampNum * coalesce(c, 0L)) div ${DampDen}L")).as("pr"))
        .transform(graft.Materialize.iteration)
    }
    pr.select(col("id"), col("pr"), col("seed").as("is_seed"))
  }

  /** [[pageRank]] and [[personalizedPageRank]] fused into ONE BSP loop —
    * (`id`, `pr`, `trust`, `is_seed`), bit-identical to running the two
    * loops separately (the per-column integer arithmetic is untouched and
    * the columns never interact), for HALF the supersteps: callers that
    * need both vectors over the same edge list (`LinkGraph.spamHosts`,
    * i.e. every trust-funnel query) previously normalized the edges,
    * built the node frame, counted nodes, and ran `iters` join+agg+join
    * rounds TWICE. Here each round's shuffle of the rank frame carries
    * both rank columns (16 extra bytes/row) instead of running twice, the
    * edge normalization and the node/seed frame are computed once, and
    * the two driver-side counts collapse into one action.
    *
    * At 100 TB the same fusion halves the number of full |nodes|-scale
    * shuffles per superstep — the guide §2.4 "two operations keyed the
    * same way share one exchange" rule applied to the iteration loop.
    */
  def rankAndTrust(
      edges: DataFrame, seeds: DataFrame, iters: Int = PrIters): DataFrame = {
    val wsum = edges.groupBy("src").agg(sum("w").as("wsum"))
    val norm = edges.join(wsum, "src")
      .select(col("src"), col("dst"), expr(s"(w * ${WQ}L) div wsum").as("wq"))
      .transform(graft.Materialize.iteration)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
    val flagged = nodes
      .join(seeds.select(col("id")).distinct().withColumn("s1", lit(true)),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("s1"), lit(false)).as("seed"))
      .transform(graft.Materialize.iteration)
    // ONE driver action for both counts (pageRank's n and the ppr's s)
    val cnt = flagged
      .agg(count(lit(1)).as("n"),
        sum(when(col("seed"), 1L).otherwise(0L)).as("s"))
      .head()
    val n = cnt.getLong(0)
    val s = if (cnt.isNullAt(1)) 0L else cnt.getLong(1)
    if (n == 0)
      return flagged.select(col("id"), lit(0L).as("pr"),
        lit(0L).as("trust"), col("seed").as("is_seed"))
    val basePr = (DampDen - DampNum) * PrQ / (DampDen * n)
    // s == 0: personalizedPageRank's contract is an all-zero trust vector
    // (no seed mass to flow); the seed base term below stays 0 for all
    val baseTr = if (s == 0) 0L else (DampDen - DampNum) * PrQ / (DampDen * s)
    val seedInit =
      if (s == 0) lit(0L) else when(col("seed"), lit(PrQ / s)).otherwise(lit(0L))
    var pr = flagged.select(col("id"), col("seed"),
      lit(PrQ / n).as("pr"), seedInit.as("trust"))
    for (_ <- 1 to iters) {
      val contrib = norm.join(pr, norm("src") === pr("id"))
        .select(col("dst"),
          expr(s"(pr * wq) div ${WQ}L").as("c"),
          expr(s"(trust * wq) div ${WQ}L").as("ct"))
        .groupBy("dst")
        .agg(sum("c").as("c"), sum("ct").as("ct"))
      val seedBase =
        if (s == 0) lit(0L)
        else when(col("seed"), lit(baseTr)).otherwise(lit(0L))
      pr = flagged.join(contrib, flagged("id") === contrib("dst"), "left")
        .select(
          col("id"), col("seed"),
          (lit(basePr) +
            expr(s"($DampNum * coalesce(c, 0L)) div ${DampDen}L")).as("pr"),
          (seedBase +
            expr(s"($DampNum * coalesce(ct, 0L)) div ${DampDen}L")).as("trust"))
        .transform(graft.Materialize.iteration)
    }
    pr.select(col("id"), col("pr"), col("trust"), col("seed").as("is_seed"))
  }

  /** Top words of the registered TextRank query. */
  val WordRankK = 50

  /** Top words of the registered triangle query. */
  val TriangleK = 20

  /** k-core threshold / fixed peel rounds for the registered query (the
    * same fixed-iteration contract as [[PrIters]]: the loop is unrolled
    * in the oracle, so it must stay small and static — on most graphs
    * peeling converges in a handful of rounds; un-converged residue is
    * part of the documented "after R peels" semantics, not an error).
    */
  val KCoreK = 3
  val KCoreRounds = 4

  /** Canonical undirected co-occurrence edges (a < b) of the word-bigram
    * graph — shared by [[wordTriangles]] and [[kCoreWords]].
    */
  private def cooccurrenceEdges(documents: DataFrame): DataFrame = {
    val ts = graft.Parallelism.ensure(documents)
      .select(split(trim(lower(graft.functions.TextFunctions.nfc(col("text")))), "\\s+").as("ts"))
      .where(size(col("ts")) >= 2)
    ts
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS src, ts[i] AS dst))")).as("bg"))
      .select(
        least(col("bg.src"), col("bg.dst")).as("a"),
        greatest(col("bg.src"), col("bg.dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
  }

  /** Degree frame of an (a, b) edge list. */
  private def degreesOf(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("a"), col("b"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("d"))

  /** k-core peeling, [[KCoreRounds]] fixed rounds: each round drops every
    * node of degree < k (and its edges), simultaneously — the BSP variant
    * of the sequential min-degree peel. Returns every surviving node with
    * its post-peel degree. Each round is one exploded degree agg
    * (map-side combined) + two semi-joins keyed on the endpoint — the
    * same per-round shape as [[pageRank]]'s superstep, with per-round
    * localCheckpoint keeping plans constant.
    */
  def kCoreWords(
      documents: DataFrame, k: Int = KCoreK, rounds: Int = KCoreRounds): DataFrame = {
    var edges = cooccurrenceEdges(documents).transform(graft.Materialize.iteration)
    for (_ <- 1 to rounds) {
      val keep = degreesOf(edges).where(col("d") >= k).select("w")
      edges = edges
        .join(keep.select(col("w").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("w").as("b")), Seq("b"), "left_semi")
        .transform(graft.Materialize.iteration)
    }
    degreesOf(edges).select(col("w").as("word"), col("d").as("degree"))
  }

  /** Per-word triangle participation counts over the UNDIRECTED word
    * co-occurrence graph (canonical `a < b` edges from the bigram stream),
    * top-k words by (triangles DESC, word ASC) — the clustering-structure
    * signal next to [[wordPageRank]]'s centrality.
    *
    * Algorithm: degree-ordered triangle enumeration. Each edge is ORIENTED
    * from its (degree, id)-smaller endpoint to the larger; wedges are then
    * a self-join of the oriented list on the source, and a wedge (u; v, w)
    * closes iff the canonical edge (v, w) exists. Every triangle is
    * enumerated exactly once — at its unique (degree, id)-minimum vertex —
    * and, the scale point, the oriented out-degree is O(√m) on any graph,
    * so the wedge join materializes O(m^1.5) rows worst-case instead of
    * Σ deg² (which a hub vertex makes quadratic). All three joins are hash
    * equi-joins on word keys; no windows, no driver state.
    */
  def wordTriangles(documents: DataFrame, k: Int = TriangleK): DataFrame = {
    // reused three ways: degrees, orientation, wedge closing
    val edges = cooccurrenceEdges(documents).transform(graft.Materialize.iteration)
    val deg = degreesOf(edges)
    val oriented = edges
      .join(deg.select(col("w").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("w").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
    val wedges = oriented.as("x")
      .join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("u"), col("x.v").as("vv"), col("y.v").as("ww"))
    val tri = wedges
      .join(edges, col("vv") === col("a") && col("ww") === col("b"))
      .select(col("u"), col("vv"), col("ww"))
    tri.select(explode(array(col("u"), col("vv"), col("ww"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_triangles"))
      .orderBy(desc("n_triangles"), asc("word"))
      .limit(k)
  }

  /** TextRank-style keyword ranking: the word-bigram graph (lowercase
    * adjacent-token pairs, edge weight = pair count — the same axis as
    * [[TextAnalysis.bigramNextTokens]]) run through [[pageRank]], top-k
    * words by (pr DESC, word ASC). High-rank words are the corpus's
    * connective tissue — the signal TextRank inverts for keyword
    * extraction and a pipeline uses for stopword induction.
    */
  def wordPageRank(documents: DataFrame, k: Int = WordRankK): DataFrame = {
    val ts = graft.Parallelism.ensure(documents)
      .select(split(trim(lower(graft.functions.TextFunctions.nfc(col("text")))), "\\s+").as("ts"))
      .where(size(col("ts")) >= 2)
    val edges = ts
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS src, ts[i] AS dst))")).as("bg"))
      .select(col("bg.src").as("src"), col("bg.dst").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"))
    pageRank(edges)
      .orderBy(desc("pr"), asc("id"))
      .limit(k)
      .select(col("id").as("word"), col("pr"))
  }
}
