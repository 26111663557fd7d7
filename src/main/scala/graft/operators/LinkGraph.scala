package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level link graph — the crawl-graph stage between [[Html]]
  * extraction and [[Domains]] curation. A production pipeline ranks the
  * HOSTS of its crawl (Common Crawl publishes exactly this artifact: the
  * host-level webgraph plus centrality scores) and uses the ranks as a
  * curation prior: pages on well-linked hosts are kept at higher quality
  * thresholds, frontier hosts feed the next crawl round. This module
  * builds that artifact from the synthesized pages' OWN anchors — parsed
  * from the raw page bytes exactly like a crawler would, never assumed
  * from the grammar — and runs [[GraphAnalytics.pageRank]]'s all-integer
  * kernel over it, so every score replays bit-exactly in DuckDB.
  *
  * Reference lineage: the reference's only graph is the word→count map
  * (`mapreduce/mapreduce.go:33`); this is the same keyed-aggregation
  * shape lifted to (src_host, dst_host) keys plus the BSP rank loop
  * already proven on the word graph.
  *
  * Link semantics (what a crawler does, applied to the r15 grammar):
  *
  *   - ABSOLUTE anchors (`href="https://…"`) resolve to the host named
  *     in the URL — the grammar's `next` anchor, whose target host
  *     re-hashes per page id, so these are the cross-host edges.
  *   - RELATIVE anchors (`href="/p{t}"`) resolve against the page's own
  *     host ([[Domains.hostOf]] of its doc_id) — intra-host by
  *     construction, so they never enter the cross-host edge list but do
  *     count toward frontier discovery.
  *   - `src=` attributes (the ad block's img) are fetches, not links —
  *     excluded by anchoring the patterns on `href=`.
  *
  * Scale shape: link extraction is a scan-speed regexp over the page
  * bytes (no shuffle); the page→host edge aggregation map-side combines
  * into a host-graph frame bounded by |hosts|² (at 100 TB: millions of
  * rows for hundreds of billions of pages — the whole point of ranking
  * hosts, not pages); the rank iteration then runs on that small frame,
  * never rescanning the corpus.
  *
  * The family: [[hostEdges]] (the webgraph), [[hostRank]] (PageRank
  * authority), [[harmonicCentrality]] (the pivot-sampled CC-style
  * metric), [[hostComponents]] (site families), [[frontier]] (the crawl
  * scheduler's frame), [[authorityBySource]] (curation prior), its
  * [[RankStore]] stored-rank twin, and the streaming ingestion twin in
  * `DocumentStreams.linkHostsToBatch`.
  */
object LinkGraph {

  /** Absolute-URL alternative (RE2-safe, oracle-shared). */
  private val AbsHrefAlt = "https://[^\"]+"

  /** Relative `/p{id}` alternative (ids may be negative — fixtures). */
  private val RelHrefAlt = "/p-?[0-9]+"

  /** Absolute anchors: capture the full URL. */
  val AbsHrefPattern: String = s"""href="($AbsHrefAlt)""""

  /** Relative page anchors `/p{id}`. */
  val RelHrefPattern: String = s"""href="($RelHrefAlt)""""

  /** Both anchor shapes in ONE alternation — the single extraction pass
    * [[linksRaw]] runs, so the corpus is scanned (and the page
    * synthesized) once per link query instead of once per anchor kind.
    * Built from the same alternatives as the single-kind patterns so the
    * three regexes cannot diverge.
    */
  val AnyHrefPattern: String = s"""href="($AbsHrefAlt|$RelHrefAlt)""""

  /** Target page id inside an absolute URL's `/p/{id}` path. */
  val AbsPagePattern: String = "/p/(-?[0-9]+)$"

  /** Target page id of a relative `/p{id}` anchor. */
  val RelPagePattern: String = "^/p(-?[0-9]+)$"

  /** The crawl frame: documents ∪ [[Html.MarkupFixtures]], each with its
    * synthesized page and its own host — (url, html) is what a real
    * crawler hands this stage. Runs over the SAME corpus as the
    * registered HTML queries so the fixtures' negative ids exercise the
    * hash grammar's sign handling end to end.
    */
  def pages(documents: DataFrame): DataFrame =
    pagesRaw(Html.withFixtures(graft.Parallelism.ensure(documents)))

  /** [[pages]] without the fixture union/partitioning guard — the shard
    * form the streaming twin runs per micro-batch (fixtures arrive as
    * their own final shard there, the [[Html]] streaming convention).
    */
  def pagesRaw(frame: DataFrame): DataFrame =
    Html.withHtml(frame)
      .withColumn("host", Domains.hostOf(col("doc_id"), col("source")))

  /** One row per anchor: (doc_id, src_host, dst_host, dst_page,
    * absolute). ONE scan-speed extraction pass ([[AnyHrefPattern]]) with
    * CASE-based resolution — a two-pass union form would re-read the
    * corpus and re-synthesize every page once per anchor kind; this
    * parses both kinds from a single Generate. No UDF, no shuffle.
    */
  def links(documents: DataFrame): DataFrame =
    linksRaw(Html.withFixtures(graft.Parallelism.ensure(documents)))

  /** [[links]] over an explicit (doc_id, source, text) frame — doc-local
    * (parse only; no corpus state), so micro-batch unions equal the
    * batch extraction row for row.
    */
  def linksRaw(frame: DataFrame): DataFrame = {
    val p = pagesRaw(frame)
    val isAbs = col("u").startsWith("https://")
    p.select(col("doc_id"), col("host").as("src_host"),
        explode(regexp_extract_all(col("html"), lit(AnyHrefPattern), lit(1)))
          .as("u"))
      .select(col("doc_id"), col("src_host"),
        when(isAbs, Domains.urlHost(col("u")))
          .otherwise(col("src_host")).as("dst_host"),
        when(isAbs, regexp_extract(col("u"), AbsPagePattern, 1))
          .otherwise(regexp_extract(col("u"), RelPagePattern, 1))
          .cast("long").as("dst_page"),
        isAbs.as("absolute"))
  }

  /** The host-level link graph — `q_link_hosts`: cross-host edges with
    * link weights. Self-edges (an absolute anchor that happens to land
    * on its own host, and every relative anchor) are dropped: host
    * ranking wants the between-host structure, same as the published
    * host-graph artifacts. One map-side-combined aggregation.
    */
  def hostEdges(documents: DataFrame): DataFrame =
    edgesFromLinks(links(documents))

  /** The cross-host aggregation over an anchor frame — shared verbatim
    * by the batch path and the streaming twin's post-drain rollup, so
    * the two cannot drift.
    */
  def edgesFromLinks(l: DataFrame): DataFrame =
    l.where(col("dst_host") =!= col("src_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))

  /** Host authority — `q_link_rank`: [[GraphAnalytics.pageRank]] (fixed
    * [[GraphAnalytics.PrIters]] all-integer rounds) over [[hostEdges]],
    * each host with its rank and distinct in/out counterparty counts.
    * Frontier-only hosts (linked to, never crawled) are nodes too — they
    * hold the base teleport mass, which is exactly how a crawler
    * prioritizes them.
    */
  def hostRank(documents: DataFrame): DataFrame = {
    val e = hostEdges(documents).localCheckpoint()
    val pr = GraphAnalytics.pageRank(
      e.select(col("src_host").as("src"), col("dst_host").as("dst"),
        col("n_links").as("w")))
    val outd = e.groupBy("src_host")
      .agg(countDistinct("dst_host").as("n_out"))
    val ind = e.groupBy("dst_host")
      .agg(countDistinct("src_host").as("n_in"))
    pr.join(outd, pr("id") === outd("src_host"), "left")
      .join(ind, pr("id") === ind("dst_host"), "left")
      .select(col("id").as("host"), col("pr"),
        coalesce(col("n_in"), lit(0L)).as("n_in"),
        coalesce(col("n_out"), lit(0L)).as("n_out"))
  }

  /** Crawl-frontier card — `q_link_frontier`: per target host, how many
    * links point there, how many distinct pages they name, and how many
    * of those pages are NOT in the corpus (discovered-but-uncrawled —
    * the frame a crawler's scheduler is fed). Known-ness is by page id:
    * one slim left join of the anchor frame against the corpus id set.
    */
  def frontier(documents: DataFrame): DataFrame = {
    val l = links(documents)
    val ids = Html.withFixtures(graft.Parallelism.ensure(documents))
      .select(col("doc_id").as("t")).distinct()
    l.join(ids, l("dst_page") === ids("t"), "left")
      .groupBy("dst_host")
      .agg(
        count(lit(1)).as("n_links"),
        countDistinct("dst_page").as("n_targets"),
        countDistinct(when(col("t").isNull, col("dst_page")))
          .as("n_frontier"))
  }

  /** Pivot count / BFS radius / pivot-draw seed for
    * [[harmonicCentrality]]. Rounds stay small and static — the oracle
    * unrolls them (the [[GraphAnalytics.PrIters]] contract).
    */
  val HcPivots = 8
  val HcRounds = 3
  val HcSeed = 61

  /** Pivot-sampled harmonic centrality — `q_link_harmonic`: the OTHER
    * published host-ranking metric (Common Crawl ships harmonic
    * centrality beside PageRank for exactly this graph). Exact harmonic
    * centrality needs all-pairs distances; the at-scale estimators
    * sample — HyperBall via HLL counters, or pivot sampling (Eppstein &
    * Wang 2004): run BFS from a small deterministic pivot set and score
    * each host by its inverse distances FROM the pivots. This implements
    * the pivot form, all-integer and radius-bounded so the whole
    * computation replays in DuckDB:
    *
    *   - pivots = the [[HcPivots]] hosts with the smallest seeded md5
    *     draw (host-name ties by name) — a uniform, deterministic sample;
    *   - [[HcRounds]] BSP relaxation rounds of `d(p, v) =
    *     min(d, 1 + min over in-edges)` — each round one join + one
    *     min-agg over the ≤|hosts|·P distance frame;
    *   - score = Σ_p 1000 div d(p, v) over reached pivots at d ≥ 1, in
    *     exact milli units — the radius-R truncated estimator (unreached
    *     pivots contribute 0, the standard harmonic convention).
    *
    * Every host appears in the card (unreached ⇒ 0), so the consumer
    * can tell "peripheral" from "absent".
    */
  def harmonicCentrality(documents: DataFrame): DataFrame = {
    val e = hostEdges(documents)
      .select(col("src_host").as("src"), col("dst_host").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val pivots = nodes
      .orderBy(graft.functions.HashFunctions.md5Long(col("host"), HcSeed).asc,
        col("host").asc)
      .limit(HcPivots)
      .select(col("host").as("pivot"))
      .localCheckpoint()
    var dist = pivots.select(col("pivot"), col("pivot").as("host"),
      lit(0).as("d"))
    for (_ <- 1 to HcRounds) {
      val ext = dist.join(e, dist("host") === e("src"))
        .select(col("pivot"), e("dst").as("host"), (col("d") + 1).as("d"))
      dist = dist.unionAll(ext)
        .groupBy("pivot", "host").agg(min("d").as("d"))
        .localCheckpoint()
    }
    val hc = dist.where(col("d") >= 1)
      .groupBy("host")
      .agg(sum(expr("1000 div d")).as("h"),
        count(lit(1)).as("r"),
        min("d").as("m"))
    nodes.join(hc, Seq("host"), "left")
      .select(col("host"),
        coalesce(col("h"), lit(0L)).as("h_milli"),
        coalesce(col("r"), lit(0L)).as("n_pivots_reached"),
        coalesce(col("m"), lit(0)).as("min_d"))
  }

  /** TrustRank — `q_link_trustrank`:
    * [[GraphAnalytics.personalizedPageRank]] over the host graph with
    * the teleport set restricted to a TRUSTED seed set — the published
    * link-spam demotion signal (rank mass a host cannot trace back to a
    * trusted set is suspect; a selector demotes high-PageRank/low-trust
    * hosts). The seed rule is deterministic and data-driven: the hosts
    * of the lexicographically FIRST source feed (a real deployment
    * plugs in its curated whitelist — the operator contract is the seed
    * frame, not the rule). Under this grammar trust cannot cross source
    * boundaries, so every host outside the seed source scores EXACTLY
    * 0 — the sharp property the spec pins.
    */
  def trustRank(documents: DataFrame): DataFrame = {
    val e = hostEdges(documents).localCheckpoint()
    val docsH = Html.withFixtures(graft.Parallelism.ensure(documents))
      .select(col("source"),
        Domains.hostOf(col("doc_id"), col("source")).as("host"))
    // 1-row scalar: the seed source (bounded broadcast, the Dsir idiom)
    val seedSrc = docsH.agg(min("source").as("ssrc"))
    val seeds = docsH.crossJoin(seedSrc)
      .where(col("source") === col("ssrc"))
      .select(col("host").as("id")).distinct()
    GraphAnalytics.personalizedPageRank(
      e.select(col("src_host").as("src"), col("dst_host").as("dst"),
        col("n_links").as("w")),
      seeds)
      .select(col("id").as("host"), col("pr").as("trust"), col("is_seed"))
  }

  /** Web communities — `q_link_components`: weakly-connected components
    * of the host graph through [[Dedup.clustersFromPairs]]'s proven
    * min-label propagation (+ star-contraction fallback), string keys
    * ordering lexicographically exactly like the DuckDB replay's `min`.
    * Under this grammar the absolute anchor keeps the page's own source,
    * so components are per-source site families — the structure a
    * mixture balancer would budget over. Hosts with no cross-host edge
    * are not graph nodes and do not appear (the card describes the
    * GRAPH, not the corpus — [[harmonicCentrality]] covers every host).
    */
  def hostComponents(documents: DataFrame): DataFrame = {
    val e = hostEdges(documents).localCheckpoint()
    val pairs = e.select(
        least(col("src_host"), col("dst_host")).as("doc_a"),
        greatest(col("src_host"), col("dst_host")).as("doc_b"))
      .distinct()
    val nodes = e.select(col("src_host").as("doc_id"))
      .union(e.select(col("dst_host").as("doc_id")))
      .distinct()
    Dedup.clustersFromPairs(nodes, pairs)
      .select(col("doc_id").as("host"),
        col("cluster_id").as("component_id"),
        col("cluster_n").as("component_n"))
  }

  /** Authority-as-curation-prior card — `q_link_authority`: per source
    * feed, document count, distinct hosts, and the summed/average host
    * rank of its pages (integer [[GraphAnalytics.PrQ]] units; `div`, not
    * float). A source whose pages live on isolated hosts (rank NULL —
    * possible only if every one of its cross-host anchors self-looped)
    * counts 0, the honest floor. This is the join a selector uses to
    * temper per-source budgets by link authority.
    */
  def authorityBySource(documents: DataFrame): DataFrame =
    authorityTail(docHosts(documents),
      hostRank(documents).select(col("host"), col("pr")))

  /** The doc→host map — a pure (doc_id, source) projection; no page
    * synthesis needed (only the rank side parses anchors).
    */
  private[operators] def docHosts(documents: DataFrame): DataFrame =
    Html.withFixtures(graft.Parallelism.ensure(documents))
      .select(col("source"),
        Domains.hostOf(col("doc_id"), col("source")).as("host"))

  /** The card tail shared by the fresh and stored-rank forms, so the two
    * cannot drift.
    */
  private[operators] def authorityTail(p: DataFrame, r: DataFrame): DataFrame =
    p.join(r, Seq("host"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("host").as("n_hosts"),
        sum(coalesce(col("pr"), lit(0L))).as("sum_pr"))
      .select(col("source"), col("n_docs"), col("n_hosts"), col("sum_pr"),
        expr("sum_pr div n_docs").as("avg_pr"))
}

/** Session-persisted host-rank artifact — the link graph's
  * train-once/apply-everywhere seam on the shared
  * [[graft.sources.ArtifactStore]] kernel (the CentroidStore/ModelStore
  * contract): a production pipeline rebuilds its webgraph ranks in a
  * periodic batch job and every consumer (curation, crawl scheduling,
  * mixture tempering) reads the LAST published ranks instead of
  * re-parsing the corpus. Ranks are integer [[GraphAnalytics.PrQ]] units,
  * so the parquet round-trip is exact and
  * `q_link_authority_stored` shares `q_link_authority`'s oracle verbatim.
  */
object RankStore {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types._

  private val store = new graft.sources.ArtifactStore[String]("hostrank")

  private val schema = StructType(Seq(
    StructField("host", StringType),
    StructField("pr", LongType),
    StructField("n_in", LongType),
    StructField("n_out", LongType)))

  /** The persisted rank card for `dir`, computed on first call. */
  def ranks(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schema).parquet(store.getOrBuild(dir) { out =>
      LinkGraph.hostRank(graft.Tables.documents(spark, dir))
        .write.mode("overwrite").parquet(out)
    })

  /** The authority card under STORED ranks — zero parse/rank jobs on the
    * apply path beyond the doc→host projection.
    */
  def authorityBySource(spark: SparkSession, dir: String): DataFrame =
    LinkGraph.authorityTail(
      LinkGraph.docHosts(graft.Tables.documents(spark, dir)),
      ranks(spark, dir).select(
        org.apache.spark.sql.functions.col("host"),
        org.apache.spark.sql.functions.col("pr")))

  /** Times the ranks for `dir` have been BUILT (not read) — spec hook. */
  def builds(dir: String): Int = store.builds(dir)
}
