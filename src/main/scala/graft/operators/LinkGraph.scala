package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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


  /** Both anchor shapes in ONE alternation — the single extraction pass
    * [[linksRaw]] runs, so the corpus is scanned (and the page
    * synthesized) once per link query instead of once per anchor kind.
    * Built from the same alternatives as the single-kind patterns so the
    * three regexes cannot diverge.
    */
  val AnyHrefPattern: String = s"""href="($AbsHrefAlt|$RelHrefAlt)""""

  /** A whole anchor ELEMENT — href plus inner text (entity-escaped
    * prose never contains `<`, so `[^<]*` spans exactly the anchor
    * text). [[linksRaw]] extracts these in ONE pass and derives href
    * and text per element, so the edge list and the anchor-text index
    * ([[anchorBm25Hosts]]) share a single corpus scan.
    */
  val AnchorElemPattern: String =
    s"""<a href="($AbsHrefAlt|$RelHrefAlt)">[^<]*</a>"""

  /** The inner text of a captured anchor element. */
  val AnchorTextPattern: String = ">([^<]*)</a>"

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
    * absolute, anchor_text). ONE scan-speed extraction pass
    * ([[AnchorElemPattern]] — whole elements, so href AND anchor text
    * come from the same Generate) with CASE-based resolution — a
    * two-pass union form would re-read the corpus and re-synthesize
    * every page once per anchor kind. No UDF, no shuffle. The anchor
    * text is entity-UNESCAPED back to prose — it feeds the token-level
    * index ([[anchorBm25Hosts]]), not the page bytes.
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
        explode(regexp_extract_all(col("html"), lit(AnchorElemPattern), lit(0)))
          .as("el"))
      .select(col("doc_id"), col("src_host"),
        regexp_extract(col("el"), AnyHrefPattern, 1).as("u"),
        Html.unescapeHtml(regexp_extract(col("el"), AnchorTextPattern, 1))
          .as("anchor_text"))
      .select(col("doc_id"), col("src_host"),
        when(isAbs, Domains.urlHost(col("u")))
          .otherwise(col("src_host")).as("dst_host"),
        when(isAbs, regexp_extract(col("u"), AbsPagePattern, 1))
          .otherwise(regexp_extract(col("u"), RelPagePattern, 1))
          .cast("long").as("dst_page"),
        isAbs.as("absolute"),
        col("anchor_text"))
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
    val e = hostEdges(documents).transform(graft.Materialize.iteration)
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
      .transform(graft.Materialize.iteration)
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .transform(graft.Materialize.iteration)
    val pivots = nodes
      .orderBy(graft.functions.HashFunctions.md5Long(col("host"), HcSeed).asc,
        col("host").asc)
      .limit(HcPivots)
      .select(col("host").as("pivot"))
      .transform(graft.Materialize.iteration)
    var dist = pivots.select(col("pivot"), col("pivot").as("host"),
      lit(0).as("d"))
    for (_ <- 1 to HcRounds) {
      val ext = dist.join(e, dist("host") === e("src"))
        .select(col("pivot"), e("dst").as("host"), (col("d") + 1).as("d"))
      dist = dist.unionAll(ext)
        .groupBy("pivot", "host").agg(min("d").as("d"))
        .transform(graft.Materialize.iteration)
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
    val e = hostEdges(documents).transform(graft.Materialize.iteration)
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
    val e = hostEdges(documents).transform(graft.Materialize.iteration)
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

  // ------------------------------------------------------------------
  // Anchor-text retrieval (r16)
  // ------------------------------------------------------------------

  /** Host pool of the anchor-BM25 ranking (small: hosts are the bounded
    * key — ~2·64·|sources| under this grammar, millions at 100 TB).
    */
  val AnchorHostK = 20

  /** The anchor-text INDEX rows: every CROSS-HOST anchor's unescaped,
    * lowercased tokens keyed by TARGET host — what real web ranking
    * indexes (anchor text describes the page it points AT, not the page
    * it sits on; same-host anchors are nav chrome and are excluded by
    * the [[hostEdges]] rule). Under the r16 grammar the cross-host
    * anchor is the teaser (`next` + the source page's leading prose), so
    * the index carries real corpus tokens.
    *
    * Shape: the [[links]] single-pass extraction (the SAME pass the edge
    * list reads — anchor text rides the already-captured elements), one
    * explode, scan speed. At 100 TB this is the per-fetch anchor log a
    * crawler already materializes.
    */
  private[operators] def anchorTokens(documents: DataFrame): DataFrame =
    links(documents)
      .where(col("dst_host") =!= col("src_host"))
      .select(col("dst_host").as("host"),
        explode(TextAnalysis.lowToks(col("anchor_text"))).as("tok"))
      .where(col("tok") =!= "")

  /** The anchor-term INDEX frame — (host, tok, tf) over the FULL anchor
    * vocabulary (not just one query's terms): what a web index
    * materializes at crawl time and every retrieval reads. This is the
    * artifact [[AnchorStore]] persists; the fresh path builds it
    * inline. One map-side-combined hash-agg over the anchor log,
    * bounded by |hosts| × anchor vocabulary.
    */
  def anchorTermIndex(documents: DataFrame): DataFrame =
    anchorTokens(documents).groupBy("host", "tok").agg(count(lit(1)).as("tf"))

  /** Visible-prose tokens kept on EACH side of an anchor element — the
    * ±N context window a crawl-scale retrieval index stores next to the
    * anchor text itself (anchor text says what the TARGET is; the words
    * around it say what the source was TALKING ABOUT when it linked).
    */
  val AnchorContextTokens = 3

  /** One row per anchor WITH its ±[[AnchorContextTokens]] context
    * windows: (doc_id, src_host, dst_host, absolute, anchor_text,
    * ctx_before, ctx_after). The window is defined on the page's visible
    * prose: split the page at the anchor element's first occurrence
    * (elements are unique within a page under the grammar — a real
    * pipeline's positioned tokenizer removes that precondition), strip
    * script/style bodies then tags from each half, entity-unescape,
    * tokenize like [[TextAnalysis]]'s lowToks, and keep the last /
    * first N non-empty tokens. Everything is codegen'd builtins on a
    * per-page axis — no corpus state, no shuffle, and the DuckDB oracle
    * replays the identical strpos/strip/slice chain.
    */
  def anchorContexts(documents: DataFrame): DataFrame =
    anchorContextsRaw(Html.withFixtures(graft.Parallelism.ensure(documents)))

  private[operators] def anchorContextsRaw(frame: DataFrame): DataFrame = {
    def visible(x: Column): Column =
      filter(
        TextAnalysis.lowToks(Html.unescapeHtml(regexp_replace(
          regexp_replace(x, Html.ScriptStylePattern, " "),
          "<[^>]*>", " "))),
        t => t =!= "")
    val isAbs = col("u").startsWith("https://")
    pagesRaw(frame)
      .select(col("doc_id"), col("host").as("src_host"), col("html"),
        explode(regexp_extract_all(col("html"), lit(AnchorElemPattern), lit(0)))
          .as("el"))
      .select(col("doc_id"), col("src_host"),
        regexp_extract(col("el"), AnyHrefPattern, 1).as("u"),
        Html.unescapeHtml(regexp_extract(col("el"), AnchorTextPattern, 1))
          .as("anchor_text"),
        visible(expr("substring(html, 1, instr(html, el) - 1)")).as("tb"),
        visible(expr("substring(html, instr(html, el) + length(el))")).as("ta"))
      .select(col("doc_id"), col("src_host"),
        when(isAbs, Domains.urlHost(col("u")))
          .otherwise(col("src_host")).as("dst_host"),
        isAbs.as("absolute"),
        col("anchor_text"),
        expr(s"slice(tb, greatest(size(tb) - $AnchorContextTokens + 1, 1), " +
          s"$AnchorContextTokens)").as("ctx_before"),
        expr(s"slice(ta, 1, $AnchorContextTokens)").as("ctx_after"))
  }

  /** The context-EXTENDED anchor-term index — (host, tok, tf) where each
    * cross-host anchor contributes its anchor-text tokens AND its ±N
    * context-window tokens to the TARGET host's bag (the standard
    * anchor-context retrieval index; scoring stays
    * [[anchorBm25FromIndex]]). Same shape and bounds as
    * [[anchorTermIndex]] — one map-side-combined hash-agg, ≤ (2N +
    * anchor-len) tokens per anchor.
    */
  def anchorContextTermIndex(documents: DataFrame): DataFrame =
    termIndexOfContexts(anchorContexts(documents))

  /** The context index of an arriving shard ALONE — no markup fixtures
    * (those are stable pages of the base crawl, already in the stored
    * base index; a shard contributes only its own pages). This is the
    * only thing the incremental stored path parses.
    */
  private[graft] def anchorContextTermIndexShard(documents: DataFrame): DataFrame =
    termIndexOfContexts(anchorContextsRaw(graft.Parallelism.ensure(documents)))

  /** The (host, tok, tf) rollup of a context frame — shared by the full
    * build and the shard-only incremental build so both count the same
    * way (tf is a per-page additive count: base ⊎ shard ≡ full).
    */
  private def termIndexOfContexts(ctx: DataFrame): DataFrame =
    ctx
      .where(col("dst_host") =!= col("src_host"))
      .select(col("dst_host").as("host"),
        explode(concat(
          filter(TextAnalysis.lowToks(col("anchor_text")), t => t =!= ""),
          col("ctx_before"), col("ctx_after"))).as("tok"))
      .groupBy("host", "tok").agg(count(lit(1)).as("tf"))

  /** BM25 over the anchor-text index — `q_anchor_bm25`'s anchor side:
    * each host's "document" is the bag of anchor tokens pointing at it;
    * scoring is [[TextAnalysis.bm25TopK]]'s exact integer-ratio form
    * (constants imported, not copied) with the host as the document
    * key, top-k hosts by (score DESC, host ASC). ONE scoring definition
    * ([[anchorBm25FromIndex]]) serves the fresh build and the
    * [[AnchorStore]] stored read — tf/dl are exact longs either way, so
    * the two are hash-identical and share one oracle.
    */
  def anchorBm25Hosts(
      documents: DataFrame, terms: Seq[String] = TextAnalysis.Bm25Query,
      k: Int = AnchorHostK): DataFrame =
    anchorBm25FromIndex(anchorTermIndex(documents), terms, k)

  /** The scoring tail over an explicit (host, tok, tf) index frame.
    *
    * Shape: the index is checkpointed once (it feeds the length frame
    * and the tf filter); everything after the `tok IN query` filter is
    * host-bounded — df/scalars broadcast back exactly like the text
    * BM25. `dl = Σ tf` equals the raw token count by construction.
    */
  def anchorBm25FromIndex(
      index: DataFrame, terms: Seq[String] = TextAnalysis.Bm25Query,
      k: Int = AnchorHostK): DataFrame = {
    import TextAnalysis.{Bm25K1Num, Bm25K1Den, Bm25BNum, Bm25BDen}
    require(terms.nonEmpty)
    val at = index.transform(graft.Materialize.iteration) // feeds dl + tf
    val dl = at.groupBy("host").agg(sum("tf").as("dl"))
    val scalars = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("s_tok"))
    val tf = at.where(col("tok").isInCollection(terms))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val numF = (Bm25K1Num + Bm25K1Den) * Bm25BDen        // 20
    val denTf = Bm25K1Den * Bm25BDen                     // 8
    val denS = Bm25K1Num * (Bm25BDen - Bm25BNum)         // 3
    val denDl = Bm25K1Num * Bm25BNum                     // 9
    val core = (col("tf") * numF * col("s_tok")).cast("double") /
      (col("tf") * denTf * col("s_tok") + lit(denS.toLong) * col("s_tok") +
        lit(denDl.toLong) * col("dl") * col("n_docs")).cast("double")
    val idf = col("n_docs").cast("double") / (col("df") + lit(1L)).cast("double")
    val perTerm = tf
      .join(dl, "host")
      .join(broadcast(dfq), "tok")
      .crossJoin(broadcast(scalars))
      .select(col("host"), col("tok"), (core * idf).as("ts"))
    val score = terms
      .map(t => coalesce(max(when(col("tok") === t, col("ts"))), lit(0.0)))
      .reduceLeft(_ + _)
    perTerm.groupBy("host")
      .agg(score.as("score"))
      .orderBy(desc("score"), asc("host"))
      .limit(k)
  }

  /** The anchor ranking EXPANDED to documents for rank fusion: hosts
    * ranked 1..[[AnchorHostK]] by [[anchorBm25Hosts]], every corpus doc
    * on a ranked host pooled by (host_rank ASC, doc_id ASC) and cut at
    * `poolK` — the host-level anchor signal transferred to the pages
    * that live there (the curation-prior move, like
    * [[authorityBySource]]). The pool cut is a TakeOrdered (distributed
    * heap, never a corpus sort); the 1..poolK rank window runs over
    * ≤ poolK rows (the `bm25Ranks` single-task detail).
    */
  def anchorDocRanks(documents: DataFrame, poolK: Int): DataFrame =
    anchorDocRanksFrom(documents, anchorBm25Hosts(documents), poolK)

  /** [[anchorDocRanks]] over an explicit (host, score) anchor ranking —
    * the seam the [[AnchorStore]] stored path plugs into.
    */
  private[operators] def anchorDocRanksFrom(
      documents: DataFrame, hosts: DataFrame, poolK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hostRanks = hosts
      .select(col("host"), row_number().over(
        Window.orderBy(desc("score"), asc("host"))).as("host_rank"))
    val docs = documents.select(col("doc_id"),
      Domains.hostOf(col("doc_id"), col("source")).as("host"))
    val pool = docs.join(broadcast(hostRanks), "host")
      .orderBy(asc("host_rank"), asc("doc_id"))
      .limit(poolK)
    pool
      .select(col("doc_id").as("neighbor_id"),
        row_number().over(
          Window.orderBy(asc("host_rank"), asc("doc_id"))).as("rank"))
  }

  // ------------------------------------------------------------------
  // Stored-rank staleness (r16) and the TrustRank spam gate
  // ------------------------------------------------------------------

  /** A host's rank is "shifted" iff |fresh − stored| · this > stored. */
  val StaleShiftDenom = 8L

  /** Rebuild verdict: total shifted mass · this > total stored mass. */
  val StaleRebuildDenom = 4L

  /** STORED-RANK STALENESS card — `q_link_rank_stale` (the
    * `q_ann_stale` framing applied to [[RankStore]]): what happens to
    * the persisted host ranks when the crawl GROWS — the first question
    * the stored-artifact design raises ("stored is 4-6× faster — until
    * when?"). The drifted crawl doubles the page set deterministically
    * (the ann card's even/odd idiom: base pages re-keyed to 2·id, grown
    * replica at 2·id+1), so host mass redistributes over the bounded
    * host set, a few tail hosts vanish, new tail hosts appear, and the
    * frontier grows — all exactly replayable in DuckDB because page
    * synthesis, anchor parsing, and the integer PageRank are the shared
    * grammar.
    *
    * One row per host status bucket (`stable` / `shifted` /
    * `new_host` / `vanished`, by the [[StaleShiftDenom]] relative-shift
    * rule) with host counts, stored/fresh rank mass, and absolute shift
    * mass (new/vanished hosts count their whole rank as shift); plus
    * the frontier sizes of both crawls (distinct uncrawled targets) and
    * the [[StaleRebuildDenom]] rebuild verdict over total shifted mass.
    *
    * Shape: stored ranks are READ (zero jobs — the stored-artifact
    * point); the drifted crawl pays one anchor extraction (checkpointed
    * — it feeds the edge rollup and the frontier) plus the
    * host-bounded rank iteration; the base frontier pays one more
    * extraction; every comparison frame is host-bounded.
    */
  def rankStalenessCard(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val stored = RankStore.ranks(spark, dir)
      .select(col("host"), col("pr").as("pr_stored"))
    val drifted = docs
      .select((col("doc_id") * 2).as("doc_id"), col("source"), col("text"))
      .unionAll(docs.select((col("doc_id") * 2 + 1).as("doc_id"),
        col("source"), col("text")))
    val lFresh = links(drifted).transform(graft.Materialize.iteration) // edges + frontier
    val fresh = GraphAnalytics.pageRank(
      edgesFromLinks(lFresh).select(col("src_host").as("src"),
        col("dst_host").as("dst"), col("n_links").as("w")))
      .select(col("id").as("host"), col("pr").as("pr_fresh"))
    val j = stored.join(fresh, Seq("host"), "full_outer")
    val status = when(col("pr_stored").isNull, "new_host")
      .when(col("pr_fresh").isNull, "vanished")
      .when(abs(col("pr_fresh") - col("pr_stored")) * StaleShiftDenom >
        col("pr_stored"), "shifted")
      .otherwise("stable")
    val shift = when(col("pr_stored").isNull, col("pr_fresh"))
      .when(col("pr_fresh").isNull, col("pr_stored"))
      .otherwise(abs(col("pr_fresh") - col("pr_stored")))
    val g = j
      .select(status.as("status"),
        coalesce(col("pr_stored"), lit(0L)).as("prs"),
        coalesce(col("pr_fresh"), lit(0L)).as("prf"), shift.as("sh"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_hosts"), sum("prs").as("sum_pr_stored"),
        sum("prf").as("sum_pr_fresh"), sum("sh").as("shift_abs"))
      .transform(graft.Materialize.iteration) // ≤ 4 rows; feeds the totals and the card
    val tot = g.agg(sum("shift_abs").as("tot_shift"),
      sum("sum_pr_stored").as("tot_stored"))
    g.crossJoin(broadcast(tot))
      .crossJoin(broadcast(
        frontierTotal(links(docs), docs).select(col("n").as("n_frontier_stored"))))
      .crossJoin(broadcast(
        frontierTotal(lFresh, drifted).select(col("n").as("n_frontier_fresh"))))
      .select(col("status"), col("n_hosts"), col("sum_pr_stored"),
        col("sum_pr_fresh"), col("shift_abs"),
        col("n_frontier_stored"), col("n_frontier_fresh"),
        (col("tot_shift") * StaleRebuildDenom > col("tot_stored")).as("rebuild"))
  }

  /** Total frontier size of a crawl — distinct uncrawled (host, page)
    * targets (the [[frontier]] card's grand total; NULL target pages —
    * impossible under this grammar — are outside the count, matching
    * `q_link_frontier`).
    */
  private def frontierTotal(l: DataFrame, corpus: DataFrame): DataFrame = {
    val ids = Html.withFixtures(graft.Parallelism.ensure(corpus))
      .select(col("doc_id").as("t")).distinct()
    l.join(ids, l("dst_page") === ids("t"), "left")
      .where(col("t").isNull && col("dst_page").isNotNull)
      .agg(countDistinct(
        concat(col("dst_host"), lit("|"), col("dst_page").cast("string")))
        .as("n"))
  }

  /** "High rank": pr · n_nodes > this · PrQ (≥ 2× the uniform share). */
  val SpamRankMult = 2L

  /** "Low trust": trust · this < pr (trust under ¼ of rank mass). */
  val SpamTrustMult = 4L

  /** The TrustRank DEMOTION set — hosts whose PageRank the trusted seed
    * set cannot vouch for (Gyöngyi et al.'s spam-mass rule: high
    * [[hostRank]] authority, low [[trustRank]] trust): pr at least
    * [[SpamRankMult]]× the uniform share AND trust · [[SpamTrustMult]]
    * < pr. Seeds are the hosts of the lexicographically first DOCUMENT
    * source (the whitelist a real deployment plugs in). Both rank
    * frames run over ONE checkpointed edge list; output is
    * host-bounded.
    */
  def spamHosts(documents: DataFrame): DataFrame = {
    val e = hostEdges(documents).transform(graft.Materialize.iteration)
    val edges = e.select(col("src_host").as("src"), col("dst_host").as("dst"),
      col("n_links").as("w"))
    val docsH = documents.select(col("source"),
      Domains.hostOf(col("doc_id"), col("source")).as("host"))
    val seedSrc = docsH.agg(min("source").as("ssrc")) // 1-row broadcast
    val seeds = docsH.crossJoin(broadcast(seedSrc))
      .where(col("source") === col("ssrc"))
      .select(col("host").as("id")).distinct()
    // ONE fused BSP loop for both vectors (half the supersteps, and the
    // rank⋈trust re-join disappears — both columns ride the same row);
    // bit-identical to the two-loop form, see GraphAnalytics.rankAndTrust
    val rt = GraphAnalytics.rankAndTrust(edges, seeds)
      .select(col("id").as("host"), col("pr"), col("trust"))
    val n = rt.agg(count(lit(1)).as("n_nodes"))
    rt.crossJoin(broadcast(n))
      .where(col("pr") * col("n_nodes") >
          lit(SpamRankMult) * lit(GraphAnalytics.PrQ) &&
        coalesce(col("trust"), lit(0L)) * SpamTrustMult < col("pr"))
      .select("host")
  }
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

/** Session-persisted anchor-text INDEX — the retrieval-side stored
  * artifact of the link family on the shared
  * [[graft.sources.ArtifactStore]] kernel: a web index materializes
  * (host, term, tf) at crawl time, once, and every query reads the
  * index instead of re-synthesizing pages and re-parsing anchors.
  * tf/dl are exact longs, so the parquet round-trip is bit-exact and
  * `q_anchor_bm25_stored` shares `q_anchor_bm25`'s oracle verbatim
  * (the [[RankStore]] argument).
  */
object AnchorStore {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types._

  private val store = new graft.sources.ArtifactStore[String]("anchortf")

  private val schema = StructType(Seq(
    StructField("host", StringType),
    StructField("tok", StringType),
    StructField("tf", LongType)))

  /** The persisted (host, tok, tf) anchor-term index for `dir`, built on
    * first call — full anchor vocabulary, so ANY term query serves from
    * the same artifact.
    */
  def index(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schema).parquet(store.getOrBuild(dir) { out =>
      LinkGraph.anchorTermIndex(graft.Tables.documents(spark, dir))
        .write.mode("overwrite").parquet(out)
    })

  /** The anchor-side host ranking under the STORED index — zero page
    * synthesis, zero anchor parsing on the query path.
    */
  def anchorBm25Hosts(
      spark: SparkSession, dir: String,
      terms: Seq[String] = TextAnalysis.Bm25Query,
      k: Int = LinkGraph.AnchorHostK): DataFrame =
    LinkGraph.anchorBm25FromIndex(index(spark, dir), terms, k)

  /** Times the index for `dir` has been BUILT (not read) — spec hook. */
  def builds(dir: String): Int = store.builds(dir)

  private val ctxStore = new graft.sources.ArtifactStore[String]("anchorctx")

  /** The persisted CONTEXT-EXTENDED anchor index (r17): same (host, tok,
    * tf) schema, tokens = anchor text ∪ the ±N visible-prose window
    * around each anchor ([[LinkGraph.anchorContextTermIndex]]) — what a
    * production crawl index actually stores, built once at crawl time.
    */
  def contextIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schema).parquet(ctxStore.getOrBuild(dir) { out =>
      LinkGraph.anchorContextTermIndex(graft.Tables.documents(spark, dir))
        .write.mode("overwrite").parquet(out)
    })

  /** Host ranking under the STORED context index — zero page synthesis,
    * zero anchor/window parsing on the query path; scoring shared with
    * the inner-text path ([[LinkGraph.anchorBm25FromIndex]]).
    */
  def anchorCtxBm25Hosts(
      spark: SparkSession, dir: String,
      terms: Seq[String] = TextAnalysis.Bm25Query,
      k: Int = LinkGraph.AnchorHostK): DataFrame =
    LinkGraph.anchorBm25FromIndex(contextIndex(spark, dir), terms, k)

  /** Times the context index for `dir` has been BUILT — spec hook. */
  def ctxBuilds(dir: String): Int = ctxStore.builds(dir)

  private val ctxBaseStore =
    new graft.sources.ArtifactStore[String]("anchorctxbase")

  /** The persisted BASE-CRAWL context index: pages below the ingest
    * split (plus the markup fixtures — stable pages of any crawl),
    * parsed and indexed ONCE. The incremental query path never touches
    * these pages again.
    */
  private[graft] def ctxBaseIndex(
      spark: SparkSession, dir: String, split: Long): DataFrame =
    spark.read.schema(schema).parquet(ctxBaseStore.getOrBuild(dir) { out =>
      LinkGraph.anchorContextTermIndex(
        graft.Tables.documents(spark, dir)
          .where(org.apache.spark.sql.functions.col("doc_id") < split))
        .write.mode("overwrite").parquet(out)
    })

  /** INCREMENTAL context retrieval — the continuous-crawl twin of
    * [[anchorCtxBm25Hosts]]: only the arriving shard (docs at/above the
    * ingest split) is parsed; its term counts merge ADDITIVELY with the
    * stored base index (tf is a per-page count and page extraction is
    * row-local, so base ⊎ shard ≡ full rebuild EXACTLY — the merged
    * ranking shares the fresh path's oracle verbatim), and one BM25
    * scoring pass runs over the merged index. Per-batch cost is
    * O(shard parse + index merge), never a corpus re-parse.
    */
  def anchorCtxBm25Incremental(
      spark: SparkSession, dir: String,
      terms: Seq[String] = TextAnalysis.Bm25Query,
      k: Int = LinkGraph.AnchorHostK): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum}
    val docs = graft.Tables.documents(spark, dir)
    Dedup.ingestSplitOf(docs) match {
      case None => anchorCtxBm25Hosts(spark, dir, terms, k) // empty corpus
      case Some(split) =>
        val merged = ctxBaseIndex(spark, dir, split)
          .unionByName(LinkGraph.anchorContextTermIndexShard(
            docs.where(col("doc_id") >= split)))
          .groupBy("host", "tok").agg(sum("tf").as("tf"))
        LinkGraph.anchorBm25FromIndex(merged, terms, k)
    }
  }

  /** Times the base context index for `dir` has been BUILT — spec hook. */
  def ctxBaseBuilds(dir: String): Int = ctxBaseStore.builds(dir)

  private val ctxPubStore =
    new graft.sources.ArtifactStore[String]("anchorctxpub")

  /** PUBLISH/compaction — the end of the incremental lifecycle: fold the
    * arriving shard's counts into the stored base and persist the merged
    * index as the NEXT base-crawl artifact (what a periodic index-publish
    * job ships; the next ingest batch probes this, closing the
    * probe → publish → probe loop). Returns the published artifact's
    * per-host rollup (host, n_terms, dl) READ BACK FROM THE ARTIFACT, so
    * the card verifies the parquet round-trip and the additive-compaction
    * contract (published ≡ full rebuild) against the full-corpus oracle.
    * Publish cost is the shard parse + one index-sized merge — the base
    * pages are never re-parsed.
    */
  def publishCtxBase(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, countDistinct, sum}
    val docs = graft.Tables.documents(spark, dir)
    val published = Dedup.ingestSplitOf(docs) match {
      case None => contextIndex(spark, dir) // empty corpus: nothing to fold
      case Some(split) =>
        spark.read.schema(schema).parquet(ctxPubStore.getOrBuild(dir) { out =>
          ctxBaseIndex(spark, dir, split)
            .unionByName(LinkGraph.anchorContextTermIndexShard(
              docs.where(col("doc_id") >= split)))
            .groupBy("host", "tok")
            .agg(sum("tf").as("tf"))
            .write.mode("overwrite").parquet(out)
        })
    }
    published.groupBy("host")
      .agg(countDistinct(col("tok")).as("n_terms"), sum("tf").as("dl"))
  }

  /** Times the published context index for `dir` has been BUILT. */
  def ctxPubBuilds(dir: String): Int = ctxPubStore.builds(dir)
}
