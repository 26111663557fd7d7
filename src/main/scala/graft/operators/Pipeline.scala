package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The canonical training-data retention pipeline, composed end-to-end from
  * the library's own operators:
  *
  *   1. quality gate — ≥ 10 whitespace tokens and ≥ 1 stopword (the
  *      [[TextAnalysis.docStats]] `is_quality` rule), evaluated as a pure
  *      projection filter so it runs at scan speed: no aggregation, no
  *      shuffle, just the parquet scan feeding a codegen'd predicate;
  *   2. exact dedup — keep each normalized text's minimum doc_id
  *      ([[Dedup.exactDuplicates]]), one hash-agg + a semi join back;
  *   3. near-dup dedup — cluster the survivors' MinHash+LSH pair graph
  *      ([[Dedup.nearDupClusters]]) and keep only cluster representatives
  *      (doc_id == cluster_id).
  *
  * Order matters at scale: each stage shrinks the corpus the next (more
  * expensive) stage sees, and running exact dedup BEFORE LSH is what keeps
  * identical-text clusters from forming degenerate LSH buckets (see
  * [[Dedup.dropOversizedBuckets]]). The survivor set is materialized once
  * (`localCheckpoint`; a staged table on a cluster) because the clustering
  * and the final semi join both consume it.
  */
object Pipeline {

  /** Per-SOURCE curation rollup — the dashboard a data-curation team
    * watches per ingest feed: document count, how many of a source's docs
    * are corpus-wide exact duplicates (fp_md5 seen > 1×, the cross-source
    * contamination signal), language spread, and exact token totals /
    * mean. Everything downstream of two hash-aggs: a corpus-wide fp
    * count (state = one row per distinct text) joined back on fp, then a
    * per-source agg with map-side combine — both keys near-uniform, so
    * the 100 TB shuffle carries (fp, count) pairs and per-source partial
    * states, never documents.
    */
  def sourceCurationStats(documents: DataFrame): DataFrame = {
    val withFp = graft.Parallelism.ensure(documents).select(
      col("doc_id"), col("source"), col("lang"),
      md5(TextAnalysis.normalized(col("text"))).as("fp"),
      size(split(trim(col("text")), "\\s+")).as("n_toks"))
    val fpCounts = withFp.groupBy("fp").agg(count(lit(1)).as("n_copies"))
    withFp.join(fpCounts, "fp")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_toks").cast("long")).as("total_tokens"))
      .withColumn("avg_tokens",
        col("total_tokens").cast("double") / col("n_docs"))
  }

  /** Source×source near-dup contamination matrix — which ingest feeds
    * overlap: for every near-duplicate pair, the (unordered) pair of
    * sources its endpoints came from, rolled up to pair counts. The
    * question this answers — "is crawl B mostly a re-crawl of crawl A?" —
    * decides whether a new feed is worth its processing cost, and the
    * diagonal (same-source pairs) is the feed's internal duplication.
    *
    * `src_a <= src_b` lexicographically, so (A,B) and (B,A) collapse to
    * one cell and the matrix is upper-triangular — deterministic
    * regardless of which endpoint the pair miner put first.
    *
    * Shape: the pair set (banded equi-join, never all-pairs) joined twice
    * to the slim (doc_id, source) projection — both joins keyed by doc
    * id, each carrying 2 longs + a short string — then a hash-agg to
    * |sources|² rows, map-side combined. At 100 TB the pair set, not this
    * rollup, is the cost; the matrix adds two slim shuffles of the pairs.
    */
  def sourceOverlapMatrix(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("source_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("source_b")), "doc_b")
      .select(
        least(col("source_a"), col("source_b")).as("src_a"),
        greatest(col("source_a"), col("source_b")).as("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Quality-ranked cluster keepers — the retention policy production
    * pipelines actually run: within each near-dup cluster keep the HIGHEST
    * QUALITY member (here: most whitespace tokens, the same signal the
    * weighted sampler uses), not the smallest id — the min-id rule is the
    * right CLUSTER LABEL but the wrong survivor when copies differ (the
    * longest copy of a templated page is usually the full one). Ties break
    * to the smallest doc_id, keeping the choice total and deterministic.
    *
    * Portable argmax: per-cluster (size, max quality) in one hash-agg,
    * then min doc_id among the members achieving the max — two keyed aggs
    * and a join, no engine-specific argmax/struct-ordering semantics to
    * replicate in the oracle. All shuffles are keyed by cluster_id, so the
    * partitioning is computed once and reused.
    */
  def bestOfClusterKeepers(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = Dedup.clustersFromPairs(documents, pairs)
      .select("doc_id", "cluster_id")
    val withQ = clusters.join(
      documents.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks")),
      "doc_id")
    val stats = withQ.groupBy("cluster_id").agg(
      count(lit(1)).as("n_members"), max("n_toks").as("best_toks"))
    withQ.join(stats, "cluster_id")
      .where(col("n_toks") === col("best_toks"))
      .groupBy("cluster_id", "best_toks", "n_members")
      .agg(min("doc_id").as("keeper_id"))
      .select("cluster_id", "keeper_id", "best_toks", "n_members")
  }

  /** `sigTable`: a persisted [[Dedup.shingleSignatureTable]] frame (see
    * [[Dedup$ SignatureStore]]). When present, the near-dup stage probes
    * the stored per-document signatures semi-joined down to the survivor
    * set instead of re-shingling survivor text — the production shape
    * (signatures are an ingest-time artifact; retention is one of several
    * consumers) and the reason this pipeline's cost no longer includes the
    * corpus-wide shingling pass. Output is identical either way: a doc's
    * signature does not depend on which other docs survived.
    */
  def retainedCorpus(
      documents: DataFrame, threshold: Double = 0.5,
      sigTable: Option[DataFrame] = None): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val nStopwords = size(filter(toks, t => t.isin(TextAnalysis.Stopwords: _*)))
    val quality = documents.where(size(toks) >= 10 && nStopwords > 0)
    val exactKeepers = Dedup.exactDuplicates(quality)
      .select(col("keeper_id").as("doc_id"))
    // with a signature table, nothing downstream reads survivor TEXT (the
    // near-dup stage probes stored shingles/signatures) — so the
    // materialized survivor set carries only (doc_id, lang), not the
    // corpus bytes; the from-text fallback still needs the text column
    val survivorCols =
      if (sigTable.isDefined) Seq(col("doc_id"), col("lang"))
      else Seq(col("doc_id"), col("lang"), col("text"))
    val survivors = quality
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .select(survivorCols: _*)
      .transform(graft.Materialize.iteration)
    val pairs = sigTable match {
      case Some(tbl) =>
        // mine pairs on the FULL store (its ingest-time group_id/members
        // columns stay valid — they describe the whole frame), then
        // restrict both ENDPOINTS to survivors. Exact: a pair's verdict
        // (jaccard of the two docs) does not depend on which other docs
        // survived, so all-pairs ∩ survivors² == survivor pairs. This is
        // also the production shape — the corpus pair set is mined once
        // and every retention policy filters it, rather than re-mining
        // per policy.
        Dedup.nearDuplicatePairsFromTable(tbl, threshold)
          .join(survivors.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
          .join(survivors.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
          .select(col("doc_a"), col("doc_b"))
      case None =>
        Dedup.nearDuplicatePairs(survivors, threshold)
          .select(col("doc_a"), col("doc_b"))
    }
    val keepers = Dedup.clustersFromPairs(survivors, pairs)
      .where(col("doc_id") === col("cluster_id"))
      .select("doc_id")
    survivors.join(keepers, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"))
  }

  /** [[selectBestPerSource]] keeps the top 1/SelectBestDenom of each
    * source by classifier score.
    */
  val SelectBestDenom: Long = 10L

  /** Budgeted DATA SELECTION: per source, keep the top ⌈n/10⌉ documents
    * by ([[TextAnalysis.classifierScore]] DESC, doc_id ASC) — the
    * "train on the best decile of each feed" step (DSIR/phi-style
    * quality selection with per-source budgets, so one huge low-quality
    * feed cannot crowd out the long tail). Emits the per-source
    * selection card: population, selected count, the score CUTOFF the
    * selection implies (the number to compare across snapshots), and
    * selected-token totals.
    *
    * The rank is a total order (score ties break on doc_id), so the
    * selected SET is deterministic and engine-portable; the fractional
    * budget ⌈n/10⌉ is an integer cross-multiplication. The oracle pins
    * the semantics as the obvious per-source window rank; the engine
    * computes the SAME selection by counting instead of sorting —
    * selection is an order statistic, and scores are small integers, so
    * the k-th largest per source falls out of a per-(source, score)
    * histogram without ever sorting documents:
    *
    *   1. histogram — one map-side-combined hash-agg to
    *      (source, score) → (count, token sum); output is bounded by
    *      |sources| × |score range|, tiny at any corpus size;
    *   2. cutoff — a descending cumulative window over that TINY frame
    *      finds the k-th-largest score and the strictly-above totals;
    *   3. ties — only documents AT the cutoff score (the one tie group
    *      per source) are ranked by doc_id to fill the remaining
    *      budget; that shuffle carries tie rows, not the corpus.
    *
    * vs the naive per-source sort (one task sorts its whole source —
    * measured 7.3× for 10× data, pure sort growth), every
    * corpus-proportional step here is a scan or a map-side-combined
    * agg; the only per-document window runs inside cutoff tie groups.
    * The rollup output is |sources| rows.
    */
  def selectBestPerSource(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.classifierScore(documents).transform(graft.Materialize.iteration)
    val cumW = Window.partitionBy("source").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = scored.groupBy("source", "score")
      .agg(count(lit(1)).as("n"), sum("n_toks").as("toks"))
      .withColumn("cum_n", sum("n").over(cumW))
      .withColumn("cum_toks", sum("toks").over(cumW))
      .withColumn("n_docs",
        sum("n").over(Window.partitionBy("source")))
      .withColumn("k", expr(s"(n_docs + ${SelectBestDenom - 1}) DIV $SelectBestDenom"))
    // the cutoff row: the LARGEST score whose cumulative count reaches k
    // (cum_n - n < k <= cum_n); everything strictly above is taken whole
    val cutoff = hist
      .where(col("cum_n") >= col("k") && col("cum_n") - col("n") < col("k"))
      .select(
        col("source"), col("n_docs"), col("k"), col("score").as("cutoff_score"),
        (col("cum_n") - col("n")).as("n_above"),
        (col("cum_toks") - col("toks")).as("toks_above"),
        (col("k") - (col("cum_n") - col("n"))).as("need"))
      .transform(graft.Materialize.iteration) // tiny: one row per source
    // rank ONLY the cutoff tie group by doc_id to fill the budget
    val tieTaken = scored
      .join(
        broadcast(cutoff.select(
          col("source"), col("cutoff_score"), col("need"))),
        Seq("source"))
      .where(col("score") === col("cutoff_score"))
      .withColumn("tr",
        row_number().over(Window.partitionBy("source").orderBy("doc_id")))
      .where(col("tr") <= col("need"))
      .groupBy("source")
      .agg(sum("n_toks").as("toks_tie"))
    cutoff.join(tieTaken, Seq("source"))
      .select(
        col("source"), col("n_docs"), col("k").as("n_selected"),
        col("cutoff_score"),
        (col("toks_above") + col("toks_tie")).as("n_tokens_selected"))
  }

  /** QUALITY-SIGNAL AGREEMENT card — the `q_dedup_agreement` idea for
    * the quality axis: every document lands in one of the 2³ cells of
    * (classifier keep, high-LM-surprisal, rare-bigram flag), so the card
    * shows how much the three independent detectors agree before a
    * pipeline commits to one (or to their intersection) at 100 TB. A
    * large keep ∧ high-surprisal ∧ rare cell means the classifier admits
    * text the LM signals are united against — the cell to audit first.
    *
    * The LM flag is corpus-relative: a doc is high-surprisal iff its
    * avg_nll_f exceeds the mean over scored docs, tested by integer
    * cross-multiplication (`avg·n_scored > Σavg`; avg_nll_f ~ 2²² and
    * n_scored ≤ 2⁴⁰ keep the product far inside int64). Evidence-less
    * docs (no bigrams) are never LM-flagged — they are the length
    * filter's business. Output: ≤ 8 rows.
    *
    * Shape: three per-doc signal frames (each individually scan-shaped
    * and oracle-checked as its own query), two doc_id-keyed joins, a
    * 1-row mean broadcast, and an ≤ 8-cell rollup.
    */
  def qualityAgreement(documents: DataFrame): DataFrame = {
    // REP-COLLAPSED end to end (r14): all three signals are pure
    // functions of lowercased text, so the whole card runs over DISTINCT
    // content — ONE shared grouping, per-rep signal frames, rep-keyed
    // joins, and cell counts recovered exactly as Σm. Documents are
    // never fanned back out; the previous per-doc form was the suite's
    // worst second decade (8.0×/decade at sf10) precisely because every
    // replicated copy re-paid the bigram pipeline and three doc-keyed
    // joins. Corpus-relative stats (the LM mean) use the same m-weighted
    // sums, so the 8 output cells are bit-identical to the per-doc form.
    val (_, reps) = TextAnalysis.contentGroups(documents) // reps checkpointed there, read 3×
    // ONE bigram count kernel for both LM signals (r17) — previously each
    // signal re-exploded and re-aggregated the same bigrams
    val counts = Some(TextAnalysis.bigramCountsByRep(reps))
    val cls = reps.select(col("rep"),
      (TextAnalysis.classifierScoreOf(col("lt")) > 0).as("cls_keep"))
    val lm = TextAnalysis.lmSurprisalByRep(reps, counts)
      .select(col("rep"), col("m"), col("n_bigrams"), col("avg_nll_f"))
    val rare = TextAnalysis.rareBigramRateByRep(reps, counts)
      .select(col("rep"), col("flagged").as("rare_flag"))
    val lmTot = lm.where(col("n_bigrams") > 0)
      .agg(sum("m").as("n_scored"),
        sum(col("avg_nll_f") * col("m")).as("sum_avg"))
    cls.join(lm, Seq("rep"))
      .join(rare, Seq("rep"))
      .crossJoin(broadcast(lmTot))
      .withColumn("lm_flag",
        col("n_bigrams") > 0 &&
          col("avg_nll_f") * col("n_scored") > col("sum_avg"))
      .groupBy("cls_keep", "lm_flag", "rare_flag")
      .agg(sum("m").as("n"))
  }

  /** The one-row corpus DATASHEET — the summary card a dataset release
    * ships (Datasheets for Datasets, Gebru et al. 2021): population,
    * token/char volume, source and language breadth, the split
    * allocation, and how much of the corpus the quality classifier
    * keeps. One number per axis, cheap enough to recompute per
    * snapshot and diff.
    *
    * Shape: ONE scan — every per-row column (token count, split CASE,
    * classifier fold) is a codegen'd projection — into one global
    * aggregate. The two COUNT(DISTINCT) axes make Catalyst plan an
    * Expand (3× map-side rows), but every path combines map-side and
    * the shuffle carries partial states only; there is no second pass
    * over the data. Output: exactly one row.
    */
  def corpusDatasheet(documents: DataFrame): DataFrame =
    graft.Parallelism.ensure(documents)
      .select(
        col("source"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        size(filter(split(trim(lower(graft.functions.TextFunctions.nfc(col("text")))), "\\s+"), x => x =!= ""))
          .cast("long").as("n_toks"),
        Splits.splitOf(col("doc_id")).as("split"),
        (TextAnalysis.classifierScoreOf(col("text")) > 0).as("cls_keep"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        countDistinct("source").as("n_sources"),
        countDistinct("lang").as("n_langs"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
        sum(when(col("cls_keep"), 1L).otherwise(0L)).as("n_cls_keep"))

  /** Reciprocal-rank-fusion constant (Cormack et al., SIGIR 2009: 60 is
    * the canonical choice) and the fused list's cut.
    */
  val RrfC = 60
  val RrfK = 20

  /** HYBRID retrieval: reciprocal-rank fusion of the lexical BM25
    * ranking ([[TextAnalysis.bm25TopK]], fixed term query) and the dense
    * embedding ranking ([[Similarity.bruteForceTopK]], query vector 0 —
    * the corpus ships doc-aligned embeddings, `vec_id = doc_id`) — the
    * standard two-retriever setup where neither score is comparable to
    * the other, so fusion happens on RANKS:
    *   rrf(d) = Σ_lists 1 / (C + rank_list(d)),
    * computed here in exact integer millionths (1000000 div (C + rank),
    * summed) so the fused ordering is bit-portable. Documents reached by
    * only one retriever keep that list's contribution alone — the
    * characteristic RRF behavior that lets a dense-only hit surface.
    *
    * Output: the fused top-[[RrfK]] with both source ranks (NULL where a
    * retriever didn't surface the doc), ordered (rrf desc, doc_id asc).
    *
    * Scale shape: both inputs are already top-`poolK` lists — the fusion
    * operates on 2·poolK rows regardless of corpus size (one tiny
    * full-outer hash join + a TakeOrdered), so the cost IS the two
    * retrievers', each with its own documented scale path (BM25: pruned
    * scan + broadcast df; dense: swap the brute scan for the IVF probe
    * at index scale).
    */
  def hybridRrfTopK(
      documents: DataFrame, embeddings: DataFrame,
      poolK: Int = TextAnalysis.Bm25K, k: Int = RrfK): DataFrame =
    rrfFuse(
      bm25Ranks(documents, poolK),
      Similarity.bruteForceTopK(embeddings, nQueries = 1, k = poolK),
      k)

  /** [[hybridRrfTopK]] with the dense side swapped for the TRAINED IVF
    * probe ([[Similarity.ivfTopK]], the documented at-index-scale dense
    * path) — the same fusion tail, so the "swap the brute scan for the
    * IVF probe at scale" claim is a registered, oracle-checked query
    * rather than a docstring promise. The fused list can differ from the
    * brute variant's exactly where IVF recall differs — which is the
    * trade the recall report (`q_ann_recall`) prices.
    */
  def hybridRrfIvfTopK(
      documents: DataFrame, embeddings: DataFrame,
      poolK: Int = TextAnalysis.Bm25K, k: Int = RrfK): DataFrame =
    rrfFuse(
      bm25Ranks(documents, poolK),
      Similarity.ivfTopK(embeddings, nQueries = 1, k = poolK,
        trainIters = Similarity.IvfTrainIters),
      k)

  /** BM25 pool ranked 1..poolK; the ≤poolK-row frame makes the
    * unpartitioned window a single-task detail, not a scale concern.
    */
  private def bm25Ranks(documents: DataFrame, poolK: Int): DataFrame = {
    val wText = Window.orderBy(desc("score"), asc("doc_id"))
    TextAnalysis.bm25TopK(documents, TextAnalysis.Bm25Query, poolK)
      .select(col("doc_id"), row_number().over(wText).as("text_rank"))
  }

  /** The shared integer RRF fusion tail over a text-rank frame and any
    * (neighbor_id, rank) second ranking; `rankName` labels the second
    * list's rank column in the output (`vec_rank` for the dense
    * retrievers, `anchor_rank` for the anchor-text one).
    */
  private def rrfFuse(text: DataFrame, denseRanks: DataFrame, k: Int,
      rankName: String = "vec_rank"): DataFrame = {
    val dense = denseRanks
      .select(col("neighbor_id").as("doc_id"), col("rank").as(rankName))
    text.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("text_rank"), col(rankName),
        (coalesce(expr(s"1000000 div ($RrfC + text_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfC + $rankName)"), lit(0L)))
          .as("rrf_micro"))
      .orderBy(desc("rrf_micro"), asc("doc_id"))
      .limit(k)
  }

  /** ANCHOR-TEXT hybrid retrieval — `q_anchor_bm25`: the same integer
    * RRF fusion with the second list swapped for the anchor-text index
    * ranking ([[LinkGraph.anchorBm25Hosts]] → docs via
    * [[LinkGraph.anchorDocRanks]]) — content BM25 says "this page SAYS
    * hash/join/vector", the anchor list says "pages elsewhere DESCRIBE
    * this page's host with those words" (the two signals web ranking has
    * fused since anchor text was first indexed). Documents reached by
    * only one list keep that list's contribution — the RRF behavior that
    * lets an anchor-only hit surface.
    */
  def anchorHybridTopK(
      documents: DataFrame, poolK: Int = TextAnalysis.Bm25K,
      k: Int = RrfK): DataFrame =
    rrfFuse(
      bm25Ranks(documents, poolK),
      LinkGraph.anchorDocRanks(documents, poolK),
      k, "anchor_rank")

  /** [[anchorHybridTopK]] with the anchor side served from the PERSISTED
    * [[AnchorStore]] index — the production shape (the index is a
    * crawl-time artifact; retrieval reads it), zero page synthesis or
    * anchor parsing on the query path. Exact longs round-trip parquet,
    * so this shares `q_anchor_bm25`'s oracle verbatim.
    */
  def anchorHybridStoredTopK(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      poolK: Int = TextAnalysis.Bm25K, k: Int = RrfK): DataFrame = {
    val documents = graft.Tables.documents(spark, dir)
    rrfFuse(
      bm25Ranks(documents, poolK),
      LinkGraph.anchorDocRanksFrom(
        documents, AnchorStore.anchorBm25Hosts(spark, dir), poolK),
      k, "anchor_rank")
  }

  /** [[anchorHybridStoredTopK]] with the anchor side scored over the
    * PERSISTED CONTEXT index (r17): the fusion consumes the richer
    * anchor+window term bag — what the source pages were TALKING ABOUT
    * when they linked, not just the link labels — still with zero page
    * synthesis or parsing on the query path (the AnchorStore contract),
    * and the identical integer RRF tail.
    */
  def anchorCtxHybridStoredTopK(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      poolK: Int = TextAnalysis.Bm25K, k: Int = RrfK): DataFrame = {
    val documents = graft.Tables.documents(spark, dir)
    rrfFuse(
      bm25Ranks(documents, poolK),
      LinkGraph.anchorDocRanksFrom(
        documents, AnchorStore.anchorCtxBm25Hosts(spark, dir), poolK),
      k, "anchor_rank")
  }

  /** RETENTION FUNNEL with first-reject attribution —
    * `q_pipeline_trust_funnel`: the [[retainedCorpus]] pipeline EXTENDED
    * with the r15/r16 link-graph spam gate and accounted the
    * [[TextAnalysis.filterFunnel]] way: every document gets exactly ONE
    * verdict, the first stage that rejects it, so per-(source, verdict)
    * counts sum exactly to the corpus and a policy change shows up as a
    * count migration, never silence. Stage order (cheap scans first,
    * corpus-level state later — the [[retainedCorpus]] rationale):
    *
    *   1. `low_quality` — the quality gate (< 10 tokens or no stopword)
    *   2. `spam_host`   — the [[LinkGraph.spamHosts]] TrustRank demotion
    *                      (high-PageRank hosts the trusted seed source
    *                      cannot vouch for)
    *   3. `exact_dup`   — not the min-id keeper of its normalized text
    *                      among stage-3 reachers
    *   4. `near_dup`    — not its near-dup cluster representative among
    *                      stage-4 reachers (MinHash pair graph, the
    *                      stored-signature probe)
    *   5. `kept`
    *
    * Shape: one corpus projection (token count, quality flag, host,
    * normalized-text fp — all codegen'd) checkpointed once; the spam
    * set is host-bounded and broadcast; exact keepers are one hash-agg
    * on fp; the near-dup stage probes the stored signature table
    * semi-joined to reachers (the [[retainedCorpus]] production shape);
    * the rollup is |sources|×5 rows.
    */
  def retentionFunnel(
      documents: DataFrame, threshold: Double = 0.5,
      sigTable: Option[DataFrame] = None): DataFrame = {
    val base = funnelProjection(documents)
      .transform(graft.Materialize.iteration) // feeds gate flags, keepers, clusters, rollup
    val spam = LinkGraph.spamHosts(documents)
      .select(col("host"), lit(true).as("spam_flag"))
    val flagged = base
      .join(broadcast(spam), Seq("host"), "left")
      .withColumn("spam", coalesce(col("spam_flag"), lit(false)))
    val reach3 = col("q_ok") && !col("spam")
    val keepers = flagged.where(reach3)
      .groupBy("fp").agg(min("doc_id").as("keeper"))
    val staged = flagged
      .join(keepers, Seq("fp"), "left")
      .withColumn("is_keeper", col("doc_id") === col("keeper"))
      .transform(graft.Materialize.iteration) // read by the r4 projection and the rollup
    val r4 = staged.where(reach3 && col("is_keeper"))
    val pairs = (sigTable match {
      case Some(tbl) =>
        // pair verdicts are pairwise, so all-pairs ∩ reachers² equals
        // the reacher pair set (the retainedCorpus argument verbatim) —
        // PROVIDED no band bucket exceeds Dedup.DefaultMaxBucketSize:
        // the table path's oversized-bucket valve is evaluated over
        // full-corpus bucket membership, so past the cap it can drop
        // pairs a reacher-only training would keep (and the DuckDB
        // oracle brute-forces uncapped). Dedup.minhashBucketLoads is the
        // monitoring query that shows whether the valve engaged on a
        // given corpus, so a future oracle mismatch self-explains.
        Dedup.nearDuplicatePairsFromTable(tbl, threshold)
          .join(r4.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
          .join(r4.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      case None =>
        Dedup.nearDuplicatePairs(r4.select("doc_id", "text"), threshold)
    }).select(col("doc_a"), col("doc_b"))
    val clusters = Dedup.clustersFromPairs(r4.select("doc_id"), pairs)
      .select(col("doc_id"), col("cluster_id"))
    val verdict =
      when(!col("q_ok"), "low_quality")
        .when(col("spam"), "spam_host")
        .when(!col("is_keeper"), "exact_dup")
        .when(col("cluster_id") =!= col("doc_id"), "near_dup")
        .otherwise(lit("kept"))
    staged
      .join(clusters, Seq("doc_id"), "left")
      .select(col("source"), verdict.as("verdict"), col("n_toks"))
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
  }

  /** The funnel's per-doc projection, shared by the batch funnel and its
    * incremental twin: token count, quality flag, host, exact-dedup
    * fingerprint — all codegen'd scan-speed expressions. NFC-composed
    * before tokenizing, like TextAnalysis.lowToks and the DuckDB oracle's
    * tokCte (nfc_normalize) — identical on ASCII but the stopword gate
    * would otherwise diverge on decomposed-form corpora.
    */
  private def funnelProjection(documents: DataFrame): DataFrame = {
    val toksC = split(trim(graft.functions.TextFunctions.nfc(col("text"))), "\\s+")
    val nStop = size(filter(toksC, t => t.isin(TextAnalysis.Stopwords: _*)))
    graft.Parallelism.ensure(documents)
      .select(col("doc_id"), col("source"), col("text"),
        size(toksC).cast("long").as("n_toks"),
        (size(toksC) >= 10 && nStop > 0).as("q_ok"),
        Domains.hostOf(col("doc_id"), col("source")).as("host"),
        md5(TextAnalysis.normalized(col("text"))).as("fp"))
  }

  /** Continuous-ingestion twin of [[retentionFunnel]] — the same
    * first-reject verdicts for an ARRIVING shard (the top fifth of the
    * doc_id range, the `Dedup.ingestSplitOf` boundary every incremental
    * card shares), scored against artifacts FROZEN on the existing
    * corpus, with no PageRank / keeper / signature recomputation per
    * batch:
    *
    *   - `spam_host`  — the [[LinkGraph.spamHosts]] set of the EXISTING
    *                   corpus (the published [[LinkGraph.RankStore]]-style
    *                   rank/trust artifact; a batch never reranks the web
    *                   graph, and never lets arriving link spam vote on
    *                   its own trust);
    *   - `exact_dup`  — fingerprint ∈ the existing reachers' keeper-fp
    *                   table (probe-only: an arrival matching corpus
    *                   content is the duplicate, the corpus keeps its
    *                   keeper);
    *   - `near_dup`   — the stage-4 survivors probe the existing
    *                   keepers' stored LSH band index
    *                   ([[Dedup.probeStoredIndex]], O(shard + matched
    *                   buckets) per batch); shard-INTERNAL pairs are
    *                   contractually deferred to the next artifact
    *                   publication, exactly like the incremental dedup
    *                   family.
    *
    * Output: per (source, verdict) rollup over the ARRIVING docs only —
    * counts sum to the shard. Cost per batch: one scan of the shard +
    * bounded probes; the existing-corpus work is the artifact build a
    * production pipeline amortizes across batches.
    */
  def incrementalTrustFunnel(
      documents: DataFrame, threshold: Double = 0.5,
      sigTable: Option[DataFrame] = None): DataFrame =
    Dedup.ingestSplitOf(documents) match {
      case None =>
        documents.select(col("source"), lit("kept").as("verdict"),
          lit(0L).as("n_docs"), lit(0L).as("n_tokens")).limit(0)
      case Some(split) =>
        funnelRollup(scoreShardAgainstFunnel(
          documents.where(col("doc_id") >= split),
          funnelArtifacts(documents, split, sigTable, threshold)))
    }

  /** The frozen artifact bundle a funnel shard probe reads — what a
    * production pipeline publishes per artifact cycle and every
    * batch/micro-batch consumes unchanged: the spam-host set, the
    * keeper-fp table, the existing keepers' LSH band index, and the
    * shingle frame resolving the index side of the verification join.
    */
  private[graft] final case class FunnelArtifacts(
      spam: DataFrame, keepers: DataFrame, idx: DataFrame,
      corpusSh: DataFrame, threshold: Double)

  /** Build (and materialize once) the [[FunnelArtifacts]] of the corpus
    * below `split`. With a signature table, the band index derives from
    * STORED signatures — nothing re-shingles the corpus per batch.
    */
  private[graft] def funnelArtifacts(
      documents: DataFrame, split: Long,
      sigTable: Option[DataFrame], threshold: Double): FunnelArtifacts = {
    val existing = documents.where(col("doc_id") < split)
    val spam = LinkGraph.spamHosts(existing)
      .select(col("host"), lit(true).as("spam_flag"))
      .transform(graft.Materialize.iteration)
    val exBase = funnelProjection(existing)
      .join(broadcast(spam), Seq("host"), "left")
      .withColumn("spam", coalesce(col("spam_flag"), lit(false)))
    val exReach3 = exBase.where(col("q_ok") && !col("spam"))
    val keepers = exReach3
      .groupBy("fp").agg(min("doc_id").as("keeper"))
      .transform(graft.Materialize.iteration) // the published exact-dedup artifact
    val exR4 = exReach3
      .join(keepers, Seq("fp"))
      .where(col("doc_id") === col("keeper"))
      .select("doc_id")
    val keeperSh = (sigTable match {
      case Some(tbl) => tbl.select(col("doc_id"), col("sh"))
      case None => Dedup.shingled(existing)
    }).join(exR4, Seq("doc_id"), "left_semi")
      .transform(graft.Materialize.iteration)
    val idx = (sigTable match {
      case Some(tbl) =>
        Dedup.corpusBandIndexFromTable(tbl.join(exR4, Seq("doc_id"), "left_semi"))
      case None => Dedup.corpusBandIndex(keeperSh)
    }).transform(graft.Materialize.iteration)
    FunnelArtifacts(spam, keepers, idx, keeperSh, threshold)
  }

  /** Per-doc first-reject verdicts of ONE arriving shard against the
    * frozen artifacts — (doc_id, source, verdict, n_toks). Shard-local
    * except the bounded probes: the spam set broadcasts, the keeper-fp
    * join is fp-keyed, the near-dup probe is the banded equi-join
    * against the stored index. Verdicts depend only on the artifacts
    * (probe-only, no shard-internal pairs), so micro-batch unions equal
    * the batch twin row for row — the shared-oracle contract every
    * streaming twin in this repo rides.
    */
  private[graft] def scoreShardAgainstFunnel(
      shard: DataFrame, arts: FunnelArtifacts): DataFrame = {
    val base = funnelProjection(shard)
      .join(broadcast(arts.spam), Seq("host"), "left")
      .withColumn("spam", coalesce(col("spam_flag"), lit(false)))
      .join(arts.keepers.select(col("fp"), lit(true).as("fp_known")),
        Seq("fp"), "left")
      .withColumn("exact_dup", coalesce(col("fp_known"), lit(false)))
      .transform(graft.Materialize.iteration) // probe input + the verdict read
    val stage4 = base
      .where(col("q_ok") && !col("spam") && !col("exact_dup"))
      .select("doc_id")
    // the shard derives its own shingles/signatures (doc-local, the
    // streaming-twin convention); the corpus side comes from the artifact
    val shardSh = Dedup.shingled(shard.select("doc_id", "text"))
      .join(stage4, Seq("doc_id"), "left_semi")
    val nearDup = Dedup
      .probeCorpusIndex(shardSh, arts.idx, arts.corpusSh, arts.threshold)
      .select(col("shard_doc").as("doc_id")).distinct()
      .withColumn("near_flag", lit(true))
    val verdict =
      when(!col("q_ok"), "low_quality")
        .when(col("spam"), "spam_host")
        .when(col("exact_dup"), "exact_dup")
        .when(coalesce(col("near_flag"), lit(false)), "near_dup")
        .otherwise(lit("kept"))
    base
      .join(nearDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), verdict.as("verdict"), col("n_toks"))
  }

  /** The |sources|×5 funnel rollup over per-doc verdict rows. */
  private[graft] def funnelRollup(perDoc: DataFrame): DataFrame =
    perDoc
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
}

/** Session-persisted funnel ARTIFACT bundle — the retention pipeline's
  * train-once/apply-everywhere seam on the shared
  * [[graft.sources.ArtifactStore]] kernel (the RankStore/AnchorStore
  * contract): a production pipeline publishes the spam-host set, the
  * keeper-fp table, and the keeper LSH band index in a periodic artifact
  * job, and every ingest batch scores against the PUBLISHED bundle —
  * zero PageRank, zero keeper recomputation, zero corpus shingling on
  * the scoring path. Hosts/fps are exact strings and the index rows are
  * (long, int, md5-string), so the parquet round-trip is bit-exact and
  * `q_trust_funnel_stored` shares `q_trust_funnel_incremental`'s oracle
  * verbatim.
  */
object FunnelStore {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types._

  private val store = new graft.sources.ArtifactStore[String]("funnel")

  private val spamSchema = StructType(Seq(StructField("host", StringType)))
  private val keeperSchema = StructType(Seq(
    StructField("fp", StringType), StructField("keeper", LongType)))
  private val idxSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("key", StringType)))
  private val shSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sh", ArrayType(StringType, containsNull = false))))

  /** The persisted artifact bundle for `dir`, built ONCE per JVM from
    * the corpus below the ingest split (+ the stored signature table).
    * None on an empty corpus (no split exists).
    */
  def artifacts(
      spark: SparkSession, dir: String,
      threshold: Double = 0.5): Option[Pipeline.FunnelArtifacts] = {
    val docs = graft.Tables.documents(spark, dir)
    Dedup.ingestSplitOf(docs).map { split =>
      val out = store.getOrBuild(dir) { o =>
        val arts = Pipeline.funnelArtifacts(
          docs, split, Some(SignatureStore.table(spark, dir)), threshold)
        arts.spam.select("host").write.mode("overwrite").parquet(s"$o/spam")
        arts.keepers.write.mode("overwrite").parquet(s"$o/keepers")
        arts.idx.write.mode("overwrite").parquet(s"$o/idx")
        arts.corpusSh.write.mode("overwrite").parquet(s"$o/sh")
      }
      Pipeline.FunnelArtifacts(
        spark.read.schema(spamSchema).parquet(s"$out/spam")
          .withColumn("spam_flag",
            org.apache.spark.sql.functions.lit(true)),
        spark.read.schema(keeperSchema).parquet(s"$out/keepers"),
        spark.read.schema(idxSchema).parquet(s"$out/idx"),
        spark.read.schema(shSchema).parquet(s"$out/sh"),
        threshold)
    }
  }

  /** The funnel rollup of the arriving shard under the STORED bundle —
    * what a production batch actually runs per artifact cycle.
    */
  def trustFunnelStored(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    (Dedup.ingestSplitOf(docs), artifacts(spark, dir)) match {
      case (Some(split), Some(arts)) =>
        Pipeline.funnelRollup(Pipeline.scoreShardAgainstFunnel(
          docs.where(org.apache.spark.sql.functions.col("doc_id") >= split),
          arts))
      case _ => Pipeline.incrementalTrustFunnel(docs) // empty in, empty out
    }
  }

  /** Times the bundle for `dir` has been BUILT (not read) — spec hook. */
  def builds(dir: String): Int = store.builds(dir)
}
