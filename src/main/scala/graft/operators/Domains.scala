package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation — the grouping key production crawl
  * pipelines actually curate by (per-domain duplication rates, domain
  * frequency caps, domain token budgets; the Gopher/RefinedWeb "domain
  * cap" is budgeted against the REGISTERED domain, not the ingest feed).
  * The reference has no such concept (its only key is the word —
  * `mapreduce/mapreduce.go:33`); `source` plays the coarse feed-level
  * role elsewhere in this suite ([[Sampling.sourceTokenBudget]],
  * [[Pipeline.sourceCurationStats]]); these operators add the fine,
  * power-law-distributed key under it.
  *
  * The driver corpus carries no URL column, so [[withUrl]] DERIVES one —
  * deterministically from (doc_id, source), so every downstream result
  * is exactly replayable by the DuckDB oracle. The grammar is chosen to
  * make the derived corpus behave like a crawl:
  *
  *   url  = https:// [www.] <source>.d<N>.com /p/<doc_id>
  *   N    = 1024 div (md5₆₀(DomainSeed:doc_id) mod 1024 + 1)
  *
  * N is a TRUE POWER LAW by construction — P(N = d) ≈ 1/(d(d+1)), so
  * domain d1.com holds ~half the corpus, d2.com ~a sixth, with a long
  * singleton tail (~2·√1024 = 64 distinct values) — the classic skewed
  * key shape that makes per-domain operators worth stress-testing, at
  * EVERY scale factor, without a special replica. Many hosts (up to
  * 2 × |sources| subdomain variants) map onto one registered domain, so
  * host→domain extraction is semantically load-bearing, not cosmetic.
  *
  * A real deployment replaces [[withUrl]] with its crawl-metadata URL
  * column and [[registeredDomain]]'s last-two-labels rule with a Public
  * Suffix List lookup (a broadcast map over the ~9k-entry PSL); for this
  * grammar — single-label TLDs — last-two-labels IS the registered
  * domain, so the approximation is exact here and the operator contract
  * (group by eTLD+1) is the production one.
  */
object Domains {

  /** Power-law bucket count for the synthetic domain id (and the modulus
    * of its hash draw) — P(domain d) ≈ 1/(d(d+1)) over ~64 distinct ids.
    */
  val DomainBuckets = 1024L
  val DomainSeed = 41
  /** Seed for the www-subdomain coin (independent of the domain draw). */
  val SubSeed = 43

  /** Frequency cap (max docs kept per registered domain) and the seed of
    * its hash order. Small enough that the cap ENGAGES on the power-law
    * head at every driver scale factor (d1.com holds ~n/2 docs).
    */
  val DomainCapDocs = 40L
  val DomainCapSeed = 47

  /** Token budget per registered domain, and its hash-order seed —
    * engages on the head domains at every scale factor, like
    * [[Sampling.SourceBudgetTokens]].
    */
  val DomainBudgetTokens = 800L
  val DomainBudgetSeed = 53

  /** The grammar's host for page `id` under feed `source` —
    * `[www.]<source>.d<N>.com` with the www coin and the power-law
    * domain draw both hashed from `id`. Factored out of [[withUrl]] so
    * [[LinkGraph]] can name the host of a LINK TARGET (page `id+1`)
    * without synthesizing its whole URL; byte-identical to the host part
    * [[urlHost]] extracts from a [[withUrl]] url.
    */
  def hostOf(id: Column, source: Column): Column = {
    val www = when(
      pmod(HashFunctions.md5Long(id.cast("string"), SubSeed),
        lit(2L)) === 0L, lit("")).otherwise(lit("www."))
    val domH = pmod(HashFunctions.md5Long(id.cast("string"), DomainSeed),
      lit(DomainBuckets))
    // Integer div via floor(double /): exact here — the true quotient
    // 1024/(h+1) is either an integer or ≥ 1/1024 away from one, far
    // beyond double rounding error, so this equals DuckDB's `//` (and
    // the previous SQL `div`) bit-for-bit.
    concat(www, source, lit(".d"),
      floor(lit(DomainBuckets) / (domH + lit(1L))).cast("string"),
      lit(".com"))
  }

  /** documents + a deterministic `url` column (see the object doc for
    * the grammar and why it is derived rather than read). One codegen'd
    * projection: two md5 calls + string concat per row, no shuffle.
    */
  def withUrl(documents: DataFrame): DataFrame =
    documents
      .withColumn("url",
        concat(lit("https://"), hostOf(col("doc_id"), col("source")),
          lit("/p/"), col("doc_id").cast("string")))

  /** Host part of a URL: the authority between `://` and the first
    * `/ ? #` — one codegen'd regexp, no UDF.
    */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)

  /** Registered domain (eTLD+1) of a host under the single-label-TLD
    * rule: the last two dot-separated labels. Exact for [[withUrl]]'s
    * grammar; a production deployment swaps in a PSL lookup (see object
    * doc) without touching any consumer below.
    */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** (doc_id, url, host, domain, tok) — the shared projection every
    * per-domain operator below starts from; also registered directly as
    * `q_domain_urls` so the extraction itself is row-level
    * oracle-checked.
    */
  def urlTable(documents: DataFrame): DataFrame = {
    val u = withUrl(graft.Parallelism.ensure(documents))
    u.select(
      col("doc_id"),
      col("url"),
      urlHost(col("url")).as("host"),
      registeredDomain(urlHost(col("url"))).as("domain"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("tok"),
      col("text"))
  }

  /** Per-registered-domain curation rollup — the per-domain counterpart
    * of [[Pipeline.sourceCurationStats]]: document count, distinct-host
    * count (how many subdomain/feed variants funnel into the domain),
    * WITHIN-DOMAIN exact-duplicate docs (normalized-text fingerprint
    * seen more than once inside the same domain — the per-domain
    * dup-rate numerator), token total and mean.
    *
    * Shape: one scan with per-row url/md5 projection, one
    * (domain, fp)-keyed hash-agg for copy counts (map-side combined; the
    * power-law domain key is harmless because fp spreads it), a join
    * back, then the |domains|-row rollup. At 100 TB this is the standard
    * two-agg dedup-stats plan, linear in the corpus.
    */
  def domainStats(documents: DataFrame): DataFrame = {
    val t = urlTable(documents)
      .select(col("doc_id"), col("host"), col("domain"),
        md5(TextAnalysis.normalized(col("text"))).as("fp"), col("tok"))
    val copies = t.groupBy("domain", "fp").agg(count(lit(1)).as("n_copies"))
    t.join(copies, Seq("domain", "fp"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("tok")).as("total_tokens"))
      .withColumn("avg_tokens",
        col("total_tokens").cast("double") / col("n_docs"))
  }

  /** Domain FREQUENCY cap: keep at most `cap` documents per registered
    * domain, chosen as the cap smallest by (md5₆₀ mod 2^20, doc_id) — a
    * deterministic uniform subset, stable under repartitioning and
    * incremental re-runs. The head of the power law is truncated
    * (d1.com: ~n/2 docs → cap), the tail passes whole.
    *
    * One row per kept doc: (domain, doc_id, h).
    *
    * Shape: [[Sampling.smallestKPerKey]] — histogram counting-selection,
    * never a corpus sort; windows only over the ≤4096-buckets-per-domain
    * histogram, so the power-law key costs what a uniform one does.
    */
  def domainFrequencyCap(documents: DataFrame,
      cap: Long = DomainCapDocs, seed: Int = DomainCapSeed): DataFrame = {
    val hashed = urlTable(documents)
      .select(col("doc_id"), col("domain"),
        (HashFunctions.md5Long(col("doc_id").cast("string"), seed)
          % (1L << 20)).as("h"))
      .localCheckpoint()
    Sampling.smallestKPerKey(hashed, "domain", cap)
      .select("domain", "doc_id", "h")
  }

  /** Domain TOKEN budget — [[Sampling.sourceTokenBudget]] re-keyed to the
    * registered domain (the unit the Gopher-style domain cap is actually
    * spent in): within each domain, docs are taken in content-hash order
    * until the running token total reaches the budget; the first
    * crossing doc is kept, every hash-later one dropped.
    *
    * One row per kept doc: (domain, doc_id, tok).
    */
  def domainTokenBudget(documents: DataFrame,
      budget: Long = DomainBudgetTokens, seed: Int = DomainBudgetSeed): DataFrame = {
    val hashed = urlTable(documents)
      .select(col("doc_id"), col("domain"), col("tok"),
        (HashFunctions.md5Long(col("doc_id").cast("string"), seed)
          % (1L << 20)).as("h"))
      .localCheckpoint()
    Sampling.tokenBudgetByKey(hashed, "domain", budget)
      .select("domain", "doc_id", "tok")
  }

  /** TEMPERED per-domain token budget — domain-level temperature
    * sampling, the downsampling half of the mixture story: each
    * registered domain's budget is its n^(1/T) tempered SHARE of the
    * corpus's own token mass ([[Sampling.temperedWeights]], same
    * fixed-point ln/exp chains and [[Sampling.MixShareScale]] integer
    * share arithmetic as `q_mixture_temperature`), then the same
    * first-crossing hash-order rule as [[domainTokenBudget]]. Tempering
    * flattens toward uniform, so over-represented head domains (d1.com's
    * ~n/2) get budgets far below their size and are truncated hard,
    * while tail domains' budgets exceed their mass and pass whole — the
    * "don't let one crawl domain dominate the mixture" knob, applied at
    * the key production pipelines apply it to. (This operator only CAPS;
    * the upsampling half of tempering is `q_mixture_temperature`'s
    * n_repeats.)
    *
    * One row per KEPT doc: (domain, doc_id, tok, dom_budget).
    *
    * Shape: one |domains|-row weight chain (scan + tiny aggs + 1-row
    * broadcast), then [[Sampling.tokenBudgetPerKey]]'s counting
    * selection — corpus never sorted, budgets ride the broadcast cutoff.
    */
  def temperedDomainBudget(documents: DataFrame,
      tNum: Long = Sampling.TempNum, tDen: Long = Sampling.TempDen,
      seed: Int = DomainBudgetSeed): DataFrame = {
    val hashed = urlTable(documents)
      .select(col("doc_id"), col("domain"), col("tok"),
        (HashFunctions.md5Long(col("doc_id").cast("string"), seed)
          % (1L << 20)).as("h"))
      .localCheckpoint()
    val byDom = hashed.groupBy("domain")
      .agg(sum("tok").as("src_tokens"))
    val w = Sampling.temperedWeights(byDom, tNum, tDen)
    val totals = w.agg(
      sum("src_tokens").cast("long").as("total_tokens"),
      sum("w_f").as("sum_w"))
    val budgets = w.crossJoin(broadcast(totals))
      .select(col("domain"),
        expr(s"(total_tokens * ((w_f * ${Sampling.MixShareScale}) div sum_w))" +
          s" div ${Sampling.MixShareScale}").as("budget"))
    Sampling.tokenBudgetPerKey(hashed, "domain", budgets)
      .join(broadcast(budgets.withColumnRenamed("budget", "dom_budget")), Seq("domain"))
      .select("domain", "doc_id", "tok", "dom_budget")
  }

  /** INCREMENTAL domain token budget — [[domainTokenBudget]] under
    * continuous ingestion, with the family's frozen-artifact asymmetry
    * ([[Dedup.incrementalLineDedup]]): the corpus below the ingest
    * boundary freezes a per-(domain, hash-bucket) SPEND state, and an
    * arriving document is admitted iff the CORPUS token mass hashed
    * strictly before it (within its domain) is still under budget.
    * Arrivals do not charge the budget against each other — batch-
    * internal displacement waits for the next full rebuild, exactly the
    * banded probe's contract. Because admission replays the batch
    * operator's own order rule, an admitted arrival is precisely one the
    * full rebuild would keep against the frozen corpus (a new doc can
    * displace only hash-later docs — the [[Sampling.sourceTokenBudget]]
    * stability property, inherited).
    *
    * One row per SHARD document: (domain, doc_id, tok, admitted).
    *
    * Shape per batch: O(shard) hashes + ONE broadcast join against the
    * ≤4096·|domains|-row dense spend grid + one equi-join against the
    * single matching hash bucket's corpus rows (≈ n_domain/4096 docs per
    * probe — the corpus is never rescanned per batch).
    */
  def incrementalDomainBudget(documents: DataFrame,
      budget: Long = DomainBudgetTokens, seed: Int = DomainBudgetSeed): DataFrame =
    Dedup.ingestSplitOf(documents) match {
      case None =>
        urlTable(documents)
          .select(col("domain"), col("doc_id"), col("tok"),
            lit(true).as("admitted")).limit(0)
      case Some(split) =>
        val t = budgetFrame(documents, seed)
        val corpus = t.where(col("doc_id") < split).localCheckpoint()
        budgetProbe(t.where(col("doc_id") >= split),
          frozenSpend(corpus), corpus, budget)
    }

  /** (doc_id, domain, tok, h, hb) — the hashed frame the budget family
    * probes and freezes.
    */
  private[graft] def budgetFrame(documents: DataFrame, seed: Int): DataFrame =
    urlTable(documents)
      .select(col("doc_id"), col("domain"), col("tok"),
        (HashFunctions.md5Long(col("doc_id").cast("string"), seed)
          % (1L << 20)).as("h"))
      .withColumn("hb", shiftright(col("h"), 8))

  /** The FROZEN spend artifact: per (domain, bucket) the corpus token
    * mass in strictly-smaller buckets — densified over all 4096 buckets
    * per domain so a probe in an empty bucket still reads the right
    * running total. ≤4096·|domains| rows, built once, broadcast to every
    * batch.
    */
  private[graft] def frozenSpend(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = corpus.groupBy("domain", "hb").agg(sum("tok").as("tn"))
    val grid = corpus.select("domain").distinct()
      .crossJoin(corpus.sparkSession.range(1 << 12).select(col("id").as("hb")))
    val cumW = Window.partitionBy("domain").orderBy(col("hb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    grid.join(hist, Seq("domain", "hb"), "left")
      .withColumn("cum_below",
        coalesce(sum(coalesce(col("tn"), lit(0L))).over(cumW), lit(0L)))
      .select(col("domain"), col("hb"), col("cum_below"))
      .localCheckpoint()
  }

  /** The per-batch probe shared by [[incrementalDomainBudget]] and the
    * streaming twin: arrivals read their bucket's frozen running total
    * plus the in-bucket corpus mass ordered strictly before them.
    */
  private[graft] def budgetProbe(
      shard: DataFrame, spend: DataFrame, corpus: DataFrame,
      budget: Long): DataFrame = {
    val inBucket = shard.alias("s")
      .join(corpus.alias("c"),
        col("s.domain") === col("c.domain") && col("s.hb") === col("c.hb") &&
          (col("c.h") < col("s.h") ||
            (col("c.h") === col("s.h") && col("c.doc_id") < col("s.doc_id"))),
        "left")
      .groupBy(col("s.domain").as("domain"), col("s.doc_id").as("doc_id"),
        col("s.tok").as("tok"), col("s.hb").as("hb"))
      .agg(sum(col("c.tok")).as("in_bucket"))
    inBucket
      .join(broadcast(spend), Seq("domain", "hb"), "left")
      .select(col("domain"), col("doc_id"), col("tok"),
        (coalesce(col("cum_below"), lit(0L)) + coalesce(col("in_bucket"), lit(0L))
          < budget).as("admitted"))
  }

  /** Majority threshold (milli) for [[domainQualityCard]]'s keep
    * decision, interpolated into the oracle.
    */
  val DomainKeepMilli = 500L

  /** Per-domain QUALITY decision card — the wholesale domain-level
    * filter production pipelines run before any per-document work (a
    * spam farm is dropped as a DOMAIN, not doc by doc): per registered
    * domain, the exact classifier-score total
    * ([[TextAnalysis.classifierScoreOf]], integer fold), how many docs
    * the classifier keeps, how many pass the basic quality rule
    * (≥10 tokens and ≥1 lowercase stopword hit — prose detection), both
    * as exact milli shares, and the keep decision: both majorities ≥
    * [[DomainKeepMilli]]. One scan + one |domains|-row hash-agg;
    * everything integer, so the verdict is bit-portable.
    */
  def domainQualityCard(documents: DataFrame): DataFrame = {
    val lowToks = split(trim(lower(graft.functions.TextFunctions.nfc(col("text")))), "\\s+")
    val f = urlTable(documents).select(
      col("domain"), col("tok"),
      TextAnalysis.classifierScoreOf(col("text")).as("score"),
      size(filter(lowToks, x => x.isin(TextAnalysis.Stopwords: _*)))
        .cast("long").as("n_stop"))
    f.groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("score").as("sum_score"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("tok") >= 10 && col("n_stop") > 0, 1L).otherwise(0L))
          .as("n_quality"))
      .select(col("domain"), col("n_docs"), col("sum_score"),
        col("n_keep"), expr("n_keep * 1000 div n_docs").as("keep_milli"),
        col("n_quality"), expr("n_quality * 1000 div n_docs").as("quality_milli"))
      .withColumn("domain_keep",
        col("keep_milli") >= DomainKeepMilli
          && col("quality_milli") >= DomainKeepMilli)
  }

  /** Domain×domain near-dup contamination matrix —
    * [[Pipeline.sourceOverlapMatrix]] on the registered-domain key: for
    * every mined near-dup pair, the unordered domain pair of its
    * endpoints, rolled up. The diagonal is a domain's internal
    * duplication (template pages); off-diagonal cells are cross-domain
    * scraping/mirroring — the per-domain dup-rate's "who is copying
    * whom" refinement. Same shape: the pair set joined twice to the slim
    * (doc_id, domain) projection, then a hash-agg.
    */
  def domainOverlapMatrix(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val dom = urlTable(documents).select(col("doc_id"), col("domain"))
    pairs
      .join(dom.select(col("doc_id").as("doc_a"), col("domain").as("dom_sa")), "doc_a")
      .join(dom.select(col("doc_id").as("doc_b"), col("domain").as("dom_sb")), "doc_b")
      .select(
        least(col("dom_sa"), col("dom_sb")).as("dom_a"),
        greatest(col("dom_sa"), col("dom_sb")).as("dom_b"))
      .groupBy("dom_a", "dom_b")
      .agg(count(lit(1)).as("n_pairs"))
  }
}
