package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM-training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH and n-gram Jaccard (near-dup), and SimHash
  * (small-edit near-dup). The embedding-cosine variant lives in
  * [[Similarity]].
  *
  * Scale design: every method here is either a single hash-aggregate
  * (exact dedup, signatures) or an LSH bucket join — candidate pairs come
  * from an equi-join on (band, key), never from a cross join. At 100 TB the
  * bucket join shuffles each doc `bands` times (a constant), and bucket
  * sizes are bounded w.h.p. by the banding parameters; a skew guard
  * ([[dropOversizedBuckets]]) drops degenerate buckets (e.g. boilerplate /
  * identical-text clusters) above a size cap the same way production
  * MinHash dedup pipelines do.
  */
object Dedup {

  // 8 bands x 2 rows: a jaccard-0.99 pair is missed with prob (1-0.99^2)^8
  // ~ 6e-15; a jaccard-0.13 pair becomes a candidate ~12% of the time and is
  // then discarded by the exact-jaccard filter. Banding trades shuffle volume
  // (docs x Bands rows) against miss rate; these defaults favor exactness.
  val NumHashes = 16
  val Bands = 8
  val RowsPerBand = 2 // NumHashes / Bands

  /** Default bucket-size cap for the band self-joins. A bucket of size n
    * yields n(n-1)/2 within-bucket pairs in one task's hands — at the
    * default cap that is ~5e7 pairs, the most a single straggling task
    * should ever own. Buckets above the cap are degenerate by construction
    * (identical boilerplate that exact dedup should have removed first, or
    * a collapsed hash family) — enumerating their pairs is O(n²) work that
    * tells you nothing new about any individual pair.
    */
  val DefaultMaxBucketSize = 10000

  /** Prefix-group cap for the REGISTERED `q_neardup_exact_capped` query —
    * deliberately set below this corpus family's maximum doc-weighted
    * prefix-group mass (measured r15: max 3 at sf0.01, 12 at sf0.1, with
    * 38 / 18,538 keys above the cap respectively), so the cap VALVE is
    * exercised by the oracle gate itself: the DuckDB replay encodes the
    * same capped construction and the result observably differs from the
    * uncapped `q_neardup_exact` (24 vs 25 pairs at sf0.01, 130 vs 241 at
    * sf0.1). r14's registration used [[DefaultMaxBucketSize]], which this
    * corpus never reaches — the query re-paid the full mine to emit a
    * copy of the uncapped result and the valve went untested (r14 verdict
    * item 4). Production callers keep the [[DefaultMaxBucketSize]]
    * default; this constant exists so the safety mechanism itself has a
    * green row.
    */
  val ExercisedPrefixCap = 2

  /** Exact dedup on whitespace-normalized lowercase text: one hash-agg;
    * keeps the smallest doc_id as the cluster representative.
    */
  def exactDuplicates(documents: DataFrame): DataFrame =
    documents
      .select(md5(TextAnalysis.normalized(col("text"))).as("fp_md5"), col("doc_id"))
      .groupBy("fp_md5")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper_id"))

  /** Per-document MinHash signature columns mh0..mh{NumHashes-1} over
    * distinct word 3-shingles. Docs with no shingles (< 3 tokens) get null
    * signatures and are excluded from LSH downstream.
    *
    * Shape: explode shingles → NumHashes hash columns per shingle row →
    * hash-agg min per doc. A pure-projection form (NumHashes array_min
    * columns) looks cheaper but Catalyst's project collapsing inlines the
    * whole shingle expression into every signature column — NumHashes×
    * recomputation of the regex split/distinct per row; the explode form
    * computes shingles once and the per-doc mins combine map-side, so the
    * shuffle carries NumHashes longs per doc.
    */
  /** (doc_id, sh: array<string>) of distinct 3-shingles per doc. The
    * parallelism guard matters here: shingling is the pipeline's CPU-heavy
    * per-row step and must not run at the (possibly single-partition) scan
    * parallelism.
    */
  def shingled(documents: DataFrame): DataFrame =
    graft.Parallelism.ensure(documents)
      .select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))

  /** Signatures from a pre-shingled frame (see [[shingled]]) — lets callers
    * compute the expensive shingling once and reuse it across the LSH join
    * and the exact-jaccard verification.
    */
  def signaturesFromShingled(sh: DataFrame, numHashes: Int = NumHashes): DataFrame = {
    require(numHashes % 2 == 0, "signature entries come in digest-half pairs")
    // The hash functions must be genuinely independent. An affine family
    // h_i = h1 + i*h2 from a single digest was tried and rejected: without
    // a full-width modular reduction one element with small (h1, h2) stays
    // the argmin across a RANGE of i, correlating every band and missing
    // true near-dup pairs. Disjoint bit-ranges of a digest ARE independent,
    // so each seeded digest safely yields TWO signature entries
    // (HashFunctions.md5LongHalves) — numHashes/2 digests per shingle.
    val digests = (0 until numHashes / 2).map(i =>
      HashFunctions.md5LongHalves(col("s"), i).as(s"d$i"))
    val perShingle = sh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id") +: digests: _*)
    val mins = (0 until numHashes).map { i =>
      val half = if (i % 2 == 0) "h1" else "h2"
      min(col(s"d${i / 2}.$half")).as(s"mh$i")
    }
    val sigs = perShingle.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    // docs with no shingles keep a row (null signature) for oracle parity
    sh.select(col("doc_id")).join(sigs, Seq("doc_id"), "left")
  }

  def minhashSignatures(documents: DataFrame, numHashes: Int = NumHashes): DataFrame =
    signaturesFromShingled(shingled(documents), numHashes)

  /** The full per-document dedup artifact — (doc_id, sh, mh0..mh{N-1}) in
    * one frame: the shingle set AND the MinHash signature, i.e. everything
    * any dedup-family operator needs downstream of the raw text. This is
    * the frame [[SignatureStore]] persists once per corpus: in production
    * it is computed at INGEST (per new document, exactly once) and every
    * dedup/retention job probes the table instead of re-shingling raw
    * text — see [[nearDuplicatePairsFromTable]] /
    * [[incrementalNearDupsFromTable]] / `Pipeline.retainedCorpus`.
    */
  def shingleSignatureTable(documents: DataFrame, numHashes: Int = NumHashes): DataFrame = {
    val sh = shingled(documents).localCheckpoint()
    signaturesFromShingled(sh, numHashes).join(sh, Seq("doc_id"))
      .select(col("doc_id") +: col("sh") +:
        (0 until numHashes).map(i => col(s"mh$i")): _*)
  }

  /** Signature-column projection of a [[shingleSignatureTable]] frame. */
  private def sigCols(tbl: DataFrame): DataFrame =
    tbl.select(col("doc_id") +: (0 until NumHashes).map(i => col(s"mh$i")): _*)

  /** Pin a verification input onto `defaultParallelism` hash partitions
    * of `key` — the CPU-width guard for the exact-Jaccard verify joins.
    *
    * Why (r17, measured): AQE coalesces post-shuffle partitions by BYTE
    * size, but a verify stage's cost is the `array_intersect`/
    * `array_union` over two shingle arrays per row — heavily CPU-bound
    * relative to its bytes. On the bench corpus the uncapped exact
    * miner's verify stage was coalesced to 7 partitions and ran 6-10 s
    * at 7/32 of machine width. An explicit numPartitions repartition is
    * exempt from AQE coalescing, and hashing on the join key means the
    * join reuses the exchange (no extra shuffle) — the join's other,
    * slim side aligns to it. Width = defaultParallelism, i.e. derived
    * from the cluster, not a constant. Per-key skew is bounded by the
    * miners' bucket/prefix caps (one key joins ≤ cap members).
    *
    * Scoped to [[prefixNearDupPairs]] ONLY, by measurement: the
    * recall-1 prefix miner is the one path whose verify set is
    * structurally large (no banding loss, no cap by default — at sf0.1
    * its verify stage alone was 6-10 s). The banded miner and the
    * incremental/streaming probes verify tiny, cap-bounded candidate
    * sets; pinning them cost +0.3-1.3 s each in forced-exchange
    * overhead with nothing to parallelize (measured r17, reverted).
    */
  private def pinWidth(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Exact-Jaccard verification of candidate pairs against the true
    * shingle sets — the tail shared by the from-text and from-table pair
    * generators.
    */
  private def verifyPairs(pairs: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .where(col("jaccard") >= threshold)

  /** Content-group assignment for a signature frame: `group_id` = the
    * smallest doc_id sharing this row's exact shingle ARRAY (order
    * included), `members` = that group's size. Keying the window on the
    * array itself beats a fingerprint column both ways: zero collision
    * surface, and the shuffle row carries the array as payload
    * regardless, so there is nothing extra to compute or ship.
    *
    * This is an INGEST-TIME artifact, like the signatures: a pure
    * function of the corpus, computed once when [[SignatureStore]]
    * builds, so no per-query shuffle pays for it (the per-query window
    * formulation of the same collapse cost ~2× at sf0.1 purely in
    * fixed stage overheads). The columns describe THE WHOLE FRAME —
    * callers that filter rows out must drop them and let
    * [[nearDuplicatePairsFromTable]] regroup (or, better, mine pairs on
    * the full frame and restrict endpoints afterwards, as
    * `Pipeline.retainedCorpus` does — pair verdicts are pure functions
    * of the two docs, so the restriction is exact).
    */
  def withContentGroups(tbl: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("sh")
    tbl
      .withColumn("group_id", min("doc_id").over(w))
      .withColumn("members", count(lit(1)).over(w))
  }

  /** [[nearDuplicatePairs]] over a persisted signature table instead of
    * raw text: candidates from the stored signatures, verification from
    * the stored shingle sets — zero re-shingling. Identical output to the
    * from-text form (signatures are pure functions of the text), which is
    * why both share one oracle.
    *
    * COLLAPSE IDENTICAL SHINGLE SETS FIRST (r8, same move as
    * [[simhashNearDupPairs]] and `Similarity.cosineNearDupPairs`): every
    * output column (inter, uni, jaccard) is a pure function of the two
    * shingle sets, and the signature is a pure function of the shingle
    * set, so a group of identical documents shares bucket membership AND
    * verdict. Band-join and exact-verify DISTINCT content only, then
    * expand group cross products. On crawl-shaped corpora this is the
    * difference between work ∝ distinct documents and work ∝ copies² —
    * and it retires the bucket-cap caveat for exact duplicates: an
    * identical-doc cluster of ANY size is now one banded row (never a
    * degenerate bucket), its intra pairs emitted exactly instead of
    * being dropped past the cap. The cap still counts member DOCUMENTS
    * (weighted), so drop behavior for genuinely-shared shingle content
    * across DIFFERENT texts is unchanged.
    */
  def nearDuplicatePairsFromTable(
      tbl: DataFrame, threshold: Double = 0.5,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val sigC = (0 until NumHashes).map(i => col(s"mh$i"))
    // group columns come free from the store; frames without them (the
    // from-text path, ad-hoc tests) pay the window once here
    val keyed =
      if (tbl.columns.contains("group_id")) tbl else withContentGroups(tbl)
    val reps = keyed.where(col("doc_id") === col("group_id"))
    val members = keyed.select(col("group_id").as("rep_id"), col("doc_id"))
    // banded rows over DISTINCT content, carrying the member count so the
    // cap still drops exactly the buckets the uncollapsed join would;
    // explicit repartition for the same AQE-coalescing reason as the
    // simhash path. The ONE slim materialization is `kept` (post-cap),
    // read by both self-join sides and the intra-pair gate.
    val banded = bandedKeys(
      reps.select(col("group_id").as("doc_id") +: col("members") +: sigC: _*),
      passThrough = Seq("members"))
      .withColumnRenamed("doc_id", "rep_id")
      .repartition(tbl.sparkSession.sparkContext.defaultParallelism)
    val oversized = banded
      .groupBy("band", "key")
      .agg(sum("members").as("bucket_n"))
      .where(col("bucket_n") > maxBucketSize)
      .select("band", "key")
    val kept = banded.join(broadcast(oversized), Seq("band", "key"), "left_anti")
      .localCheckpoint()
    val candidates = kept.as("l")
      .join(kept.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.rep_id") < col("r.rep_id"))
      .select(col("l.rep_id").as("rep_a"), col("r.rep_id").as("rep_b"))
      .distinct()
    // ONE exact-jaccard evaluation per distinct content pair
    val repSh = reps.select(col("group_id").as("rep_id"), col("sh"))
    val repPairs = candidates
      .join(repSh.select(col("rep_id").as("rep_a"), col("sh").as("sh_a")), "rep_a")
      .join(repSh.select(col("rep_id").as("rep_b"), col("sh").as("sh_b")), "rep_b")
      .select(
        col("rep_a"), col("rep_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .where(col("jaccard") >= threshold)
    // Intra-group pairs need NO verification join: for an identical
    // shingle set, inter = uni = |set| and jaccard is IDENTICALLY 1.0
    // (|A∩A| = |A∪A|), so a group qualifies iff it has ≥ 2 members, a
    // non-empty shingle set (empty sets never band — the uncollapsed join
    // never meets shingle-less docs either), the caller's threshold
    // admits jaccard 1 (constant-folds), and the group survives the cap
    // in ≥ 1 band — the same condition under which the uncollapsed join
    // would have met the pair. A qualifying group rides as a SELF-pair
    // (rep, rep) through the one shared member expansion below, where
    // the id_a < id_b guard turns it into the group's C(members, 2)
    // distinct doc pairs.
    val selfPairs = reps
      .where(col("members") > 1 && size(col("sh")) > 0 && lit(1.0) >= threshold)
      .select(col("group_id").as("rep_a"), col("group_id").as("rep_b"),
        size(col("sh")).as("inter"), size(col("sh")).as("uni"),
        lit(1.0).as("jaccard"))
      .join(kept.select(col("rep_id").as("rep_a")), Seq("rep_a"), "left_semi")
    repPairs.unionByName(selfPairs)
      .join(members.select(col("rep_id").as("rep_a"), col("doc_id").as("id_a")), "rep_a")
      .join(members.select(col("rep_id").as("rep_b"), col("doc_id").as("id_b")), "rep_b")
      .where(col("rep_a") =!= col("rep_b") || col("id_a") < col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("inter"), col("uni"), col("jaccard"))
  }

  /** A side of a near-dup pair counts as "contained" when its shingle
    * containment |A∩B|/|A| reaches this many thousandths.
    */
  val ContainmentMilli: Long = 900L

  /** DIRECTIONAL containment classification of the near-dup pair set:
    * for each mined pair, |A∩B|/|A| and |A∩B|/|B| in integer
    * thousandths, and a relation verdict — `mutual` (two near-copies),
    * `a_in_b` / `b_in_a` (one side is essentially a subset: a quote, an
    * excerpt, a page embedded in a boilerplate shell), or `partial`.
    * Jaccard is symmetric and can't tell these apart; the asymmetric
    * view decides WHICH side a keeper policy should prefer (the
    * superset carries strictly more content). Candidate recall is the
    * pair miner's: a small-in-huge subset pair has LOW Jaccard and may
    * never band — detecting those is [[substringDuplicates]]' job; this
    * operator classifies the pairs the near-dup stage already acts on.
    *
    * Shape: the [[nearDuplicatePairsFromTable]] banded miner (never
    * all-pairs), then two slim doc_id-keyed joins that attach each
    * side's shingle-set SIZE (an int per doc, not the set). The milli
    * ratios are exact-integer floor divisions — bit-portable, no
    * doubles beyond the pair miner's own jaccard column.
    */
  def pairContainment(tbl: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sizes = tbl.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    nearDuplicatePairsFromTable(tbl, threshold)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .select(
        col("doc_a"), col("doc_b"), col("inter").cast("long").as("inter"),
        col("n_a"), col("n_b"),
        expr("CAST(inter AS BIGINT) * 1000 DIV n_a").as("cont_a_milli"),
        expr("CAST(inter AS BIGINT) * 1000 DIV n_b").as("cont_b_milli"))
      .withColumn("relation",
        when(
          col("cont_a_milli") >= ContainmentMilli &&
            col("cont_b_milli") >= ContainmentMilli, "mutual")
          .when(col("cont_a_milli") >= ContainmentMilli, "a_in_b")
          .when(col("cont_b_milli") >= ContainmentMilli, "b_in_a")
          .otherwise(lit("partial")))
  }

  /** EXACT near-duplicate pair mining by PREFIX FILTERING (the SSJoin /
    * PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008): the
    * deterministic, recall-1 complement to the MinHash banding miner.
    * Same input (the signature store's shingle sets), same threshold,
    * same output columns as [[nearDuplicatePairsFromTable]] — but where
    * banding is probabilistic (a pair can miss every band) and capped
    * (oversized buckets are dropped), this operator provably emits EVERY
    * pair with jaccard ≥ τ and so shares the brute-force oracle with no
    * equivalence caveat.
    *
    * The pruning theorem: fix any total order on shingles and sort each
    * set by it. If J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉ =: o, and
    * the smallest common shingle must sit within the first |S| − o + 1
    * elements of BOTH sets (all o common elements order at or after it,
    * so its position is ≤ |S| − o + 1). Hence joining only the length-
    * (|S| − ⌈τ|S|⌉ + 1) PREFIXES finds every qualifying pair, and the
    * order is chosen to make prefixes maximally selective: ascending
    * document frequency, so each doc's prefix holds its RAREST shingles
    * and corpus-common boilerplate shingles (the high-fan-out join keys)
    * are exiled to the suffixes that never join. A length filter
    * (τ|A| ≤ |B| ≤ |A|/τ, exact in cross-multiplied integers) prunes
    * size-incompatible candidates before the exact verify.
    *
    * Scale shape: df is one vocabulary-bounded hash-agg over DISTINCT
    * content (reps, so the order — and with it the whole pair set — is
    * invariant under duplication); per-set ordering is a local
    * array_sort, no global rank structure; candidates come from one
    * equi-join of the two prefix frames; verification is one
    * array_intersect per candidate pair. No caps and no drops — the
    * honest cost of exactness is that a corpus whose similar family is
    * quadratically large gets a quadratically large OUTPUT (the skew
    * replica's 16.7k-doc template family alone implies ~1.4×10⁸ true
    * pairs; the capped LSH miner is the documented scale path there,
    * this the ground-truth path where completeness is the contract).
    *
    * `maxPrefixGroup` (default: uncapped) is the deployable safety
    * valve for exactly that degenerate corpus: the prefix-join analog of
    * the banded miner's [[DefaultMaxBucketSize]] cap. A prefix join key
    * (one shingle) carried by n documents hands one task up to n(n−1)/2
    * candidate pairs, so groups whose DOC-WEIGHTED size (reps weighted
    * by their member counts, the same unit the banded cap compares)
    * exceeds the cap are dropped from the join up front by a broadcast
    * anti-join on the ≤handful of oversized shingles. The theorem's
    * recall-1 guarantee narrows to pairs that still share an uncapped
    * prefix shingle — on non-degenerate corpora the cap never fires and
    * the output is bit-identical to the exact miner (DedupSpec asserts
    * this), while a template-family flood loses only its intra-family
    * pairs, which enumerate quadratic boilerplate a pipeline would
    * collapse wholesale anyway.
    */
  /** The (rep_id, n, members, g) prefix frame of [[prefixNearDupPairs]]:
    * each rep's rarest-first length-(n − ⌈τn⌉ + 1) prefix, exploded one
    * shingle per row — shared with [[prefixGroupLoads]] so the
    * diagnostic weighs exactly the frame the miner joins.
    */
  private def prefixRows(reps: DataFrame, milli: Long): DataFrame = {
    val exploded = reps
      .select(col("rep_id"), col("members"), explode(col("sh")).as("g"))
    val dfreq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    // per-set (df asc, shingle asc) order + sizes; sh elements are
    // distinct by construction so collect_list is the set
    val ordered = exploded.join(dfreq, "g")
      .groupBy("rep_id")
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("rs"),
        count(lit(1)).as("n"), first(col("members")).as("members"))
    // prefix length n − ⌈τn⌉ + 1, all-integer ceil
    ordered
      .select(col("rep_id"), col("n"), col("members"),
        explode(slice(col("rs"), lit(1),
          (col("n") - expr(s"($milli * n + 999) DIV 1000") + lit(1))
            .cast("int"))).as("e"))
      .select(col("rep_id"), col("n"), col("members"), col("e.g").as("g"))
  }

  private def repsOf(tbl: DataFrame): DataFrame = {
    val keyed =
      if (tbl.columns.contains("group_id")) tbl else withContentGroups(tbl)
    keyed
      .where(col("doc_id") === col("group_id") && size(col("sh")) > 0)
      .select(col("group_id").as("rep_id"), col("sh"), col("members"))
  }

  /** τ·1000 as an exact integer — the unit every prefix-length and verify
    * comparison cross-multiplies in. Requiring integrality (rather than
    * silently rounding) keeps the "identical set to jaccard ≥ τ" claim
    * literally true: a non-milli τ (0.333, 0.8005…) would otherwise gate
    * at round(τ·1000)/1000 without anyone noticing.
    */
  private def milliOf(threshold: Double): Long = {
    val milli = math.round(threshold * 1000)
    require(milli.toDouble == threshold * 1000,
      s"threshold must be a multiple of 0.001 (got $threshold); " +
        s"the integer gate would silently become ${milli / 1000.0}")
    milli
  }

  def prefixNearDupPairs(
      tbl: DataFrame, threshold: Double = 0.5,
      maxPrefixGroup: Int = Int.MaxValue): DataFrame = {
    val milli = milliOf(threshold)
    val keyed =
      if (tbl.columns.contains("group_id")) tbl else withContentGroups(tbl)
    val reps = repsOf(tbl)
    val members = keyed.select(col("group_id").as("rep_id"), col("doc_id"))
    // consumed by both self-join sides — checkpoint, and repartition for
    // the same AQE-coalescing reason as the banded frames
    val prefixes = prefixRows(reps, milli)
      .repartition(tbl.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint()
    // cap gate: drop the (rare, degenerate) prefix join keys whose
    // doc-weighted fan-out exceeds the cap — one pass over the already-
    // checkpointed prefix frame, oversized keys broadcast to both sides
    val joinable =
      if (maxPrefixGroup == Int.MaxValue) prefixes
      else {
        val oversized = prefixes.groupBy("g")
          .agg(sum(col("members")).as("pg_docs"))
          .where(col("pg_docs") > maxPrefixGroup)
          .select("g")
        prefixes.join(broadcast(oversized), Seq("g"), "left_anti")
      }
    val candidates = joinable.as("l")
      .join(joinable.as("r"),
        col("l.g") === col("r.g") && col("l.rep_id") < col("r.rep_id") &&
          lit(1000L) * col("l.n") >= lit(milli) * col("r.n") &&
          lit(1000L) * col("r.n") >= lit(milli) * col("l.n"))
      .select(col("l.rep_id").as("rep_a"), col("r.rep_id").as("rep_b"))
      .distinct()
    val repSh = reps.select(col("rep_id"), col("sh"))
    // UNCAPPED verify runs at full machine width (see [[pinWidth]]); a
    // capped run's verify mass is bounded by the cap, so there the
    // forced exchanges would cost more than they parallelize (measured)
    val wide = maxPrefixGroup == Int.MaxValue
    def widen(key: String)(df: DataFrame): DataFrame =
      if (wide) pinWidth(df, key) else df
    val repPairs = candidates.transform(widen("rep_a"))
      .join(repSh.select(col("rep_id").as("rep_a"), col("sh").as("sh_a")), "rep_a")
      .transform(widen("rep_b"))
      .join(repSh.select(col("rep_id").as("rep_b"), col("sh").as("sh_b")), "rep_b")
      .select(
        col("rep_a"), col("rep_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("uni"))
      // exact integer gate — identical set to `jaccard >= threshold`
      .where(lit(1000L) * col("inter") >= lit(milli) * col("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
    // identical-content groups: jaccard is identically 1, no verify join
    // and — unlike the banded miner — no cap gate to survive
    val selfPairs = reps
      .where(col("members") > 1 && lit(1000L) >= lit(milli))
      .select(col("rep_id").as("rep_a"), col("rep_id").as("rep_b"),
        size(col("sh")).as("inter"), size(col("sh")).as("uni"),
        lit(1.0).as("jaccard"))
    repPairs.unionByName(selfPairs)
      .join(members.select(col("rep_id").as("rep_a"), col("doc_id").as("id_a")), "rep_a")
      .join(members.select(col("rep_id").as("rep_b"), col("doc_id").as("id_b")), "rep_b")
      .where(col("rep_a") =!= col("rep_b") || col("id_a") < col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("inter"), col("uni"), col("jaccard"))
  }

  /** Doc-weighted PREFIX-GROUP load card for [[prefixNearDupPairs]]'s
    * cap: one row per prefix join key (shingle) with the number of reps
    * whose prefix carries it, the doc-weighted size the cap compares,
    * the rep-pair mass the key hands the candidate join (n·(n−1)/2 over
    * its reps), and whether the cap would drop it. [[SkewReport]] prints
    * its rollup for the skew replica: the uncapped exact miner's blowup
    * there is the SUM of pair_mass, almost all of it owned by a handful
    * of oversized keys — the same concentration shape the banded
    * miner's bucket card shows.
    */
  def prefixGroupLoads(documents: DataFrame, threshold: Double = 0.5,
      cap: Int = DefaultMaxBucketSize): DataFrame = {
    val milli = milliOf(threshold)
    val reps = repsOf(shingleSignatureTable(documents))
    prefixRows(reps, milli)
      .groupBy("g")
      .agg(count(lit(1)).as("pg_reps"), sum(col("members")).as("pg_docs"))
      .select(col("g"), col("pg_reps"), col("pg_docs"),
        expr("pg_reps * (pg_reps - 1) DIV 2").as("pair_mass"),
        (col("pg_docs") > cap).as("oversized"))
  }

  /** AGREEMENT report between the two lexical near-dup detectors: the
    * MinHash/Jaccard pair set (shingle overlap ≥ 0.5) vs the SimHash
    * pair set (hamming ≤ 3 over token-hash sign sums), bucketed into
    * `both` / `minhash_only` / `simhash_only` pair counts. The methods
    * measure different similarity (set overlap vs weighted profile), so
    * divergence is a property of the CORPUS — a simhash_only surge
    * means documents share token distributions without sharing shingle
    * phrases (template/boilerplate families), and the report is how a
    * pipeline picks thresholds before committing to one detector at
    * 100 TB. On the driver corpus the split is 24 both / 1 minhash-only
    * / 708 simhash-only — the detectors genuinely disagree.
    *
    * Shape: both miners are the production banded joins (never
    * all-pairs); the comparison is one full-outer join keyed by the
    * pair itself and a ≤3-row rollup.
    */
  def dedupMethodAgreement(documents: DataFrame, tbl: DataFrame): DataFrame = {
    val mh = nearDuplicatePairsFromTable(tbl)
      .select(col("doc_a"), col("doc_b"), lit(true).as("in_minhash"))
    val sh = simhashNearDupPairs(documents)
      .select(col("doc_a"), col("doc_b"), lit(true).as("in_simhash"))
    mh.join(sh, Seq("doc_a", "doc_b"), "full_outer")
      .select(
        when(coalesce(col("in_minhash"), lit(false)) &&
          coalesce(col("in_simhash"), lit(false)), "both")
          .when(coalesce(col("in_minhash"), lit(false)), "minhash_only")
          .otherwise(lit("simhash_only")).as("method"))
      .groupBy("method")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Skew guard for band self-joins: anti-join away every (band, key)
    * bucket larger than `cap` before the bucket join goes quadratic on it.
    * The oversized set is tiny by construction (it IS the skew), so the
    * anti-join broadcasts — one extra aggregate over the banded rows, no
    * extra shuffle of them. Pairs inside a dropped bucket are NOT emitted;
    * callers that must not lose them should exact-dedup first (identical
    * docs are what make degenerate buckets).
    */
  private def dropOversizedBuckets(banded: DataFrame, cap: Int): DataFrame = {
    val oversized = banded
      .groupBy("band", "key")
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > cap)
      .select("band", "key")
    banded.join(broadcast(oversized), Seq("band", "key"), "left_anti")
  }

  /** Ops diagnostic: the document-weighted (band, key) bucket-load profile
    * the MinHash-LSH skew guard evaluates — one row per occupied bucket
    * with its summed member count (`bucket_n`, what the cap compares),
    * its DISTINCT-content row count (`distinct_n`, what the band join
    * actually self-joins), and whether the cap would drop it. In
    * production this is the monitoring query a dedup pipeline runs per
    * corpus snapshot to catch degenerate boilerplate before it costs a
    * quadratic join; here it also evidences the guards ENGAGING on the
    * skewed scale-up corpora (SCALING.md / [[graft.SkewReport]]).
    */
  def minhashBucketLoads(
      documents: DataFrame, cap: Int = DefaultMaxBucketSize): DataFrame = {
    val sh = shingled(documents).localCheckpoint()
    val keyed = withContentGroups(signaturesFromShingled(sh).join(sh, Seq("doc_id")))
    val reps = keyed.where(col("doc_id") === col("group_id"))
    val sigC = (0 until NumHashes).map(i => col(s"mh$i"))
    bandedKeys(
      reps.select(col("group_id").as("doc_id") +: col("members") +: sigC: _*),
      passThrough = Seq("members"))
      .groupBy("band", "key")
      .agg(sum("members").as("bucket_n"), count(lit(1)).as("distinct_n"))
      .withColumn("oversized", col("bucket_n") > cap)
  }

  /** [[minhashBucketLoads]]' SimHash twin: byte-band buckets of the 32-bit
    * signatures, weighted by signature-group size (the population the
    * weighted cap in [[simhashNearDupPairs]] compares against).
    */
  def simhashBucketLoads(
      documents: DataFrame, cap: Int = DefaultMaxBucketSize): DataFrame =
    simhashSignatures(documents)
      .groupBy("simhash").agg(count(lit(1)).as("members"))
      .select(
        col("members"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("key"))
        }: _*)).as("bk"))
      .select(col("members"), col("bk.band").as("band"), col("bk.key").as("key"))
      .groupBy("band", "key")
      .agg(sum("members").as("bucket_n"), count(lit(1)).as("distinct_n"))
      .withColumn("oversized", col("bucket_n") > cap)

  /** (doc_id, band, key) bucket rows of a signature frame — the LSH index
    * layout, shared by the self-join pair generator and the incremental
    * shard-vs-corpus probe. `passThrough` columns ride along unchanged
    * (e.g. the collapsed form's per-content member count).
    */
  private def bandedKeys(
      signatures: DataFrame, passThrough: Seq[String] = Nil): DataFrame =
    signatures
      .where(col("mh0").isNotNull)
      .select(
        col("doc_id") +: passThrough.map(col) :+
        explode(array((0 until Bands).map { b =>
          struct(
            lit(b).as("band"),
            HashFunctions.bandKey(
              (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}"))).as("key"))
        }: _*)).as("bk"): _*)
      .select(col("doc_id") +: passThrough.map(col) :+
        col("bk.band").as("band") :+ col("bk.key").as("key"): _*)

  /** LSH candidate pairs (a < b) from banded minhash signatures: docs
    * collide iff all RowsPerBand minhashes of some band agree. The join is
    * an equi-join on (band, key) — no cross join anywhere — with buckets
    * above `maxBucketSize` dropped first (see [[dropOversizedBuckets]]).
    */
  def lshCandidatePairs(
      signatures: DataFrame, maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // self-joined below: materialize so the signature pipeline above
    // runs once, not once per join side
    val banded = bandedKeys(signatures).localCheckpoint()
    val kept = dropOversizedBuckets(banded, maxBucketSize)
    kept.as("l")
      .join(kept.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, verified with the exact n-gram Jaccard:
    * candidates from [[lshCandidatePairs]], then intersection/union sizes
    * on the true shingle sets. `inter`/`uni` are exact ints; `jaccard` is
    * their single-division ratio. Keeps pairs with jaccard >= threshold.
    */
  def nearDuplicatePairs(
      documents: DataFrame, threshold: Double = 0.5,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // materialize shingles ONCE: they feed the signature pipeline plus both
    // sides of the verification join, and a self-join otherwise recomputes
    // its whole input subplan per side (localCheckpoint also cuts lineage).
    // At cluster scale this would be an explicit staged table or
    // MEMORY_AND_DISK persist — same idea, longer-lived.
    val sh = shingled(documents).localCheckpoint()
    // assemble the signature-table shape and share the duplicate-collapsed
    // pair generator with the from-table form (one implementation, one
    // oracle for both)
    nearDuplicatePairsFromTable(
      signaturesFromShingled(sh).join(sh, Seq("doc_id")), threshold, maxBucketSize)
  }

  /** Incremental near-dup: dedup an INCOMING shard against the existing
    * corpus WITHOUT re-pairing the corpus against itself — the
    * continuous-ingestion shape every production dedup pipeline runs
    * (each crawl batch probes the index; the corpus is never self-joined
    * again). The shard here is the top fifth of the doc_id range (split =
    * ⌊4·(max_id+1)/5⌋, a 1-row scalar broadcast — the n_docs pattern);
    * in production the split is the ingest boundary.
    *
    * Shape: the corpus's banded signature rows ARE the persisted LSH
    * index (built once — localCheckpoint stands in for the maintained
    * table); the shard computes only its own signatures and probes the
    * index with a banded equi-join, so a batch costs O(shard + matched
    * buckets) — never corpus × corpus, and never corpus-scale per batch.
    * The bucket-size cap applies to the index side (a curated artifact;
    * crowded buckets are degenerate shingles there, same rationale as
    * [[lshCandidatePairs]]). Candidates verify with the exact shingle
    * Jaccard like [[nearDuplicatePairs]].
    */
  /** The ingest boundary: ⌊4·(max_id+1)/5⌋, collected once (a 1-row
    * bounded head). None on an empty table.
    */
  private[graft] def ingestSplitOf(documents: DataFrame): Option[Long] = {
    val mx = documents.agg(max(col("doc_id"))).head()
    if (mx.isNullAt(0)) None else Some((mx.getLong(0) + 1L) * 4L / 5L)
  }

  /** The persisted corpus-side LSH index: capped banded signature rows of
    * the documents below the split (built ONCE; probed by every batch).
    */
  private[graft] def corpusBandIndex(
      corpusSh: DataFrame, maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    dropOversizedBuckets(bandedKeys(signaturesFromShingled(corpusSh)), maxBucketSize)

  /** One shard batch probed against the index: the shard computes only its
    * own signatures, candidates come from the banded equi-join, and the
    * exact shingle Jaccard verifies — shared verbatim by the batch
    * operator and the streaming per-micro-batch twin, so both answer
    * identically off one oracle.
    */
  private[graft] def probeCorpusIndex(
      shardSh: DataFrame, corpusIdx: DataFrame, corpusSh: DataFrame,
      threshold: Double): DataFrame = {
    val shardKeys = bandedKeys(signaturesFromShingled(shardSh))
    val cand = corpusIdx.as("l")
      .join(shardKeys.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key"))
      .select(col("l.doc_id").as("corpus_doc"), col("r.doc_id").as("shard_doc"))
      .distinct()
    cand
      .join(corpusSh.select(col("doc_id").as("corpus_doc"), col("sh").as("sh_a")), "corpus_doc")
      .join(shardSh.select(col("doc_id").as("shard_doc"), col("sh").as("sh_b")), "shard_doc")
      .select(
        col("corpus_doc"), col("shard_doc"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .where(col("jaccard") >= threshold)
  }

  /** Empty result frame with the incremental-pair schema. */
  private[graft] def emptyIncrementalPairs(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Seq.empty[(Long, Long, Int, Int, Double)]
      .toDF("corpus_doc", "shard_doc", "inter", "uni", "jaccard")
  }

  def incrementalNearDups(
      documents: DataFrame, threshold: Double = 0.5,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    ingestSplitOf(documents) match {
      case None => emptyIncrementalPairs(documents)
      case Some(split) =>
        // shingles computed ONCE for both sides (index build + both ends
        // of the verification join)
        val sh = shingled(documents).localCheckpoint()
        val idx = corpusBandIndex(sh.where(col("doc_id") < split), maxBucketSize)
        probeCorpusIndex(sh.where(col("doc_id") >= split), idx, sh, threshold)
    }

  /** [[incrementalNearDups]] over a persisted signature table: the corpus
    * band index derives from STORED signatures (no re-shingling of the
    * corpus — the part that must never be reprocessed per batch at 100 TB)
    * and the shard side probes with its stored rows too. Identical pairs
    * to the from-text form, same oracle.
    */
  def incrementalNearDupsFromTable(
      tbl: DataFrame, threshold: Double = 0.5,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    ingestSplitOf(tbl) match {
      case None => emptyIncrementalPairs(tbl)
      case Some(split) =>
        probeStoredIndex(
          corpusBandIndexFromTable(
            tbl.where(col("doc_id") < split), maxBucketSize),
          tbl.where(col("doc_id") >= split),
          tbl.select(col("doc_id"), col("sh")), threshold)
    }

  /** The capped corpus band index from STORED signatures — the from-table
    * analogue of [[corpusBandIndex]] (no recomputation of anything).
    */
  private[graft] def corpusBandIndexFromTable(
      corpusTbl: DataFrame,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    dropOversizedBuckets(bandedKeys(sigCols(corpusTbl)), maxBucketSize)

  /** One shard probed against a stored-signature index: the from-table
    * probe half of [[incrementalNearDupsFromTable]], reusable by any
    * consumer holding the index as a frozen artifact (the incremental
    * leak-free split, the streaming probes). `sh` resolves both ends of
    * the verification join.
    */
  private[graft] def probeStoredIndex(
      idx: DataFrame, shardTbl: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val shardKeys = bandedKeys(sigCols(shardTbl))
    val cand = idx.as("l")
      .join(shardKeys.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key"))
      .select(col("l.doc_id").as("corpus_doc"), col("r.doc_id").as("shard_doc"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("corpus_doc"), col("sh").as("sh_a")), "corpus_doc")
      .join(sh.select(col("doc_id").as("shard_doc"), col("sh").as("sh_b")), "shard_doc")
      .select(
        col("corpus_doc"), col("shard_doc"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .where(col("jaccard") >= threshold)
  }

  /** Arrival band width for [[ingestDupRateFromTable]] — small here so
    * the driver shard (one fifth of the corpus) spans several bands; a
    * real ingest keys this by arrival hour/batch id instead of id range.
    */
  val IngestBand = 32L

  /** Ingestion dup-rate monitor — the dashboard number a continuous-
    * ingestion dedup pipeline actually watches: per band of arriving
    * doc_ids, how many documents came in, how many were near-duplicates
    * of the EXISTING corpus (distinct shard docs in the incremental
    * probe's pair set), and the rate in integer thousandths. A band whose
    * rate spikes means the crawler is re-fetching known content — the
    * upstream signal to throttle, and exactly what the reference's
    * progress dashboard generalizes to for this pipeline.
    *
    * Shape: the [[incrementalNearDupsFromTable]] probe (O(shard) per
    * band, corpus never self-joined), a distinct on shard ids, a
    * left-join flag, and a |bands|-row rollup. All integers.
    */
  def ingestDupRateFromTable(
      tbl: DataFrame, band: Long = IngestBand): DataFrame =
    ingestSplitOf(tbl) match {
      case None =>
        tbl.select(col("doc_id").as("band"), lit(0L).as("n_arrived"),
          lit(0L).as("n_dup"), lit(0L).as("dup_rate_milli")).limit(0)
      case Some(split) =>
        val dups = incrementalNearDupsFromTable(tbl)
          .select(col("shard_doc").as("doc_id")).distinct()
          .withColumn("d", lit(true))
        tbl.where(col("doc_id") >= split).select(col("doc_id"))
          .join(dups, Seq("doc_id"), "left")
          .groupBy(expr(s"doc_id div ${band}L").as("band"))
          .agg(count(lit(1)).as("n_arrived"),
            sum(when(col("d"), 1L).otherwise(0L)).as("n_dup"))
          .withColumn("dup_rate_milli", expr("(n_dup * 1000) div n_arrived"))
    }

  /** Near-duplicate CLUSTERS: connected components over the
    * [[nearDuplicatePairs]] graph, labeled by the component's minimum
    * doc_id. Every document gets a row — docs with no near-dup partner are
    * singleton clusters of themselves — so the output is a complete dedup
    * assignment table: keep `doc_id == cluster_id`, drop the rest, and
    * `cluster_n` says how many documents each keeper represents.
    *
    * Shape: distributed min-label propagation. Each round every node takes
    * the min of its own label and its neighbors' labels — one shuffle join
    * (edges ⋈ labels) plus one hash-agg per round — and the loop stops when
    * a round changes nothing. Rounds needed = graph diameter, and near-dup
    * components are dense quasi-cliques (every member overlaps the same
    * content), so 2-3 rounds close them; `maxIter` bounds pathological
    * chains. The loop iterates ONLY over nodes with at least one edge — at
    * 100 TB the pair graph is a tiny fraction of the corpus, so the
    * per-round shuffles touch |pairs|-scale data, never corpus-scale;
    * singletons join back in one final corpus-scale left join. For graphs
    * with genuinely long chains, the O(log n)-round large-star/small-star
    * contraction — Kiveris et al., "Connected Components in MapReduce and
    * Beyond" — kicks in automatically when propagation fails to converge
    * ([[starContractionLabels]]); plain propagation stays the default
    * because it has the better constant for dedup's clique-shaped
    * components. Per-round `localCheckpoint` cuts
    * the otherwise exponentially-growing lineage; a cluster deployment
    * would use checkpoint-to-HDFS or a staged table, same idea.
    */
  def nearDupClusters(
      documents: DataFrame, threshold: Double = 0.5, maxIter: Int = 20,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    clustersFromPairs(
      documents,
      nearDuplicatePairs(documents, threshold, maxBucketSize)
        .select(col("doc_a"), col("doc_b")),
      maxIter)

  /** Connected components over an arbitrary duplicate-pair relation
    * (doc_a, doc_b) — the clustering half of [[nearDupClusters]], usable
    * with any pair source: MinHash ([[nearDuplicatePairs]]), SimHash
    * ([[simhashNearDupPairs]]), or embedding-cosine
    * ([[Similarity.cosineNearDupPairsBlocked]]) pairs.
    *
    * PRECONDITION: pair endpoints must be drawn from `documents` (every
    * in-library pair source guarantees this — pairs are derived from the
    * same frame). Endpoints outside it would inflate `cluster_n`, which is
    * counted over the label frame so the corpus is scanned only once.
    */
  def clustersFromPairs(
      documents: DataFrame, pairs0: DataFrame, maxIter: Int = 20): DataFrame = {
    val pairs = pairs0.select(col("doc_a"), col("doc_b"))
    // undirected: propagate both ways each round. Both orientations come
    // from ONE explode over ONE evaluation of the pair plan — the naive
    // union of two selects would execute the (expensive: LSH join + exact
    // verify) pair pipeline once per branch
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // label init fused with the first propagation round: label(0) =
    // min(self, min neighbor id) — exactly what round 1 over self-labels
    // would produce, for the cost of the node-distinct aggregate we needed
    // anyway. Dense quasi-clique components (the near-dup shape) converge
    // AT init, so the loop's only work is the no-change confirmation round.
    var labels = edges
      .groupBy(col("src").as("doc_id"))
      .agg(min("dst").as("nbr_min"))
      .select(col("doc_id"), least(col("doc_id"), col("nbr_min")).as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst")).agg(min("cluster_id").as("nbr_min"))
      // convergence detection rides the SAME pass as the label update: a
      // `changed` flag is projected next to the new label and materialized
      // by the (eager) localCheckpoint, so the emptiness probe below scans
      // cached blocks only — no second join/shuffle per round (at 100 TB
      // each extra distributed action is a full shuffle round)
      val next = labels
        .join(nbrMin, labels("doc_id") === nbrMin("dst"), "left")
        .select(
          col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          (col("nbr_min").isNotNull && col("nbr_min") < col("cluster_id"))
            .as("changed"))
        .localCheckpoint()
      converged = next.where(col("changed")).isEmpty
      labels = next.select("doc_id", "cluster_id")
      iter += 1
    }
    // partial labels are silently WRONG (callers and the oracle expect the
    // transitive-closure fixpoint), so a diameter->maxIter graph falls back
    // to the O(log n)-round star contraction, which converges on any shape
    if (!converged) labels = starContractionLabels(edges)
    labelsToClusters(documents, labels)
  }

  /** The corpus-join tail shared by both CC strategies: attach cluster ids
    * and sizes to every document, singletons included.
    */
  private def labelsToClusters(documents: DataFrame, labels: DataFrame): DataFrame = {
    // sizes come from the |edge-nodes|-scale label frame, not the corpus:
    // every multi-doc cluster consists of edge nodes only, and singletons
    // (docs with no pairs) are always clusters of exactly 1 — so the
    // corpus-scale `assigned` frame is built and scanned ONCE, with
    // cluster_n filled by coalesce for the singletons
    val sizes = labels.groupBy(col("cluster_id").as("cid"))
      .agg(count(lit(1)).as("cluster_n"))
    documents
      .select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .join(sizes, col("cluster_id") === col("cid"), "left")
      .select(col("doc_id"), col("cluster_id"), coalesce(col("cluster_n"), lit(1L)).as("cluster_n"))
  }

  /** O(log n)-round connected components by alternating large-star /
    * small-star contraction (Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — the fallback [[clustersFromPairs]] selects
    * when min-label propagation hits maxIter, i.e. when a component's
    * diameter exceeds the round budget (chain-shaped graphs). Rounds are
    * O(log n) in the component size regardless of diameter, so a 10^9-node
    * path needs ~30 rounds where propagation would need 10^9.
    *
    * Round shape, all |edges|-scale (never corpus-scale): LARGE-STAR links
    * every neighbor v > u to m = min(N(u) ∪ u) — one groupBy + one
    * re-join; SMALL-STAR links every smaller-side neighbor and u itself to
    * the group min — same cost. The edge set only moves toward stars
    * centered at component minima, and the fixpoint check compares round
    * output to round input as sets. Input `edges` carries both
    * orientations of each pair; output is one (doc_id, cluster_id) row per
    * edge endpoint, cluster_id = component min, matching the propagation
    * loop's label contract exactly.
    */
  private def starContractionLabels(edges: DataFrame): DataFrame = {
    // state: each undirected edge once, oriented src > dst (large-star
    // output naturally has this shape, see below)
    var cur = edges.where(col("src") > col("dst")).distinct().localCheckpoint()
    var converged = cur.isEmpty
    var rounds = 0
    // star-count halves (amortized) per round: 64 covers any Long-keyed
    // graph; reaching it means a logic bug, not a big input — fail loudly
    val maxRounds = 64
    while (!converged && rounds < maxRounds) {
      // LARGE-STAR over undirected neighborhoods: both orientations from
      // one explode (one evaluation of cur), m(u) = min(N(u) ∪ u); emit
      // (v, m(u)) for v > u. Each undirected edge is emitted exactly once
      // (from its smaller endpoint's group), and m(u) <= u < v keeps the
      // src > dst orientation invariant.
      val und = cur
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val lsMin = und.groupBy("src").agg(min("dst").as("nbr_min"))
        .select(col("src").as("u"), least(col("src"), col("nbr_min")).as("m"))
      val ls = und.join(lsMin, und("src") === col("u"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
      // SMALL-STAR on the (bigger -> smaller) edges: per group u, link
      // every smaller neighbor and u itself to m = min(N⁻(u)); self-links
      // (m -> m) never arise because the m-row itself is filtered and u > m.
      val ssMin = ls.groupBy("src").agg(min("dst").as("m"))
      val next = ls.join(ssMin, Seq("src"))
        .where(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionAll(ssMin.select(col("src"), col("m").as("dst")))
        .distinct()
        .localCheckpoint()
      // set-equality fixpoint probe: both sides are distinct and cached
      // (localCheckpoint), so this is two scans of cached blocks, no
      // recomputation of the round
      converged = next.count() == cur.count() && next.except(cur).isEmpty
      cur = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not reach a fixpoint in $maxRounds rounds — " +
          "impossible for any Long-keyed graph; indicates corrupt pair input")
    // fixpoint = stars: every non-root points at its component min, roots
    // appear only on the dst side. min() guards the (never-observed) case
    // of a node carrying two star edges mid-collapse.
    val nodes = cur.select(col("src").as("doc_id"))
      .unionAll(cur.select(col("dst").as("doc_id")))
      .distinct()
    val parent = cur.groupBy(col("src").as("doc_id")).agg(min("dst").as("p"))
    nodes.join(parent, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("p"), col("doc_id")).as("cluster_id"))
  }

  /** 32-bit SimHash per document over the (multiset) whitespace tokens:
    * explode → one 32-bit hash per token → 32 conditional bit sums → one
    * hash-agg by doc_id → recombine bits. Map-side partial aggregation
    * applies, so the shuffle carries 32 ints per doc, not the tokens.
    */
  def simhashSignatures(documents: DataFrame, seed: Int = 99): DataFrame = {
    val perToken = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), explode(split(trim(graft.functions.TextFunctions.nfc(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"), HashFunctions.md5Int32(col("tok"), seed).as("h32"))
    val bitSums = (0 until 32).map(b =>
      sum(HashFunctions.simhashBitTerm(col("h32"), b)).as(s"b$b"))
    val signature = (0 until 32)
      .map(b => when(col(s"b$b") > 0, 1L << b).otherwise(0L))
      .reduce(_ + _)
    perToken
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), signature.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found via
    * band join: the 32-bit signature splits into 4 bytes; by pigeonhole,
    * any pair within Hamming distance 3 matches on at least one byte, so
    * the band join is EXACT for maxDist <= 3 — same result as the O(n²)
    * scan, at bucket-join cost. Exactness assumes no bucket exceeds
    * `maxBucketSize` documents (the cap is the skew escape hatch for
    * degenerate identical-signature clusters; see
    * [[dropOversizedBuckets]]).
    *
    * COLLAPSE IDENTICAL SIGNATURES FIRST (r8): Hamming distance is a pure
    * function of the two signatures, so a signature group shares one
    * verdict — band-join and score DISTINCT signatures only, then expand
    * group cross products. Without this, duplicated corpora (the crawl
    * shape) square the bucket-join volume: every copy of a document shares
    * every one of its 4 byte-buckets with every other copy, and the
    * candidate join went 13× super-linear at the 10× scale-up. With it,
    * band-join work scales with distinct signatures; the duplication
    * factor survives only in the (unavoidable) output expansion. The
    * bucket cap still counts DOCUMENTS (sum of group sizes per bucket), so
    * exactly the buckets the uncollapsed join would drop are dropped.
    */
  def simhashNearDupPairs(
      documents: DataFrame, maxDist: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(maxDist <= 3, "byte-banding over 32 bits is only exact for maxDist <= 3")
    val sigs = simhashSignatures(documents)
      .localCheckpoint() // feeds groups, intra pairs, and both expansions
    val groups = sigs.groupBy("simhash").agg(count(lit(1)).as("members"))
    // EXPLICIT round-robin repartition before the self-join: groups is an
    // aggregation output that AQE coalesces to few partitions when
    // distinct signatures are few, and the band join's candidate
    // expansion inherits the stream side's partitioning — with one stream
    // partition the expansion runs in one task (Parallelism.ensure can't
    // see this: post-aggregation/checkpoint stats are unknown)
    val banded = groups.select(
      col("simhash"), col("members"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("key"))
      }: _*)).as("bk"))
      .select(col("simhash"), col("members"), col("bk.band").as("band"), col("bk.key").as("key"))
      .repartition(documents.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint() // self-joined: compute the banding once
    // document-weighted cap: a bucket's population is the sum of its
    // signature-group sizes, which is exactly the uncollapsed bucket size
    val oversized = banded
      .groupBy("band", "key")
      .agg(sum("members").as("bucket_n"))
      .where(col("bucket_n") > maxBucketSize)
      .select("band", "key")
    val kept = banded.join(broadcast(oversized), Seq("band", "key"), "left_anti")
    // one Hamming evaluation per DISTINCT signature pair
    val repPairs = kept.as("l")
      .join(kept.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.simhash") < col("r.simhash"))
      .select(col("l.simhash").as("sig_a"), col("r.simhash").as("sig_b"))
      .distinct()
      .withColumn("dist", HashFunctions.hamming(col("sig_a"), col("sig_b")))
      .where(col("dist") <= maxDist)
    // expand each qualifying signature pair to its groups' cross product
    val inter = repPairs
      .join(sigs.select(col("simhash").as("sig_a"), col("doc_id").as("id_a")), "sig_a")
      .join(sigs.select(col("simhash").as("sig_b"), col("doc_id").as("id_b")), "sig_b")
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("dist"))
    // intra-group pairs: identical signatures, dist 0 — emitted iff the
    // group survives in at least one of its 4 buckets, the same condition
    // under which the uncollapsed join would have met the pair
    val keptSigs = kept.select("simhash").distinct()
    val m = sigs.join(keptSigs, Seq("simhash"))
    val intra = m.as("a")
      .join(m.as("b"),
        col("a.simhash") === col("b.simhash") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        HashFunctions.hamming(col("a.simhash"), col("b.simhash")).as("dist"))
    inter.unionByName(intra)
  }

  /** Exact-substring dedup, the token-window formulation (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): every
    * k-token window that occurs at least `minOccurrences` times ANYWHERE in
    * the corpus (across documents or repeated inside one) marks its span,
    * and overlapping marked spans per document merge into maximal
    * (span_start, span_end) token ranges — the ranges a training-data
    * pipeline cuts out of the text. Complements MinHash (whole-document
    * near-dup): this catches shared boilerplate/quotation RUNS inside
    * otherwise-distinct documents.
    *
    * Scale shape (the published approach uses a single-machine suffix
    * array — inherently not distributable; the window formulation is):
    * one pass computes per-row window fingerprints
    * ([[graft.functions.NgramFingerprints]] — 128-bit, so the shuffle
    * carries 16 bytes per window, never the k-token text), one
    * hash-aggregate counts occurrences (map-side combine absorbs
    * intra-partition repeats), a semi-join keeps duplicated windows, and
    * the interval merge is a per-document sort — partitions bounded by
    * document length, never by corpus size. Everything is linear in total
    * tokens; there is no pairwise term at all (unlike LSH there is not
    * even a candidate join — counting, not pairing).
    */
  def duplicatedNgramSpans(
      documents: DataFrame, k: Int = 8, minOccurrences: Int = 2): DataFrame = {
    import graft.functions.NgramExpressions.ngramFingerprints
    import org.apache.spark.sql.expressions.Window
    // raw single-space tokenization: substring dedup must see the text the
    // pipeline would actually cut, not a normalized shadow of it
    val grams = graft.Parallelism.ensure(documents)
      .select(col("doc_id"),
        posexplode(ngramFingerprints(split(col("text"), " "), k)).as(Seq("start", "h")))
      .select(col("doc_id"), col("start"), col("h.h1").as("h1"), col("h.h2").as("h2"))
    val dupKeys = grams
      .groupBy("h1", "h2")
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minOccurrences)
      .select("h1", "h2")
    val spans = grams
      .join(dupKeys, Seq("h1", "h2"), "left_semi")
      .select(col("doc_id"), col("start").cast("long").as("start"),
        (col("start") + k).cast("long").as("end"))
    mergeSpans(spans)
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** Classic interval merge as two window passes over one per-doc sort:
    * a span opens an island iff it starts past everything seen before
    * it. Input (doc_id, start, end), output maximal disjoint
    * (doc_id, span_start, span_end). Partitions bounded by per-document
    * span counts, never corpus size.
    */
  private def mergeSpans(spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("start")
    val prevMax = max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("opens", when(prevMax.isNull || col("start") > prevMax, 1).otherwise(0))
      .withColumn("island", sum("opens").over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("start").as("span_start"), max("end").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** Character-window length for [[duplicatedCharSpans]] — Lee et al.'s
    * published 50-unit threshold, at character granularity (= bytes for
    * this corpus's code points; the operator is parametric in the unit).
    */
  val CharSpanLen = 50

  /** EXACT-substring dedup at suffix-array semantics —
    * [[duplicatedNgramSpans]]'s own docstring names the single-machine
    * suffix array as the published exact method; this is that
    * exactness, distributed. The definition the suffix array computes —
    * "every position inside some length-≥50 substring that occurs at
    * least twice in the corpus" — is EQUAL to "every position covered by
    * a duplicated 50-char window": a duplicated run of length L ≥ 50
    * contains L−49 duplicated windows covering exactly the run, and
    * every duplicated window is itself a duplicated length-50 substring.
    * So counting window fingerprints reproduces the suffix array's
    * marked set verbatim — with no suffix array, no single machine, and
    * the same one-hash-agg, zero-pair-join shape as the token-window
    * form. The token form is the cheap approximation (8-token windows,
    * ~1/8th the fingerprints); this is the ground truth it approximates;
    * [[substringExactnessGap]] prices the difference per document.
    *
    * One row per maximal duplicated char run: (doc_id, span_start,
    * span_end, span_chars) — 0-based char offsets, end exclusive.
    */
  def duplicatedCharSpans(
      documents: DataFrame, k: Int = CharSpanLen,
      minOccurrences: Int = 2): DataFrame = {
    import graft.functions.NgramExpressions.ngramFingerprints
    val grams = graft.Parallelism.ensure(documents)
      .select(col("doc_id"),
        posexplode(ngramFingerprints(split(col("text"), ""), k))
          .as(Seq("start", "h")))
      .select(col("doc_id"), col("start"), col("h.h1").as("h1"), col("h.h2").as("h2"))
    val dupKeys = grams
      .groupBy("h1", "h2")
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minOccurrences)
      .select("h1", "h2")
    val spans = grams
      .join(dupKeys, Seq("h1", "h2"), "left_semi")
      .select(col("doc_id"), col("start").cast("long").as("start"),
        (col("start") + k).cast("long").as("end"))
    mergeSpans(spans)
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_chars"))
  }

  /** EXACTNESS-GAP card: where the cheap token-window spans
    * ([[duplicatedNgramSpans]], k = 8 tokens) and the exact char-window
    * spans ([[duplicatedCharSpans]], 50 chars) disagree, per document —
    * both measured in CHARACTERS (token spans are converted through the
    * corpus's own `split(text, " ")` offsets: token i starts at
    * Σ_{j<i}(len(tok_j) + 1)). The two directions of disagreement are
    * both real: a duplicated run of ≥50 chars in <8 tokens (long tokens
    * — URLs, hashes) is exact-only; a duplicated 8-token run under 50
    * chars (short words) is window-only. |A∩B| and the asymmetric
    * differences come from one extra interval merge of the CONCATENATED
    * span sets (|A∪B|), so nothing is ever pairwise.
    *
    * One row per document with any coverage: (doc_id, exact_chars,
    * window_chars, union_chars, only_exact_chars, only_window_chars).
    */
  def substringExactnessGap(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO checkpoint of the corpus: the three consumers below re-scan the
    // 2-column parquet projection (cheap, pushed down) instead of pinning
    // corpus text in block memory — checkpointing here OOM'd the 100×
    // replica; only the slim span frames are worth materializing
    val docs = graft.Parallelism.ensure(documents)
    val exact = duplicatedCharSpans(docs)
      .select(col("doc_id"), col("span_start").as("start"), col("span_end").as("end"))
      .localCheckpoint()
    // token→char offsets per SPAN, not per token: char start of token p in
    // the single-space join is len(join(first p tokens)) + 1 (0 for p = 0),
    // and the char end of token span [a, b) is len(join(first b tokens)).
    // Post-merge spans are a handful per doc, so two O(doc-chars)
    // slice-joins per span beat exploding every token and window-sorting a
    // corpus-sized (doc, pos) frame — the explode form's sort buffers
    // OOM'd the 100× replica under 32-way concurrency.
    val window = duplicatedNgramSpans(docs)
      .join(docs.select(col("doc_id"), split(col("text"), " ").as("ts")), "doc_id")
      .select(col("doc_id"),
        when(col("span_start") === 0, lit(0L))
          .otherwise(length(array_join(
            slice(col("ts"), lit(1), col("span_start").cast("int")), " "))
            .cast("long") + 1L).as("start"),
        length(array_join(
          slice(col("ts"), lit(1), col("span_end").cast("int")), " "))
          .cast("long").as("end"))
      .localCheckpoint()
    def cover(spans: DataFrame, name: String): DataFrame =
      mergeSpans(spans).groupBy("doc_id")
        .agg(sum(col("span_end") - col("span_start")).as(name))
    val e = cover(exact, "exact_chars")
    val w = cover(window, "window_chars")
    val u = cover(exact.unionByName(window), "union_chars")
    u.join(e, Seq("doc_id"), "left")
      .join(w, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_chars"), lit(0L)).as("exact_chars"),
        coalesce(col("window_chars"), lit(0L)).as("window_chars"),
        col("union_chars"),
        (col("union_chars") - coalesce(col("window_chars"), lit(0L)))
          .as("only_exact_chars"),
        (col("union_chars") - coalesce(col("exact_chars"), lit(0L)))
          .as("only_window_chars"))
  }

  /** Stand-in benchmark selection for [[benchmarkContamination]]'s
    * registration: every ~50th document by content hash plays the
    * external eval set (so contamination exists by construction — the
    * members themselves plus their planted near-dups sit in the corpus).
    * A real deployment passes the actual benchmark table; nothing below
    * depends on the eval frame's origin.
    */
  val EvalSampleMod = 50L
  val EvalSampleSeed = 61

  /** Window length and min shared distinct windows for the
    * contamination verdict (2 disjoint-ish 8-gram hits ≈ a 9+-token
    * shared passage — one shared window can be a common idiom).
    */
  val ContamMinShared = 2L

  /** Corpus-hot window cap: windows carried by more than this many
    * DISTINCT corpus contents leave the contamination join on both sides
    * (broadcast anti-join — the winnow-overlap bucket-cap discipline).
    * Matching a benchmark on corpus-wide boilerplate is not the
    * contamination signal (the benchmark-specific CONTENT is), and a
    * hot window straddling both sides is exactly what turns the gram
    * join quadratic on a template flood — measured: the skew replica's
    * verdict scan drops 21 s → ~uniform with the cap, and at driver
    * scales no window is hot, so the cap is pure insurance there (the
    * oracle replays it, keeping that a checked fact).
    */
  val ContamHotCap = 64L

  /** BENCHMARK DECONTAMINATION scan — the pre-training hygiene step
    * every serious pipeline runs (GPT-3 appendix C, The Pile, Llama):
    * flag corpus documents sharing ≥ `minShared` distinct `k`-token
    * windows with ANY document of an EVAL set, so test questions the
    * model will be scored on are removed from (or at least known in)
    * the training data. Unlike the corpus×corpus pair miners this is
    * corpus×SMALL-EXTERNAL: the eval side is a benchmark (MBs at 100 TB
    * scale), so its distinct window fingerprints broadcast and the scan
    * costs one corpus n-gram pass + a broadcast hash join — no shuffle
    * of corpus grams at all when the eval side fits, and the output is
    * bounded by true contamination, not corpus size.
    *
    * One row per contaminated (corpus doc, eval doc) pair:
    * (doc_id, eval_id, shared_ngrams) — distinct shared windows, so a
    * repeated idiom inside one doc counts once. An eval member present
    * verbatim in the corpus flags itself (doc_id == eval_id, the removal
    * case); near-copies flag with fewer shared windows.
    */
  def benchmarkContamination(
      documents: DataFrame, eval: DataFrame,
      k: Int = 8, minShared: Long = ContamMinShared): DataFrame = {
    val (keyed, reps, repGrams) = collapsedGrams(documents, k)
    keyed
      .join(reps.select(col("fp"), col("rep_id")), "fp")
      .join(repVerdicts(repGrams,
        contaminationIndex(repGrams, eval, k), minShared), "rep_id")
      .select(col("doc_id"), col("eval_id"), col("shared_ngrams"))
  }

  /** Identical-content collapse: one representative (min doc_id) row per
    * distinct text. Both contamination sides collapse before pairing —
    * without it, a duplicated passage on BOTH sides multiplies the
    * verdict join quadratically (measured on the skew replica: the
    * boilerplate template family × its eval-draw copies took the scan
    * from 4.2 s to 89 s at sf1; rep-collapse restores ~uniform cost).
    * Verdicts are pure functions of content, so collapsing loses
    * nothing: corpus members are re-expanded afterwards (linear in
    * FLAGGED docs), and identical eval copies ARE one benchmark item —
    * the min eval id labels it.
    */
  private def contentReps(df: DataFrame): DataFrame =
    df.select(md5(col("text")).as("fp"), col("doc_id"), col("text"))
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("text"))).as("m"))
      .select(col("fp"), col("m.doc_id").as("rep_id"), col("m.text").as("text"))

  /** The frozen eval-side artifact: distinct window fingerprints of the
    * content-collapsed eval set, keyed by the group's min doc_id.
    */
  private[graft] def evalGramsOf(eval: DataFrame, k: Int = 8): DataFrame =
    docGrams(contentReps(eval)
      .select(col("rep_id").as("doc_id"), col("text")), "eval_id", k)

  /** Distinct k-token window fingerprints per document — the frame both
    * contamination sides reduce to.
    */
  private[graft] def docGrams(df: DataFrame, idAs: String, k: Int = 8): DataFrame = {
    import graft.functions.NgramExpressions.ngramFingerprints
    df.select(col("doc_id").as(idAs),
        explode(ngramFingerprints(split(col("text"), " "), k)).as("h"))
      .select(col(idAs), col("h.h1").as("h1"), col("h.h2").as("h2"))
      .distinct()
  }

  /** The collapsed frames every contamination consumer starts from: the
    * (fp, doc_id) membership, the content reps, and the reps' distinct
    * window fingerprints (checkpointed — consumed by hot-window capping
    * and the verdict join).
    */
  private def collapsedGrams(
      docs: DataFrame, k: Int): (DataFrame, DataFrame, DataFrame) = {
    val keyed = docs.select(md5(col("text")).as("fp"), col("doc_id"))
    val reps = contentReps(docs).localCheckpoint()
    val repGrams = graft.Parallelism.ensure(
        docGrams(reps.select(col("rep_id").as("doc_id"), col("text")), "rep_id", k))
      .localCheckpoint()
    (keyed, reps, repGrams)
  }

  /** The CAPPED eval index — the artifact both the batch scan and the
    * streaming gate probe (frozen in the stream): the eval reps' window
    * fingerprints minus the corpus-hot windows ([[ContamHotCap]]). The
    * capping lives HERE, on the index, so a micro-batch's verdicts
    * depend only on (its own content, the frozen index) and stream ==
    * batch holds row for row.
    */
  private[graft] def contaminationIndex(
      corpusRepGrams: DataFrame, eval: DataFrame, k: Int = 8): DataFrame = {
    val hot = corpusRepGrams.groupBy("h1", "h2")
      .agg(count(lit(1)).as("n"))
      .where(col("n") > ContamHotCap)
      .select("h1", "h2")
    evalGramsOf(eval, k).join(broadcast(hot), Seq("h1", "h2"), "left_anti")
  }

  /** One-call index builder for the streaming twin: the static corpus's
    * collapsed rep grams feed the hot-window cap, the result is the
    * frozen artifact every micro-batch probes.
    */
  private[graft] def corpusContaminationIndex(
      docs: DataFrame, eval: DataFrame, k: Int = 8): DataFrame = {
    val (_, _, repGrams) = collapsedGrams(docs, k)
    contaminationIndex(repGrams, eval, k).localCheckpoint()
  }

  private def repVerdicts(
      repGrams: DataFrame, evalIdx: DataFrame, minShared: Long): DataFrame =
    repGrams
      .join(broadcast(evalIdx), Seq("h1", "h2"))
      .groupBy("rep_id", "eval_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)

  /** The probe tail shared by [[benchmarkContamination]] and the
    * streaming per-micro-batch twin: content-collapsed docs against an
    * already-built (and, in the stream, FROZEN) capped eval index,
    * verdicts re-expanded to every member document.
    *
    * Output caveat priced by SCALING.md: the PAIR listing is the audit
    * view, honestly quadratic where a near-dup family genuinely straddles
    * both sides on sub-cap windows; [[contaminationVerdicts]] is the
    * linear production form (one row per contaminated doc).
    */
  private[graft] def contaminationProbe(
      docs: DataFrame, evalIdx: DataFrame,
      k: Int, minShared: Long): DataFrame = {
    val (keyed, reps, repGrams) = collapsedGrams(docs, k)
    keyed
      .join(reps.select(col("fp"), col("rep_id")), "fp")
      .join(repVerdicts(repGrams, evalIdx, minShared), "rep_id")
      .select(col("doc_id"), col("eval_id"), col("shared_ngrams"))
  }

  /** Per-document contamination VERDICT — the linear production form of
    * [[benchmarkContamination]]: one row per contaminated corpus doc
    * with how many distinct eval items it hits, the strongest overlap,
    * and the smallest matching eval id (the removal ticket's evidence
    * line). The rollup happens at REP level before member expansion, so
    * the output is linear in contaminated documents even when the pair
    * listing would be quadratic in a near-dup family.
    */
  def contaminationVerdicts(
      documents: DataFrame, eval: DataFrame,
      k: Int = 8, minShared: Long = ContamMinShared): DataFrame = {
    val (keyed, reps, repGrams) = collapsedGrams(documents, k)
    val roll = repVerdicts(repGrams,
        contaminationIndex(repGrams, eval, k), minShared)
      .groupBy("rep_id").agg(
        count(lit(1)).as("n_eval_items"),
        max("shared_ngrams").as("max_shared"),
        min("eval_id").as("first_eval"))
    keyed
      .join(reps.select(col("fp"), col("rep_id")), "fp")
      .join(roll, "rep_id")
      .select(col("doc_id"), col("n_eval_items"), col("max_shared"),
        col("first_eval"))
  }

  /** The deterministic stand-in eval frame (see [[EvalSampleMod]]). */
  def evalSample(documents: DataFrame): DataFrame =
    documents.where(
      pmod(graft.functions.HashFunctions.md5Long(
        col("doc_id").cast("string"), EvalSampleSeed), lit(EvalSampleMod)) === 0)

  /** Jaccard bucket width (milli) for [[lshThresholdCurve]]. */
  val CurveBucketMilli = 50L

  /** LSH banding S-CURVE card — the tuning read before committing
    * (bands, rowsPerBand, threshold) at 100 TB: for each jaccard bucket,
    * the CLOSED-FORM candidate-detection probability of the configured
    * banding, P(detect | j) = 1 − (1 − j^r)^b, next to the OBSERVED
    * verified-pair mass of this corpus in that bucket. Read it like a
    * datasheet: where the S-curve crosses ~500 is the banding's effective
    * threshold; pair mass sitting on buckets where p_detect < 1000 warns
    * that tightening the verify threshold (or dropping a band) would
    * start costing recall, and empty high-probability buckets say the
    * banding has headroom. All probabilities are exact integer milli
    * chains — j^r and the (1 − p)^b fold are successive `·x div 1000`
    * steps — so the card replays bit-for-bit in the oracle.
    *
    * The observed column counts the pairs the miner ACTS on (verified
    * jaccard ≥ threshold, where banding ≡ brute force at these
    * parameters — the `q_dedup_neardup` equivalence); sub-threshold
    * buckets show 0 observed with their theoretical detectability, which
    * is exactly the "what would lowering the threshold buy" read.
    * Shape: the banded miner unchanged, an integer bucket projection,
    * one ≤21-row histogram left-joined onto the constant grid.
    */
  def lshThresholdCurve(
      tbl: DataFrame, threshold: Double = 0.5): DataFrame = {
    val nBuckets = (1000L / CurveBucketMilli).toInt + 1
    val hist = nearDuplicatePairsFromTable(tbl, threshold)
      .select(expr("(inter * 1000L) div uni").as("jm"))
      .select(expr(s"(jm div $CurveBucketMilli) * $CurveBucketMilli").as("jaccard_lo"))
      .groupBy("jaccard_lo").agg(count(lit(1)).as("n_pairs"))
    val grid = tbl.sparkSession.range(nBuckets)
      .select((col("id") * CurveBucketMilli).as("jaccard_lo"))
      .withColumn("j_mid",
        when(col("jaccard_lo") === 1000L, lit(1000L))
          .otherwise(col("jaccard_lo") + CurveBucketMilli / 2))
    // p_band = j^r and miss = (1000 - p_band)^b as stepwise integer folds
    val withBand = (1 to RowsPerBand).foldLeft(
      grid.withColumn("pb0", lit(1000L))) { (df, k) =>
      df.withColumn(s"pb$k", expr(s"(pb${k - 1} * j_mid) div 1000"))
    }.withColumnRenamed(s"pb$RowsPerBand", "p_band_milli")
    val withMiss = (1 to Bands).foldLeft(
      withBand.withColumn("miss0", lit(1000L))) { (df, k) =>
      df.withColumn(s"miss$k", expr(s"(miss${k - 1} * (1000 - p_band_milli)) div 1000"))
    }
    withMiss
      .join(broadcast(hist), Seq("jaccard_lo"), "left")
      .select(col("jaccard_lo"), col("j_mid"), col("p_band_milli"),
        (lit(1000L) - col(s"miss$Bands")).as("p_detect_milli"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
  }

  /** Tokens per "line" for [[lineDedup]] — the corpus has no newlines or
    * sentence punctuation, so its natural line unit is a fixed
    * non-overlapping token window (the last window of a document may be
    * shorter).
    */
  val LineLen = 8

  /** A line is "corpus-frequent" — excised everywhere — at this many total
    * occurrences (the C4 heuristic is 3 over a full crawl; 2 is the right
    * discrimination at test scale and is a parameter, not a semantic).
    */
  val LineMinOccurrences = 2

  /** Seed for the per-line 60-bit content hash. */
  val LineSeed = 29

  /** LINE-level dedup — the C4/RefinedWeb curation step between exact
    * whole-document dedup and [[duplicatedNgramSpans]]' overlapping-window
    * span marking: count every line's corpus-wide frequency and EXCISE
    * lines that occur at least `minOccurrences` times (cookie banners,
    * footers, navigation chrome — the line-shaped boilerplate that
    * survives whole-document dedup because the surrounding text differs).
    * All occurrences drop, by design: a line frequent enough to trip the
    * threshold is template text, not content, so there is no "canonical"
    * occurrence worth keeping — and dropping all is what keeps the
    * operator a pure per-line function of the frequency table (keep-first
    * would need a corpus-wide arbitration per line on top).
    *
    * One row per document (zero-drop docs included — a total report):
    * line count, lines/tokens dropped, and the md5 of the retained text
    * (kept lines re-joined in position order — the column a downstream
    * stage or the oracle verifies the actual cut against).
    *
    * Scale shape: lines are NON-overlapping windows, so the exploded frame
    * is |tokens|/[[LineLen]] rows carrying a 60-bit hash each (never the
    * line text past the first projection); frequency is one map-side-
    * combined hash-agg; the verdict joins back by hash (plain equi-join,
    * near-uniform keys, AQE-friendly — the frequent-line key set is
    * corpus-sized in the worst case, so no broadcast); the per-document
    * fold is one keyed agg whose collect_list is bounded by document
    * length. Nothing pairwise, nothing corpus-ordered. A 60-bit collision
    * merges two lines' counts identically in engine and oracle, so the
    * gate stays exact.
    */
  def lineDedup(
      documents: DataFrame, lineLen: Int = LineLen,
      minOccurrences: Int = LineMinOccurrences): DataFrame = {
    val lines = linesOf(documents, lineLen)
    val frequent = lines
      .groupBy("lh").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minOccurrences)
      .select(col("lh"), lit(1).as("dup"))
    excisionReport(lines, frequent)
  }

  /** A winnowing fingerprint hash selected in more than this many
    * documents is treated as boilerplate and leaves the overlap join up
    * front (the [[dropOversizedBuckets]] guard in fingerprint space).
    */
  val WinnowBucketCap = 16

  /** Minimum shared selected fingerprints for a reported overlap pair. */
  val WinnowMinShared = 2

  /** Document-overlap pair mining over WINNOWING fingerprints (the MOSS
    * report): two documents pair when they share at least
    * [[WinnowMinShared]] distinct selected fingerprint hashes — the
    * position-robust complement to [[nearDuplicatePairs]] (MinHash
    * estimates whole-document resemblance; winnowing finds LOCAL shared
    * passages of ≥ k+w−1 tokens regardless of how different the rest of
    * the two documents is, the plagiarism/quotation/shared-paragraph
    * signal resemblance dilutes away).
    *
    * Output per pair: shared-fingerprint count, each side's selected
    * count (post-cap), and overlap_milli = shared·1000 div min(n_a, n_b)
    * — a containment-style strength in exact integers.
    *
    * Scale shape: the join key is the fingerprint hash, never the
    * document — grouped counts + one self equi-join over the ~2n/(w+1)-
    * dense selection set, with hashes selected in more than
    * [[WinnowBucketCap]] documents (boilerplate chrome shared by
    * everything) leaving via a broadcast anti-join BEFORE the pair join,
    * exactly the banded miner's bucket-cap discipline: no hot fingerprint
    * can quadratically flood the join.
    */
  def winnowOverlapPairs(
      documents: DataFrame, cap: Int = WinnowBucketCap,
      minShared: Int = WinnowMinShared): DataFrame = {
    val fps = TextAnalysis.winnowFingerprints(documents)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .localCheckpoint() // feeds the cap, the per-doc counts, and the join
    val hot = fps.groupBy("fp_hash").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > cap).select("fp_hash")
    val cold = fps.join(broadcast(hot), Seq("fp_hash"), "left_anti")
      .localCheckpoint()
    val perDoc = cold.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = cold.select(col("fp_hash"), col("doc_id").as("doc_a"))
      .join(cold.select(col("fp_hash"), col("doc_id").as("doc_b")), "fp_hash")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    pairs
      .join(perDoc.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(perDoc.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"), col("n_b"),
        expr("n_shared * 1000 div least(n_a, n_b)").as("overlap_milli"))
  }

  /** Seed for the [[softDedup]] keep draw. */
  val SoftDedupSeed = 37

  /** SOFT (probabilistic) exact dedup — instead of keeping exactly one
    * copy per duplicate group ([[exactDuplicates]]' keeper), keep each
    * copy independently with probability 1/n_copies: a group of n
    * survives with EXPECTED one copy, so duplicated content is
    * down-WEIGHTED rather than hard-deduplicated (the soft alternative
    * when moderate duplication is a popularity signal worth a bounded
    * amount of extra training mass — hard dedup erases it, no dedup
    * lets it dominate). The draw is the house content-hash Bernoulli —
    * keep iff md5Long(doc_id) mod n_copies = 0 — so the verdict is a
    * pure function of (doc_id, group size): reproducible across engines,
    * partitionings, and re-runs; some groups keep 0 or 2+ copies, which
    * is the definition working, not failing.
    *
    * One row per document: group size and the keep verdict. Shape:
    * [[exactDuplicates]]' one hash-agg + the same fp equi-join back —
    * nothing new at scale.
    */
  def softDedup(documents: DataFrame): DataFrame = {
    val groups = exactDuplicates(documents).select("fp_md5", "n_copies")
    graft.Parallelism.ensure(documents)
      .select(col("doc_id"),
        md5(TextAnalysis.normalized(col("text"))).as("fp_md5"))
      .join(groups, "fp_md5")
      .select(col("doc_id"), col("n_copies"),
        (HashFunctions.md5Long(col("doc_id").cast("string"), SoftDedupSeed)
          % col("n_copies") === 0L).as("kept"))
  }

  /** Incremental WINNOW overlap — the ingestion-time plagiarism/overlap
    * probe, following the family's frozen-artifact asymmetry
    * ([[incrementalNearDups]], [[incrementalLineDedup]]): the corpus
    * below the ingest split freezes into a capped per-document
    * fingerprint index (hashes selected in more than `cap` CORPUS
    * documents are boilerplate and leave the index — the frozen verdict;
    * shard-side hotness waits for the next full pass), and each arriving
    * document's own winnow selection probes it with ONE equi-join on the
    * fingerprint hash. Output: shard-vs-corpus pairs sharing ≥
    * `minShared` fingerprints, with both sides' post-cap counts and the
    * same overlap_milli strength as [[winnowOverlapPairs]] — shard-
    * internal pairs are out of contract, exactly like the banded probe.
    *
    * Cost per batch: O(shard grams) for the selection + an equi-join
    * against the slim index; the corpus is scanned once at index build.
    */
  def incrementalWinnowOverlap(
      documents: DataFrame, cap: Int = WinnowBucketCap,
      minShared: Int = WinnowMinShared): DataFrame =
    ingestSplitOf(documents) match {
      case None =>
        documents.select(
          col("doc_id"), col("doc_id").as("corpus_doc"),
          lit(0L).as("n_shared"), lit(0L).as("n_doc"),
          lit(0L).as("n_corpus"), lit(0L).as("overlap_milli")).limit(0)
      case Some(split) =>
        val (hot, index, nCorpus) =
          winnowCorpusArtifacts(documents.where(col("doc_id") < split), cap)
        winnowProbe(documents.where(col("doc_id") >= split),
          hot, index, nCorpus, minShared)
    }

  /** The frozen corpus-side artifacts for [[incrementalWinnowOverlap]]
    * and its streaming twin: the boilerplate fingerprint set (> cap
    * corpus docs), the capped per-doc fingerprint index, and the per-doc
    * post-cap counts — built once, checkpointed, probed per batch.
    */
  private[graft] def winnowCorpusArtifacts(
      corpus: DataFrame, cap: Int): (DataFrame, DataFrame, DataFrame) = {
    val corpusFps = TextAnalysis.winnowFingerprints(corpus)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .localCheckpoint() // feeds the hot set AND the index
    val hot = corpusFps.groupBy("fp_hash").agg(count(lit(1)).as("n"))
      .where(col("n") > cap).select("fp_hash")
      .localCheckpoint()
    val index = corpusFps.join(broadcast(hot), Seq("fp_hash"), "left_anti")
      .localCheckpoint()
    val nCorpus = index.groupBy("doc_id").agg(count(lit(1)).as("n_corpus"))
      .select(col("doc_id").as("corpus_doc"), col("n_corpus"))
      .localCheckpoint()
    (hot, index, nCorpus)
  }

  /** One shard batch's overlap probe against the frozen artifacts —
    * shared verbatim by the batch operator and the streaming micro-batch
    * twin (per-document verdicts touch only the frozen index, never
    * fellow batch members, so any batch partitioning unions to the same
    * pair set and both twins share one oracle).
    */
  private[graft] def winnowProbe(
      shard: DataFrame, hot: DataFrame, index: DataFrame,
      nCorpus: DataFrame, minShared: Int): DataFrame = {
    val shardFps = TextAnalysis.winnowFingerprints(shard)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .join(broadcast(hot), Seq("fp_hash"), "left_anti")
      .localCheckpoint() // feeds the per-doc counts and the probe
    val nShard = shardFps.groupBy("doc_id").agg(count(lit(1)).as("n_doc"))
    shardFps
      .join(index.select(col("fp_hash"), col("doc_id").as("corpus_doc")),
        "fp_hash")
      .groupBy("doc_id", "corpus_doc")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .join(nShard, "doc_id")
      .join(nCorpus, "corpus_doc")
      .select(col("doc_id"), col("corpus_doc"), col("n_shared"),
        col("n_doc"), col("n_corpus"),
        expr("n_shared * 1000 div least(n_doc, n_corpus)")
          .as("overlap_milli"))
  }

  /** WITHIN-document repetition excision — the Gopher-style "remove
    * repeated paragraphs" rule ([[lineDedup]]'s intra-document sibling):
    * a line repeated INSIDE one document keeps its FIRST occurrence and
    * drops the rest, independent of what any other document contains.
    * The two compose: corpus-frequent boilerplate is a between-document
    * signal (all occurrences template text → all drop), while a document
    * that stutters — a crawler that re-appended the same paragraph, a
    * generation loop — still has exactly one legitimate copy, so
    * keep-first is the right verdict and needs no corpus-wide
    * arbitration (the within-document winner is just min(pos)).
    *
    * Output is the [[lineDedup]] report shape, one row per document:
    * line count, lines/tokens dropped, md5 of the retained text (kept
    * lines re-joined in position order).
    *
    * Scale shape: same |tokens|/[[LineLen]]-row hash-only line frame;
    * the first-occurrence verdict is a min(pos) window over
    * (doc_id, lh) — a per-document-per-line key, so the widest group is
    * one document's copies of one line and no corpus-level key ever
    * concentrates a partition — followed by the per-document report
    * fold. Two narrow shuffles, nothing pairwise, nothing
    * corpus-ordered.
    */
  def repetitionExcise(
      documents: DataFrame, lineLen: Int = LineLen): DataFrame = {
    val w = Window.partitionBy("doc_id", "lh")
    linesOf(documents, lineLen)
      .withColumn("first_pos", min("pos").over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("pos") > col("first_pos"), 1L).otherwise(0L))
          .as("n_lines_dropped"),
        sum(when(col("pos") > col("first_pos"), col("n_tok")).otherwise(0L))
          .as("n_tokens_dropped"),
        collect_list(when(col("pos") === col("first_pos"),
          struct(col("pos"), col("line")))).as("kept"))
      .select(col("doc_id"), col("n_lines"), col("n_lines_dropped"),
        col("n_tokens_dropped"),
        md5(concat_ws(" ", expr("transform(array_sort(kept), x -> x.line)")))
          .as("kept_md5"))
  }

  /** The (doc_id, pos, line, n_tok, lh) line frame both line-dedup forms
    * start from: raw single-space tokenization (like
    * [[duplicatedNgramSpans]] — excision must cut the text the pipeline
    * actually ships, not a normalized shadow; the corpus is already
    * lowercase single-spaced) chopped into non-overlapping
    * `lineLen`-token windows, each carrying its 60-bit content hash.
    */
  private[graft] def linesOf(documents: DataFrame, lineLen: Int): DataFrame =
    graft.Parallelism.ensure(documents)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(
          s"""transform(sequence(0, (size(toks) - 1) div $lineLen),
             |  i -> concat_ws(' ', slice(toks, i * $lineLen + 1, $lineLen)))"""
            .stripMargin)).as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"), col("line"),
        least(lit(lineLen), size(col("toks")) - col("pos") * lineLen)
          .cast("long").as("n_tok"),
        graft.functions.HashFunctions.md5Long(col("line"), LineSeed).as("lh"))

  /** The per-document excision fold shared by [[lineDedup]] and the
    * incremental/streaming twins: `dupKeys` is a (lh, dup=1) verdict
    * frame; lines it marks drop, the rest re-join in position order.
    */
  private[graft] def excisionReport(
      lines: DataFrame, dupKeys: DataFrame): DataFrame =
    lines
      .join(dupKeys, Seq("lh"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("dup") === 1, 1L).otherwise(0L)).as("n_lines_dropped"),
        sum(when(col("dup") === 1, col("n_tok")).otherwise(0L))
          .as("n_tokens_dropped"),
        // kept lines in position order; collect_list skips the NULLs the
        // `when` leaves for dropped lines, array_sort restores document
        // order (pos is unique per doc), and an all-dropped document
        // hashes the empty string
        collect_list(when(col("dup").isNull, struct(col("pos"), col("line"))))
          .as("kept"))
      .select(col("doc_id"), col("n_lines"), col("n_lines_dropped"),
        col("n_tokens_dropped"),
        md5(concat_ws(" ", expr("transform(array_sort(kept), x -> x.line)")))
          .as("kept_md5"))

  /** The frozen corpus-side line-frequency index for the incremental
    * probes: only lines ONE more occurrence tips over the excision
    * threshold (freq ≥ minOccurrences − 1) are kept — the slim artifact a
    * batch joins against, the [[corpusBandIndex]] analogue for lines.
    */
  private[graft] def corpusLineIndex(
      corpusLines: DataFrame, minOccurrences: Int): DataFrame =
    corpusLines
      .groupBy("lh").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minOccurrences - 1)
      .select(col("lh"), lit(1).as("dup"))

  /** Incremental LINE dedup — the continuous-ingestion twin of
    * [[lineDedup]], following the family's frozen-artifact asymmetry
    * ([[incrementalNearDups]], `Dsir.incrementalScores`): the corpus
    * below the ingest split contributes a FROZEN frequency index (built
    * once, never shifted by the batch being judged), and an incoming
    * shard line is excised iff the corpus has already seen it
    * `minOccurrences − 1` times — this occurrence is the one that tips
    * the threshold. Shard-INTERNAL repeats wait for the next full pass,
    * exactly like shard-internal near-dup pairs in the banded probe.
    *
    * Cost per batch: O(shard lines) + an equi-join against the slim
    * index; the corpus is scanned once at index build, never per batch.
    * Output: the [[lineDedup]] report shape, shard documents only.
    */
  def incrementalLineDedup(
      documents: DataFrame, lineLen: Int = LineLen,
      minOccurrences: Int = LineMinOccurrences): DataFrame =
    ingestSplitOf(documents) match {
      case None => lineDedup(documents, lineLen, minOccurrences) // empty in, empty out
      case Some(split) =>
        val idx = corpusLineIndex(
          linesOf(documents.where(col("doc_id") < split), lineLen), minOccurrences)
        excisionReport(
          linesOf(documents.where(col("doc_id") >= split), lineLen), idx)
    }
}

/** Session-persisted per-corpus signature table — the production shape
  * where MinHash signatures are computed ONCE at ingest and every
  * dedup-family job (pair mining, clustering, retention, incremental
  * probes) reads the stored artifact instead of re-shingling raw text.
  * Locally the store is a temp-dir parquet table built on first request
  * per source directory and reused for the life of the JVM (deleted on
  * exit); on a cluster it would be a catalog table maintained by the
  * ingest job — same contract, longer-lived.
  *
  * Reuse is the scale argument: shingling + hashing is the dedup family's
  * CPU-dominant step, and at 100 TB recomputing it per downstream job
  * multiplies the most expensive scan in the pipeline by the number of
  * consumers. The store makes that cost once-per-document-ever.
  */
object SignatureStore {
  // shared build-once kernel (r15); the schema side-map is filled inside
  // the build closure (the built frame's schema is what the explicit-
  // schema read-back needs, and it is deterministic per corpus)
  private val store = new graft.sources.ArtifactStore[String]("sigstore")
  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** The (doc_id, sh, mh0..mh15, group_id, members) table for a source
    * directory's documents, built+persisted on first call, read back from
    * parquet afterwards. `group_id`/`members` are the identical-content
    * group assignment ([[Dedup.withContentGroups]]) — paying that window
    * once at ingest is what lets every downstream dedup consumer band
    * DISTINCT content with zero per-query grouping work. The explicit
    * schema on read keeps an empty corpus working (an empty parquet
    * write leaves no footer to infer from).
    */
  def table(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val path = store.getOrBuild(dir) { out =>
      val df = Dedup.withContentGroups(
        Dedup.shingleSignatureTable(graft.Tables.documents(spark, dir)))
      df.write.mode("overwrite").parquet(out)
      schemas.put(dir, df.schema)
      ()
    }
    spark.read.schema(schemas.get(dir)).parquet(path)
  }
}
