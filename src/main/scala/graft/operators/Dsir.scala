package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FixedPointLn.{lnF, Ln2F}
import graft.functions.HashFunctions.md5Long

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): score every raw document by how much more likely its hashed
  * n-gram features are under a TARGET domain's distribution than under the
  * raw corpus's, then sample the training set by Gumbel-top-k over those
  * log-importance weights. This is the standard "make 100 TB of crawl look
  * like the curated feeds" selection step, and the round-11 flagship user
  * of the portable fixed-point logarithm
  * ([[graft.functions.FixedPointLn]]) — every log-likelihood term is an
  * exact int64, so the scores and the selected SET are bit-identical in
  * the DuckDB oracle.
  *
  * Model (the paper's hashed bag-of-n-grams with add-1 smoothing):
  *   - features: lowercase whitespace unigrams + adjacent bigrams, hashed
  *     into [[NumBuckets]] buckets by the engine-portable 60-bit md5
  *     ([[graft.functions.HashFunctions.md5Long]]);
  *   - per-bucket weight λ_b = ln p̂(b) − ln q̂(b) with
  *     p̂(b) = (t_b+1)/(T+B) over the target sample ([[TargetSources]] —
  *     the "curated feeds") and q̂(b) = (r_b+1)/(R+B) over the whole raw
  *     corpus, every ln the fixed-point `ln_f`;
  *   - document log-weight logw_f = Σ_b c_d(b) · λ_b.
  *
  * Scale shape (the reason DSIR works at 100 TB): the corpus is touched by
  * exactly TWO map-side-combined hash-aggs (per-doc bucket counts, and the
  * B-bounded bucket histograms that roll up from them) plus one broadcast
  * join of the ≤[[NumBuckets]]-row λ table back onto the per-doc counts —
  * no corpus-sized shuffle other than the doc_id-keyed partial-combined
  * aggregation, no window over the corpus, nothing all-pairs. The λ frame
  * and the two (T, R) totals are parameter-bounded, not data-bounded.
  */
object Dsir {

  /** Hashed-feature bucket count (the paper uses 10k; 4096 keeps the
    * oracle's λ frame trivially small while leaving bucket collisions
    * realistic at test scale).
    */
  val NumBuckets = 4096

  /** The target-domain sample: the "curated feeds" whose feature
    * distribution selection should steer toward.
    */
  val TargetSources: Seq[String] = Seq("src0", "src1")

  /** Seed for the per-feature bucket hash. */
  val FeatureSeed = 0

  /** Seed for the per-document Gumbel uniform draw. */
  val GumbelSeed = 7

  /** Gumbel-top-k keeps ⌈n / SelectDenom⌉ documents. */
  val SelectDenom = 5L

  /** Tokens of one text column: lowercase, whitespace-split, empties out
    * (the whitespace-only-document edge) — the house tokenizer with the
    * empty-token filter applied before BOTH unigram and bigram features.
    */
  private def cleanToks(text: Column): Column =
    filter(split(trim(lower(graft.functions.TextFunctions.nfc(text))), "\\s+"), t => t =!= "")

  /** (doc_id, source, bucket, c) — hashed unigram+bigram feature counts
    * per document. One explode + one map-side-combined hash-agg; rows per
    * doc are bounded by min(2·tokens − 1, [[NumBuckets]]).
    */
  private[graft] def featureBuckets(documents: DataFrame): DataFrame = {
    val ts = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), col("source"), cleanToks(col("text")).as("ts"))
    val feats = ts.select(
      col("doc_id"), col("source"),
      explode(concat(
        col("ts"),
        when(size(col("ts")) >= 2, expr(
          "transform(sequence(1, size(ts) - 1), i -> concat(ts[i-1], ' ', ts[i]))"))
          .otherwise(typedLit(Seq.empty[String])))).as("f"))
    feats
      .select(col("doc_id"), col("source"),
        (md5Long(col("f"), FeatureSeed) % NumBuckets).as("b"))
      .groupBy("doc_id", "source", "b")
      .agg(count(lit(1)).as("c"))
  }

  /** The ≤[[NumBuckets]]-row λ table: (b, t, r, lam_f) where
    * lam_f = ln_f(t+1) − ln_f(T+B) − ln_f(r+1) + ln_f(R+B). Buckets absent
    * from the raw corpus cannot occur in any document, so the raw
    * histogram's bucket set is the whole domain; target counts left-join
    * onto it (absent target bucket → t = 0 → the smoothing floor).
    */
  private[graft] def bucketWeights(featureCounts: DataFrame): DataFrame = {
    val raw = featureCounts.groupBy("b").agg(sum("c").as("r"))
    val tgt = featureCounts
      .where(col("source").isInCollection(TargetSources))
      .groupBy("b").agg(sum("c").as("t"))
    val totals = raw.agg(sum("r").as("bigR"))
      .crossJoin(tgt.agg(sum("t").as("bigT")))
    raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("t"))
      .crossJoin(broadcast(totals))
      .select(
        col("b"), col("t"), col("r"),
        // A corpus with features but ZERO TargetSources rows means the
        // target-source list is misconfigured; without this guard bigT is
        // NULL, every lam_f is NULL, and the downstream na.fill(0) would
        // present an all-zero "selection" as a valid uniform score. Fail
        // at execution instead — the guard rides on lam_f (the one column
        // every consumer reads, so pruning can't drop it) and is evaluated
        // only on the ≤NumBuckets-row λ frame, so it costs nothing. (A
        // corpus with no features at all yields zero λ rows and never
        // reaches this branch: an empty schedule is the honest answer
        // there.)
        when(col("bigT").isNull, raise_error(lit(
          "DSIR: corpus has features but no TargetSources rows " +
            s"(${TargetSources.mkString(", ")}) - target list misconfigured"))
          .cast("long"))
          .otherwise(
            lnF(col("t") + 1) - lnF(col("bigT") + NumBuckets)
              - lnF(col("r") + 1) + lnF(col("bigR") + NumBuckets)).as("lam_f"))
  }

  /** Per-document DSIR log-importance weights: (doc_id, source, n_feats,
    * logw_f), one row per document (feature-less documents score 0 — the
    * smoothed model is indifferent about them). logw_f is 20-bit fixed
    * point: 2^20 ≈ one nat.
    */
  def importanceScores(documents: DataFrame): DataFrame = {
    // the (doc, bucket) count frame feeds the raw histogram, the target
    // histogram, their totals AND the per-doc fold — checkpoint it so the
    // corpus is tokenized/hashed ONCE, not once per consumer (the
    // rareBigramRate idiom; without this the plan re-derives the feature
    // explode subtree 12 times)
    val fb = featureBuckets(documents).localCheckpoint()
    val perDoc = fb
      .join(broadcast(bucketWeights(fb).select("b", "lam_f")), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_feats"), sum(col("c") * col("lam_f")).as("logw_f"))
    documents.select("doc_id", "source")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_feats", "logw_f"))
      .select("doc_id", "source", "n_feats", "logw_f")
  }

  /** The smoothing-floor weight for buckets the frozen corpus has never
    * seen (t = 0, r = 0): λ_novel = ln_f(R+B) − ln_f(T+B). One row,
    * broadcast next to the λ table. A corpus WITH features but no
    * TargetSources rows fails loudly (same misconfiguration guard as
    * [[bucketWeights]]); the truly-empty corpus (bigR NULL too — no
    * evidence at all) keeps the honest NULL.
    */
  private[graft] def lamDefaultOf(corpusFb: DataFrame): DataFrame = {
    val raw = corpusFb.agg(sum("c").as("bigR"))
    val tgt = corpusFb.where(col("source").isInCollection(TargetSources))
      .agg(sum("c").as("bigT"))
    raw.crossJoin(tgt).select(
      when(col("bigR").isNotNull && col("bigT").isNull, raise_error(lit(
        "DSIR: corpus has features but no TargetSources rows " +
          s"(${TargetSources.mkString(", ")}) - target list misconfigured"))
        .cast("long"))
        .otherwise(lnF(col("bigR") + NumBuckets) - lnF(col("bigT") + NumBuckets))
        .as("lam_default"))
  }

  /** Score a SHARD's documents under a FROZEN weight table — the apply
    * half of the train-once/apply-everywhere seam (the λ table is the
    * persisted artifact, like the SignatureStore and TokenizerStore):
    * shard features left-join the ≤[[NumBuckets]]-row broadcast weights,
    * novel buckets fall back to the smoothing floor, one doc_id-keyed agg.
    * Shared verbatim by the batch ingestion operator and the streaming
    * per-micro-batch twin, so both answer with identical semantics.
    */
  private[graft] def scoreShardAgainstWeights(
      shard: DataFrame, weights: DataFrame, lamDefault: DataFrame): DataFrame = {
    val perDoc = featureBuckets(shard)
      .join(broadcast(weights.select("b", "lam_f")), Seq("b"), "left")
      .crossJoin(broadcast(lamDefault))
      .withColumn("lam", coalesce(col("lam_f"), col("lam_default")))
      .groupBy("doc_id")
      .agg(sum("c").as("n_feats"), sum(col("c") * col("lam")).as("logw_f"))
    shard.select("doc_id", "source")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_feats", "logw_f"))
      .select("doc_id", "source", "n_feats", "logw_f")
  }

  /** Incremental DSIR — the continuous-ingestion shape, the importance-
    * scoring twin of `Dedup.incrementalNearDups` / `semDeDupIncremental`:
    * the INCOMING shard (the top fifth of the doc_id range, same
    * ⌊4·(max+1)/5⌋ ingest boundary) is scored under weights trained on
    * the EXISTING corpus only — the bucket histograms are the persisted
    * artifact; a batch never re-featurizes the corpus, and never shifts
    * the weights it is judged by (scoring a batch with weights that
    * include the batch itself would let a flood of junk drag the raw
    * distribution toward itself and launder its own scores). Novel
    * buckets — features the corpus has never seen — take the smoothing
    * floor λ = ln_f(R+B) − ln_f(T+B), exactly what add-1 smoothing says
    * about an unseen feature.
    *
    * Cost per batch: O(shard features) + the broadcast of the ≤B-row
    * weight table. Output: (doc_id, source, n_feats, logw_f) for shard
    * docs only.
    */
  def incrementalScores(documents: DataFrame): DataFrame =
    Dedup.ingestSplitOf(documents) match {
      case None =>
        documents.select(
          col("doc_id"), col("source"),
          lit(0L).as("n_feats"), lit(0L).as("logw_f")).limit(0)
      case Some(split) =>
        val corpusFb = featureBuckets(documents.where(col("doc_id") < split))
          .localCheckpoint()
        scoreShardAgainstWeights(
          documents.where(col("doc_id") >= split),
          bucketWeights(corpusFb), lamDefaultOf(corpusFb))
    }

  /** Deterministic Gumbel key for resampling: g = −ln(−ln u) with
    * u = (2h+1)/2^21 from the content-keyed 20-bit hash draw h — the odd
    * numerator keeps u strictly inside (0,1). Both logs are `ln_f`, so
    * the key is an exact integer: nl_f = 21·LN2F − ln_f(2h+1) is −ln u in
    * fixed point (clamped to ≥ 1: at the largest h the true value ~0.5
    * rounds through the series truncation to 0 or −2, and ln_f needs a
    * positive argument — the clamp is the defined semantics of the draw),
    * then g_f = 20·LN2F − ln_f(nl_f) re-reads nl_f as a 20-bit fixed-point
    * VALUE and takes −ln of it.
    */
  private[graft] def gumbelF(h: Column): Column = {
    val nl = greatest(lit(21L * Ln2F) - lnF(h * 2 + 1), lit(1L))
    lit(20L * Ln2F) - lnF(nl)
  }

  /** DSIR selection — Gumbel-top-k over logw_f + g_f keeps ⌈n/5⌉
    * documents: (doc_id, source, logw_f, g_f, key_f), the sampled training
    * subset. Sampling ∝ importance weight without replacement is exactly
    * top-k on logw + Gumbel (the paper's resampling step), and the hash
    * Gumbel makes the draw reproducible across engines and partitionings.
    *
    * The oracle pins the semantics as the obvious global window rank; the
    * engine computes the SAME set without ever sorting the corpus — the
    * [[Pipeline.selectBestPerSource]] counting idiom generalized to wide
    * keys: a 4096-wide coarse histogram of key_f (arithmetic-shift
    * bucketing, a map-side-combined agg), a cumulative window over that
    * TINY frame to find the cutoff bucket, and a rank restricted to the
    * one cutoff bucket's population (≈ n / #occupied-buckets rows — the
    * Gumbel spread alone puts ≥ 3.5 nats ≈ 900 buckets between min and
    * max, so no bucket concentrates the corpus).
    */
  def gumbelTopK(documents: DataFrame): DataFrame =
    gumbelSelect(importanceScores(documents))

  /** The selection half of [[gumbelTopK]] over an already-computed score
    * frame — shared with [[steeringReport]] so the report's selected set
    * is the exact set the selection query emits.
    */
  private[graft] def gumbelSelect(scores: DataFrame): DataFrame = {
    val keyed = scores
      .withColumn("h",
        md5Long(col("doc_id").cast("string"), GumbelSeed) % (1L << 20))
      .withColumn("g_f", gumbelF(col("h")))
      .withColumn("key_f", col("logw_f") + col("g_f"))
      .drop("h")
      .localCheckpoint()
    val n = keyed.agg(count(lit(1)).as("n_docs"))
    val coarse = keyed
      .select(shiftright(col("key_f"), 12).as("kb"))
      .groupBy("kb").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .withColumn("k", expr(s"(n_docs + ${SelectDenom - 1}) DIV $SelectDenom"))
      .withColumn("cum", sum("cnt").over(
        Window.orderBy(col("kb").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cutoff = coarse
      .where(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col("kb").as("cut_kb"),
        (col("k") - (col("cum") - col("cnt"))).as("need"))
      .localCheckpoint() // exactly one row
    val above = keyed
      .crossJoin(broadcast(cutoff))
      .where(shiftright(col("key_f"), 12) > col("cut_kb"))
    val tie = keyed
      .crossJoin(broadcast(cutoff))
      .where(shiftright(col("key_f"), 12) === col("cut_kb"))
      .withColumn("tr", row_number().over(
        Window.orderBy(col("key_f").desc, col("doc_id").asc)))
      .where(col("tr") <= col("need"))
      .drop("tr")
    above.unionByName(tie)
      .select("doc_id", "source", "logw_f", "g_f", "key_f")
  }

  /** The per-source STEERING report — which feeds DSIR favors: population,
    * summed/mean log-weight (fixed point, integer mean), how many docs the
    * Gumbel-top-k selection takes from the source, and the selected share
    * in milli. The one-page diagnostic read before committing a selection
    * run at 100 TB (a target-lookalike junk feed shows up here as a high
    * mean with a suspicious share).
    *
    * Scores are computed ONCE (checkpointed) and feed both the rollup and
    * the shared [[gumbelSelect]], so the report's selected counts are the
    * exact selection `q_dsir_select` emits. Output: |sources| rows.
    */
  def steeringReport(documents: DataFrame): DataFrame = {
    val scores = importanceScores(documents).localCheckpoint()
    val sel = gumbelSelect(scores)
      .groupBy("source").agg(count(lit(1)).as("n_selected"))
    scores.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("logw_f").as("sum_logw_f"))
      .withColumn("mean_logw_f", expr("sum_logw_f DIV n_docs"))
      .join(sel, Seq("source"), "left")
      .na.fill(0L, Seq("n_selected"))
      .withColumn("sel_share_milli", expr("(n_selected * 1000) DIV n_docs"))
  }
}
