package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM-training-data pipeline over the
  * `documents` table: per-document statistics / quality signals, heuristic
  * language ID, token counting (whitespace + BPE-ish regex), and document
  * fingerprinting. Everything is a narrow per-row projection built from
  * codegen'd builtins — zero shuffles, so at 100 TB these run at scan speed
  * and the parquet reader prunes to just (doc_id, text).
  */
object TextAnalysis {

  /** Stopword list used for the quality signal (top English function words;
    * the marker sets below play the same role per language).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "is", "of", "and", "to", "in", "that", "it", "on")

  /** Language marker words for the heuristic language ID. Deliberately tiny:
    * the operator demonstrates the argmax-over-marker-hits shape; a real
    * deployment would swap in character n-gram profiles, same plan.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** The house whitespace tokenizer, NFC-composed ([[TextFunctions.nfc]],
    * allocation-free on already-NFC text) — r15: every identity-bearing
    * consumer below (BPE word frequencies, NB vocabulary, language ID,
    * LM bigrams, token ids, drift vocabularies) sees ONE token for "café"
    * whether the source bytes were NFC or NFD, matching
    * [[TextFunctions.tokens]] and the DuckDB oracles' `nfc_normalize`.
    * NFC never maps characters to or from whitespace, so the count-only
    * consumers (token counts, length buckets) are bit-unchanged.
    */
  private def toks(text: Column): Column =
    split(trim(TextFunctions.nfc(text)), "\\s+")

  /** The lowercased tokenizer — NFC composed BEFORE the case fold (the
    * [[contentGroups]] order, and exactly the oracles'
    * `lower(nfc_normalize(text))`). Defined directly rather than via
    * [[toks]] so engine and oracle are the SAME expression — re-running
    * NFC after the case fold would differ in the corner where
    * lowercasing denormalizes (e.g. U+0130).
    */
  private[operators] def lowToks(text: Column): Column =
    split(trim(lower(TextFunctions.nfc(text))), "\\s+")

  /** Per-document statistics and a quality score. All counts are integers;
    * the ratio is a single division of exact ints (engine-reproducible).
    *
    * Shape: one tokenization (explode) → conditional sums → hash-agg by
    * doc. The pure-projection form re-evaluates the regex split for every
    * output column; here it runs once per document and the per-token
    * predicates combine map-side, so the shuffle carries 3 ints per doc.
    */
  def docStats(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"), length(col("text")).as("n_chars_txt"),
        explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "n_chars_txt")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok").rlike("^[.,!?:;\"']+$"), 1L).otherwise(0L)).as("n_punct_tokens"),
        sum(when(col("tok").isin(Stopwords: _*), 1L).otherwise(0L)).as("n_stopwords"))
      .select(
        col("doc_id"), col("n_chars_txt"),
        col("n_tokens").cast("int").as("n_tokens"),
        col("n_punct_tokens").cast("int").as("n_punct_tokens"),
        col("n_stopwords").cast("int").as("n_stopwords"),
        (col("n_stopwords").cast("double") / col("n_tokens")).as("stopword_ratio"),
        (col("n_tokens") >= 10 && col("n_stopwords") > 0).as("is_quality"))

  /** Heuristic language ID: argmax of marker-word hits with a fixed
    * precedence chain (en > de > es > fr on ties) so the prediction is
    * total and deterministic. Same explode→agg shape as [[docStats]].
    */
  def langId(documents: DataFrame): DataFrame = {
    val hitSums = LangMarkers.map { case (l, ws) =>
      sum(when(col("tok").isin(ws: _*), 1L).otherwise(0L)).cast("int").as(s"hits_$l")
    }
    val hits = LangMarkers.map { case (l, _) => l -> col(s"hits_$l") }.toMap
    val pred = when(
      hits("en") >= hits("de") && hits("en") >= hits("es") && hits("en") >= hits("fr"), "en")
      .when(hits("de") >= hits("es") && hits("de") >= hits("fr"), "de")
      .when(hits("es") >= hits("fr"), "es")
      .otherwise("fr")
    documents
      .select(col("doc_id"), col("lang"), explode(lowToks(col("text"))).as("tok"))
      .groupBy("doc_id", "lang")
      .agg(hitSums.head, hitSums.tail: _*)
      .select(
        col("doc_id"), col("lang"),
        hits("en"), hits("de"), hits("es"), hits("fr"),
        pred.as("pred_lang"))
  }

  /** [[zipfFit]] fits the top this-many terms. */
  val ZipfTopK = 1000

  /** ZIPF-SLOPE fit of the token frequency curve — the corpus-health
    * number next to the frequency spectrum (`q_token_spectrum`): natural
    * language sits near slope −1 on log rank vs log frequency; template
    * floods flatten it, tokenizer breakage steepens it. The least-squares
    * slope over the top-[[ZipfTopK]] terms is computed ENTIRELY in
    * integers: x = ln_f(rank)/1000 and y = ln_f(freq)/1000 (milli-nats,
    * which keeps n·Σxy inside int64 at any corpus size), then the closed
    * form (n·Σxy − Σx·Σy)·1000 div (n·Σx² − (Σx)²) — so the one-row card
    * is bit-identical in the oracle. Output: (n_terms, slope_milli),
    * slope_milli ≈ −1000 for Zipfian text.
    *
    * Shape: one vocabulary-bounded hash-agg, a bounded top-k
    * (TakeOrderedAndProject), a ≤k-row rank window, one 1-row agg.
    */
  def zipfFit(documents: DataFrame, k: Int = ZipfTopK): DataFrame = {
    import graft.functions.FixedPointLn.lnF
    val counts = graft.Parallelism.ensure(documents)
      .select(explode(lowToks(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val xy = counts
      .orderBy(desc("freq"), asc("tok")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("freq"), asc("tok"))).cast("long"))
      .withColumn("lx", lnF(col("rank")))
      .withColumn("ly", lnF(col("freq")))
      .selectExpr("lx DIV 1000 AS x", "ly DIV 1000 AS y")
    xy.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .selectExpr(
        "n AS n_terms",
        """CASE WHEN n * sxx - sx * sx <> 0
          |     THEN ((n * sxy - sx * sy) * 1000) DIV (n * sxx - sx * sx)
          |     ELSE 0 END AS slope_milli""".stripMargin)
  }

  /** Ingestion buckets for [[ngramNovelty]]/[[heapsFit]]: doc_id range
    * split into this many equal-width slices (doc_id IS ingestion order
    * in this corpus).
    */
  val NoveltyBuckets = 16

  /** N-GRAM NOVELTY curve: how much genuinely new content each slice of
    * the ingestion order contributes — per bucket, the distinct trigram
    * shingles seen (n_ngrams), the ones whose FIRST corpus occurrence is
    * this bucket (n_new), the running vocabulary (cum_vocab), and the
    * new-share in milli. The saturation read a crawl pipeline takes
    * before paying for more data: when novelty_milli flattens near 0,
    * additional ingestion is re-buying shingles dedup already owns.
    *
    * Shape: one shingle explode (the [[Dedup.shingled]] frame all dedup
    * ops share), one (bucket, shingle) hash-agg, one min-bucket agg per
    * shingle (first occurrence — an aggregation, NOT a window over the
    * corpus), and a ≤[[NoveltyBuckets]]-row rollup whose cumulative sum
    * runs over that tiny frame. The corpus is never sorted; bucket
    * assignment is a closed-form integer expression off one broadcast
    * max(doc_id) row.
    */
  def ngramNovelty(
      documents: DataFrame, buckets: Int = NoveltyBuckets): DataFrame = {
    val d = graft.Parallelism.ensure(documents)
    val mx = d.agg(max("doc_id").as("m"))
    val bucketOf = expr(s"(doc_id * $buckets) DIV (m + 1)")
    val e = graft.operators.Dedup.shingled(d).crossJoin(broadcast(mx))
      .select(bucketOf.as("bucket"), explode(col("sh")).as("g"))
    // both the per-bucket rollup and the min-bucket (first occurrence)
    // agg consume this frame — checkpoint so the corpus is shingled and
    // exploded ONCE (the single-scan-artifact discipline; without it the
    // whole explode chain runs twice)
    val bg = e.groupBy("bucket", "g").agg(count(lit(1)).as("n_inst"))
      .localCheckpoint()
    val perBucket = bg.groupBy("bucket")
      .agg(count(lit(1)).as("n_ngrams"), sum("n_inst").as("n_ngram_rows"))
    val firstSeen = bg.groupBy("g").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
    val nDocs = d.crossJoin(broadcast(mx))
      .groupBy(bucketOf.as("bucket")).agg(count(lit(1)).as("n_docs"))
    nDocs
      .join(perBucket, Seq("bucket"), "left")
      .join(firstSeen, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_ngrams", "n_ngram_rows", "n_new"))
      .withColumn("cum_vocab",
        sum("n_new").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("novelty_milli",
        when(col("n_ngrams") > 0, expr("n_new * 1000 DIV n_ngrams"))
          .otherwise(lit(0L)))
  }

  /** HEAPS-LAW fit over the [[ngramNovelty]] curve: slope β of
    * ln(cum_vocab) against ln(cum_ngram_rows) across the ingestion
    * buckets — V ≈ K·Nᵝ, the standard vocabulary-growth exponent. β near
    * 1 means every new slice is mostly novel (keep crawling); β near 0
    * means the corpus is saturated. Same milli-nat `ln_f` axes and
    * closed-form integer least squares as [[zipfFit]], so the slope is
    * bit-portable. ≤[[NoveltyBuckets]] points; the heavy lifting is the
    * novelty frame's aggregations.
    */
  def heapsFit(
      documents: DataFrame, buckets: Int = NoveltyBuckets): DataFrame = {
    import graft.functions.FixedPointLn.lnF
    val pts = ngramNovelty(documents, buckets)
      .withColumn("cum_rows",
        sum("n_ngram_rows").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum_rows") > 0 && col("cum_vocab") > 0)
      .withColumn("lx", lnF(col("cum_rows")))
      .withColumn("ly", lnF(col("cum_vocab")))
      .selectExpr("lx DIV 1000 AS x", "ly DIV 1000 AS y")
    pts.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .selectExpr(
        "n AS n_points",
        """CASE WHEN n * sxx - sx * sx <> 0
          |     THEN ((n * sxy - sx * sy) * 1000) DIV (n * sxx - sx * sx)
          |     ELSE 0 END AS slope_milli""".stripMargin)
  }

  /** Denylist PHRASES for [[phraseBlocklist]] — the C4-style badlist,
    * here token bigrams so matching is positional, not substring (no
    * "scunthorpe" false positives by construction).
    */
  val BlockedPhrases: Seq[String] = Seq("slow scan", "big table", "key value")

  /** C4-style BLOCKLIST card: per source, how many documents contain at
    * least one denylist phrase and how many total occurrences appear —
    * the impact estimate a pipeline reads BEFORE committing a filter
    * that silently deletes documents (C4's badword filter famously
    * removed dialect-heavy and medical text; this card is how that
    * shows up as a per-source flagged_milli skew instead of a surprise).
    *
    * Shape: one positional-bigram explode filtered against the
    * broadcast-literal denylist (the match runs in codegen as an `IN`
    * over string literals), one per-source agg counting occurrences and
    * distinct flagged docs, joined onto the per-source doc totals. No
    * regex scans, no per-phrase passes — |denylist| does not multiply
    * the corpus scans.
    */
  def phraseBlocklist(
      documents: DataFrame,
      phrases: Seq[String] = BlockedPhrases): DataFrame = {
    val d = graft.Parallelism.ensure(documents)
    val bi = d
      .select(col("source"), col("doc_id"), lowToks(col("text")).as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("source"), col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> concat(ts[i-1], ' ', ts[i]))"))
        .as("bg"))
    val blocked = bi.where(col("bg").isin(phrases: _*))
      .groupBy("source")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_flagged"))
    d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(blocked, Seq("source"), "left")
      .na.fill(0L, Seq("n_occurrences", "n_flagged"))
      .withColumn("flagged_milli", expr("n_flagged * 1000 DIV n_docs"))
  }

  /** Denylist EXCISION as a pipeline TRANSFORM (the [[phraseBlocklist]]
    * card's actionable twin, same scan→transform split as `q_pii_scan` →
    * `q_pii_redacted`): every token participating in a blocked bigram is
    * removed — token i survives iff neither (i−1,i) nor (i,i+1) is on
    * the denylist, so overlapping matches excise their union — and the
    * surviving text is emitted as a hash-checked column beside exact
    * removal counts. Purely higher-order expressions inside one codegen
    * projection: no explode, no shuffle, scan-speed per document.
    */
  def blocklistExcise(
      documents: DataFrame,
      phrases: Seq[String] = BlockedPhrases): DataFrame = {
    val bl = array(phrases.map(lit): _*)
    documents
      .select(col("doc_id"), lowToks(col("text")).as("ts"), bl.as("bl"))
      .select(
        col("doc_id"), col("ts"),
        size(col("ts")).cast("long").as("n_tokens"),
        expr("""filter(sequence(0, size(ts) - 1), i ->
          NOT ( (i > 0 AND array_contains(bl, concat_ws(' ', ts[i-1], ts[i])))
             OR (i < size(ts) - 1
                 AND array_contains(bl, concat_ws(' ', ts[i], ts[i+1]))) ))""")
          .as("ki"))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("ki"))).cast("long").as("n_removed"),
        md5(concat_ws(" ", expr("transform(ki, i -> ts[i])"))).as("kept_md5"))
  }

  /** The frozen corpus-side vocabulary for [[incrementalNgramNovelty]]:
    * the distinct trigram shingles of the below-split corpus — one
    * hash-agg, checkpointed once, probed by every arriving batch (the
    * `corpusBandIndex` analogue for novelty).
    */
  private[graft] def corpusNgramIndex(corpus: DataFrame): DataFrame =
    graft.operators.Dedup.shingled(corpus)
      .select(explode(col("sh")).as("g")).distinct()

  /** One shard batch's per-document novelty against the frozen index:
    * n_ngrams (the doc's distinct trigrams), n_novel (those absent from
    * the corpus vocabulary), and the novel share in milli. Shared
    * verbatim by the batch operator and the streaming micro-batch twin —
    * per-document verdicts are independent (a doc probes the FROZEN
    * index, never its fellow batch members), so any batch partitioning
    * of the shard unions to the identical answer and both twins share
    * one oracle.
    */
  private[graft] def novelProbe(shard: DataFrame, idx: DataFrame): DataFrame = {
    val counts = graft.operators.Dedup.shingled(shard)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(idx.withColumn("seen", lit(true)), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    shard.select(col("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_ngrams", "n_novel"))
      .withColumn("novelty_milli",
        when(col("n_ngrams") > 0, expr("n_novel * 1000 DIV n_ngrams"))
          .otherwise(lit(0L)))
  }

  /** INGESTION-time novelty: per arriving document, how much of it the
    * corpus has never seen — the per-doc filter signal ("this document
    * adds nothing new") where [[ngramNovelty]] is the corpus-level
    * saturation card. Same ⌊4(max+1)/5⌋ ingest split as the incremental
    * dedup family: the below-split corpus freezes into a distinct-
    * shingle vocabulary index; each above-split document probes it with
    * one equi-join — O(shard + matched vocabulary), never corpus-scale
    * per batch.
    */
  def incrementalNgramNovelty(documents: DataFrame): DataFrame =
    graft.operators.Dedup.ingestSplitOf(documents) match {
      case None =>
        documents.select(col("doc_id"), lit(0L).as("n_ngrams"),
          lit(0L).as("n_novel"), lit(0L).as("novelty_milli"))
      case Some(split) =>
        val idx = corpusNgramIndex(documents.where(col("doc_id") < split))
          .localCheckpoint()
        novelProbe(documents.where(col("doc_id") >= split), idx)
    }

  /** Language-ID CONFUSION rollup: (true lang, predicted lang) cell counts
    * of [[langId]] against the table's lang column, with each cell's share
    * of its true-language row in milli — the detector-QA card read before
    * trusting a heuristic language filter at corpus scale (off-diagonal
    * mass = docs a lang-keyed pipeline would misroute). One |langs|² frame
    * after the per-doc argmax; the share window runs over that tiny frame.
    */
  def langIdConfusion(documents: DataFrame): DataFrame = {
    val cells = langId(documents)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    cells
      .withColumn("n_true",
        sum("n").over(Window.partitionBy("lang")))
      .select(
        col("lang"), col("pred_lang"), col("n"), col("n_true"),
        expr("(n * 1000) DIV n_true").as("share_milli"),
        (col("lang") === col("pred_lang")).as("correct"))
  }

  /** BPE-ish regex for subword-ish token counting: letter runs, digit runs,
    * and single non-alphanumeric marks — a cheap, deterministic stand-in
    * for a real BPE vocabulary's pre-tokenizer.
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Whitespace vs BPE-ish token counts per document. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(toks(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(BpeishPattern), lit(0))).as("bpeish_tokens"))

  /** Token frequency SPECTRUM (frequency-of-frequencies): for each corpus
    * term frequency `tf`, how many distinct lowercase whitespace tokens
    * occur exactly `tf` times — the Zipf/hapax-legomena diagnostic a
    * corpus-curation pipeline watches per snapshot (a hapax surge flags
    * OCR noise / boilerplate churn; a fat high-tf head flags template
    * floods before dedup even runs).
    *
    * Shape: two map-side-combined hash-aggs — the shuffle carries
    * (token, partial count) then (tf, partial count), never documents;
    * output is at most the number of DISTINCT corpus frequencies
    * (≤ O(√total_tokens), tiny at any scale).
    */
  def tokenFrequencySpectrum(documents: DataFrame): DataFrame =
    graft.Parallelism.ensure(documents)
      .select(explode(lowToks(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .groupBy("tf").agg(count(lit(1)).as("n_types"))

  /** [[classifierScore]] weight table parameters: weight(tok) =
    * md5₆₀(seed:tok) mod ClsWeightMod − ClsWeightShift ∈ [−8, 8]. The
    * oracle interpolates THESE constants, so the two engines cannot drift.
    */
  val ClsWeightMod: Long = 17L
  val ClsWeightShift: Long = 8L
  val ClsSeed: Int = 31

  /** Hashed linear classifier INFERENCE — the quality-filter-model stage
    * of a CCNet/fastText-style pipeline (feature hashing: each token maps
    * straight to a weight, no vocabulary lookup), run with a deterministic
    * surrogate weight table so the whole thing is oracle-replayable:
    * weight(tok) = md5₆₀(seed:tok) mod 17 − 8, score = Σ weights over
    * token INSTANCES, keep iff score > 0. A trained model would broadcast
    * its real weight array into this same expression — the surrogate
    * changes the numbers, not the execution shape, and the shape is the
    * point: per-row fold over the token array (`aggregate`), weights
    * computed in-expression — NO weight-table join, NO explode, NO
    * shuffle. Whole-stage-codegen scan speed at any corpus size.
    */
  def classifierScore(documents: DataFrame): DataFrame = {
    val t = filter(lowToks(col("text")), x => x =!= "")
    documents.select(
      col("doc_id"), col("source"),
      size(t).cast("long").as("n_toks"),
      classifierScoreOf(col("text")).as("score"))
      .withColumn("keep", col("score") > 0)
  }

  /** The [[classifierScore]] fold as a bare column over a text column —
    * for callers that embed the score in a wider single-scan projection
    * (e.g. `Pipeline.corpusDatasheet`). Same tokens, same weights, same
    * zero element; `classifierScore` itself evaluates exactly this.
    */
  def classifierScoreOf(text: Column): Column = {
    val t = filter(lowToks(text), x => x =!= "")
    val w = (tok: Column) =>
      HashFunctions.md5Long(tok, ClsSeed) % ClsWeightMod - ClsWeightShift
    aggregate(t, lit(0L), (acc, tok) => acc + w(tok))
  }

  /** [[filterFunnel]] thresholds. All integer cross-multiplications (a
    * punct share of > 1/[[FunnelPunctMult]], a top-token share of
    * ≥ 1/[[FunnelTopTokMult]]) so the verdicts are bit-portable and
    * invariant under uniform corpus replication.
    */
  val FunnelMinTokens: Long = 20L
  val FunnelMaxChars: Long = 450L
  val FunnelPunctMult: Long = 5L
  val FunnelTopTokMult: Long = 5L

  /** Quality-filter FUNNEL with first-reject attribution — the drop
    * accounting a curation pipeline dashboards next to its filter
    * cascade. Every document gets exactly one verdict: the FIRST rule
    * (in the fixed order below) that rejects it, or `kept`:
    *
    *   1. `too_short`   — fewer than [[FunnelMinTokens]] tokens
    *   2. `too_long`    — more than [[FunnelMaxChars]] characters
    *   3. `punct_flood` — punctuation tokens exceed 1/5 of the doc
    *   4. `no_stopwords`— zero stopword hits (boilerplate/non-prose)
    *   5. `top_token_flood` — one token is ≥ 1/5 of all instances
    *                      (the [[repetitionStats]] top-token signal)
    *
    * First-reject (rather than all-flags) attribution is what makes the
    * rollup a FUNNEL: rule counts sum exactly to the corpus, so a shift
    * in any band is visible without double counting, and re-ordering a
    * rule shows up as a count migration, not silence. Output is one row
    * per (source, verdict) with doc and token totals.
    *
    * Shape: two map-side-combined hash-aggs — explode → (doc, tok)
    * counts → per-doc metrics (the [[repetitionStats]] top-token idiom;
    * the shuffle carries 2 ints per (doc, token), then 4 ints per doc) —
    * and a final |sources|×6-row rollup. No joins, scan-bounded at any
    * corpus size. `explode_outer` keeps token-less documents in the
    * frame (they fall in the `too_short` band, not off the report).
    */
  def filterFunnel(documents: DataFrame): DataFrame = {
    val perTok = graft.Parallelism.ensure(documents)
      .select(
        col("doc_id"), col("source"), length(col("text")).as("n_chars_txt"),
        explode_outer(filter(lowToks(col("text")), x => x =!= "")).as("tok"))
      .groupBy("doc_id", "source", "n_chars_txt", "tok")
      .agg(count(lit(1)).as("c"))
    val m = perTok
      .groupBy("doc_id", "source", "n_chars_txt")
      .agg(
        sum(when(col("tok").isNotNull, col("c")).otherwise(0L)).as("n_toks"),
        sum(when(col("tok").rlike("^[.,!?:;\"']+$"), col("c")).otherwise(0L)).as("n_punct"),
        sum(when(col("tok").isin(Stopwords: _*), col("c")).otherwise(0L)).as("n_stop"),
        max(when(col("tok").isNotNull, col("c")).otherwise(0L)).as("top_tok"))
    val verdict =
      when(col("n_toks") < FunnelMinTokens, "too_short")
        .when(col("n_chars_txt") > FunnelMaxChars, "too_long")
        .when(col("n_punct") * FunnelPunctMult > col("n_toks"), "punct_flood")
        .when(col("n_stop") === 0, "no_stopwords")
        .when(col("top_tok") * FunnelTopTokMult >= col("n_toks"), "top_token_flood")
        .otherwise(lit("kept"))
    m.select(col("source"), verdict.as("verdict"), col("n_toks"))
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
  }

  /** Multinomial Naive Bayes TRAINER for the quality signal — the
    * trainable upgrade of [[classifierScore]]'s fixed weights, and the
    * relational core of the fastText-style classifiers real curation
    * pipelines train (CCNet, GPT-3's WebText-vs-CommonCrawl filter):
    * distant supervision from the corpus's own weak label
    * ([[docStats]]' `is_quality`), learned on the TRAIN split
    * (`doc_id % 10 ≠ 0`, the household holdout convention) so the
    * held-out eval card is honest.
    *
    * Training IS counting for NB — no gradient loop, no driver-resident
    * optimizer state: per-token class-conditional counts, Laplace
    * smoothing, and the per-token log-likelihood ratio
    *
    *   llr(t) = ln (n_t⁺+1)/(N⁺+V) − ln (n_t⁻+1)/(N⁻+V)
    *
    * carried in the SAME 20-bit fixed-point ln as the DSIR family, so
    * the learned table is bit-portable and the oracle replays it as
    * integer chains. Output is the MODEL: one row per train-vocabulary
    * token, (tok, n_pos, n_neg, llr_f).
    *
    * Shape: the label frame is one explode-agg ([[docStats]] reused
    * verbatim — the label rule cannot drift from the report that
    * defines it); token counts are one map-side-combined hash-agg over
    * (tok, class); the totals frame is 1 row, broadcast back. Vocab-
    * bounded past the first agg at any corpus size.
    */
  def nbTrain(documents: DataFrame): DataFrame = {
    import graft.functions.FixedPointLn.lnF
    val lab = docStats(documents).select(col("doc_id"), col("is_quality"))
    val counts = graft.Parallelism.ensure(documents)
      .where(col("doc_id") % EvalHoldoutMod =!= 0)
      .select(col("doc_id"),
        explode(filter(lowToks(col("text")), t => t =!= "")).as("tok"))
      .join(lab, "doc_id")
      .groupBy("tok")
      .agg(
        sum(when(col("is_quality"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("is_quality"), 0L).otherwise(1L)).as("n_neg"))
    val totals = counts.agg(
      sum("n_pos").as("bigN1"), sum("n_neg").as("bigN0"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .select(col("tok"), col("n_pos"), col("n_neg"),
        (lnF(col("n_pos") + 1) - lnF(col("bigN1") + col("v"))
          - lnF(col("n_neg") + 1) + lnF(col("bigN0") + col("v"))).as("llr_f"))
  }

  /** Score EVERY document under the [[nbTrain]] model: per-doc posterior
    * log-odds `prior + Σ count(t)·llr(t)` in fixed point, with tokens
    * outside the train vocabulary paying the smoothing-floor constant
    * `ln (N⁻+V)/(N⁺+V)` (the llr of a zero-count token — the same
    * add-one floor the model trains with, so eval-split-only tokens are
    * handled by the model's own rule, not dropped). `nb_quality` is the
    * sign read-out.
    *
    * Shape: per-(doc, tok) counts pre-aggregated BEFORE the vocabulary
    * join (the shuffle carries one int per distinct token per doc, and
    * the Zipf-skewed join keys ride AQE like every vocabulary join
    * here); the prior/floor constants are a 1-row crossJoin broadcast.
    * A degenerate corpus whose train split has a single class yields
    * NULL scores (ln_f's loud-NULL convention), never a silent 0.
    */
  def nbScore(documents: DataFrame): DataFrame = {
    val model = nbTrain(documents).localCheckpoint()
    nbScoreAgainst(documents, model, nbConsts(documents, model))
  }

  /** The 1-row prior/floor constants frame of the [[nbTrain]] model:
    * `prior_f = ln d⁺/d⁻` over the train-split docs and
    * `unseen_f = ln (N⁻+V)/(N⁺+V)` — the out-of-vocabulary llr. Split
    * out so the streaming gate can freeze it with the model.
    */
  private[graft] def nbConsts(documents: DataFrame, model: DataFrame): DataFrame = {
    import graft.functions.FixedPointLn.lnF
    val totals = model.agg(
      sum("n_pos").as("bigN1"), sum("n_neg").as("bigN0"),
      count(lit(1)).as("v"))
    val priors = docStats(documents)
      .where(col("doc_id") % EvalHoldoutMod =!= 0)
      .agg(
        sum(when(col("is_quality"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("is_quality"), 0L).otherwise(1L)).as("d0"))
    priors.crossJoin(totals).select(
      (lnF(col("d1")) - lnF(col("d0"))).as("prior_f"),
      (lnF(col("bigN0") + col("v")) - lnF(col("bigN1") + col("v"))).as("unseen_f"))
  }

  /** The scoring fold alone, against an ALREADY-TRAINED model — the core
    * [[nbScore]] and the streaming ingest gate share, so a frozen model
    * scores a micro-batch with exactly the batch operator's semantics.
    * Per-doc, so any partition of the corpus scores identically.
    */
  private[graft] def nbScoreAgainst(
      docs: DataFrame, model: DataFrame, consts: DataFrame): DataFrame =
    graft.Parallelism.ensure(docs)
      .select(col("doc_id"),
        explode(filter(lowToks(col("text")), t => t =!= "")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .join(model.select("tok", "llr_f"), Seq("tok"), "left")
      .crossJoin(broadcast(consts))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_tokens"),
        (max(col("prior_f"))
          + sum(col("c") * coalesce(col("llr_f"), col("unseen_f")))).as("score_f"))
      .select(col("doc_id"), col("n_tokens"), col("score_f"),
        (col("score_f") > 0).as("nb_quality"))

  /** Score-band clamp for [[nbCalibration]]: bands cover −5..+4 nats. */
  val CalibrationBands: Long = 10L
  val CalibrationShift: Long = 5L

  /** CALIBRATION card for the trained classifier — the reliability read
    * before a learned filter gates a corpus: eval-split documents
    * bucketed by posterior log-odds band (whole nats, clamped to
    * [[CalibrationBands]] buckets so the card is fixed-width at any
    * corpus size) with the observed weak-label positive rate per band.
    * A calibrated filter shows pos_rate_milli rising monotonically with
    * the band; a flat or inverted run means the score separates nothing
    * and the gate threshold is arbitrary.
    *
    * Banding is all-integer and portable: the score is SHIFTED into the
    * non-negative range before the floor division (`DIV` truncates
    * toward zero, so a direct division of negative fixed-point scores
    * would round differently than DuckDB's floor `//` — shifting makes
    * both floors). ≤ [[CalibrationBands]] rows out of one |eval|-row
    * join + one hash-agg on top of [[nbScore]].
    */
  def nbCalibration(documents: DataFrame): DataFrame = {
    import graft.functions.FixedPointLn.Scale
    val lab = docStats(documents).select(col("doc_id"), col("is_quality"))
    val hi = CalibrationBands * Scale - 1
    nbScore(documents)
      .where(col("doc_id") % EvalHoldoutMod === 0)
      .join(lab, "doc_id")
      .select(
        (expr(s"greatest(0L, least(${hi}L, score_f + ${CalibrationShift * Scale}L)) DIV $Scale")
          - CalibrationShift).as("band"),
        col("is_quality"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_quality"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("band"), col("n_docs"), col("n_pos"),
        expr("n_pos * 1000 DIV n_docs").as("pos_rate_milli"))
  }

  /** HELD-OUT evaluation card for the trained classifier: the confusion
    * counts and milli metrics of [[nbScore]]'s prediction against the
    * weak label on the eval split (`doc_id % 10 == 0`) — documents the
    * model never trained on. The number a pipeline reads before letting
    * a learned filter gate a corpus; precision/recall are NULL (not 0)
    * when their denominator is empty. One |eval|-row join + a 1-row agg.
    */
  def nbEval(documents: DataFrame): DataFrame = {
    val lab = docStats(documents).select(col("doc_id"), col("is_quality"))
    nbScore(documents)
      .where(col("doc_id") % EvalHoldoutMod === 0)
      .join(lab, "doc_id")
      .agg(
        sum(when(col("nb_quality") && col("is_quality"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("nb_quality") && !col("is_quality"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("nb_quality") && col("is_quality"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("nb_quality") && !col("is_quality"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(tp + tn) * 1000 DIV (tp + fp + fn + tn)").as("accuracy_milli"),
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000 DIV (tp + fp) END")
          .as("precision_milli"),
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000 DIV (tp + fn) END")
          .as("recall_milli"))
  }

  /** Integer scale for [[topCollocations]]' PMI score. */
  val PmiScale: Long = 1000000L
  val CollocationMinCount: Long = 5L
  val CollocationK: Int = 50

  /** Top collocations by SCALED pointwise mutual information: bigrams
    * whose joint count is large relative to both unigram counts ("new
    * york" outranks "of the" even at a fraction of its frequency). For a
    * FIXED corpus, PMI's total-token constant multiplies every score
    * equally, so the ranking drops it and the score stays bounded:
    *
    *   pmi_scaled = ((n_pair × S) div n_w1 × S) div n_w2,   S = 10⁶
    *
    * — all-integer (two floor divisions, reproducible in any engine),
    * monotone in the true PMI up to the documented floor-division
    * granularity. `minCount` kills hapax pairs (the classic PMI caveat:
    * rare pairs score spuriously high). Ties break on (w1, w2), keeping
    * the top-k total and deterministic.
    *
    * Shape: one bigram hash-agg + one unigram hash-agg, both map-side
    * combined and vocabulary-keyed; two vocabulary joins; global top-k as
    * TakeOrderedAndProject. Int64 bound: n_pair × S needs a single bigram
    * below 9.2e12 occurrences.
    */
  def topCollocations(documents: DataFrame, k: Int = CollocationK,
      minCount: Long = CollocationMinCount): DataFrame = {
    val ts = graft.Parallelism.ensure(documents)
      .select(lowToks(col("text")).as("ts"))
    val bi = ts.where(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    val uni = ts.select(explode(col("ts")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
    bi
      .join(uni.select(col("tok").as("w1"), col("n_tok").as("n_w1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("n_tok").as("n_w2")), "w2")
      .withColumn("pmi_scaled",
        expr(s"(((n_pair * ${PmiScale}L) div n_w1) * ${PmiScale}L) div n_w2"))
      .orderBy(desc("pmi_scaled"), asc("w1"), asc("w2"))
      .limit(k)
      .select("w1", "w2", "n_pair", "n_w1", "n_w2", "pmi_scaled")
  }

  /** Top-k TF-IDF terms per document over lowercase whitespace tokens.
    *
    * The idf is the LINEAR form `n_docs / (df + 1)`, not the log form:
    * `ln` is only 1-ulp-accurate on the JVM (HotSpot intrinsic) and
    * correctly-rounded in C libm, so `tf * ln(N/(df+1))` diverges between
    * engines on ~0.1% of arguments — measured, not hypothetical — which is
    * data-dependent flakiness in an exact-hash correctness gate. The linear
    * score is one correctly-rounded division of exact integers (`tf *
    * n_docs` ≤ 2^53), bit-identical everywhere, and induces the same
    * ordering family (monotone in tf, anti-monotone in df).
    *
    * Shape: explode → (doc, term) hash-agg for tf (map-side combine), a
    * term-keyed agg for df, a term-keyed join of the two, then a per-doc
    * window top-k. The df join key is Zipf-skewed (every doc has "the");
    * AQE's skew-join split handles that at scale, and the window partitions
    * by doc_id which is near-uniform. The 1-row corpus count joins in as a
    * broadcast, never a driver collect.
    */
  def tfIdfTopTerms(documents: DataFrame, k: Int = 5): DataFrame = {
    val perTerm = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), explode(lowToks(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    val tf = perTerm.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", (col("tf") * col("n_docs")).cast("double") / (col("df") + lit(1L)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf", "rank")
  }

  /** Vocabulary size cap for [[tokenIdSequences]]; rarer tokens map to
    * [[UnkId]] (the OOV bucket), ids 1..VocabSize by (count DESC, token
    * ASC) rank — deterministic, so the id assignment is part of the
    * oracle contract.
    */
  val VocabSize = 96
  val UnkId = 0

  /** Vocabulary induction + id encoding — the tokenize-to-ids step of a
    * training pipeline: rank tokens by corpus frequency (count DESC,
    * token ASC), keep the top [[VocabSize]] as ids 1..V, map every
    * position of every document to its token id (OOV → [[UnkId]]).
    * Output is the exploded (doc_id, pos, token_id) sequence frame — the
    * form [[Packing]] consumes downstream.
    *
    * Shape: one exploded scan builds the frequency table (map-side
    * combined; vocabulary-sized, not corpus-sized), the top-V ranking is
    * a TakeOrdered-class sort over the vocabulary, and the encode pass is
    * the same exploded scan joined to the BROADCAST vocabulary — at
    * 100 TB the vocabulary is a few MB against petabytes of positions,
    * the canonical map-side-join asymmetry.
    */
  def tokenIdSequences(documents: DataFrame, vocabSize: Int = VocabSize): DataFrame = {
    val positions = graft.Parallelism.ensure(documents)
      .select(col("doc_id"),
        posexplode(lowToks(col("text"))).as(Seq("pos", "tok")))
    val vocab = positions
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("tok"))
      .limit(vocabSize)
      .select(col("tok"),
        row_number().over(Window.orderBy(desc("n"), asc("tok"))).as("token_id"))
    positions
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(UnkId)).as("token_id"))
  }

  /** BM25 constants as exact ratios: k1 = 3/2, b = 3/4 — the standard
    * Robertson defaults, kept rational so the saturation term reduces to
    * ONE division of two exact integers (see [[bm25TopK]]). Interpolated
    * into the oracle.
    */
  val Bm25K1Num = 3
  val Bm25K1Den = 2
  val Bm25BNum = 3
  val Bm25BDen = 4
  /** Fixed retrieval query for the registered BM25 ranking. */
  val Bm25Query: Seq[String] = Seq("hash", "join", "vector")
  val Bm25K = 50

  /** BM25-style ranked retrieval for a fixed term query: per-(doc, term)
    * saturated tf with document-length normalization, the LINEAR idf
    * (`n_docs / (df+1)`, same `ln`-portability rationale as
    * [[tfIdfTopTerms]]), summed over the query terms in FIXED term order,
    * top-k docs by (score DESC, doc_id ASC).
    *
    * Portability: with k1 = K1N/K1D and b = BN/BD rational and
    * avgdl = S/N (total tokens / doc count, exact integers), the
    * saturation term
    *   tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * cross-multiplies to
    *   tf·(K1N+K1D)·BD·S  /  (tf·K1D·BD·S + K1N·(BD−BN)·S + K1N·BN·dl·N)
    * — ONE double division of two exact int64s; the idf is a second; the
    * product and the fixed-order sum are then bit-identical across
    * engines, so the full ranking hash-matches the oracle. (Bound check:
    * numerator ≤ tf·20·S — at 10^13 corpus tokens that is ~2^57·tf; at
    * larger S swap the int64s for DECIMAL(38), nothing else changes.)
    *
    * Shape: the tf filter (`tok IN query`) prunes the exploded stream at
    * scan speed BEFORE any shuffle; df/tf are map-side-combined keyed
    * aggs; the per-term frame joins the tiny df and 1-row corpus scalars
    * by broadcast; the final top-k is a TakeOrderedAndProject. The pivot
    * to one row per doc exists because floating ADDITION is not
    * associative — summing term scores via sum() would be
    * partition-order-dependent; the fixed left-associated chain is not.
    */
  def bm25TopK(
      documents: DataFrame, terms: Seq[String] = Bm25Query,
      k: Int = Bm25K): DataFrame = {
    require(terms.nonEmpty)
    val dl = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("dl"))
      .localCheckpoint() // feeds the scalars, the join, and nothing else
    val scalars = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("s_tok"))
    val tf = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), explode(lowToks(col("text"))).as("tok"))
      .where(col("tok").isInCollection(terms))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
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
      .join(dl, "doc_id")
      .join(broadcast(dfq), "tok")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), col("tok"), (core * idf).as("ts"))
    val score = terms
      .map(t => coalesce(max(when(col("tok") === t, col("ts"))), lit(0.0)))
      .reduceLeft(_ + _)
    perTerm.groupBy("doc_id")
      .agg(score.as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Corpus-level top-k terms PER LANGUAGE (SURVEY §7 M4's grouped top-k):
    * explode → (lang, term) hash-agg with map-side combine → per-lang
    * window rank. The shuffle width is |langs × vocabulary|, not the
    * corpus; the window partitions by lang (a handful of groups, each
    * vocabulary-sized — at 100 TB switch the final rank to a per-lang
    * TakeOrdered if vocabularies outgrow a partition).
    */
  /** Defaults shared with the registered queries' oracle SQL — the oracle
    * interpolates THESE constants (not literals), so changing a default
    * here cannot silently desync the two engines.
    */
  val DefaultTopTermsK = 10
  val DefaultChunkTokens = 64
  val DefaultStride = 48

  def topTermsPerLang(documents: DataFrame, k: Int = DefaultTopTermsK): DataFrame = {
    val perTerm = graft.Parallelism.ensure(documents)
      .select(col("lang"), explode(lowToks(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("term").asc)
    perTerm
      .groupBy("lang", "term").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** The at-scale variant of [[topTermsPerLang]] — same answer, no
    * vocabulary-wide sort. The window form sorts each language's ENTIRE
    * vocabulary inside one task (O(V log V) time, and the vocabulary must
    * fit one partition); this one runs a distributed TakeOrdered per
    * language instead: each partition of the (lang, term, n) aggregate
    * keeps a size-k bound heap per language (O(V log k), O(langs·k)
    * memory), and the final per-lang merge sees at most k·partitions rows
    * — never the vocabulary. That two-phase partial top-k is exactly what
    * `TakeOrderedAndProject` does for the global case; Spark has no
    * grouped equivalent, hence the typed heaps.
    *
    * Rank order (n desc, term asc) and the output schema match the window
    * form row for row — TextAnalysisSpec asserts equality on driver data.
    */
  def topTermsPerLangTakeOrdered(documents: DataFrame, k: Int = DefaultTopTermsK): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // "worst is maximal" ordering, so the bound heap's dequeue evicts the
    // row that cannot be in the top k: smallest n, tie-break latest term
    val worstFirst: Ordering[(String, Long)] =
      Ordering.by { case (term, n) => (-n, term) }
    def topK(rows: Iterator[(String, String, Long)]): Iterator[(String, String, Long)] = {
      val heaps = scala.collection.mutable.Map.empty[String, scala.collection.mutable.PriorityQueue[(String, Long)]]
      rows.foreach { case (lang, term, n) =>
        val h = heaps.getOrElseUpdate(
          lang, scala.collection.mutable.PriorityQueue.empty(worstFirst))
        h.enqueue((term, n))
        if (h.size > k) { h.dequeue(); () }
      }
      heaps.iterator.flatMap { case (lang, h) =>
        h.iterator.map { case (term, n) => (lang, term, n) }
      }
    }
    val counts = graft.Parallelism.ensure(documents)
      .select(col("lang"), explode(lowToks(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("lang", "term").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)]
    counts
      .mapPartitions(topK) // partial: global top-k ⊆ ∪ per-partition top-k
      .groupByKey(_._1)
      .flatMapGroups { (lang, rows) =>
        topK(rows).toSeq
          .sortBy { case (_, term, n) => (-n, term) }
          .zipWithIndex
          .map { case ((_, term, n), i) => (lang, term, n, i + 1) }
      }
      .toDF("lang", "term", "n", "rank")
  }

  /** Token-windowed document CHUNKING — the training/embedding-prep
    * primitive: each document explodes into overlapping windows of
    * `chunkTokens` whitespace tokens, starting every `stride` tokens
    * (overlap = chunkTokens − stride). chunk_id is the window ordinal, so
    * `(doc_id, chunk_id)` is a stable chunk key for downstream embedding
    * and provenance joins.
    *
    * Shape: one scan, tokenize once, explode the start offsets, slice —
    * pure narrow projection work at scan speed; output size is
    * ~`1/stride` tokens-per-token of the corpus, the expected fan-out of
    * chunking. Every document yields at least one chunk (short docs get
    * one partial window), so no rows are silently dropped.
    */
  def chunked(
      documents: DataFrame, chunkTokens: Int = DefaultChunkTokens,
      stride: Int = DefaultStride): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      "need 1 <= stride <= chunkTokens (overlap = chunkTokens - stride)")
    graft.Parallelism.ensure(documents)
      .select(col("doc_id"), toks(col("text")).as("toks"))
      // starts = 0, stride, 2*stride, ... < n_tokens (n >= 1 always: the
      // whitespace split of any string has at least one element)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .select(
        col("doc_id"),
        col("pos").as("chunk_id"),
        array_join(slice(col("toks"), col("col") + 1, lit(chunkTokens)), " ").as("chunk_text"),
        size(slice(col("toks"), col("col") + 1, lit(chunkTokens))).as("n_tokens"))
  }

  /** Repetition-flag thresholds (shared with the oracle SQL — interpolated,
    * not duplicated): a doc is flagged when more than 30% of its trigram
    * windows are repeats of an earlier window, or when a single token makes
    * up more than 20% of the document. Both ratios are exact-integer
    * divisions, so the threshold comparison is bit-identical across engines.
    */
  val RepetitionDupTrigramMax = 0.30
  val RepetitionTopTokenMax = 0.20

  /** Per-document REPETITION signals — the Gopher/C4-style quality filters
    * for generated or boilerplate text: the duplicate-trigram ratio
    * (1 − distinct/total trigram windows) and the top-token fraction
    * (occurrences of the most frequent token / total tokens).
    *
    * Shape: the trigram side is a pure per-row projection (tokenize once,
    * count windows vs distinct shingles — scan speed, no shuffle); the
    * top-token side is explode → (doc, tok) hash-agg → per-doc max/sum,
    * both with map-side combine, shuffling 2 ints per (doc, token). The
    * final join is doc_id-keyed and near-uniform. Trigrams are over the
    * same capped raw-token axis as [[TextFunctions.shingles]]; the token
    * histogram is over lowercase tokens like [[topTermsPerLang]].
    */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val capped = slice(toks(col("text")), 1, TextFunctions.MaxShingleTokens)
    val topTok = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), explode(lowToks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("top_tok_n"), sum(col("n")).as("n_tokens"))
    documents
      .select(
        col("doc_id"),
        greatest(size(capped) - lit(2), lit(0)).as("n_trigrams"),
        size(TextFunctions.shingles(col("text"), 3)).as("n_distinct_trigrams"))
      .join(topTok, "doc_id")
      .select(
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        col("n_trigrams"),
        col("n_distinct_trigrams"),
        when(col("n_trigrams") > 0,
          (col("n_trigrams") - col("n_distinct_trigrams")).cast("double") / col("n_trigrams"))
          .otherwise(lit(0.0)).as("dup_trigram_ratio"),
        col("top_tok_n").cast("int").as("top_tok_n"),
        (col("top_tok_n").cast("double") / col("n_tokens")).as("top_token_frac"))
      .withColumn("is_repetitive",
        col("dup_trigram_ratio") > RepetitionDupTrigramMax ||
          col("top_token_frac") > RepetitionTopTokenMax)
  }

  /** PII-ish scan patterns. Deliberately inside the Java-regex ∩ RE2 common
    * subset (no lookaround, no backreferences; `\b` and ASCII classes mean
    * the same in both), so the DuckDB oracle runs the IDENTICAL pattern
    * strings.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val UrlPattern = "https?://[^\\s]+"
  val DigitRunPattern = "[0-9]{7,}"

  /** Per-document PII / sensitive-pattern scan: match counts for emails,
    * IPv4 literals, URLs, and long digit runs (phone/account-number
    * shaped), a `has_pii` flag, and the md5 of the redacted text (emails →
    * `<EMAIL>`, then IPs → `<IP>`, then digit runs → `<NUM>`, in that
    * order — the md5 keeps the output row narrow while still pinning the
    * exact redaction bytes cross-engine).
    *
    * Pure narrow projection — zero shuffles, scan speed at 100 TB, and the
    * parquet reader prunes to (doc_id, text). All four regex scans run in
    * one codegen'd stage over the same row.
    */
  /** The redaction chain shared by [[piiScan]] (hash-only) and
    * [[piiRedact]] (emits the text): emails → `<EMAIL>`, then IPs →
    * `<IP>`, then digit runs → `<NUM>`, in that fixed order (order
    * matters: an IP's octets would otherwise be eaten as digit runs).
    */
  private def redactedText: Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      DigitRunPattern, "<NUM>")

  def piiScan(documents: DataFrame): DataFrame = {
    def hits(pattern: String): Column =
      size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
    val redacted = redactedText
    documents
      .select(
        col("doc_id"),
        hits(EmailPattern).as("n_emails"),
        hits(Ipv4Pattern).as("n_ipv4"),
        hits(UrlPattern).as("n_urls"),
        hits(DigitRunPattern).as("n_digit_runs"),
        md5(redacted).as("redacted_md5"))
      .withColumn("has_pii",
        col("n_emails") > 0 || col("n_ipv4") > 0 || col("n_digit_runs") > 0)
  }

  /** PII redaction as a PIPELINE STAGE, not just a scan: emits the
    * redacted text itself (deterministic `<EMAIL>`/`<IP>`/`<NUM>`
    * placeholders via [[redactedText]] — the same chain [[piiScan]]
    * hashes) plus the replacement count per category, so a downstream
    * stage consumes `redacted_text` in place of `text` and an auditor can
    * reconcile this frame against the scan's `redacted_md5` column.
    *
    * Same shape as the scan: a pure narrow projection, zero shuffles,
    * scan speed at 100 TB. URLs are counted by the scan but NOT redacted
    * — a URL is an audit signal here, not removable PII; the n_urls
    * column stays on the scan card.
    */
  def piiRedact(documents: DataFrame): DataFrame = {
    def hits(pattern: String): Column =
      size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
    documents.select(
      col("doc_id"),
      hits(EmailPattern).as("n_emails"),
      hits(Ipv4Pattern).as("n_ipv4"),
      hits(DigitRunPattern).as("n_digit_runs"),
      redactedText.as("redacted_text"))
  }

  /** Decontamination n-gram length (GPT-3-style 13-gram collision) and the
    * held-out split rule (doc_id % mod == 0 → eval). Interpolated into the
    * oracle SQL.
    */
  val DecontamNgram = 13
  val EvalHoldoutMod = 10

  /** Train/eval DECONTAMINATION: flags training documents that share any
    * `n`-gram with the held-out eval split — the standard guard against
    * benchmark leakage into a training corpus. Output is one row per TRAIN
    * document (zero-hit docs included, so the result is a total report):
    * distinct n-gram count, how many of those n-grams also occur in the
    * eval split, the contamination ratio, and the flag.
    *
    * Shape: both sides explode [[TextFunctions.shingles]] (distinct per
    * doc, capped tokens) and shuffle only a 60-bit hash per n-gram — never
    * the n-gram string. The eval side is collapsed to DISTINCT hashes
    * before the join, so each train n-gram meets at most ONE eval row: no
    * pair explosion on boilerplate n-grams, unlike a doc×doc join (which
    * this deliberately is not — "which eval doc" costs a skew-prone pair
    * join; "is it leaked" doesn't). The join is a plain hash equi-join on
    * gh — near-uniform by construction (md5), AQE-friendly, and the
    * per-doc re-agg reuses map-side combine. A 60-bit hash collision would
    * produce the same verdict in engine and oracle alike (both join on the
    * same hashes), so the gate stays exact.
    */
  def decontaminate(
      documents: DataFrame, n: Int = DecontamNgram,
      evalMod: Int = EvalHoldoutMod): DataFrame = {
    val grams = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), explode(TextFunctions.shingles(col("text"), n)).as("g"))
      .select(col("doc_id"), HashFunctions.md5Long(col("g"), n).as("gh"))
    val evalGrams = grams.where(col("doc_id") % evalMod === 0)
      .select("gh").distinct().withColumn("hit", lit(1))
    val perDoc = grams.where(col("doc_id") % evalMod =!= 0)
      .join(evalGrams, Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("hit") === 1, 1L).otherwise(0L)).as("n_shared"))
    documents.where(col("doc_id") % evalMod =!= 0)
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).cast("int").as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).cast("int").as("n_shared_ngrams"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("contamination_ratio"))
      .withColumn("contaminated", col("n_shared_ngrams") > 0)
  }

  /** SPAN-level decontamination: WHERE inside each training document the
    * eval-split n-grams occur — one row per contiguous contaminated span
    * (token offsets, inclusive), overlapping hit windows merged. The
    * surgical companion to [[decontaminate]]'s doc-level flag: at 100 TB a
    * pipeline excises leaked spans (the Lee et al. 2022 practice) instead
    * of discarding whole documents, and this emits exactly the cut list.
    *
    * Same axes as [[decontaminate]]: trim-split tokens capped at
    * [[graft.functions.TextFunctions.MaxShingleTokens]], 13-gram windows,
    * 60-bit md5 per gram (the string never shuffles), doc_id % 10 == 0 as
    * the held-out side. Positional windows instead of the distinct
    * shingle set, since the output is offsets.
    *
    * Shape: windows explode → hash → the eval side collapses to DISTINCT
    * hashes before the equi-join (no pair explosion on boilerplate — same
    * argument as [[decontaminate]]) → a LEFT SEMI keeps hit windows only.
    * The island merge (gaps-and-islands: a window starting within the
    * previous window's extent continues the span) runs per-doc windows
    * over HIT rows only — sparse by construction, so the per-doc sort
    * carries contaminated windows, not the corpus.
    */
  def spanDecontaminate(
      documents: DataFrame, n: Int = DecontamNgram,
      evalMod: Int = EvalHoldoutMod): DataFrame = {
    val win = graft.Parallelism.ensure(documents)
      .select(col("doc_id"),
        slice(split(trim(TextFunctions.nfc(col("text"))), "\\s+"), 1,
          graft.functions.TextFunctions.MaxShingleTokens).as("ts"))
      .where(size(col("ts")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ts) - $n), " +
          s"i -> struct(i AS s, array_join(slice(ts, i + 1, $n), ' ') AS g))")).as("w"))
      .select(col("doc_id"), col("w.s").cast("long").as("s"),
        HashFunctions.md5Long(col("w.g"), n).as("gh"))
    val evalGrams = win.where(col("doc_id") % evalMod === 0)
      .select("gh").distinct()
    val hits = win.where(col("doc_id") % evalMod =!= 0)
      .join(evalGrams, Seq("gh"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("s")
    hits
      .withColumn("newisl",
        when(col("s") - lag("s", 1).over(w) < n, 0L).otherwise(1L))
      .withColumn("isl", sum("newisl").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "isl")
      .agg(min("s").as("span_start"), (max("s") + (n - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** [[spanDecontaminate]] with a BLOOM-PREFILTERED probe side — the shape
    * a 100 TB decontamination pass actually runs (e.g. Dolma's
    * bloom-filter decontamination): the eval split's n-gram hash set is
    * folded into an m-bit bitmap ([[RuntimeFilter.bloomBitmap]] — built
    * distributed, driver transfer bounded by m, never by gram count) and
    * every train window pays ONE codegen'd scan-stage membership test
    * before anything shuffles. Windows that cannot match never reach the
    * exact semi-join; false positives are removed by that join, so the
    * RESULT IS IDENTICAL to [[spanDecontaminate]] and the registered query
    * shares its oracle verbatim (the same pass-through contract as
    * `q_bloom_join`).
    *
    * Why it matters at scale: the exact semi-join needs the eval gram set
    * as a join side — fine while it broadcasts, but a real benchmark
    * battery's 13-gram set (10⁸–10⁹ hashes) outgrows broadcast and the
    * probe (every window of the corpus) pays a full shuffle. The bitmap
    * stays m-bounded (128 MB at the 2^30 cap) no matter how many grams
    * feed it, rides to executors in the task binary, and drops the
    * overwhelmingly-clean corpus at the scan, so the exact join's probe
    * side is the contaminated sliver. FP rate at the sized m is ~0.7%
    * ([[RuntimeFilter.BloomBitsPerKey]]), i.e. the residual join is ~170×
    * smaller than the unfiltered one on a clean corpus.
    */
  def spanDecontaminateBloom(
      documents: DataFrame, n: Int = DecontamNgram,
      evalMod: Int = EvalHoldoutMod): DataFrame = {
    val win = graft.Parallelism.ensure(documents)
      .select(col("doc_id"),
        slice(split(trim(TextFunctions.nfc(col("text"))), "\\s+"), 1,
          graft.functions.TextFunctions.MaxShingleTokens).as("ts"))
      .where(size(col("ts")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ts) - $n), " +
          s"i -> struct(i AS s, array_join(slice(ts, i + 1, $n), ' ') AS g))")).as("w"))
      .select(col("doc_id"), col("w.s").cast("long").as("s"),
        HashFunctions.md5Long(col("w.g"), n).as("gh"))
    // the eval gram set is consumed three times (count for sizing, bitmap
    // fold, exact semi-join) — checkpoint so eval docs tokenize once
    val evalGrams = win.where(col("doc_id") % evalMod === 0)
      .select("gh").distinct().localCheckpoint()
    val m = RuntimeFilter.bloomBitsFor(evalGrams.count())
    val bits = RuntimeFilter.bloomBitmap(evalGrams, "gh", m)
    val hits = RuntimeFilter
      .bloomPruneBitmap(win.where(col("doc_id") % evalMod =!= 0), "gh", bits, m)
      .join(evalGrams, Seq("gh"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("s")
    hits
      .withColumn("newisl",
        when(col("s") - lag("s", 1).over(w) < n, 0L).otherwise(1L))
      .withColumn("isl", sum("newisl").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "isl")
      .agg(min("s").as("span_start"), (max("s") + (n - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** −ln α for Stupid Backoff's α = 0.4, in 20-bit fixed point: defined as
    * `ln_f(5) − ln_f(2)` (= ln 2.5 through the portable integer chain), so
    * both engines use the exact same penalty integer.
    */
  val BackoffPenaltyF: Long =
    graft.functions.FixedPointLn.lnFRef(5L) - graft.functions.FixedPointLn.lnFRef(2L)

  /** HELD-OUT trigram surprisal with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the web-scale n-gram
    * scoring rule): the LM trains on the TRAIN split (doc_id % 10 ≠ 0,
    * the [[decontaminate]] holdout convention) and scores the EVAL split,
    * so backoff genuinely fires — a trigram the train split never saw
    * backs off to the bigram (× α), then the unigram (× α²), then a
    * singleton floor for never-seen words:
    *
    *   S(w3|w1 w2) = n123/n12       if the trigram is in the train LM
    *               = α · n23/n2     else if the bigram is
    *               = α² · n3/N      else if the word is
    *               = α² · 1/(N+1)   else (unseen word — the defined floor)
    *
    * Surprisal per level is an ln_f difference plus 0/1/2 ×
    * [[BackoffPenaltyF]]; the per-doc output carries the level counts
    * (n_l3 .. n_l0) — the backoff-rate profile is itself the diagnostic a
    * pipeline reads (high l0/l1 share = out-of-domain or gibberish eval
    * text). Complements [[lmSurprisal]] (held-in, add-1 bigram): this is
    * the held-out, production-shaped scoring path.
    *
    * Shape: three train-side n-gram hash-aggs (uni/bi/tri — each map-side
    * combined, vocabulary-bounded after aggregation), the eval side's
    * per-(doc, trigram) counts (checkpointed — the eval corpus is
    * tokenized once), then five LEFT joins of pre-aggregated frames keyed
    * by n-gram parts (AQE handles the Zipf skew) and one doc_id-keyed
    * final agg. NULL-safe by construction: ln_f of a NULL count is NULL
    * and the level CASE never reads a NULL branch it selects.
    */
  def backoffSurprisal(
      documents: DataFrame, evalMod: Int = EvalHoldoutMod): DataFrame = {
    val ts = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), lowToks(col("text")).as("ts"))
    val lm = backoffLmTables(ts.where(col("doc_id") % evalMod =!= 0))
    val evalTris = ts.where(col("doc_id") % evalMod === 0)
      .where(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(ts) - 1), " +
          "i -> struct(ts[i-2] AS w1, ts[i-1] AS w2, ts[i] AS w3))")).as("tg"))
      .groupBy(col("doc_id"), col("tg.w1").as("w1"),
        col("tg.w2").as("w2"), col("tg.w3").as("w3"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val scored = backoffScoreTris(evalTris, lm)
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_trigrams"),
        sum(when(col("level") === 3, col("c")).otherwise(0L)).as("n_l3"),
        sum(when(col("level") === 2, col("c")).otherwise(0L)).as("n_l2"),
        sum(when(col("level") === 1, col("c")).otherwise(0L)).as("n_l1"),
        sum(when(col("level") === 0, col("c")).otherwise(0L)).as("n_l0"),
        sum(col("c") * col("s_f")).as("nll_f"))
    documents.where(col("doc_id") % evalMod === 0).select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_trigrams", "n_l3", "n_l2", "n_l1", "n_l0", "nll_f"))
      .withColumn("avg_nll_f",
        when(col("n_trigrams") > 0, expr("nll_f DIV n_trigrams")).otherwise(0L))
  }

  /** The Stupid-Backoff train-side artifact: the three checkpointed n-gram
    * tables + the 1-row token total, from a (doc_id, ts) token frame.
    * Shared by [[backoffSurprisal]] and [[lineSurprisal]] so the LM the
    * doc scorer and the window scorer consult is the same table.
    */
  private[graft] case class BackoffLm(
      uni: DataFrame, bi: DataFrame, tri: DataFrame, bigN: DataFrame)

  private[graft] def backoffLmTables(train: DataFrame): BackoffLm = {
    // the three LM tables are each consumed 1-2× downstream (bigN derives
    // from uni; bi serves both the n12 and n23 joins) — checkpoint them so
    // the train corpus is tokenized exactly three times (once per n-gram
    // order, the train-once artifact cost), not once per consumer
    val uni = train.select(explode(col("ts")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n1"))
      .localCheckpoint()
    val bi = train.where(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
      .localCheckpoint()
    val tri = train.where(size(col("ts")) >= 3)
      .select(explode(expr(
        "transform(sequence(2, size(ts) - 1), " +
          "i -> struct(ts[i-2] AS w1, ts[i-1] AS w2, ts[i] AS w3))")).as("tg"))
      .select(col("tg.w1").as("w1"), col("tg.w2").as("w2"), col("tg.w3").as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n123"))
      .localCheckpoint()
    BackoffLm(uni, bi, tri, uni.agg(sum("n1").as("n_train")))
  }

  /** The five-join backoff scoring pass: attaches `level` and the
    * per-trigram fixed-point surprisal `s_f` to any frame carrying
    * (w1, w2, w3) columns (extra key columns pass through untouched).
    */
  private[graft] def backoffScoreTris(tris: DataFrame, lm: BackoffLm): DataFrame = {
    import graft.functions.FixedPointLn.lnF
    val pen = lit(BackoffPenaltyF)
    tris
      .join(lm.tri, Seq("w1", "w2", "w3"), "left")
      .join(lm.bi, Seq("w1", "w2"), "left")
      .join(lm.bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("n12").as("n23")), Seq("w2", "w3"), "left")
      .join(lm.uni.select(col("w").as("w2"), col("n1").as("n2")), Seq("w2"), "left")
      .join(lm.uni.select(col("w").as("w3"), col("n1").as("n3")), Seq("w3"), "left")
      .crossJoin(broadcast(lm.bigN))
      .withColumn("level",
        when(col("n123").isNotNull, 3)
          .when(col("n23").isNotNull, 2)
          .when(col("n3").isNotNull, 1)
          .otherwise(0))
      .withColumn("s_f",
        when(col("level") === 3, lnF(col("n12")) - lnF(col("n123")))
          .when(col("level") === 2, lnF(col("n2")) - lnF(col("n23")) + pen)
          .when(col("level") === 1,
            lnF(col("n_train")) - lnF(col("n3")) + pen * 2)
          .otherwise(lnF(col("n_train") + 1) + pen * 2))
  }

  /** A line is flagged by [[lineSurprisal]] iff its milli-nat avg exceeds
    * [[LineNllNum]]/[[LineNllDen]] of the corpus mean of line averages.
    */
  val LineNllNum = 3L
  val LineNllDen = 2L

  /** WINDOWED (per-line) surprisal — the CCNet paragraph-perplexity
    * filter (Wenzek et al. 2020): score each LINE of every eval-split
    * document under the train-split Stupid-Backoff LM and flag the
    * outlier lines, so a document with one boilerplate/gibberish run in
    * otherwise-fluent text loses the run, not the document. The doc-level
    * [[backoffSurprisal]] averages that signal away; this is the operator
    * that localizes it. Lines are the corpus's line unit
    * ([[graft.operators.Dedup.LineLen]]-token non-overlapping windows,
    * the line-dedup convention); trigrams never cross a line boundary
    * (each line is scored as its own context, exactly CCNet's
    * per-paragraph scoring), and the tail window keeps its row as long
    * as it holds ≥ 3 tokens.
    *
    * The flag is corpus-relative in the [[graft.operators.Pipeline
    * .qualityAgreement]] overflow-safe idiom: per-line avg surprisal in
    * MILLI-nats (≤ ~5·10⁴), flagged iff
    * `avg_milli · n_lines · LineNllDen > LineNllNum · Σ avg_milli` —
    * the cross-multiplied "above 3/2 of the corpus mean line average"
    * test, exact in int64 past 10¹³ lines.
    *
    * Shape: the SAME frozen LM tables as the doc scorer
    * ([[backoffLmTables]] — train corpus tokenized once per n-gram
    * order), per-(line, trigram) counts pre-aggregated before the five
    * vocabulary joins, a (doc, pos)-keyed rollup, and a 1-row mean
    * broadcast. Nothing corpus-ordered, nothing pairwise.
    */
  def lineSurprisal(
      documents: DataFrame, evalMod: Int = EvalHoldoutMod,
      lineLen: Int = graft.operators.Dedup.LineLen): DataFrame = {
    import graft.functions.FixedPointLn.Scale
    val ts = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), lowToks(col("text")).as("ts"))
    val lm = backoffLmTables(ts.where(col("doc_id") % evalMod =!= 0))
    val winTris = ts.where(col("doc_id") % evalMod === 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(ts) - 1) div $lineLen), " +
          s"i -> slice(ts, i * $lineLen + 1, $lineLen))")).as(Seq("pos", "wts")))
      .where(size(col("wts")) >= 3)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), explode(expr(
        "transform(sequence(2, size(wts) - 1), " +
          "i -> struct(wts[i-2] AS w1, wts[i-1] AS w2, wts[i] AS w3))")).as("tg"))
      .groupBy(col("doc_id"), col("pos"), col("tg.w1").as("w1"),
        col("tg.w2").as("w2"), col("tg.w3").as("w3"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val perLine = backoffScoreTris(winTris, lm)
      .groupBy("doc_id", "pos")
      .agg(
        sum("c").as("n_trigrams"),
        sum(when(col("level") === 0, col("c")).otherwise(0L)).as("n_l0"),
        sum(col("c") * col("s_f")).as("nll_f"))
      .withColumn("avg_milli",
        expr(s"(nll_f DIV n_trigrams) * 1000 DIV $Scale"))
      .localCheckpoint() // consumed twice: the mean and the flagged rows
    val tot = perLine.agg(
      count(lit(1)).as("n_lines"), sum("avg_milli").as("sum_avg"))
    perLine.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("pos"), col("n_trigrams"), col("n_l0"),
        col("nll_f"), col("avg_milli"),
        (col("avg_milli") * col("n_lines") * LineNllDen >
          lit(LineNllNum) * col("sum_avg")).as("flagged"))
  }

  /** Relative flag floor for [[docCompression]]: a document is flagged iff
    * its chars-per-BPE-token ratio is below 3/4 of the corpus ratio.
    * Frequency-relative like [[RareDen]] — an absolute cutoff stops
    * meaning anything as the tokenizer or corpus drifts.
    */
  val CompressionFloorNum = 3L
  val CompressionFloorDen = 4L

  /** Per-document BPE COMPRESSION ratio — chars per BPE token, in milli —
    * under the PERSISTED tokenizer: the cheap gibberish detector (random
    * character soup defeats the merge rules and falls back toward
    * one-piece-per-char, cratering the ratio; fluent text compresses).
    * Flagged iff the doc ratio is below [[CompressionFloorNum]]/
    * [[CompressionFloorDen]] of the corpus-wide ratio — the threshold is
    * an integer milli floor `(t_chars·3000) div (t_bpe·4)`, so the verdict
    * stays exact at any scale (no doc×corpus cross-multiplication that
    * could overflow int64 at 100 TB).
    *
    * Shape: the [[tokenizerFertility]] pieces re-keyed by document — the
    * vocabulary-bounded `bpe_segments` pass over DISTINCT words, a
    * per-(doc, word) hash-agg, the word-keyed join of the two, a
    * doc_id-keyed rollup, and a 1-row corpus total broadcast back.
    */
  def docCompression(
      documents: DataFrame, rules: Array[(String, String)]): DataFrame = {
    val pieces = bpeEncodeWithRules(documents, rules)
      .select(col("word"), col("n_pieces"))
    val docWords = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), explode(lowToks(col("text"))).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("freq"))
    // consumed by the corpus totals AND the final join — checkpoint so the
    // BPE segment chain runs once, not once per consumer
    val perDoc = docWords.join(pieces, "word")
      .groupBy("doc_id")
      .agg(
        sum("freq").as("n_words"),
        sum(col("freq") * length(col("word"))).as("n_chars"),
        sum(col("freq") * col("n_pieces")).as("n_bpe"))
      .localCheckpoint()
    val totals = perDoc.agg(
      sum("n_chars").as("t_chars"), sum("n_bpe").as("t_bpe"))
    documents.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_words", "n_chars", "n_bpe"))
      .crossJoin(broadcast(totals))
      .withColumn("compression_milli",
        when(col("n_bpe") > 0, expr("(n_chars * 1000) DIV n_bpe")).otherwise(0L))
      .withColumn("flagged",
        col("n_bpe") > 0 && col("compression_milli") <
          expr(s"(t_chars * ${1000 * CompressionFloorNum})" +
            s" DIV (t_bpe * $CompressionFloorDen)"))
      .select("doc_id", "n_words", "n_chars", "n_bpe",
        "compression_milli", "flagged")
  }

  /** Top-k candidate pool size for [[bpeMergeCandidates]]. */
  val DefaultBpeK = 20

  /** BPE vocabulary induction, step one: corpus-wide counts of adjacent
    * CHARACTER pairs inside lowercase tokens — the statistic a byte-pair
    * tokenizer trainer maximizes for its first merge. Top-k pairs by
    * (count desc, pair asc) is the deterministic merge-candidate list.
    *
    * Shape: explode tokens → explode the per-token pair list (a lambda
    * over a sequence of offsets; `tok` is a plain attribute so the HOF
    * re-evaluation trap doesn't apply) → hash-agg with map-side combine →
    * global top-k as TakeOrderedAndProject. State is the character-pair
    * alphabet (≤ |chars|²), independent of corpus size.
    */
  def bpeMergeCandidates(documents: DataFrame, k: Int = DefaultBpeK): DataFrame =
    graft.Parallelism.ensure(documents)
      .select(explode(lowToks(col("text"))).as("tok"))
      .where(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(k)

  /** Distinct words with corpus frequencies — the weighted vocabulary
    * table BOTH BPE stages run on. This is the standard trainer
    * optimization: pair statistics are Σ freq(word) · pairs-in-word, so
    * after this one corpus-scale (map-side-combined) count, every
    * training round and the final encode touch only the VOCABULARY —
    * 100 TB of text becomes a few million weighted rows.
    */
  private def wordFreqs(documents: DataFrame): DataFrame =
    graft.Parallelism.ensure(documents)
      .select(explode(lowToks(col("text"))).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Vocabulary cap for the driver-local training loop: [[trainBpeRules]]
    * collects at most this many (word, freq) rows — the top-V by
    * (freq DESC, word ASC), i.e. a `TakeOrderedAndProject`, never a full
    * collect. This is the standard trainer shape (in-memory training over
    * a word-count table; the distributed work is the ONE corpus-scale
    * count that builds it): at the driver's SFs the vocabulary is orders
    * of magnitude below the cap, so the trained rules are bit-identical
    * to the uncapped DuckDB replay; at 100 TB the cap is what bounds the
    * driver at ~32 MB while the rare sub-cap tail it can drop carries
    * negligible pair mass by construction (lowest-frequency words).
    */
  val DefaultBpeTrainVocab: Int = 1 << 20

  /** Spark's string sort order (UTF8 binary) for the local tie-break —
    * a Scala String comparison would diverge on supplementary planes.
    */
  private def utf8Cmp(x: String, y: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(x)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))

  /** One leftmost-first merge pass — the exact per-rule fold of the
    * [[graft.functions.BpeSegments]] kernel (and of the oracle's
    * `list_reduce`), applied in place during local training.
    */
  private def mergeOnce(pieces: Array[String], a: String, b: String): Array[String] = {
    if (pieces.length < 2) return pieces
    val out = scala.collection.mutable.ArrayBuffer[String](pieces(0))
    var i = 1
    while (i < pieces.length) {
      if (out.last == a && pieces(i) == b) out(out.length - 1) = a + b
      else out += pieces(i)
      i += 1
    }
    out.toArray
  }

  /** The REAL iterative BPE trainer — one distributed job, then local
    * rounds. The cluster computes (and [[DefaultBpeTrainVocab]]-bounds)
    * the weighted vocabulary; every merge round is then a driver-local
    * rescan of the collected segmentations: count adjacent piece pairs
    * weighted by word frequency, pick the top by (count DESC, pair ASC
    * in UTF8 order), fold it leftmost-first, repeat. Identical rules to
    * the previous k-job distributed loop (the DuckDB oracle replays the
    * uncapped training and stays hash-green), at 1/k the job count —
    * this was the 5th-slowest bench family purely on job scheduling.
    * Stops early if no pairs remain (fully merged vocabulary).
    */
  private def trainBpeRules(
      words: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    val vocab = words
      .orderBy(desc("freq"), asc("word"))
      .limit(DefaultBpeTrainVocab)
      .collect()
    val freqs = new Array[Long](vocab.length)
    val segs = new Array[Array[String]](vocab.length)
    var i = 0
    while (i < vocab.length) {
      freqs(i) = vocab(i).getLong(1)
      segs(i) = vocab(i).getString(0) // code-point split, like the kernel
        .codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      i += 1
    }
    var out = Vector.empty[(Int, String, String, Long)]
    var done = false
    while (!done && out.size < k) {
      val counts = new java.util.HashMap[(String, String), Long]
      var wi = 0
      while (wi < segs.length) {
        val ps = segs(wi)
        val f = freqs(wi)
        var j = 0
        while (j < ps.length - 1) {
          counts.merge((ps(j), ps(j + 1)), f, _ + _)
          j += 1
        }
        wi += 1
      }
      var bestA: String = null
      var bestB: String = null
      var bestN = 0L
      counts.forEach { (p, n) =>
        val better = bestA == null || n > bestN || (n == bestN && {
          val ca = utf8Cmp(p._1, bestA)
          ca < 0 || (ca == 0 && utf8Cmp(p._2, bestB) < 0)
        })
        if (better) { bestA = p._1; bestB = p._2; bestN = n }
      }
      if (bestA == null) done = true
      else {
        out = out :+ ((out.size + 1, bestA, bestB, bestN))
        wi = 0
        while (wi < segs.length) {
          segs(wi) = mergeOnce(segs(wi), bestA, bestB)
          wi += 1
        }
      }
    }
    out
  }

  /** The trained merge table: (rank, a, b, n) — rank is training order,
    * n the weighted pair count at selection time. Fully replayed by the
    * DuckDB oracle (k generated round CTEs, each a pair count + a
    * `list_reduce` fold identical to the kernel's leftmost-first rule).
    */
  def bpeTrainedMerges(documents: DataFrame, k: Int = DefaultBpeK): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // no checkpoint: the local trainer reads the word table exactly once
    val words = wordFreqs(documents)
    trainBpeRules(words, k).toDF("rank", "a", "b", "n")
      .select(col("rank").cast("long"), col("a"), col("b"), col("n"))
  }

  /** BPE ENCODE — the tokenizer's apply step over the weighted
    * vocabulary: every distinct word segmented under the full trained
    * rule list (one kernel call per word; corpus positions would join
    * this table on the word key, never re-running the fold per
    * occurrence). Output: (word, freq, pieces space-joined, n_pieces).
    */
  def bpeEncode(documents: DataFrame, k: Int = DefaultBpeK): DataFrame = {
    val words = wordFreqs(documents).localCheckpoint()
    val rules = trainBpeRules(words, k).map(r => (r._2, r._3)).toArray
    encodeWithRules(words, rules)
  }

  /** ENCODE under an externally-supplied merge-rule list — the
    * apply-everywhere half of the train-once contract: production encodes
    * with rules loaded from the persisted tokenizer table
    * ([[TokenizerStore]]), never by retraining. One pass over the
    * vocabulary, no checkpoint needed (nothing else consumes the words).
    */
  def bpeEncodeWithRules(documents: DataFrame, rules: Array[(String, String)]): DataFrame =
    encodeWithRules(wordFreqs(documents), rules)

  private def encodeWithRules(words: DataFrame, rules: Array[(String, String)]): DataFrame =
    words
      .select(col("word"), col("freq"),
        graft.functions.BpeExpressions.bpeSegments(col("word"), rules).as("ps"))
      .select(col("word"), col("freq"),
        array_join(col("ps"), " ").as("pieces"),
        size(col("ps")).cast("long").as("n_pieces"))

  /** Deterministic 1/[[BpeSampleMod]] document sample for the BOUNDED
    * trainer — the `sketch_summary` rail pattern: membership is a pure
    * function of doc_id, so the sample (and thus the trained rules) is
    * identical across partitionings, engines, and re-runs, and the
    * DuckDB oracle replays the same training on the same rows.
    */
  val BpeSampleMod = 16L
  val BpeSampleSeed = 41

  private def bpeSampledDocs(documents: DataFrame): DataFrame =
    documents.where(
      pmod(HashFunctions.md5Long(col("doc_id").cast("string"), BpeSampleSeed),
        lit(BpeSampleMod)) === 0)

  /** BOUNDED-SAMPLE BPE training — the 100 TB answer to the exact
    * trainer's cost: [[trainBpeRules]] is already vocabulary-scale per
    * round, but its input aggregation scans the whole corpus and at real
    * scale the vocabulary itself is 10⁸+ rows × k rounds. Training on a
    * deterministic 1/16 document sample bounds BOTH: the word-frequency
    * scan aggregates only sampled rows and every merge round scans the
    * sample's vocabulary. BPE statistics are frequency RATIOS, which a
    * uniform document sample preserves in expectation — the
    * `q_bpe_sample_agreement` card MEASURES what the cut actually costs
    * in rule/segmentation agreement rather than asserting it.
    */
  def bpeSampledMerges(documents: DataFrame, k: Int = DefaultBpeK): DataFrame =
    bpeTrainedMerges(bpeSampledDocs(documents), k)

  /** The VOCABULARY-AGREEMENT card between the exact and sampled
    * trainers: one row per merge rank — both trainers' rules side by
    * side with a match flag — plus `seg_agree_milli`, the share (integer
    * thousandths) of corpus word OCCURRENCES whose full segmentation
    * under the sampled rules equals the exact trainer's. This is the
    * acceptance gate for switching production training to the sample:
    * ship the sampled tokenizer iff the card says the cut is free.
    *
    * Cost shape: both trainings (the exact one dominates — that is the
    * point of the card; the sampled trainer alone is the production
    * path, registered as `q_bpe_sampled`), then ONE vocabulary-bounded
    * double-encode scan. Driver traffic: 2k one-row collects + one
    * 1-row agreement scalar + the k-row output build — all bounded.
    */
  def bpeSampleAgreement(documents: DataFrame, k: Int = DefaultBpeK): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val words = wordFreqs(documents).localCheckpoint()
    val exact = trainBpeRules(words, k)
    val sampled = trainBpeRules(wordFreqs(bpeSampledDocs(documents)), k)
    val exactRules = exact.map(r => (r._2, r._3)).toArray
    val sampledRules = sampled.map(r => (r._2, r._3)).toArray
    // Option: NULL on an empty vocabulary (agreement is undefined; the
    // oracle's aggregate-over-empty-join yields the same NULL)
    val agreeRow = words
      .select(col("freq"),
        (array_join(graft.functions.BpeExpressions
          .bpeSegments(col("word"), exactRules), " ") ===
         array_join(graft.functions.BpeExpressions
          .bpeSegments(col("word"), sampledRules), " ")).as("same"))
      .agg((sum(when(col("same"), col("freq")).otherwise(0L)) * 1000)
        .as("a"), sum("freq").as("t"))
      .select(expr("a DIV t"))
      .collect().head
    val agreeMilli: Option[Long] =
      if (agreeRow.isNullAt(0)) None else Some(agreeRow.getLong(0))
    val eByRank = exact.map(r => r._1 -> ((r._2, r._3))).toMap
    val sByRank = sampled.map(r => r._1 -> ((r._2, r._3))).toMap
    // always k rows (trailing all-NULL when a trainer merged out early) —
    // the oracle generates exactly k rank rows
    (1 to k).map { r =>
      val e = eByRank.get(r)
      val s = sByRank.get(r)
      (r.toLong, e.map(_._1), e.map(_._2), s.map(_._1), s.map(_._2),
        e.isDefined && s.isDefined && e == s, agreeMilli)
    }.toDF("rank", "exact_a", "exact_b", "sample_a", "sample_b",
      "rule_match", "seg_agree_milli")
  }

  /** Tokenizer fertility report per language — the tokenizer-QA step a
    * multilingual pipeline runs before committing to a vocabulary: BPE
    * pieces per whitespace word (`fertility_milli`, thousandths by
    * integer division) plus the word/char/piece totals the ratio derives
    * from. A language whose fertility is far above the corpus mean is
    * being over-segmented by the shared vocabulary — the standard signal
    * that its training-token budget is effectively taxed.
    *
    * Uses the PERSISTED tokenizer rules (the train-once/apply-everywhere
    * contract — production never retrains to measure). Shape: the
    * vocabulary-bounded encode (one `bpe_segments` kernel pass over
    * DISTINCT words), a per-(lang, word) hash-agg, a word-keyed join of
    * the two (vocabulary-sized, never corpus-sized), and a |langs|-row
    * rollup. All integers.
    */
  def tokenizerFertility(
      documents: DataFrame, rules: Array[(String, String)]): DataFrame = {
    val encoded = bpeEncodeWithRules(documents, rules)
    val langWords = graft.Parallelism.ensure(documents)
      .select(col("lang"), explode(lowToks(col("text"))).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("lang", "word").agg(count(lit(1)).as("freq"))
    langWords.join(encoded.select(col("word"), col("n_pieces")), "word")
      .groupBy("lang")
      .agg(
        sum(col("freq") * col("n_pieces")).as("n_bpe_tokens"),
        sum("freq").as("n_words"),
        sum(col("freq") * length(col("word"))).as("n_chars"))
      .withColumn("fertility_milli", expr("(n_bpe_tokens * 1000) div n_words"))
  }

  /** Merge-count checkpoints for the vocab-sizing curve card — ascending,
    * ending at the full trained depth ([[DefaultBpeK]]).
    */
  val BpeCurveCheckpoints: Seq[Int] = Seq(5, 10, DefaultBpeK)

  /** Tokenizer VOCAB-SIZING curve — the "how many merges buy how much"
    * card a pipeline runs before committing to a vocabulary size. BPE's
    * greedy invariant makes the first k rules of a deeper training
    * identical to a k-round training, so ONE training to the deepest
    * checkpoint serves every point on the curve; each checkpoint then
    * costs one vocabulary-bounded encode pass under the rule PREFIX.
    * Reported per checkpoint, all exact integers: rules in effect,
    * distinct pieces actually used (vocabulary utilization), corpus
    * word/char totals, BPE token total, fertility (pieces per word,
    * milli) and compression (chars per piece, milli).
    *
    * Scale shape: the corpus-scale work is [[wordFreqs]]'s ONE count;
    * checkpoints add |vocab|-row kernel scans + two-column aggregates.
    * The DuckDB oracle reads the SAME training recursion's intermediate
    * round states — nothing retrains per checkpoint on either side.
    */
  def bpeVocabCurve(
      documents: DataFrame,
      checkpoints: Seq[Int] = BpeCurveCheckpoints): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted,
      "checkpoints must be ascending")
    val words = wordFreqs(documents).localCheckpoint()
    val rules = trainBpeRules(words, checkpoints.max)
      .map(r => (r._2, r._3)).toArray
    val base = words.agg(
      sum("freq").as("n_words"),
      sum(col("freq") * length(col("word"))).as("n_chars"))
    // a checkpoint deeper than the achieved rounds has no training
    // state (the oracle's recursion stops when no pairs remain) — it
    // contributes no curve row rather than a duplicate of the last one
    def rowFor(k: Int, emit: Boolean) = {
      val rk = rules.take(k)
      words
        .select(col("freq"),
          explode(graft.functions.BpeExpressions
            .bpeSegments(col("word"), rk)).as("piece"))
        .agg(sum("freq").as("n_bpe_tokens"),
          countDistinct(col("piece")).as("n_distinct_pieces"))
        .select(lit(k.toLong).as("vocab_k"),
          lit(rk.length.toLong).as("n_rules"),
          col("n_distinct_pieces"), col("n_bpe_tokens"))
        .where(lit(emit))
    }
    val perK = checkpoints.map(k => rowFor(k, emit = k <= rules.length))
      .reduce(_ union _)
    // empty corpus → empty curve (the oracle's recursion never reaches
    // any checkpoint round); non-empty training always has ≥1 word row
    perK.crossJoin(broadcast(base))
      .where(col("n_words").isNotNull)
      .withColumn("fertility_milli", expr("(n_bpe_tokens * 1000) div n_words"))
      .withColumn("compression_milli", expr("(n_chars * 1000) div n_bpe_tokens"))
      .select("vocab_k", "n_rules", "n_distinct_pieces", "n_words",
        "n_chars", "n_bpe_tokens", "fertility_milli", "compression_milli")
  }

  /** `character_coverage` as an exact ratio (SentencePiece's 0.9995):
    * the vocabulary keeps the most frequent code points covering at
    * least this share of the TRAINING corpus's weighted char
    * occurrences; everything rarer encodes via UTF-8 byte fallback.
    */
  val BpeCoverageNum = 9995L
  val BpeCoverageDen = 10000L

  /** BYTE-FALLBACK card — what shipping the sampled-trained vocabulary
    * costs per language in out-of-vocabulary expansion. The vocabulary
    * is built the way production byte-fallback tokenizers build theirs:
    * rank the training corpus's code points by weighted frequency
    * (DESC, char ASC tie-break) and keep the minimal prefix covering
    * ≥ [[BpeCoverageNum]]/[[BpeCoverageDen]] of char occurrences
    * (`cum_before · den < total · num` — the exact-integer form of
    * `cum_before < ceil(total·cov)`), plus every trained merge output.
    * The FULL corpus is then encoded under the sampled rules; a piece
    * outside the vocabulary (necessarily a single dropped/unseen char —
    * merges only produce trained outputs) expands to its UTF-8 bytes.
    * Per language: word/piece totals, OOV piece occurrences, the
    * byte-expanded token total, and the OOV rate in permille.
    *
    * Scale shape: training is the bounded sampled trainer; the kept
    * alphabet is a |code points|-row window (bounded by Unicode, a
    * single-task detail like bm25Ranks); the vocab join is a broadcast;
    * the only corpus-scale passes are the two word counts
    * ([[wordFreqs]] + the per-lang one) the fertility card already
    * established.
    */
  def bpeByteFallback(documents: DataFrame, k: Int = DefaultBpeK): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sampledWords = wordFreqs(bpeSampledDocs(documents)).localCheckpoint()
    val rules = trainBpeRules(sampledWords, k).map(r => (r._2, r._3)).toArray
    val charFreq = sampledWords
      .select(col("freq"), explode(graft.functions.BpeExpressions
        .bpeSegments(col("word"), Array.empty)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cf"))
    val cumW = Window.orderBy(desc("cf"), asc("piece"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val alphabet = charFreq
      .withColumn("cum_before", coalesce(sum("cf").over(cumW), lit(0L)))
      .crossJoin(broadcast(charFreq.agg(sum("cf").as("cf_total"))))
      .where(col("cum_before") * BpeCoverageDen < col("cf_total") * BpeCoverageNum)
      .select("piece")
    val vocab = alphabet
      .union(rules.map { case (a, b) => a + b }.toSeq.toDF("piece"))
      .distinct()
    val pieceStats = wordFreqs(documents)
      .select(col("word"), explode(graft.functions.BpeExpressions
        .bpeSegments(col("word"), rules)).as("piece"))
      .join(broadcast(vocab.withColumn("in_vocab", lit(true))),
        Seq("piece"), "left")
      .groupBy("word")
      .agg(count(lit(1)).as("wp"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("wo"),
        sum(when(col("in_vocab").isNull,
          octet_length(col("piece")).cast("long")).otherwise(1L)).as("wt"))
    val langWords = graft.Parallelism.ensure(documents)
      .select(col("lang"), explode(lowToks(col("text"))).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("lang", "word").agg(count(lit(1)).as("freq"))
    langWords.join(pieceStats, "word")
      .groupBy("lang")
      .agg(sum("freq").as("n_words"),
        sum(col("freq") * col("wp")).as("n_pieces"),
        sum(col("freq") * col("wo")).as("n_oov_pieces"),
        sum(col("freq") * col("wt")).as("n_tokens"))
      .withColumn("oov_permille", expr("(n_oov_pieces * 1000) div n_pieces"))
  }

  /** Next-token candidates per [[bigramNextTokens]] prefix. */
  val DefaultBigramK = 3

  /** Bigram language model: conditional next-token counts over adjacent
    * lowercase token pairs, with `p = n(w1,w2) / n(w1)` as an exact
    * integer ratio and the top-k continuations per prefix by
    * (count desc, token asc). The 2-gram flavor of the n-gram LM statistics
    * a data pipeline exports for corpus inspection and filtering.
    *
    * Shape: tokenize once per doc (projection boundary binds the array),
    * explode the per-doc pair list, (w1, w2) hash-agg with map-side
    * combine, a w1-keyed re-agg for the denominators, and a per-w1 window
    * rank over each prefix's continuation set (vocabulary-bounded, same
    * scale argument as [[topTermsPerLang]] — switch to the bound-heap
    * TakeOrdered twin if a prefix's continuation set outgrows a
    * partition).
    */
  def bigramNextTokens(documents: DataFrame, k: Int = DefaultBigramK): DataFrame = {
    val ts = graft.Parallelism.ensure(documents)
      .select(lowToks(col("text")).as("ts"))
      .where(size(col("ts")) >= 2)
    val pairs = ts
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val counts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val totals = counts.groupBy("w1").agg(sum("n_pair").as("n_w1"))
    val w = Window.partitionBy("w1").orderBy(desc("n_pair"), asc("w2"))
    counts.join(totals, "w1")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"),
        (col("n_pair").cast("double") / col("n_w1")).as("p"), col("rank"))
  }

  /** Nucleus mass for [[bigramNucleus]] as the exact ratio
    * [[NucleusNum]]/[[NucleusDen]] (= top-p 0.9), interpolated into the
    * oracle.
    */
  val NucleusNum = 9
  val NucleusDen = 10

  /** Top-p (nucleus) filtering of the bigram LM: for each prefix, the
    * smallest set of continuations — taken in (count DESC, token ASC)
    * order — whose cumulative mass reaches [[NucleusNum]]/[[NucleusDen]]
    * of the prefix total. A continuation survives iff the mass BEFORE it
    * is still under the threshold, tested by integer cross-multiplication
    * (`(cum − n)·den < num·total`) so the kept set is bit-identical across
    * engines. This is the sampling-time truncation rule (Holtzman et al.)
    * applied corpus-side, where a pipeline prunes its n-gram tables.
    *
    * Shape: the [[bigramNextTokens]] aggregates plus one per-prefix
    * cumulative-sum window — vocabulary-bounded, same scale argument.
    */
  def bigramNucleus(documents: DataFrame): DataFrame = {
    val ts = graft.Parallelism.ensure(documents)
      .select(lowToks(col("text")).as("ts"))
      .where(size(col("ts")) >= 2)
    val counts = ts
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val totals = counts.groupBy("w1").agg(sum("n_pair").as("n_w1"))
    val w = Window.partitionBy("w1").orderBy(desc("n_pair"), asc("w2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.join(totals, "w1")
      .withColumn("cum", sum("n_pair").over(w))
      .where((col("cum") - col("n_pair")) * NucleusDen < lit(NucleusNum.toLong) * col("n_w1"))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("cum"))
  }

  /** Per-document LM quality score: total and per-bigram SURPRISAL of the
    * document under the corpus's own add-1-smoothed bigram model — the
    * CCNet-style "perplexity filter" (Wenzek et al. 2020) with the n-gram
    * LM trained on the corpus itself (a held-in model; production would
    * swap in a reference-corpus LM through the identical plan). With
    * p(w2|w1) = (n(w1,w2)+1)/(n(w1)+V), the per-bigram surprisal is
    * −ln p = ln(n(w1)+V) − ln(n(w1,w2)+1), every ln the portable
    * fixed-point `ln_f` ([[graft.functions.FixedPointLn]]), so nll_f and
    * the integer per-bigram average are exact int64s the oracle replays.
    * Perplexity is exp(avg_nll) — monotone in avg_nll_f, so threshold
    * filters read avg_nll_f directly and no portable exp is needed.
    *
    * Shape: the [[bigramNextTokens]] count aggregates (vocabulary-bounded,
    * map-side combined) plus a per-(doc, bigram) count frame that joins
    * the LM tables on the bigram key — corpus-proportional but
    * partial-combined, with AQE handling the Zipf skew of common bigrams —
    * and one doc_id-keyed final agg. The vocab size V joins in as a 1-row
    * broadcast. Documents with fewer than two tokens score 0 (no bigram
    * evidence; they are the length filter's job, not the LM's).
    */
  /** REP-COLLAPSE kernel for the bigram-signal family (r14): group
    * documents by lowercase-content fingerprint; `rep` = the group's min
    * doc_id, `m` = its multiplicity.
    *
    * Why: [[lmSurprisal]] and [[rareBigramRate]] pay a corpus-
    * proportional bigram explode + bigram-keyed join — the suite's worst
    * second decade (8.0×/decade at sf10) because replicated content
    * re-pays the whole pipeline per copy. Identical lowercased text has
    * identical bigrams, so all corpus-scale work can run per DISTINCT
    * content with corpus counts recovered EXACTLY as Σ(c·m) — the same
    * collapse `q_neardup_exact` uses to stay near-flat across decades.
    * Per-doc outputs are then one rep-keyed join of small rows.
    *
    * Cost discipline: TEXT never rides a corpus-wide shuffle or
    * checkpoint. The grouping aggregates (doc_id, fp) pairs — 40-byte
    * rows; the doc→rep `mapping` joins those pairs to the (checkpointed,
    * text-free) group table; only `reps` — DISTINCT content — carries
    * text, extracted by re-deriving fp on a second pruned scan and
    * keeping group minima. (A first cut tagged docs via a window over
    * (doc_id, lt, fp) and checkpointed it: the full lowercased corpus
    * materialized per signal, 3× the card's cost at sf0.1 — measured,
    * reverted.)
    */
  private[graft] def contentGroups(documents: DataFrame): (DataFrame, DataFrame) = {
    // TEXT is scanned exactly twice, total: once to hash into the
    // checkpointed (doc_id, fp) frame (40-byte rows — everything keyed
    // off it after is shuffle-cheap), once to extract the DISTINCT
    // content texts, which are then checkpointed so the bigram/vocab
    // consumers never rescan the corpus.
    // NFC inside the fingerprint AND the rep text (r15): NFC-variant
    // copies collapse into ONE content group, and since [[toks]] also
    // composes, the m-weighted counts still reproduce per-doc brute
    // force exactly (the DedupEquivalence fuzz covers NFC/NFD mixes)
    val fps = documents
      .select(col("doc_id"), md5(lower(TextFunctions.nfc(col("text")))).as("fp"))
      .localCheckpoint()
    val groups = fps.groupBy("fp")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("m"))
      .localCheckpoint() // one row per DISTINCT content, no text
    val mapping = fps.join(groups.select("fp", "rep"), Seq("fp"))
      .select("doc_id", "rep")
    val reps = documents
      .select(col("doc_id"), lower(TextFunctions.nfc(col("text"))).as("lt"),
        md5(lower(TextFunctions.nfc(col("text")))).as("fp"))
      .join(groups, Seq("fp"))
      .where(col("doc_id") === col("rep"))
      .select(col("rep"), col("m"), col("lt"))
      .localCheckpoint() // distinct-content text only
    (mapping, reps)
  }

  def lmSurprisal(documents: DataFrame): DataFrame = {
    val (mapping, reps) = contentGroups(documents)
    lmSurprisalFrom(mapping, reps)
  }

  /** [[lmSurprisal]] over a prebuilt content grouping — the agreement
    * card shares ONE grouping across both bigram signals.
    */
  private[graft] def lmSurprisalFrom(
      mapping: DataFrame, reps: DataFrame): DataFrame =
    mapping
      .join(lmSurprisalByRep(reps).drop("m"), Seq("rep"))
      .drop("rep")

  /** The per-(rep, bigram) count frame — (rep, m, w1, w2, c), the SHARED
    * corpus-proportional kernel of [[lmSurprisalByRep]] and
    * [[rareBigramRateByRep]] (r17: the agreement card previously paid
    * the bigram explode + hash-agg TWICE, once per signal; both signals
    * derive every corpus table from exactly this frame, so it is
    * computed and checkpointed once and passed to both). Checkpointed:
    * every caller scans it at least twice (corpus tables + the per-rep
    * scoring join).
    */
  private[graft] def bigramCountsByRep(reps: DataFrame): DataFrame =
    graft.Parallelism.ensure(reps)
      // lt is already NFC-composed + lowered by [[contentGroups]]; a raw
      // split here mirrors the oracle's lower(nfc_normalize(text)) EXACTLY
      // ([[toks]] would re-normalize AFTER lowercasing, a different
      // composition in the corner where lowercasing denormalizes)
      .select(col("rep"), col("m"), split(trim(col("lt")), "\\s+").as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("rep"), col("m"), explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).as("bg"))
      .select(col("rep"), col("m"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("rep", "m", "w1", "w2").agg(count(lit(1)).as("c"))
      .localCheckpoint()

  /** The per-DISTINCT-CONTENT core of [[lmSurprisal]]: one row per rep
    * with its multiplicity `m` — the agreement card aggregates these
    * directly (Σm per cell) without ever fanning back out to documents.
    * `counts` lets the agreement card inject the shared
    * [[bigramCountsByRep]] frame (computed once for both signals).
    */
  private[graft] def lmSurprisalByRep(
      reps: DataFrame, counts: Option[DataFrame] = None): DataFrame = {
    import graft.functions.FixedPointLn.lnF
    // every corpus-proportional step below runs over DISTINCT content
    // (the reps); the m-weighted sums reproduce whole-corpus counts
    // exactly, so the per-doc output is bit-identical to the uncollapsed
    // form — the oracle row is untouched
    val ts = graft.Parallelism.ensure(reps)
      .select(col("rep"), col("m"), split(trim(col("lt")), "\\s+").as("ts"))
    val dbc = counts.getOrElse(bigramCountsByRep(reps))
    val lm = dbc.groupBy("w1", "w2").agg(sum(col("c") * col("m")).as("n_pair"))
    val lmTot = lm.groupBy("w1").agg(sum("n_pair").as("n_w1"))
    // distinct vocabulary over reps == over the corpus (duplicates add
    // no new words)
    val vocab = ts.select(explode(col("ts")).as("w")).where(col("w") =!= "")
      .agg(countDistinct("w").as("v"))
    val scored = dbc
      .join(lm, Seq("w1", "w2"))
      .join(lmTot, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("s_f", lnF(col("n_w1") + col("v")) - lnF(col("n_pair") + 1))
      .groupBy("rep")
      .agg(sum("c").as("n_bigrams"), sum(col("c") * col("s_f")).as("nll_f"))
    reps.select("rep", "m")
      .join(scored, Seq("rep"), "left")
      .na.fill(0L, Seq("n_bigrams", "nll_f"))
      .withColumn("avg_nll_f",
        when(col("n_bigrams") > 0, expr("nll_f DIV n_bigrams")).otherwise(0L))
  }

  /** Rarity denominator for [[rareBigramRate]]: a bigram is rare iff its
    * corpus count × RareDen < total bigram instances — i.e. its corpus
    * frequency is below 1/RareDen. Frequency-relative on purpose: an
    * absolute count cutoff silently stops meaning anything when the corpus
    * grows (every count scales with the data), while this ratio is
    * invariant under uniform replication, so the operator's semantics
    * survive the 10×/100× scale-ups unchanged.
    */
  val RareDen = 1000L

  /** Flag share for [[rareBigramRate]]: a document is flagged iff
    * n_rare × 100 > RareFlagPct × n_bigrams (rare share > 30%; the
    * corpus-wide median share is ~22% on the driver data, so the flag
    * marks the genuinely-unusual tail, not half the corpus).
    */
  val RareFlagPct = 30L

  /** KenLM-free fluency proxy: each document's share of bigram instances
    * that are RARE in the corpus-wide bigram table (frequency below
    * 1/[[RareDen]]). The production counterpart is CCNet-style LM
    * perplexity filtering — a document whose transitions are mostly
    * low-probability under the corpus model is boilerplate, word salad,
    * or wrong-language; the unseen/rare-transition rate is the
    * deterministic, log-free stand-in (exact integers cross-multiplied,
    * so verdicts are bit-identical across engines — a float perplexity
    * would not be).
    *
    * Shape: one bigram explode, a per-(doc, bigram) pre-aggregation (the
    * bigram-keyed join then carries one row per DISTINCT doc-bigram, not
    * per instance — and the corpus table derives from the same frame, so
    * the explode is scanned once), a vocabulary²-bounded corpus count
    * table, a 1-row total broadcast, and a doc-keyed re-aggregation. The
    * corpus join is bigram-keyed and skew-safe under AQE; nothing driver-
    * side scales with the corpus.
    */
  def rareBigramRate(documents: DataFrame): DataFrame = {
    val (mapping, reps) = contentGroups(documents)
    rareBigramRateFrom(mapping, reps)
  }

  /** [[rareBigramRate]] over a prebuilt content grouping (shared by the
    * agreement card). Rep-collapsed like lmSurprisal (see
    * [[contentGroups]]): bigram explode, corpus table, rarity join all
    * run over DISTINCT content; corpus counts are the exact m-weighted
    * sums, so every verdict is bit-identical to the uncollapsed form.
    */
  private[graft] def rareBigramRateFrom(
      mapping: DataFrame, reps: DataFrame): DataFrame =
    mapping
      .join(rareBigramRateByRep(reps).drop("m"), Seq("rep"))
      .drop("rep")

  /** The per-DISTINCT-CONTENT core of [[rareBigramRate]] (one row per
    * rep + multiplicity), mirroring [[lmSurprisalByRep]]. `counts`
    * injects the shared [[bigramCountsByRep]] frame (agreement card).
    */
  private[graft] def rareBigramRateByRep(
      reps: DataFrame, counts: Option[DataFrame] = None): DataFrame = {
    val repPair = counts.getOrElse(bigramCountsByRep(reps))
    val corpus = repPair.groupBy("w1", "w2")
      .agg(sum(col("c") * col("m")).as("n_corpus"))
    val total = corpus.agg(sum("n_corpus").as("t"))
    val perRep = repPair.join(corpus, Seq("w1", "w2"))
      .crossJoin(broadcast(total))
      .groupBy("rep")
      .agg(sum("c").as("n_bigrams"),
        sum(when(col("n_corpus") * RareDen < col("t"), col("c"))
          .otherwise(0L)).as("n_rare"))
    reps.select("rep", "m").join(perRep, Seq("rep"), "left")
      .select(col("rep"), col("m"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("flagged", col("n_rare") * 100 > col("n_bigrams") * RareFlagPct)
  }

  /** Registered phrase for [[phraseSearch]] — present at every SF of the
    * driver data (verified at sf0.001/0.01/0.1), interpolated into the
    * oracle.
    */
  val PhraseTokens: Seq[String] = Seq("order", "fast")

  /** Positional inverted index: one (`doc_id`, `pos`, `term`) posting per
    * token, positions on the raw whitespace-split axis (0-based). The
    * positional generalization of the reference's inverted-index job
    * (`MapReduce.invertedIndexJob`): storing positions is what upgrades
    * membership queries to phrase/adjacency queries. Pure narrow explode —
    * scan-speed, no shuffle.
    */
  def positionalIndex(documents: DataFrame): DataFrame =
    graft.Parallelism.ensure(documents)
      .select(
        col("doc_id"),
        posexplode(lowToks(col("text"))).as(Seq("pos", "term")))

  /** Phrase search via the positional index: occurrences of `phrase` as
    * adjacent tokens, returned as (`doc_id`, `pos`) of each match start.
    *
    * Shape: one postings fetch per phrase token (term-filtered index —
    * with the index materialized and partitioned by term, each fetch is a
    * pruned scan touching only that term's postings, never the corpus),
    * then equi-joins on (doc_id, pos − offset). That join-on-shifted-
    * position is the classic phrase-query plan over positional postings;
    * candidate cardinality is bounded by the rarest token's posting list,
    * and no row ever fans out (positions are unique per doc). A window
    * `lead()` over full documents would rescan every token of every doc
    * instead.
    */
  def phraseSearch(
      documents: DataFrame, phrase: Seq[String] = PhraseTokens): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val idx = positionalIndex(documents)
    def postings(term: String, offset: Int) =
      idx.where(col("term") === term)
        .select(col("doc_id"), (col("pos") - offset).as("pos"))
    phrase.zipWithIndex.tail.foldLeft(postings(phrase.head, 0)) {
      case (acc, (term, j)) => acc.join(postings(term, j), Seq("doc_id", "pos"))
    }
  }

  /** Whitespace-normalized lowercase NFC form — the canonical text for
    * exact dedup and fingerprinting. NFC-composed (r15) so an NFC and an
    * NFD copy of the same document hash to ONE fingerprint — without it,
    * exact dedup silently misses mixed-normalization duplicates, the
    * precise failure mode the [[graft.functions.UnicodeExpressions]]
    * docstring cites. Oracles mirror with `nfc_normalize`.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(TextFunctions.nfc(text))), "\\s+", " ")

  /** Document fingerprints: full-text md5 (exact dup key), a 60-bit integer
    * fingerprint, and a min-shingle-hash (rolling-hash-style content
    * fingerprint that survives small edits better than the full-text hash;
    * null for docs shorter than 3 tokens).
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(normalized(col("text"))).as("fp_md5"),
      HashFunctions.md5Long(normalized(col("text"))).as("fp60"),
      array_min(transform(
        TextFunctions.shingles(col("text"), 3),
        s => HashFunctions.md5Long(s, 1))).as("fp_min_shingle"))

  /** Gopher-rule thresholds (Rae et al. 2021, Table A1), adapted where
    * the signal doesn't exist in this corpus: the symbol-ratio rule uses
    * the suite's punctuation-token charset, and the duplicate-line rule
    * uses [[graft.operators.Dedup.repetitionExcise]]'s within-document
    * dropped-token share (the paper's duplicate-line character fraction,
    * in token space).
    */
  val GopherMinTokens = 50L
  val GopherMaxTokens = 100000L
  val GopherMeanLenLoMilli = 3000L
  val GopherMeanLenHiMilli = 10000L
  val GopherMaxPunctMilli = 100L
  val GopherMinAlphaMilli = 800L
  val GopherMinDistinctStopwords = 2L
  val GopherMaxDupLineMilli = 200L

  /** The GOPHER quality-rule card: per document, the six classic
    * repetition/format heuristics as exact-integer metrics plus one
    * boolean per rule and the conjunction — the standard pre-filter a
    * crawl pipeline runs before any model-based scoring, and the card a
    * curation team reads to see WHICH rule is doing the deleting (a
    * funnel that only reports "kept 62%" hides a broken threshold).
    *
    * Rules: token count in [50, 100k]; mean token length in [3, 10]
    * chars; punctuation-token share ≤ 10%; ≥ 80% of tokens contain a
    * letter; ≥ 2 distinct stopwords; within-document duplicate-line
    * token share ≤ 20%. All shares in exact integer milli (one floor
    * division each), so the card hash-matches the oracle.
    *
    * Shape: ONE tokenization pass (explode → per-doc conditional sums,
    * map-side combined) joined to the repetition report's dropped-token
    * count (itself two narrow shuffles) — nothing pairwise, nothing
    * corpus-ordered; every metric column is a projection off the two
    * aggregates.
    */
  def gopherRules(documents: DataFrame): DataFrame = {
    val m = graft.Parallelism.ensure(documents)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(length(col("tok")).cast("long")).as("n_tok_chars"),
        sum(when(col("tok").rlike("^[.,!?:;\"']+$"), 1L).otherwise(0L))
          .as("n_punct"),
        sum(when(col("tok").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
        countDistinct(when(col("tok").isin(Stopwords: _*), col("tok")))
          .as("n_stop_distinct"))
    val dup = graft.operators.Dedup.repetitionExcise(documents)
      .select(col("doc_id"), col("n_tokens_dropped").as("n_dup_toks"))
    m.join(dup, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        expr("n_tok_chars * 1000 div n_tokens").as("mean_len_milli"),
        expr("n_punct * 1000 div n_tokens").as("punct_milli"),
        expr("n_alpha * 1000 div n_tokens").as("alpha_milli"),
        col("n_stop_distinct"),
        expr("n_dup_toks * 1000 div n_tokens").as("dup_line_milli"))
      .select(col("*"),
        (col("n_tokens") >= GopherMinTokens
          && col("n_tokens") <= GopherMaxTokens).as("r_len"),
        (col("mean_len_milli") >= GopherMeanLenLoMilli
          && col("mean_len_milli") <= GopherMeanLenHiMilli).as("r_mean_len"),
        (col("punct_milli") <= GopherMaxPunctMilli).as("r_punct"),
        (col("alpha_milli") >= GopherMinAlphaMilli).as("r_alpha"),
        (col("n_stop_distinct") >= GopherMinDistinctStopwords).as("r_stop"),
        (col("dup_line_milli") <= GopherMaxDupLineMilli).as("r_dup"))
      .withColumn("keep",
        col("r_len") && col("r_mean_len") && col("r_punct")
          && col("r_alpha") && col("r_stop") && col("r_dup"))
  }

  /** Winnowing parameters: [[WinnowK]]-token grams (the house shingle
    * unit), one fingerprint selected from every window of [[WinnowW]]
    * consecutive gram hashes. Guarantee (Schleimer et al., SIGMOD 2003):
    * any shared token run of length ≥ k + w − 1 = 6 yields at least one
    * shared selected fingerprint.
    */
  val WinnowK = 3
  val WinnowW = 4

  /** Seed for the per-gram 40-bit winnowing hash. */
  val WinnowSeed = 31

  /** Bits reserved for the position in the winnowing argmin encoding —
    * documents up to 2^20 grams (~1M tokens); the hash keeps 40 bits, so
    * the composite stays under 2^60 in an exact int64.
    */
  val WinnowPosBits = 20

  /** Winnowing fingerprint SELECTION (the MOSS position-robust document
    * fingerprint): hash every [[WinnowK]]-token gram, slide a window of
    * [[WinnowW]] consecutive gram hashes, and from each window keep the
    * minimum hash — RIGHTMOST position on ties (robust winnowing) — then
    * de-duplicate the selections. Unlike [[fingerprints]]' single
    * min-shingle (one global min per doc: cheap, but one edit near the
    * minimum changes it), winnowing guarantees a selected fingerprint in
    * every w-gram window, so two documents sharing ANY token run of
    * length ≥ k+w−1 share at least one selected fingerprint — the
    * guarantee overlap detection needs and a density cap (~2/(w+1) of
    * grams selected) the full gram set doesn't give.
    *
    * One output row per selected fingerprint: (doc_id, fp_pos, fp_hash).
    * Documents shorter than k tokens have no grams and emit nothing.
    * Documents with more than 2^[[WinnowPosBits]] grams (~1M tokens)
    * raise an error rather than silently overflowing the position field
    * of the argmin encoding — chunk such documents upstream (the corpus
    * fixtures are orders of magnitude below the cap).
    *
    * Portability: the per-window argmin is ONE integer min over the
    * composite h·2^[[WinnowPosBits]] + (2^20−1−pos) — min hash, rightmost
    * tie — decoded back to (pos, hash) after selection; no floats, no
    * engine-order dependence. Scale shape: ZERO shuffles — grams, window
    * minima, and selection-dedup are all higher-order array expressions
    * inside one codegen projection (per-doc O(grams·w) work bounded by
    * document length), and the only post-projection op is the explode to
    * rows. The corpus-level consumer ([[Dedup]]-style overlap mining)
    * groups the ~2n/(w+1)-dense output by fp_hash.
    */
  def winnowFingerprints(
      documents: DataFrame, k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    val posMask = (1L << WinnowPosBits) - 1
    val scale = 1L << WinnowPosBits
    graft.Parallelism.ensure(documents)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .where(size(col("ts")) >= k)
      .select(col("doc_id"), expr(
        // the guard keeps (posMask - i) nonnegative: past 2^20 grams the
        // encoding would silently corrupt window minima and decoded fp_pos
        s"""CASE WHEN size(ts) - $k + 1 > ${scale}L THEN
           |  raise_error(concat('winnowFingerprints: document ', doc_id,
           |    ' exceeds 2^$WinnowPosBits grams; chunk it upstream'))
           |ELSE transform(sequence(0, size(ts) - $k), i ->
           |  CAST(conv(substring(md5(concat('$WinnowSeed:',
           |    concat_ws(' ', slice(ts, i + 1, $k)))), 1, 10), 16, 10)
           |    AS BIGINT) * ${scale}L + (${posMask}L - i)) END""".stripMargin)
        .as("comps"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(
           |  sequence(0, greatest(0, size(comps) - $w)),
           |  j -> array_min(slice(comps, j + 1, $w))))""".stripMargin))
        .as("comp"))
      .select(col("doc_id"),
        (lit(posMask) - col("comp") % lit(scale)).as("fp_pos"),
        expr(s"comp div ${scale}L").as("fp_hash"))
  }

  /** Bucket geometry for [[tokenDriftReport]], interpolated into the
    * oracle: token counts land in `DriftBuckets` buckets of width
    * `DriftBucketWidth`, top bucket open-ended.
    */
  val DriftBucketWidth = 16
  val DriftBuckets = 32

  /** Shift equivalent of dividing by [[DriftBucketWidth]] (which must stay
    * a power of two) — derived, so changing the width changes the bucketing
    * in both the engine and the interpolated oracle.
    */
  val DriftBucketShift: Int = {
    require(Integer.bitCount(DriftBucketWidth) == 1,
      "DriftBucketWidth must be a power of two (bucketing is a shift)")
    Integer.numberOfTrailingZeros(DriftBucketWidth)
  }

  /** Distribution-drift report between an incoming shard and the corpus —
    * the monitoring rollup a training-data pipeline runs on every ingest
    * batch ("did the new crawl change the shape of the data?"). The shard
    * is the top fifth of the doc_id range, the SAME ingest boundary as
    * `Dedup.incrementalNearDups`; the drift axis is the whitespace token
    * count, histogrammed into [[DriftBuckets]] fixed buckets.
    *
    * Per bucket: exact corpus/shard counts, their fractions (ONE double
    * division of exact integers each — no `ln`, so unlike PSI/KL this
    * stays bit-portable across engines; total-variation distance is the
    * sum of the `tvd_contrib` column, same information content for a
    * drift alarm), via a full outer merge so one-sided buckets surface
    * with an explicit zero instead of disappearing.
    *
    * Shape: one narrow scan → two fixed-width histograms (map-side
    * combined, ≤ DriftBuckets groups) → a broadcast-sized outer join +
    * two 1-row scalar broadcasts for the totals. Nothing corpus-scale
    * shuffles; the report is O(buckets) whatever the corpus size.
    */
  def tokenDriftReport(documents: DataFrame): DataFrame = {
    val split = documents.agg(max(col("doc_id")).as("mx"))
      .select(expr("(mx + 1) * 4 div 5").as("split"))
    val bucketed = documents
      .crossJoin(broadcast(split))
      .select(
        (col("doc_id") >= col("split")).as("is_shard"),
        // width is a power of two so the bucket is a shift — integer
        // arithmetic end to end (a `/` here would be a double division)
        least(shiftright(size(toks(col("text"))), DriftBucketShift).cast("long"),
          lit(DriftBuckets - 1L)).as("bucket"))
    val hist = bucketed.groupBy("bucket")
      .agg(
        sum(when(col("is_shard"), 0L).otherwise(1L)).as("cnt_corpus"),
        sum(when(col("is_shard"), 1L).otherwise(0L)).as("cnt_shard"))
      .localCheckpoint() // consumed by the totals and the report
    val totals = hist.agg(
      sum(col("cnt_corpus")).as("n_corpus"), sum(col("cnt_shard")).as("n_shard"))
    // Zero-total guard: on a degenerate corpus where one side of the split
    // is empty, report fraction 0 rather than NULL (Spark's divide-by-zero).
    def frac(cnt: String, total: String) =
      when(col(total) > 0L, col(cnt).cast("double") / col(total)).otherwise(0.0)
    hist.crossJoin(broadcast(totals))
      .select(
        col("bucket"), col("cnt_corpus"), col("cnt_shard"),
        frac("cnt_corpus", "n_corpus").as("frac_corpus"),
        frac("cnt_shard", "n_shard").as("frac_shard"))
      .withColumn("tvd_contrib",
        abs(col("frac_corpus") - col("frac_shard")) / 2.0)
  }
}

/** Session-persisted trained tokenizer — the train-once/apply-everywhere
  * seam: BPE merge rules are trained ONCE per corpus, written to a parquet
  * table (the tokenizer artifact a training pipeline versions and ships),
  * and every encode step LOADS the table instead of retraining. Locally
  * the table lives under a temp dir for the JVM's life (like
  * [[SignatureStore]]); in production it is the published tokenizer file
  * every job and the serving stack share — the contract that makes token
  * ids comparable across the whole system.
  */
object TokenizerStore {
  private val store =
    new graft.sources.ArtifactStore[(String, Int)]("tokenizer")

  /** The persisted merge table (rank, a, b, n) for a corpus directory,
    * trained+written on first call, parquet-read afterwards. Schema is
    * fixed, so the explicit read schema keeps an empty corpus working.
    */
  def mergesTable(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = TextAnalysis.DefaultBpeK): DataFrame = {
    val path = store.getOrBuild((dir, k)) { out =>
      TextAnalysis.bpeTrainedMerges(graft.Tables.documents(spark, dir), k)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.schema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType))))
      .parquet(path)
  }

  /** The reloaded rule list in training order — the bounded (≤ k rows)
    * collect every encode job starts with.
    */
  def rules(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = TextAnalysis.DefaultBpeK): Array[(String, String)] =
    mergesTable(spark, dir, k).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
}

/** Session-persisted NB quality-classifier model — the LAST train-once
  * seam (after [[SignatureStore]], [[TokenizerStore]], [[CentroidStore]]):
  * `nbScore` recomputed the class-conditional count model on every
  * scoring invocation; production trains a quality filter ONCE and gates
  * every later ingest with it. The artifact is the model table
  * (tok, n_pos, n_neg, llr_f — vocabulary-bounded) plus its 1-row
  * prior/floor constants, both parquet; the apply path is the SHARED
  * scoring fold ([[TextAnalysis.nbScoreAgainst]]) with zero training
  * aggregations (ModelStoreSpec captures the plans and proves no
  * `is_quality` label derivation runs on apply).
  */
object ModelStore {
  private val store = new graft.sources.ArtifactStore[String]("nbmodel")

  import org.apache.spark.sql.types._
  private val modelSchema = StructType(Seq(
    StructField("tok", StringType),
    StructField("n_pos", LongType),
    StructField("n_neg", LongType),
    StructField("llr_f", LongType)))
  private val constsSchema = StructType(Seq(
    StructField("prior_f", LongType),
    StructField("unseen_f", LongType)))

  private def paths(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val base = store.getOrBuild(dir) { out =>
      val docs = graft.Tables.documents(spark, dir)
      val model = TextAnalysis.nbTrain(docs).localCheckpoint()
      model.write.mode("overwrite").parquet(s"$out/model")
      TextAnalysis.nbConsts(docs, model)
        .write.mode("overwrite").parquet(s"$out/consts")
    }
    (s"$base/model", s"$base/consts")
  }

  /** The persisted (model, consts) pair, trained on first call. */
  def model(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.schema(modelSchema).parquet(paths(spark, dir)._1)
  def consts(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.schema(constsSchema).parquet(paths(spark, dir)._2)

  /** Score a corpus under the STORED model — the production gate shape:
    * ln_f integers round-trip parquet exactly, so the output is
    * hash-identical to `nbScore` and `q_nb_score_stored` shares its
    * oracle verbatim.
    */
  def score(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    TextAnalysis.nbScoreAgainst(
      graft.Tables.documents(spark, dir), model(spark, dir), consts(spark, dir))

  /** Times the model for `dir` has been TRAINED (not read) — spec hook. */
  def builds(dir: String): Int = store.builds(dir)
}
