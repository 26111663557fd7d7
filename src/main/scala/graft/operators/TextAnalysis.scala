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

  private def toks(text: Column): Column = split(trim(text), "\\s+")

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
      .select(col("doc_id"), col("lang"), explode(toks(lower(col("text")))).as("tok"))
      .groupBy("doc_id", "lang")
      .agg(hitSums.head, hitSums.tail: _*)
      .select(
        col("doc_id"), col("lang"),
        hits("en"), hits("de"), hits("es"), hits("fr"),
        pred.as("pred_lang"))
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
      .select(col("doc_id"), explode(toks(lower(col("text")))).as("term"))
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
      .select(col("lang"), explode(toks(lower(col("text")))).as("term"))
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
      .select(col("lang"), explode(toks(lower(col("text")))).as("term"))
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

  /** Whitespace-normalized lowercase form — the canonical text for exact
    * dedup and fingerprinting.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

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
}
