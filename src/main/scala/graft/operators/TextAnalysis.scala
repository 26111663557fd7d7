package graft.operators

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
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

  private def hitCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Per-document statistics and a quality score. All counts are integers;
    * the ratio is a single division of exact ints (engine-reproducible).
    */
  def docStats(documents: DataFrame): DataFrame = {
    val t = toks(col("text"))
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars_txt"),
      size(t).as("n_tokens"),
      size(filter(t, w => w.rlike("^[.,!?:;\"']+$"))).as("n_punct_tokens"),
      hitCount(t, Stopwords).as("n_stopwords"),
      (hitCount(t, Stopwords).cast("double") / size(t)).as("stopword_ratio"),
      (size(t) >= 10 && hitCount(t, Stopwords) > 0).as("is_quality"))
  }

  /** Heuristic language ID: argmax of marker-word hits with a fixed
    * precedence chain (en > de > es > fr on ties) so the prediction is
    * total and deterministic.
    */
  def langId(documents: DataFrame): DataFrame = {
    val t = toks(lower(col("text")))
    val hits = LangMarkers.map { case (l, ws) => l -> hitCount(t, ws) }.toMap
    val pred = when(
      hits("en") >= hits("de") && hits("en") >= hits("es") && hits("en") >= hits("fr"), "en")
      .when(hits("de") >= hits("es") && hits("de") >= hits("fr"), "de")
      .when(hits("es") >= hits("fr"), "es")
      .otherwise("fr")
    documents.select(
      col("doc_id"), col("lang"),
      hits("en").as("hits_en"), hits("de").as("hits_de"),
      hits("es").as("hits_es"), hits("fr").as("hits_fr"),
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
