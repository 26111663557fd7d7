package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the FIRST stage of a real crawl
  * pipeline (trafilatura/jusText-style boilerplate removal), which every
  * downstream text operator in this suite implicitly assumes has already
  * happened. Raw crawl pages bury the prose in chrome: nav bars, ad
  * blocks, related-links widgets, footers — and because that chrome
  * carries page-unique tokens (ids, timestamps, "see also" links),
  * byte-level dedup over raw HTML finds almost nothing while the actual
  * CONTENT duplicates freely. Extraction is what makes dedup, quality
  * scoring, and token accounting mean anything.
  *
  * The driver corpus carries no HTML column, so [[withHtml]] DERIVES one
  * — a deterministic page around each document's text, in the
  * [[Domains.withUrl]] tradition: the oracle REBUILDS the page and
  * RE-RUNS the same extraction, so the extractor is what's checked, not
  * assumed. The grammar plants exactly the traps a real extractor faces:
  * page-unique chrome (`Page <doc_id>` title, `see also p<id+1>` links)
  * that breaks raw-byte dedup, and boilerplate blocks holding plausible
  * prose the extractor must NOT leak into the corpus.
  *
  *   <html><head><title>Page {id}</title></head><body>
  *   <nav>home | about | {source} | login</nav>
  *   <div class="ad">SPONSORED: best {source} deals id {id mod 7}</div>
  *   <p>{16-token chunk}</p>...            ← the document text
  *   <div class="related">see also p{id+1} p{id+2}</div>
  *   <footer>copyright 2026 {source} | privacy | terms</footer>
  *   </body></html>
  *
  * Everything here is codegen'd builtins (concat / higher-order array
  * lambdas / regexps — no UDF), and every regex is RE2-safe (no
  * backreferences, no lookaround) so DuckDB replays it verbatim.
  */
object Html {

  /** Tokens per synthesized paragraph — small enough that real documents
    * span several `<p>` blocks, so the extractor's multi-paragraph
    * reassembly is load-bearing.
    */
  val ParaTokens = 16

  /** documents + a deterministic `html` column (see object doc). One
    * codegen'd projection; the paragraph split binds the token array
    * once through an outer column (the [[graft.functions.TextFunctions.shingles]]
    * lambda-binding lesson).
    *
    * Precondition: document text is tag-free prose (true of the driver
    * corpus, and of any real page's content, which its author
    * HTML-escaped). A text carrying literal markup would need entity
    * escaping here and unescaping in [[mainContent]] — a production
    * synthesis adds that pair; the extractor itself is unchanged.
    */
  def withHtml(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("para_html", expr(
        s"""array_join(transform(
           |  sequence(0, CAST((size(toks) - 1) DIV $ParaTokens AS INT)),
           |  i -> concat('<p>',
           |    array_join(slice(toks, i * $ParaTokens + 1, $ParaTokens), ' '),
           |    '</p>')), '')""".stripMargin))
      .withColumn("html", concat(
        lit("<html><head><title>Page "), col("doc_id").cast("string"),
        lit("</title></head><body>"),
        lit("<nav>home | about | "), col("source"), lit(" | login</nav>"),
        lit("<div class=\"ad\">SPONSORED: best "), col("source"),
        lit(" deals id "), pmod(col("doc_id"), lit(7L)).cast("string"),
        lit("</div>"),
        col("para_html"),
        lit("<div class=\"related\">see also p"),
        (col("doc_id") + 1L).cast("string"),
        lit(" p"), (col("doc_id") + 2L).cast("string"), lit("</div>"),
        lit("<footer>copyright 2026 "), col("source"),
        lit(" | privacy | terms</footer>"),
        lit("</body></html>")))
      .drop("toks", "para_html")

  /** Boilerplate-block pattern: nav / footer / ad / related widgets.
    * Alternation instead of a backreference (`</\1>`) — RE2 (DuckDB) has
    * no backreferences, and the oracle must run the SAME regex.
    */
  val BoilerplatePattern: String =
    "<nav>.*?</nav>|<footer>.*?</footer>|" +
      "<div class=\"ad\">.*?</div>|<div class=\"related\">.*?</div>"

  /** THE extractor: drop boilerplate blocks, then reassemble the `<p>`
    * bodies in document order, space-joined. Two codegen'd regexps per
    * page — scan speed, no shuffle, no UDF. The boilerplate pass is
    * load-bearing even though this grammar's chrome holds no `<p>`:
    * a real page's ad/related blocks do, and leaking them is exactly the
    * failure mode extraction exists to prevent.
    */
  def mainContent(html: Column): Column =
    array_join(
      regexp_extract_all(
        regexp_replace(html, BoilerplatePattern, " "),
        lit("<p>(.*?)</p>"), lit(1)),
      " ")

  /** Per-document extraction report — `q_html_extract`: paragraph count,
    * main-content length, and the ROUNDTRIP flag (extracted text equals
    * the whitespace-normalized original — true for every synthesized
    * page, and the property that pins the extractor's correctness
    * row-by-row in the oracle).
    */
  def extractionReport(documents: DataFrame): DataFrame =
    withHtml(graft.Parallelism.ensure(documents))
      .withColumn("main", mainContent(col("html")))
      .select(
        col("doc_id"),
        expr("CAST(size(regexp_extract_all(html, '<p>', 0)) AS BIGINT)")
          .as("n_paras"),
        length(col("main")).cast("long").as("main_chars"),
        (col("main") ===
          array_join(split(trim(col("text")), "\\s+"), " ")).as("roundtrip_ok"))

  /** Per-source boilerplate accounting — `q_html_boilerplate`: how much
    * of the raw crawl bytes the extractor deletes (integer thousandths).
    * The number a pipeline uses to price storage/compute of raw-vs-clean
    * retention.
    */
  def boilerplateShare(documents: DataFrame): DataFrame =
    withHtml(graft.Parallelism.ensure(documents))
      .withColumn("main", mainContent(col("html")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("pages"),
        sum(length(col("html")).cast("long")).as("html_chars"),
        sum(length(col("main")).cast("long")).as("main_chars"))
      .withColumn("boilerplate_milli",
        expr("(html_chars - main_chars) * 1000 DIV html_chars"))

  /** The dedup-lift card — `q_html_dedup_lift`: exact-duplicate documents
    * found on RAW page bytes vs on EXTRACTED main content, both hashed
    * lowercased (the [[Dedup.exactDuplicates]] normalization — dedup
    * pipelines hash normalized text, and the corpus's duplicates are
    * case-variants). Page-unique chrome (ids in title/related) makes
    * every raw page distinct regardless of casing, so raw dedup finds
    * ~nothing; extraction recovers the true content duplicates — the
    * one-row justification for extracting BEFORE dedup at 100 TB.
    *
    * Shape: two md5 hash-aggs over the same single synthesis scan
    * (checkpointed), each |distinct|-bounded past the first agg.
    */
  def dedupLift(documents: DataFrame): DataFrame = {
    val pages = withHtml(graft.Parallelism.ensure(documents))
      .select(col("doc_id"), md5(lower(col("html"))).as("raw_fp"),
        md5(lower(mainContent(col("html")))).as("main_fp"))
      .localCheckpoint()
    def dupDocs(fp: String) = pages.groupBy(col(fp)).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).agg(coalesce(sum("n"), lit(0L)).as("d"))
    val raw = dupDocs("raw_fp").select(col("d").as("raw_dup_docs"))
    val main = dupDocs("main_fp").select(col("d").as("main_dup_docs"))
    pages.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(raw))
      .crossJoin(broadcast(main))
  }
}
