package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {

  import spark.implicits._

  private def extract(page: String): String =
    Seq(page).toDF("html")
      .select(Html.mainContent(col("html")).as("m")).collect()(0).getString(0)

  test("mainContent: strips nav/footer/ad/related, reassembles <p> bodies in order") {
    val page = "<html><head><title>Page 9</title></head><body>" +
      "<nav>home | about | web | login</nav>" +
      "<div class=\"ad\">SPONSORED: best web deals id 2</div>" +
      "<p>alpha beta</p><p>gamma</p>" +
      "<div class=\"related\">see also p10 p11</div>" +
      "<footer>copyright 2026 web | privacy | terms</footer>" +
      "</body></html>"
    assert(extract(page) === "alpha beta gamma")
  }

  test("mainContent: boilerplate <p> blocks must NOT leak into the corpus") {
    // a realistic page whose ad/related widgets carry their own <p> prose
    // — the extraction failure mode the boilerplate pass exists to stop
    val page = "<body><nav>x</nav>" +
      "<div class=\"ad\"><p>buy cheap tokens now</p></div>" +
      "<p>real content</p>" +
      "<div class=\"related\"><p>you may also like</p></div>" +
      "<footer><p>legal text</p></footer></body>"
    assert(extract(page) === "real content")
  }

  test("mainContent: nested div inside an ad block does not leak its tail (r15)") {
    // the r14 advisor's finding: non-greedy .*?</div> used to stop at the
    // INNER div's close, leaking 'trailing chrome' + a broken </div>
    val page = "<body>" +
      "<div class=\"ad\">SPONSORED<div class=\"inner\">deal</div>" +
      "<p>ad prose</p>trailing chrome</div>" +
      "<p>kept</p></body>"
    assert(extract(page) === "kept")
  }

  test("mainContent: script/style payloads never reach the corpus (r15)") {
    val page = "<html><head><style>.ad{display:none}</style></head><body>" +
      "<script type=\"text/javascript\">var p=3;if(p&&p>0){trackPageView(\"p\"+p);}</script>" +
      "<p>visible prose</p></body></html>"
    val got = extract(page)
    assert(got === "visible prose")
    assert(!got.contains("display:none") && !got.contains("trackPageView"))
  }

  test("mainContent: tag attributes on every block are handled (r15)") {
    val page = "<body><nav id=\"n3\">chrome</nav>" +
      "<div class=\"ad\" data-cid=\"5\"><p>sponsored</p></div>" +
      "<p class=\"c0\">alpha</p><p class=\"c1\">beta</p>" +
      "<div class=\"related\" data-rel=\"2\"><a href=\"/p4\">p4</a></div>" +
      "<footer class=\"f\">legal</footer></body>"
    assert(extract(page) === "alpha beta")
  }

  test("mainContent: an UNCLOSED div loses only its own stray text (r15)") {
    // malformed page: promo div never closes — the paragraph-anchored
    // extractor must neither swallow the rest of the page nor emit the
    // promo prose (it sits outside any <p>)
    val page = "<body><p>before</p>" +
      "<div class=\"promo\">limited offer 7 " +
      "<footer>legal</footer><p>after</p></body>"
    assert(extract(page) === "before after")
  }

  test("escape/unescape: literal markup and entities round-trip exactly (r15)") {
    val texts = Seq(
      "literal <b>bold</b> markup & a pre-escaped &amp; survive",
      "quotes \"double\" and 'single' plus 1 < 2 > 0 and a&&b",
      "<script>alert('x')</script>",
      "&lt; stays &lt; not <")
    val got = texts.toDF("t")
      .select(Html.unescapeHtml(Html.escapeHtml(col("t"))).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got === texts)
  }

  test("roundtrip on the sf0.001 corpus (+fixtures): every page extracts back") {
    val rep = Html.extractionReport(Tables.documents(spark, sf("sf0.001")))
    val rows = rep.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "every synthesized page must roundtrip")
    assert(rows.forall(_.getLong(1) >= 1), "every page has at least one content <p>")
    // multi-paragraph pages exist (ParaTokens is small on purpose)
    assert(rows.exists(_.getLong(1) > 1))
    // the markup-bearing fixtures are present and round-trip THROUGH the
    // escape/unescape pair
    val fixtureIds = Html.MarkupFixtures.map(_._1).toSet
    val fixtureRows = rows.filter(r => fixtureIds.contains(r.getLong(0)))
    assert(fixtureRows.size === fixtureIds.size)
    assert(fixtureRows.forall(_.getBoolean(3)), "markup fixtures must roundtrip")
  }

  test("leak test: chrome/script/style text never reaches extracted mains") {
    // disjoint vocab: no document text contains these grammar markers, so
    // ANY occurrence in a main is a leak
    val docs = Seq(
      (1L, "plain words only here", "web"),
      (2L, "more plain words", "books")).toDF("doc_id", "text", "source")
    val mains = Html.withHtml(docs.select("doc_id", "source", "text"))
      .select(Html.mainContent(col("html")).as("m"))
      .collect().map(_.getString(0))
    val markers = Seq("trackPageView", "display:none", "SPONSORED",
      "deal of the day", "premium today", "see also", "related reading",
      "limited offer", "copyright", "login", "<img", "<a href",
      "\">next</a>", "https://")
    for (m <- mains; mk <- markers)
      assert(!m.contains(mk), s"leaked '$mk' into: $m")
  }

  test("boilerplateShare: milli in (0, 1000); chars conserved") {
    val card = Html.boilerplateShare(Tables.documents(spark, sf("sf0.001"))).collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val (html, main, milli) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(main < html, s"${r.getString(0)}: chrome must cost bytes")
      assert(milli > 0 && milli < 1000)
      assert(milli === (html - main) * 1000 / html)
    }
  }

  test("roundtrip fuzz: random texts INCLUDING literal markup extract back exactly") {
    // random token shapes (punctuation, digits, unicode-ish, single
    // chars) PLUS markup-bearing tokens (tags, entities, quotes, mixed
    // operators — the r14 tag-free precondition is gone), random lengths
    // crossing many paragraph boundaries, empty and whitespace-heavy docs
    val rnd = new scala.util.Random(15L)
    val alphabet = Vector("word", "x", "42", "don't", "a,b", "end.", "Tt",
      "longtokenlongtoken", "café", "|", "(y)",
      "<b>", "</div>", "&amp;", "&lt;", "a<b", "x&&y", "\"q\"", "<script>",
      "5>4", "it's")
    val docs = (1 to 60).map { i =>
      val n = rnd.nextInt(80)
      val sep = if (rnd.nextBoolean()) " " else "   "
      (i.toLong,
        Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(sep),
        s"s${rnd.nextInt(3)}")
    }.toDF("doc_id", "text", "source")
    val rows = Html.extractionReportRaw(docs.select("doc_id", "source", "text")).collect()
    assert(rows.length === 60)
    rows.foreach(r => assert(r.getBoolean(3), s"doc ${r.getLong(0)} roundtrip"))
    // long docs genuinely span multiple paragraphs
    assert(rows.exists(_.getLong(1) >= 4))
  }

  test("dedupLift: chrome-unique raw pages hide content dups; extraction recovers them") {
    // 3 distinct contents over 6 docs (each content twice, one pair
    // case-variant) — raw pages all differ (ids in title/related), main
    // content collapses to 3 groups of 2; the MarkupFixtures add one more
    // case-variant pair (-1/-3) THROUGH literal markup, plus one unique
    val docs = Seq(
      (1L, "alpha beta gamma", "web"), (2L, "alpha beta gamma", "web"),
      (3L, "delta epsilon", "web"), (4L, "DELTA Epsilon", "web"),
      (5L, "zeta", "books"), (6L, "zeta", "books")
    ).toDF("doc_id", "text", "source")
    val r = Html.dedupLift(docs).collect()(0)
    assert(r.getLong(0) === 9L) // 6 + 3 fixtures
    assert(r.getLong(1) === 0L, "raw pages must all be chrome-unique")
    assert(r.getLong(2) === 8L, "six docs + the markup fixture pair dup on main")
  }
}
