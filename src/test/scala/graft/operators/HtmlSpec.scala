package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {

  test("mainContent: strips nav/footer/ad/related, reassembles <p> bodies in order") {
    import spark.implicits._
    val page = "<html><head><title>Page 9</title></head><body>" +
      "<nav>home | about | web | login</nav>" +
      "<div class=\"ad\">SPONSORED: best web deals id 2</div>" +
      "<p>alpha beta</p><p>gamma</p>" +
      "<div class=\"related\">see also p10 p11</div>" +
      "<footer>copyright 2026 web | privacy | terms</footer>" +
      "</body></html>"
    val got = Seq(page).toDF("html")
      .select(Html.mainContent(col("html")).as("m")).collect()(0).getString(0)
    assert(got === "alpha beta gamma")
  }

  test("mainContent: boilerplate <p> blocks must NOT leak into the corpus") {
    import spark.implicits._
    // a realistic page whose ad/related widgets carry their own <p> prose
    // — the extraction failure mode the boilerplate pass exists to stop
    val page = "<body><nav>x</nav>" +
      "<div class=\"ad\"><p>buy cheap tokens now</p></div>" +
      "<p>real content</p>" +
      "<div class=\"related\"><p>you may also like</p></div>" +
      "<footer><p>legal text</p></footer></body>"
    val got = Seq(page).toDF("html")
      .select(Html.mainContent(col("html")).as("m")).collect()(0).getString(0)
    assert(got === "real content")
  }

  test("roundtrip on the sf0.001 corpus: every page extracts back to its normalized text") {
    val rep = Html.extractionReport(Tables.documents(spark, sf("sf0.001")))
    val rows = rep.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "every synthesized page must roundtrip")
    assert(rows.forall(_.getLong(1) >= 1), "every page has at least one <p>")
    // multi-paragraph pages exist (ParaTokens is small on purpose)
    assert(rows.exists(_.getLong(1) > 1))
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

  test("roundtrip fuzz: random tag-free texts extract back exactly") {
    import spark.implicits._
    // random token shapes (punctuation, digits, unicode-ish, single
    // chars), random lengths crossing many paragraph boundaries, empty
    // and whitespace-heavy docs — the roundtrip property must hold for
    // ANY tag-free prose, not just the driver grammar
    val rnd = new scala.util.Random(14L)
    val alphabet = Vector("word", "x", "42", "don't", "a,b", "end.", "Tt",
      "longtokenlongtoken", "café", "|", "(y)")
    val docs = (1 to 60).map { i =>
      val n = rnd.nextInt(80)
      val sep = if (rnd.nextBoolean()) " " else "   "
      (i.toLong,
        Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(sep),
        s"s${rnd.nextInt(3)}")
    }.toDF("doc_id", "text", "source")
    val rows = Html.extractionReport(docs).collect()
    assert(rows.length === 60)
    rows.foreach(r => assert(r.getBoolean(3), s"doc ${r.getLong(0)} roundtrip"))
    // long docs genuinely span multiple paragraphs
    assert(rows.exists(_.getLong(1) >= 4))
  }

  test("dedupLift: chrome-unique raw pages hide content dups; extraction recovers them") {
    import spark.implicits._
    // 3 distinct contents over 6 docs (each content twice, one pair
    // case-variant) — raw pages all differ (ids in title/related), main
    // content collapses to 3 groups of 2
    val docs = Seq(
      (1L, "alpha beta gamma", "web"), (2L, "alpha beta gamma", "web"),
      (3L, "delta epsilon", "web"), (4L, "DELTA Epsilon", "web"),
      (5L, "zeta", "books"), (6L, "zeta", "books")
    ).toDF("doc_id", "text", "source")
    val r = Html.dedupLift(docs).collect()(0)
    assert(r.getLong(0) === 6L)
    assert(r.getLong(1) === 0L, "raw pages must all be chrome-unique")
    assert(r.getLong(2) === 6L, "all six docs sit in main-content dup groups")
  }
}
