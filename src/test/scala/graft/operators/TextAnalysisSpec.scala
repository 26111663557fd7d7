package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextAnalysisSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tokenFrequencySpectrum: exact frequency-of-frequencies on a known corpus") {
    // corpus tokens: a×4, b×2, c×1, d×1 (case-folded, cross-document)
    val d = docs(
      1L -> "a A b c",
      2L -> "a a B d",
      3L -> "")
    val got = TextAnalysis.tokenFrequencySpectrum(d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(4L -> 1L, 2L -> 1L, 1L -> 2L)) // a@4; b@2; c,d hapax
    // invariant: sum(tf * n_types) = total non-empty tokens
    assert(got.map { case (tf, n) => tf * n }.sum === 8L)
    val again = TextAnalysis.tokenFrequencySpectrum(d.repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("topCollocations: a planted collocation outranks frequent-word pairs") {
    // "new york" always co-occurs (8 pairs, each word only in the pair);
    // "the of" co-occurs as often but both words flood the corpus
    val filler = ("the of " * 20).trim
    val d = docs(
      1L -> ("new york " * 8).trim,
      2L -> filler,
      3L -> (filler + " alpha beta"))
    val got = TextAnalysis.topCollocations(d, k = 5, minCount = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(5)))
    val rank = got.map(_._1)
    assert(rank.head === (("new", "york")), s"got $rank")
    // PMI of the exclusive pair beats every filler pair's
    val scores = got.toMap
    assert(scores(("new", "york")) > scores.getOrElse(("the", "of"), 0L))
    // determinism under repartitioning
    val again = TextAnalysis.topCollocations(d.repartition(5), k = 5, minCount = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(5)))
    assert(again.toSeq.sorted === got.toSeq.sorted)
  }

  test("tfIdfTopTerms ranks a distinctive term above ubiquitous ones") {
    // "the" appears in every doc (df=3 -> low idf); "zebra" only in doc 1
    val d = docs(
      1L -> "the zebra the zebra the",
      2L -> "the common words the",
      3L -> "the other common words")
    val top = TextAnalysis.tfIdfTopTerms(d, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) === "zebra")
    // doc 2/3: "common"/"words" (df=2) beat "the" (df=3) despite lower tf?
    // tf("the", doc2)=2, score 2*3/4 = 1.5; tf("common")=1, score 1*3/3 = 1
    // -> "the" wins on tf here; just assert determinism + a valid rank-1
    assert(top(2L) === "the")
  }

  test("tfIdfTopTerms: rank is dense 1..k per doc, tie-break by term asc") {
    val d = docs(1L -> "b a c b a c", 2L -> "x y z")
    val rows = TextAnalysis.tfIdfTopTerms(d, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
    // doc 2: all terms tf=1 df=1 -> identical scores; rank purely by term
    val doc2 = rows.filter(_._1 == 2L).sortBy(_._3).map(_._2)
    assert(doc2 === Seq("x", "y", "z"))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted === (1 to rs.length))
    }
  }

  test("topTermsPerLang ranks within each language independently") {
    import spark.implicits._
    val d = Seq(
      (1L, "apfel apfel birne", "de"),
      (2L, "apfel", "de"),
      (3L, "apple apple apple pear", "en"))
      .toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.topTermsPerLang(d, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val de = rows.filter(_._1 == "de").sortBy(_._4)
    val en = rows.filter(_._1 == "en").sortBy(_._4)
    assert(de.map(t => (t._2, t._3)).toSeq === Seq(("apfel", 3L), ("birne", 1L)))
    assert(en.map(t => (t._2, t._3)).toSeq === Seq(("apple", 3L), ("pear", 1L)))
  }

  test("topTermsPerLangTakeOrdered == window form (driver data + edge ks)") {
    // the two-phase heap variant must reproduce the window ranking row for
    // row, including the (n desc, term asc) tie-break and the rank column
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    for (k <- Seq(1, 10, 100000)) { // k past the vocabulary: full ranking
      val win = canon(TextAnalysis.topTermsPerLang(d, k))
      val heap = canon(TextAnalysis.topTermsPerLangTakeOrdered(d, k))
      assert(heap === win, s"k=$k")
      assert(heap.nonEmpty)
    }
  }

  test("chunked: overlapping windows cover every token; short docs get one chunk") {
    val d = docs(
      1L -> (1 to 10).map(i => s"t$i").mkString(" "), // 10 tokens
      2L -> "short doc")
    val rows = TextAnalysis.chunked(d, chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9 -> windows of 4,4,4,1 tokens
    assert(doc1.map(_._3) === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(doc1.map(_._4) === Seq(4, 4, 4, 1))
    // consecutive chunks overlap by chunkTokens - stride = 1 token
    val doc2 = rows.filter(_._1 == 2L)
    assert(doc2.map(r => (r._2, r._3)) === Seq((0, "short doc")))
  }

  test("repetitionStats flags duplicate trigrams and dominant tokens") {
    val d = docs(
      1L -> "a a a a a",                 // 3 windows, 1 distinct, top frac 1.0
      2L -> "one two three four five",   // all distinct, top frac 0.2 (not >)
      3L -> "solo")                      // 0 windows; single token -> frac 1.0
    val rows = TextAnalysis.repetitionStats(d).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getDouble(6), r.getBoolean(7)))
      .toMap
    assert(rows(1L) === ((5, 3, 1, 2.0 / 3.0, 1.0, true)))
    assert(rows(2L) === ((5, 3, 3, 0.0, 0.2, false)))
    // a one-token doc is trivially top-token-dominated: flagged by design
    assert(rows(3L) === ((1, 0, 0, 0.0, 1.0, true)))
  }

  test("piiScan counts emails/ips/urls/digit runs; redaction changes the md5") {
    val d = docs(
      1L -> "mail john.doe@example.com ip 192.168.0.1 see https://x.io/p id 12345678",
      2L -> "a perfectly clean document")
    val rows = TextAnalysis.piiScan(d).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5), r.getBoolean(6)))
      .toMap
    assert(rows(1L)._1 === 1); assert(rows(1L)._2 === 1)
    assert(rows(1L)._3 === 1); assert(rows(1L)._4 === 1)
    assert(rows(1L)._6 === true)
    assert(rows(2L) === ((0, 0, 0, 0,
      java.security.MessageDigest.getInstance("MD5")
        .digest("a perfectly clean document".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, false)))
    // doc 1's redaction replaced bytes, so its md5 differs from the raw md5
    assert(rows(1L)._5 !== rows(2L)._5)
  }

  test("piiRedact round-trip: placeholders in place, no residual pattern matches") {
    val d = docs(
      1L -> "mail john.doe@example.com ip 192.168.0.1 see https://x.io/p id 12345678",
      2L -> "a perfectly clean document",
      // adjacent digit run + IP: sequential replace order must not let
      // the octets be re-eaten as digit runs
      3L -> "acct 99887766551 then 10.0.0.255 end")
    val rows = TextAnalysis.piiRedact(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(rows(1L)._4 ===
      "mail <EMAIL> ip <IP> see https://x.io/p id <NUM>")
    assert(rows(2L) === ((0, 0, 0, "a perfectly clean document")))
    assert(rows(3L) === ((0, 1, 1, "acct <NUM> then <IP> end")))
    // the transform's whole point: nothing redactable survives it
    val redacted = rows.values.map(_._4)
    Seq(TextAnalysis.EmailPattern, TextAnalysis.Ipv4Pattern,
      TextAnalysis.DigitRunPattern).foreach { p =>
      val rx = p.r
      redacted.foreach(t => assert(rx.findFirstIn(t).isEmpty, s"$p in '$t'"))
    }
    // the scan's redacted_md5 reconciles against this frame's bytes
    val md5s = TextAnalysis.piiScan(d).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    rows.foreach { case (id, (_, _, _, txt)) =>
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(m === md5s(id))
    }
  }

  test("decontaminate flags train docs sharing a 13-gram with the eval split") {
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    val clean = (1 to 20).map(i => s"c$i").mkString(" ")
    val d = docs(
      10L -> shared, // eval (10 % 10 == 0)
      1L -> shared,  // train, fully contaminated
      2L -> clean,   // train, no overlap
      3L -> "tiny doc") // train, too short for any 13-gram
    val rows = TextAnalysis.decontaminate(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(rows.keySet === Set(1L, 2L, 3L)) // eval doc excluded
    assert(rows(1L) === ((8, 8, 1.0, true))) // 20 tokens -> 8 distinct 13-grams
    assert(rows(2L) === ((8, 0, 0.0, false)))
    assert(rows(3L) === ((0, 0, 0.0, false)))
  }

  test("bpeMergeCandidates counts adjacent char pairs; ties break by pair asc") {
    val d = docs(1L -> "abc ab", 2L -> "BC x") // x too short; BC lowercases
    val rows = TextAnalysis.bpeMergeCandidates(d, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // abc -> ab, bc; ab -> ab; bc -> bc  =>  ab:2, bc:2 (tie, asc order)
    assert(rows.toSeq === Seq(("ab", 2L), ("bc", 2L)))
  }

  test("bigramNextTokens: conditional counts, exact ratios, per-prefix rank") {
    val d = docs(1L -> "a b a b a c", 2L -> "b z")
    val rows = TextAnalysis.bigramNextTokens(d, k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))
      .toMap
    // prefix a: continuations b (2x), c (1x) out of 3
    assert(rows(("a", "b")) === ((2L, 3L, 2.0 / 3.0, 1)))
    assert(rows(("a", "c")) === ((1L, 3L, 1.0 / 3.0, 2)))
    // prefix b: a (2x), z (1x) out of 3 — doc 2 contributes across docs
    assert(rows(("b", "a")) === ((2L, 3L, 2.0 / 3.0, 1)))
    assert(rows(("b", "z")) === ((1L, 3L, 1.0 / 3.0, 2)))
    // c is a final token only: never a prefix
    assert(!rows.keySet.exists(_._1 == "c"))
  }

  test("tokenizerFertility: exact per-lang piece/word/char totals under explicit rules") {
    import spark.implicits._
    val d = Seq(
      (1L, "ab ab cd", "en"),
      (2L, "ab", "fr")
    ).toDF("doc_id", "text", "lang")
    // one merge rule: a+b -> "ab" segments as one piece, "cd" as two
    val got = TextAnalysis.tokenizerFertility(d, Array("a" -> "b")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("en") === ((2L * 1 + 1L * 2, 3L, 6L, 4000L / 3))) // 1333
    assert(got("fr") === ((1L, 1L, 2L, 1000L)))
  }

  test("rareBigramRate: frequency-relative rarity on a known corpus; empty docs ride along") {
    // doc 4 is a (c,c)-run that pushes total instances past RareDen, so
    // rare means corpus count < total/1000 — i.e. exactly the count-1
    // bigrams here: (b,c) and the run's final (c,x)
    val d = docs(
      1L -> "a b a b a b",              // (a,b)x3 (b,a)x2 -> 5, none rare
      2L -> "a b c",                    // (a,b) (b,c)     -> 2, (b,c) rare
      3L -> "x",                        // no bigrams
      4L -> (("c " * 1200).trim + " x") // (c,c)x1199 (c,x)x1 -> 1200, 1 rare
    )
    val got = TextAnalysis.rareBigramRate(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // total instances t = 5 + 2 + 1200 = 1207; rare iff n*1000 < 1207 -> n = 1
    assert(got(1L) === ((5L, 0L, false)))
    assert(got(2L) === ((2L, 1L, true))) // 1*100 > 30*2
    assert(got(3L) === ((0L, 0L, false)))
    assert(got(4L) === ((1200L, 1L, false))) // 100 < 30*1200
    val again = TextAnalysis.rareBigramRate(d.repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(again === got)
  }

  test("bigramNucleus keeps the smallest 90% prefix set in (count desc, token asc) order") {
    // prefix 'a': continuations b:6 c:3 d:1 (total 10). Cumulative in
    // order b,c,d: before-b=0, before-c=6, before-d=9. Keep iff
    // before*10 < 9*10 = 90: b (0) yes, c (60) yes, d (90) NO.
    val d = docs(1L -> ("a b " * 6 + "a c " * 3 + "a d").trim)
    val got = TextAnalysis.bigramNucleus(d).collect()
      .filter(_.getString(0) == "a")
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(got === Map("b" -> ((6L, 6L)), "c" -> ((3L, 9L))))
  }

  test("phraseSearch: adjacency on the raw token axis, overlaps included") {
    val d = docs(
      1L -> "order fast order fast",  // matches at 0 and 2
      2L -> "order slow fast order",  // 'order'/'fast' present but never adjacent
      3L -> "Order FAST",             // case-folded match at 0
      4L -> "fast order")             // reversed: no match
    val got = TextAnalysis.phraseSearch(d, Seq("order", "fast"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === Set((1L, 0), (1L, 2), (3L, 0)))
  }

  test("phraseSearch: overlapping self-similar phrase and 3-token phrases") {
    val d = docs(1L -> "a a a b c a")
    assert(TextAnalysis.phraseSearch(d, Seq("a", "a"))
      .collect().map(_.getInt(1)).toSet === Set(0, 1))
    assert(TextAnalysis.phraseSearch(d, Seq("a", "b", "c"))
      .collect().map(_.getInt(1)).toSet === Set(2))
    // phrase running off the document end never matches
    assert(TextAnalysis.phraseSearch(d, Seq("c", "a", "a")).count() === 0L)
  }

  test("tokenIdSequences: ids follow frequency rank; OOV positions get UnkId") {
    val d = docs(
      1L -> "b b b a a c",
      2L -> "a b rare")
    // counts: b=4, a=3, c=1, rare=1 -> rank: b=1, a=2, c=3, rare=4
    val got = TextAnalysis.tokenIdSequences(d, vocabSize = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got((1L, 0)) === 1) // b
    assert(got((1L, 3)) === 2) // a
    assert(got((1L, 5)) === 3) // c
    assert(got((2L, 2)) === TextAnalysis.UnkId) // "rare" fell outside V=3
    // every position encoded exactly once
    assert(got.size === 9)
  }

  test("bm25TopK equals a brute-force recompute of the rational formula") {
    import TextAnalysis._
    val d = graft.Tables.documents(spark, sf("sf0.001"))
    val raw = d.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toksOf = raw.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
    }.toMap
    val n = raw.length.toLong
    val s = toksOf.valuesIterator.map(_.length.toLong).sum
    val terms = Bm25Query
    val tf = toksOf.map { case (id, ts) =>
      id -> terms.map(t => t -> ts.count(_ == t).toLong).toMap
    }
    val df = terms.map(t => t -> tf.valuesIterator.count(_(t) > 0).toLong).toMap
    val (numF, denTf, denS, denDl) = (
      (Bm25K1Num + Bm25K1Den) * Bm25BDen, Bm25K1Den * Bm25BDen,
      Bm25K1Num * (Bm25BDen - Bm25BNum), Bm25K1Num * Bm25BNum)
    val scores = tf.collect { case (id, m) if m.valuesIterator.exists(_ > 0) =>
      val dl = toksOf(id).length.toLong
      val sc = terms.map { t =>
        val f = m(t)
        if (f == 0L) 0.0
        else ((f * numF * s).toDouble / (f * denTf * s + denS * s + denDl * dl * n).toDouble) *
          (n.toDouble / (df(t) + 1L).toDouble)
      }.reduceLeft(_ + _)
      (id, sc)
    }.toSeq
    val expected = scores.sortBy { case (id, sc) => (-sc, id) }.take(Bm25K)
    val got = TextAnalysis.bm25TopK(d).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    assert(got.size === Bm25K)
  }

  test("tfIdfTopTerms df counts documents, not occurrences") {
    val d = docs(1L -> "w w w", 2L -> "w", 3L -> "q")
    val row = TextAnalysis.tfIdfTopTerms(d, k = 5)
      .where("doc_id = 1").collect().head
    assert(row.getString(1) === "w")
    assert(row.getLong(2) === 3L) // tf: three occurrences in doc 1
    assert(row.getLong(3) === 2L) // df: two docs contain it
    assert(row.getDouble(4) === 3.0 * 3.0 / 3.0) // tf * n_docs / (df+1)
  }

  test("BpeSegments: leftmost-first fold, rules in training order") {
    import spark.implicits._
    def seg(word: String, rules: (String, String)*): Seq[String] =
      Seq(word).toDF("w")
        .select(graft.functions.BpeExpressions.bpeSegments(col("w"), rules.toArray))
        .collect().head.getSeq[String](0)
    // overlap: "aaa" under (a,a) merges LEFTMOST-first
    assert(seg("aaa", ("a", "a")) === Seq("aa", "a"))
    // rules apply sequentially: later rules see earlier merges
    assert(seg("abab", ("a", "b")) === Seq("ab", "ab"))
    assert(seg("abab", ("a", "b"), ("ab", "ab")) === Seq("abab"))
    // a rule whose left side was consumed earlier no longer fires
    assert(seg("abc", ("a", "b"), ("b", "c")) === Seq("ab", "c"))
    assert(seg("x") === Seq("x"))
  }

  test("bpeTrainedMerges/bpeEncode: iterative rounds re-count over merged pieces") {
    import spark.implicits._
    // 'abab' x3, 'ab' x2: round 1 picks (a,b) n=3*2+2=8; round 2 sees
    // pieces [ab, ab] and picks (ab,ab) n=3 — a pair that EXISTS only
    // after the first merge, which the single-round candidate statistic
    // can never produce
    val docs = Seq((0L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainedMerges(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(merges === Set((1L, "a", "b", 8L), (2L, "ab", "ab", 3L)))
    val enc = TextAnalysis.bpeEncode(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(enc === Set(("abab", 3L, "abab", 1L), ("ab", 2L, "ab", 1L)))
  }

  test("bpeSampleAgreement: k rows; self-consistent flags; perfect agreement on dup-only sample gap") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir)
    val k = TextAnalysis.DefaultBpeK
    val rows = TextAnalysis.bpeSampleAgreement(docs, k).collect()
    assert(rows.length === k)
    assert(rows.map(_.getLong(0)).toSet === (1 to k).map(_.toLong).toSet)
    val agree = rows.map(_.getLong(6)).distinct
    assert(agree.length === 1 && agree.head >= 0 && agree.head <= 1000)
    rows.foreach { r =>
      val same = !r.isNullAt(1) && !r.isNullAt(3) &&
        r.getString(1) == r.getString(3) && r.getString(2) == r.getString(4)
      assert(r.getBoolean(5) === same, s"rank ${r.getLong(0)} flag")
    }
    // sampled == exact when the sample IS the corpus statistics: train on
    // the sampled docs directly and compare to the sampled trainer
    import spark.implicits._
    val sampleOnly = TextAnalysis.bpeSampledMerges(docs, k).collect().map(_.toSeq)
    assert(sampleOnly.nonEmpty)
  }

  test("TokenizerStore round-trip: persisted merges reload in order; encode matches") {
    // the train-once/apply-everywhere contract: rules written to parquet
    // and reloaded must reproduce the in-session trainer bit for bit, and
    // encoding under reloaded rules must equal encoding under fresh ones
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir)
    def rowSet(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val fresh = TextAnalysis.bpeTrainedMerges(docs)
    val stored = TokenizerStore.mergesTable(spark, dir)
    assert(rowSet(stored) === rowSet(fresh))
    // second call reads the same artifact (no retrain): still identical
    assert(rowSet(TokenizerStore.mergesTable(spark, dir)) === rowSet(fresh))
    val rules = TokenizerStore.rules(spark, dir)
    assert(rules.length === fresh.count())
    assert(rowSet(TextAnalysis.bpeEncodeWithRules(docs, rules)) ===
      rowSet(TextAnalysis.bpeEncode(docs)))
  }

  test("tokenDriftReport: counts split at the ingest boundary; TVD bounded and non-negative") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // ids 0..4 -> split = 4: corpus = {0..3}, shard = {4}
    val docs = Seq(
      (0L, words(5)), (1L, words(5)), (2L, words(20)), (3L, words(40)),
      (4L, words(40))).toDF("doc_id", "text")
    val rows = TextAnalysis.tokenDriftReport(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // buckets: 5 tokens -> 0, 20 -> 1, 40 -> 2
    assert(rows.keySet === Set(0L, 1L, 2L))
    assert((rows(0L)._1, rows(0L)._2) === ((2L, 0L))) // shard has no tiny docs
    assert((rows(1L)._1, rows(1L)._2) === ((1L, 0L)))
    assert((rows(2L)._1, rows(2L)._2) === ((1L, 1L)))
    // fractions are per-side; TVD contributions sum to TVD in [0, 1]
    val tvd = rows.values.map(_._5).sum
    assert(rows.values.forall(_._5 >= 0.0))
    assert(tvd >= 0.0 && tvd <= 1.0)
    assert(math.abs(rows(2L)._3 - 0.25) < 1e-12) // corpus frac of bucket 2
    assert(math.abs(rows(2L)._4 - 1.0) < 1e-12) // the whole shard sits there
  }

  test("filterFunnel: each rule fires on its planted doc, in first-reject order") {
    import spark.implicits._
    def distinctWords(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    val d = Seq(
      // 3 tokens -> too_short (even though it also has no stopwords)
      (0L, "alpha beta gamma", "s0"),
      // > 450 chars -> too_long (20+ tokens, stopword present)
      (1L, "the " + distinctWords(75, "longword"), "s0"),
      // 20 tokens, 5 punctuation -> punct_flood (25 > 20); stopword present
      (2L, "the " + distinctWords(14, "w") + " . , ! ? ;", "s0"),
      // 20 distinct non-stopword tokens -> no_stopwords
      (3L, distinctWords(20, "x"), "s1"),
      // 'the' x5 of 20 tokens -> top_token_flood (25 >= 20); has stopwords
      (4L, "the the the the the " + distinctWords(15, "y"), "s1"),
      // 20 tokens, 1 stopword, all others unique -> kept
      (5L, "the " + distinctWords(19, "z"), "s1")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.filterFunnel(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      ("s0", "too_short") -> ((1L, 3L)),
      ("s0", "too_long") -> ((1L, 76L)),
      ("s0", "punct_flood") -> ((1L, 20L)),
      ("s1", "no_stopwords") -> ((1L, 20L)),
      ("s1", "top_token_flood") -> ((1L, 20L)),
      ("s1", "kept") -> ((1L, 20L))))
  }

  test("filterFunnel: verdicts partition the corpus; token-less docs are too_short; partition-invariant") {
    import spark.implicits._
    val d = Seq(
      (0L, "", "a"), (1L, "   ", "a"),
      (2L, "the " + (1 to 19).map(i => s"k$i").mkString(" "), "b"),
      (3L, "one two", "b")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.filterFunnel(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.values.sum === 4L) // every doc exactly one verdict
    assert(got(("a", "too_short")) === 2L) // empty/whitespace docs stay in frame
    assert(got(("b", "kept")) === 1L)
    assert(got(("b", "too_short")) === 1L)
    val again = TextAnalysis.filterFunnel(d.repartition(7)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again === got)
  }

  test("zipfFit matches the integer least-squares brute force; Zipfian text fits near -1") {
    import spark.implicits._
    import graft.functions.FixedPointLn.lnFRef
    // exact Zipf: term r occurs floor(2400/r) times, r = 1..12
    val freqs = (1 to 12).map(r => s"t%02d".format(r) -> (2400 / r))
    val text = freqs.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(d).collect()(0)
    // brute force with the same fixed-point axes
    val ranked = freqs.map(_._2.toLong).sorted(Ordering[Long].reverse).zipWithIndex
    val xs = ranked.map { case (_, i) => lnFRef(i + 1L) / 1000 }
    val ys = ranked.map { case (f, _) => lnFRef(f) / 1000 }
    val n = xs.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = ((n * sxy - sx * sy) * 1000) / (n * sxx - sx * sx)
    assert(got.getLong(0) === 12L)
    assert(got.getLong(1) === slope)
    assert(slope > -1100 && slope < -900, s"slope was $slope") // ~ -1 nat/nat
  }

  test("langIdConfusion: cells partition the corpus; shares and diagonal flags are exact") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog", "en"),   // en markers -> pred en (correct)
      (2L, "der hund und die katze", "de"),// de markers -> pred de (correct)
      (3L, "x q z", "de"),                 // no markers -> tie chain -> en
      (4L, "el los y es", "es"),           // es markers -> pred es
      (5L, "the the the", "es")            // en markers under an es label
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langIdConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got === Map(
      ("en", "en") -> ((1L, 1L, 1000L, true)),
      ("de", "de") -> ((1L, 2L, 500L, true)),
      ("de", "en") -> ((1L, 2L, 500L, false)),
      ("es", "es") -> ((1L, 2L, 500L, true)),
      ("es", "en") -> ((1L, 2L, 500L, false))))
    assert(got.values.map(_._1).sum === 5L) // every doc in exactly one cell
  }

  test("backoffSurprisal: all four levels fire and match the lnFRef brute force") {
    import spark.implicits._
    import graft.functions.FixedPointLn.lnFRef
    val train = Seq((1L, "a b c d"), (2L, "b c e"), (3L, "c x y"))
    val eval_ = Seq(
      (10L, "a b c"),                   // the known trigram: level 3
      (20L, "x b c x y a p q z"),       // a mix designed to hit L3/L2/L1/L0
      (30L, "a"))                       // too short: zero row, still present
    val d = (train ++ eval_).toDF("doc_id", "text")
    // brute force: train n-gram tables + the stupid-backoff level rule
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").toSeq
    def ngrams(ts: Seq[String], n: Int) =
      if (ts.size < n) Nil else ts.sliding(n).toSeq
    val uni = train.flatMap(r => toks(r._2)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = train.flatMap(r => ngrams(toks(r._2), 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = train.flatMap(r => ngrams(toks(r._2), 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigN = uni.values.sum
    val pen = TextAnalysis.BackoffPenaltyF
    def scoreOf(tg: Seq[String]): (Int, Long) = tri.get(tg) match {
      case Some(n123) => (3, lnFRef(bi(tg.take(2))) - lnFRef(n123))
      case None => bi.get(tg.drop(1)) match {
        case Some(n23) => (2, lnFRef(uni(tg(1))) - lnFRef(n23) + pen)
        case None => uni.get(tg(2)) match {
          case Some(n3) => (1, lnFRef(bigN) - lnFRef(n3) + 2 * pen)
          case None => (0, lnFRef(bigN + 1) + 2 * pen)
        }
      }
    }
    val want = eval_.map { case (id, t) =>
      val tgs = ngrams(toks(t), 3).map(scoreOf)
      def lv(l: Int) = tgs.count(_._1 == l).toLong
      val n = tgs.size.toLong
      val nll = tgs.map(_._2).sum
      id -> ((n, lv(3), lv(2), lv(1), lv(0), nll, if (n > 0) nll / n else 0L))
    }.toMap
    val got = TextAnalysis.backoffSurprisal(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got === want)
    // the planted shape genuinely exercises every backoff level
    assert(want(20L)._2 >= 1 && want(20L)._3 >= 1 &&
      want(20L)._4 >= 1 && want(20L)._5 >= 1)
    assert(got(30L) === ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    val again = TextAnalysis.backoffSurprisal(d.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(again === got.map { case (k, v) => k -> v._6 })
  }

  test("lineSurprisal: per-line scoring isolates the gibberish run; flags match the brute force") {
    import spark.implicits._
    import graft.functions.FixedPointLn.{lnFRef, Scale}
    val trainText = "the cat sat on the mat and then the dog sat on the mat too"
    val train = Seq((1L, trainText), (2L, trainText), (3L, "the cat ran off"))
    // eval doc 10: 16 tokens = two 8-token lines — line 0 in-domain,
    // line 1 entirely out-of-vocabulary junk; doc 20: one 3-token tail line
    val fluent = "the cat sat on the mat and then"
    val junk = "zz qq ww rr tt yy uu ii"
    val eval_ = Seq((10L, s"$fluent $junk"), (20L, "the cat sat"))
    val d = (train ++ eval_).toDF("doc_id", "text")
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").toSeq
    def ngrams(ts: Seq[String], n: Int) =
      if (ts.size < n) Nil else ts.sliding(n).toSeq
    val uni = train.flatMap(r => toks(r._2)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = train.flatMap(r => ngrams(toks(r._2), 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = train.flatMap(r => ngrams(toks(r._2), 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigN = uni.values.sum
    val pen = TextAnalysis.BackoffPenaltyF
    def scoreOf(tg: Seq[String]): (Int, Long) = tri.get(tg) match {
      case Some(n123) => (3, lnFRef(bi(tg.take(2))) - lnFRef(n123))
      case None => bi.get(tg.drop(1)) match {
        case Some(n23) => (2, lnFRef(uni(tg(1))) - lnFRef(n23) + pen)
        case None => uni.get(tg(2)) match {
          case Some(n3) => (1, lnFRef(bigN) - lnFRef(n3) + 2 * pen)
          case None => (0, lnFRef(bigN + 1) + 2 * pen)
        }
      }
    }
    // brute force: chop eval docs into 8-token lines, score trigrams
    // WITHIN each line only, milli-nat averages, above-3/2-of-mean flag
    val lines = eval_.flatMap { case (id, t) =>
      toks(t).grouped(8).zipWithIndex.collect {
        case (w, pos) if w.size >= 3 =>
          val tgs = ngrams(w, 3).map(scoreOf)
          val n = tgs.size.toLong
          val nll = tgs.map(_._2).sum
          (id, pos.toLong, n, tgs.count(_._1 == 0).toLong, nll,
            (nll / n) * 1000 / Scale)
      }
    }
    val sumAvg = lines.map(_._6).sum
    val nLines = lines.size.toLong
    val want = lines.map { case (id, pos, n, l0, nll, am) =>
      (id, pos) -> ((n, l0, nll, am,
        am * nLines * TextAnalysis.LineNllDen > TextAnalysis.LineNllNum * sumAvg))
    }.toMap
    val got = TextAnalysis.lineSurprisal(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got === want)
    // the junk line is flagged, the fluent lines are not — the filter
    // localizes the bad run instead of condemning the document
    assert(got((10L, 1L))._5 === true && got((10L, 1L))._2 === 6L)
    assert(got((10L, 0L))._5 === false)
    assert(got((20L, 0L))._5 === false)
    // line boundaries isolate context: doc 10's line count is 2 windows
    // x 6 trigrams, NOT the 14 cross-line trigrams of the doc scorer
    assert(got.view.filterKeys(_._1 == 10L).values.map(_._1).sum === 12L)
    val again = TextAnalysis.lineSurprisal(d.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(6)).toMap
    assert(again === got.view.mapValues(_._5).toMap)
  }

  test("spanDecontaminate: merged token-offset spans of leaked 13-grams; eval docs excluded") {
    val ev = (1 to 14).map(i => s"e$i").mkString(" ") // 14-token eval run
    val e13 = (1 to 13).map(i => s"e$i").mkString(" ")
    val d = docs(
      10L -> ev,                                    // eval split (id % 10 == 0)
      1L -> s"f1 f2 $ev f3",                        // both eval windows, overlapping
      2L -> ((1 to 7).map(i => s"g$i").mkString(" ") + " " + e13), // one hit at 7
      3L -> (e13 + " " + (1 to 7).map(i => s"h$i").mkString(" ") + " " + e13), // two distant
      4L -> (1 to 30).map(i => s"k$i").mkString(" "), // clean
      20L -> e13)                                   // eval-side doc: never scored
    val got = TextAnalysis.spanDecontaminate(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 2L, 15L, 2L),   // windows s=2 and s=3 merge: [2, 3+12]
      (2L, 7L, 19L, 1L),
      (3L, 0L, 12L, 1L),
      (3L, 20L, 32L, 1L))) // 13 + 7 fillers -> second run starts at 20
    val again = TextAnalysis.spanDecontaminate(d.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(again === got)
  }

  test("docCompression: exact ratios under explicit rules; gibberish flagged against the corpus floor") {
    import spark.implicits._
    val d = Seq(
      (1L, ("ab " * 20).trim), // 20 words x (2 chars, 1 piece) -> 2000 milli
      (2L, "ab"),              // 2000 milli
      (3L, ""),                // no evidence
      (4L, "zzzz")             // no merges apply: 4 pieces -> 1000 milli
    ).toDF("doc_id", "text")
    val got = TextAnalysis.docCompression(d, Array("a" -> "b")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // totals: chars 46, bpe 25 -> floor = 46*3000 / (25*4) = 1380 milli
    assert(got(1L) === ((20L, 40L, 20L, 2000L, false)))
    assert(got(2L) === ((1L, 2L, 1L, 2000L, false)))
    assert(got(3L) === ((0L, 0L, 0L, 0L, false))) // zero evidence, never flagged
    assert(got(4L) === ((1L, 4L, 4L, 1000L, true)))
  }

  test("lmSurprisal matches the lnFRef brute force; short docs score 0 and stay in frame") {
    import spark.implicits._
    import graft.functions.FixedPointLn.lnFRef
    val rows = Seq(
      (1L, "a b a b"),   // common bigrams
      (2L, "a b"),
      (3L, "c d c"),     // rarer transitions
      (4L, "a"),         // one token: no bigram evidence
      (5L, ""))          // empty
    val d = rows.toDF("doc_id", "text")
    // brute force: per-doc bigram counts, corpus LM, add-1 smoothing
    def bigrams(t: String): Seq[(String, String)] = {
      val ts = t.trim.toLowerCase.split("\\s+").toSeq
      if (ts.size < 2) Nil else ts.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val all = rows.flatMap { case (id, t) => bigrams(t).map(bg => (id, bg)) }
    val lm = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val lmt = lm.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = rows.flatMap(_._2.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .distinct.size.toLong
    val want = rows.map { case (id, t) =>
      val bgs = bigrams(t)
      val nll = bgs.map(bg => lnFRef(lmt(bg._1) + v) - lnFRef(lm(bg) + 1)).sum
      val n = bgs.size.toLong
      id -> ((n, nll, if (n > 0) nll / n else 0L))
    }.toMap
    val got = TextAnalysis.lmSurprisal(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    assert(got(4L) === ((0L, 0L, 0L)))
    assert(got(5L) === ((0L, 0L, 0L)))
    // the common-transition doc reads as more fluent than the rare one
    assert(got(1L)._3 < got(3L)._3)
    val again = TextAnalysis.lmSurprisal(d.repartition(5)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again === got)
  }

  test("rep-collapse equivalence fuzz: heavily-duplicated corpora == per-doc scala brute") {
    import spark.implicits._
    import graft.functions.FixedPointLn.lnFRef
    // The r14 rep-collapse claims EXACT per-doc equality: all bigram
    // work runs per DISTINCT lowercased content with m-weighted corpus
    // counts. Fuzz it where it could break — corpora that are mostly
    // duplicates (including case-variants, empty and 1-token texts) —
    // against an uncollapsed per-document scala brute.
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 5) {
      // accented vocab on purpose: duplicates are emitted as case
      // variants AND as NFD decompositions, so the r15 NFC-composed
      // fingerprint/tokenizer must collapse all three spellings of a
      // text into ONE content group for per-doc equality to hold
      val vocab = Vector("alpha", "beta", "gamma", "delta", "café", "züge")
      val nDistinct = 2 + rnd.nextInt(4)
      val bases = Vector.fill(nDistinct)(
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      def nfd(s: String): String =
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      val docsSeq = (1 to 30).map { i =>
        val t0 = bases(rnd.nextInt(nDistinct))
        (i.toLong, rnd.nextInt(3) match {
          case 0 => t0
          case 1 => t0.toUpperCase
          case _ => nfd(t0)
        })
      }
      val d = docsSeq.toDF("doc_id", "text")

      def norm(t: String): String =
        java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
          .toLowerCase
      def bigrams(t: String): Seq[(String, String)] = {
        val ts = norm(t).trim.split("\\s+").toSeq
        if (ts.size < 2) Nil else ts.sliding(2).map(p => (p(0), p(1))).toSeq
      }
      val all = docsSeq.flatMap { case (_, t) => bigrams(t) }
      val lm = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val lmt = lm.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val v = docsSeq.flatMap(p => norm(p._2).trim.split("\\s+"))
        .filter(_.nonEmpty).distinct.size.toLong

      // lmSurprisal vs brute
      val wantLm = docsSeq.map { case (id, t) =>
        val bgs = bigrams(t)
        val nll = bgs.map(bg => lnFRef(lmt(bg._1) + v) - lnFRef(lm(bg) + 1)).sum
        val n = bgs.size.toLong
        id -> ((n, nll, if (n > 0) nll / n else 0L))
      }.toMap
      val gotLm = TextAnalysis.lmSurprisal(d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(gotLm === wantLm, s"lmSurprisal trial $trial")

      // rareBigramRate vs brute
      val total = lm.values.sum
      val wantRare = docsSeq.map { case (id, t) =>
        val bgs = bigrams(t)
        id -> ((bgs.size.toLong,
          bgs.count(bg => lm(bg) * TextAnalysis.RareDen < total).toLong))
      }.toMap
      val gotRare = TextAnalysis.rareBigramRate(d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(gotRare === wantRare, s"rareBigramRate trial $trial")

      // the agreement card's Sum(m) cells vs a per-doc fold of the three
      // signals (classifier keep from the engine's own per-doc scan)
      val cls = TextAnalysis.classifierScore(d.withColumn("source", org.apache.spark.sql.functions.lit("x")))
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      val scored = wantLm.filter(_._2._1 > 0)
      val nScored = scored.size.toLong
      val sumAvg = scored.values.map(_._3).sum
      val wantCells = docsSeq.map { case (id, _) =>
        val (n, _, avg) = wantLm(id)
        val (nb, nr) = wantRare(id)
        (cls(id), n > 0 && avg * nScored > sumAvg,
          nr * 100 > nb * TextAnalysis.RareFlagPct)
      }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val gotCells = Pipeline.qualityAgreement(d).collect()
        .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) -> r.getLong(3))
        .toMap
      assert(gotCells === wantCells, s"qualityAgreement trial $trial")
    }
  }

  test("naive bayes: model, scores, and holdout card equal the lnFRef counting brute force") {
    import graft.functions.FixedPointLn.lnFRef
    val q1 = "the a is of and to in that it on alpha beta"
    val q2 = "the the good good good nice nice words words words here there"
    val j1 = "zz yy"
    val j2 = "spam spam spam spam spam spam spam spam spam spam spam"
    val e1 = "the a is of and to in that it on zz spam" // eval, y = 1
    val e2 = "qq rr"                                    // eval, y = 0
    val d = docs(1L -> q1, 2L -> q2, 3L -> j1, 4L -> j2, 10L -> e1, 20L -> e2)
    val train = Seq(q1, q2, j1, j2)
    val stop = TextAnalysis.Stopwords.toSet
    def label(t: String) = {
      val ts = t.trim.split("\\s+"); ts.length >= 10 && ts.exists(stop)
    }
    def lowToks(t: String) =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tokClass = train.flatMap(t => lowToks(t).map(_ -> label(t)))
    val counts = tokClass.groupBy(_._1).map { case (tok, xs) =>
      tok -> ((xs.count(_._2).toLong, xs.count(!_._2).toLong))
    }
    val bigN1 = counts.values.map(_._1).sum
    val bigN0 = counts.values.map(_._2).sum
    val v = counts.size.toLong
    def llr(np: Long, nn: Long): Long =
      lnFRef(np + 1) - lnFRef(bigN1 + v) - lnFRef(nn + 1) + lnFRef(bigN0 + v)
    val wantModel = counts.map { case (tok, (np, nn)) => (tok, np, nn, llr(np, nn)) }.toSet
    val gotModel = TextAnalysis.nbTrain(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotModel === wantModel)
    // scores over ALL docs, eval included; OOV tokens pay the floor constant
    val prior = lnFRef(2L) - lnFRef(2L) // d1 = d0 = 2
    val unseen = lnFRef(bigN0 + v) - lnFRef(bigN1 + v)
    def score(t: String): (Long, Long) = {
      val ts = lowToks(t)
      val s = prior + ts.groupBy(identity).map { case (tok, xs) =>
        xs.length * counts.get(tok).map(c => llr(c._1, c._2)).getOrElse(unseen)
      }.sum
      (ts.length.toLong, s)
    }
    val wantScores = Seq(1L -> q1, 2L -> q2, 3L -> j1, 4L -> j2, 10L -> e1, 20L -> e2)
      .map { case (id, t) =>
        val (n, s) = score(t); (id, n, s, s > 0)
      }.toSet
    val gotScores = TextAnalysis.nbScore(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(gotScores === wantScores)
    // holdout card: confusion of sign(score) vs label on docs 10/20 only
    val evalRows = Seq(e1, e2).map(t => (score(t)._2 > 0, label(t)))
    val tp = evalRows.count { case (p, y) => p && y }.toLong
    val fp = evalRows.count { case (p, y) => p && !y }.toLong
    val fn = evalRows.count { case (p, y) => !p && y }.toLong
    val tn = evalRows.count { case (p, y) => !p && !y }.toLong
    val got = TextAnalysis.nbEval(d).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((tp, fp, fn, tn)))
    assert(got.getLong(4) === (tp + tn) * 1000 / (tp + fp + fn + tn))
    // the weak signal is learnable: the stopword-heavy eval doc scores
    // positive, the unseen-junk one negative
    assert(gotScores.contains((10L, score(e1)._1, score(e1)._2, true)))
    assert(score(e2)._2 <= 0)
    // partition invariance
    val again = TextAnalysis.nbScore(d.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(again === gotScores)
    // calibration card: shifted-floor nat bands of the eval scores vs the
    // weak label (floor semantics for negative scores — the shift test)
    import graft.functions.FixedPointLn.Scale
    val (bands, shift) =
      (TextAnalysis.CalibrationBands, TextAnalysis.CalibrationShift)
    def bandOf(s: Long): Long =
      math.max(0L, math.min(bands * Scale - 1, s + shift * Scale)) / Scale - shift
    val evalScored = Seq(10L -> e1, 20L -> e2).map { case (id, t) =>
      (bandOf(score(t)._2), label(t))
    }
    val wantCal = evalScored.groupBy(_._1).map { case (b, xs) =>
      val n = xs.size.toLong; val p = xs.count(_._2).toLong
      b -> ((n, p, p * 1000 / n))
    }
    val gotCal = TextAnalysis.nbCalibration(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(gotCal === wantCal)
    // the junk eval doc scores negative: its band is strictly below the
    // stopword-heavy doc's, and the floor shift kept it a whole-nat band
    assert(bandOf(score(e2)._2) < bandOf(score(e1)._2))
  }

  test("spanDecontaminateBloom: pass-through prefilter, identical to the exact form") {
    def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // planted: same corpus as the exact-form spec, same expected cut list
    val ev = (1 to 14).map(i => s"e$i").mkString(" ")
    val e13 = (1 to 13).map(i => s"e$i").mkString(" ")
    val d = docs(
      10L -> ev,
      1L -> s"f1 f2 $ev f3",
      2L -> ((1 to 7).map(i => s"g$i").mkString(" ") + " " + e13),
      4L -> (1 to 30).map(i => s"k$i").mkString(" "),
      20L -> e13)
    val exact = spans(TextAnalysis.spanDecontaminate(d))
    val bloom = spans(TextAnalysis.spanDecontaminateBloom(d))
    assert(bloom === exact)
    assert(bloom === Set((1L, 2L, 15L, 2L), (2L, 7L, 19L, 1L)))
    // real corpus: the two forms agree row for row (false positives die in
    // the exact semi-join; false negatives are structurally impossible —
    // build and probe fold the same position expressions)
    val real = graft.Tables.documents(spark, sf("sf0.001"))
    assert(spans(TextAnalysis.spanDecontaminateBloom(real)) ===
      spans(TextAnalysis.spanDecontaminate(real)))
  }

  test("ngramNovelty: first-occurrence accounting and cumulative vocabulary") {
    // ids 0..3, buckets=2, m=3 -> bucket = id*2 DIV 4: {0,1}->0, {2,3}->1
    val d = docs(
      0L -> "a b c d", // shingles: "a b c", "b c d"
      1L -> "a b c", //           "a b c"
      2L -> "a b c x", //         "a b c", "b c x"
      3L -> "p q r s") //         "p q r", "q r s"
    val got = TextAnalysis.ngramNovelty(d, buckets = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))))
      .toMap
    // bucket 0: 2 distinct shingles over 3 doc-instances, both new
    assert(got(0L) === ((2L, 2L, 3L, 2L, 2L, 1000L)))
    // bucket 1: 4 distinct, 4 instances, 3 first seen here -> 750 milli
    assert(got(1L) === ((2L, 4L, 4L, 3L, 5L, 750L)))
    val again = TextAnalysis.ngramNovelty(d.repartition(5), buckets = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))))
      .toMap
    assert(again === got)
  }

  test("heapsFit: saturated corpus -> slope 0; fully-novel corpus -> slope 1000") {
    // every doc identical: cum_vocab is constant -> beta = 0 exactly
    val sat = docs((0L to 7L).map(i => i -> "a b c d e"): _*)
    val s = TextAnalysis.heapsFit(sat, buckets = 4).head()
    assert(s.getLong(0) === 4L && s.getLong(1) === 0L)
    // every doc a fresh token namespace: cum_vocab == cum_rows at every
    // point, so the ln-ln points sit on y = x -> beta = 1000 exactly
    val novel = docs((0L to 7L).map(i =>
      i -> s"n${i}a n${i}b n${i}c n${i}d"): _*)
    val n = TextAnalysis.heapsFit(novel, buckets = 4).head()
    assert(n.getLong(0) === 4L && n.getLong(1) === 1000L)
  }

  test("phraseBlocklist: positional bigram matches, per-source funnel") {
    import spark.implicits._
    val d = Seq(
      (1L, "s1", "The SLOW scan runs"), // "slow scan" x1 (case-folded)
      (2L, "s1", "big table big table"), // "big table" x2 in one doc
      (3L, "s1", "nothing suspicious here"),
      (4L, "s2", "scan slow the reversed order misses")) // no positional hit
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.phraseBlocklist(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("s1") === ((3L, 3L, 2L, 666L))) // 3 occurrences, 2 docs flagged
    assert(got("s2") === ((1L, 0L, 0L, 0L))) // reversed bigram is NOT a match
    val again = TextAnalysis.phraseBlocklist(d.repartition(3)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(again === got)
  }

  test("blocklistExcise: blocked-bigram token union removed, kept text hashed") {
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val d = docs(
      1L -> "the SLOW scan runs", // (slow, scan) blocked -> tokens 1,2 out
      2L -> "big table big table", // every token in some blocked bigram
      3L -> "perfectly clean words", // untouched
      4L -> "slow scan slow") // overlap: {0,1} out, trailing "slow" stays
    val got = TextAnalysis.blocklistExcise(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) === ((4L, 2L, md5("the runs"))))
    assert(got(2L) === ((4L, 4L, md5(""))))
    assert(got(3L) === ((3L, 0L, md5("perfectly clean words"))))
    assert(got(4L) === ((3L, 2L, md5("slow"))))
  }

  test("incrementalNgramNovelty: shard docs probed against the frozen corpus vocabulary") {
    // ids 0..9 -> split = 10*4/5 = 8: corpus 0..7, shard 8..9
    val d = docs(
      (Seq(0L -> "a b c d") ++
        (1L to 7L).map(i => i -> s"f${i}x f${i}y f${i}z f${i}w") ++
        Seq(
          // 5 shingles, 2 known ("a b c", "b c d"), 3 novel -> 600 milli
          8L -> "a b c d q1 q2 q3",
          9L -> "x y")): _*) // < 3 tokens: zero shingles, zero novelty
    val got = TextAnalysis.incrementalNgramNovelty(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === Set(8L, 9L)) // shard only, corpus never re-reported
    assert(got(8L) === ((5L, 3L, 600L)))
    assert(got(9L) === ((0L, 0L, 0L)))
    val again = TextAnalysis.incrementalNgramNovelty(d.repartition(5))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(again === got)
  }

  test("gopherRules: each rule fails on its planted violator and only there") {
    val stop = "the a is of and" // 5 distinct stopwords
    def filler(n: Int) = (1 to n).map(i => s"word$i").mkString(" ")
    val pass = s"$stop ${filler(50)}"                       // 55 tokens, all rules pass
    val short = s"$stop ${filler(10)}"                      // r_len fails (15 < 50)
    val longWords = s"$stop " +
      (1 to 50).map(i => s"supercalifragilistic$i").mkString(" ") // r_mean_len fails
    val punct = s"$stop ${filler(40)} " + Seq.fill(10)("..").mkString(" ") // >10% punct
    val digits = s"$stop ${filler(30)} " + (1 to 25).map(_.toString).mkString(" ") // <80% alpha
    val noStop = filler(55)                                 // r_stop fails
    val line8 = "q1 q2 q3 q4 q5 q6 q7 q8"
    // 56 tokens, window-aligned triple line: 16 dup toks / 56 = 285 > 200
    val dupOk = s"$stop ${filler(27)} $line8 $line8 $line8"
    val d = docs(1L -> pass, 2L -> short, 3L -> longWords, 4L -> punct,
      5L -> digits, 6L -> noStop, 7L -> dupOk)
    val got = TextAnalysis.gopherRules(d).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(7), r.getBoolean(8), r.getBoolean(9),
        r.getBoolean(10), r.getBoolean(11), r.getBoolean(12), r.getBoolean(13))))
      .toMap
    // (r_len, r_mean_len, r_punct, r_alpha, r_stop, r_dup, keep)
    assert(got(1L) === ((true, true, true, true, true, true, true)))
    assert(!got(2L)._1 && !got(2L)._7)
    assert(!got(3L)._2 && !got(3L)._7)
    assert(!got(4L)._3 && !got(4L)._7)
    assert(!got(5L)._4 && !got(5L)._7)
    assert(!got(6L)._5 && !got(6L)._7)
    assert(!got(7L)._6 && !got(7L)._7)
    // each violator fails ONLY its own rule (the planted cases are
    // single-axis by construction)
    assert(got(2L).productIterator.count(_ == false) === 2)
    assert(got(6L).productIterator.count(_ == false) === 2)
  }

  test("gopherRules metrics are exact integers on a hand-computed doc") {
    // 10 tokens: "the a is of and w1 w2 w3 42 .." -> chars 3+1+2+2+3+2+2+2+2+2=21
    val d = docs(1L -> "the a is of and w1 w2 w3 42 ..")
    val r = TextAnalysis.gopherRules(d).collect().head
    assert(r.getLong(1) === 10L)            // n_tokens
    assert(r.getLong(2) === 2100L)          // mean_len_milli = 21*1000/10
    assert(r.getLong(3) === 100L)           // punct: 1/10
    assert(r.getLong(4) === 800L)           // alpha: 8/10 ("42", ".." fail)
    assert(r.getLong(5) === 5L)             // distinct stopwords
    assert(r.getLong(6) === 0L)             // no repeated line
  }

  /** Brute-force [[TextAnalysis.winnowFingerprints]]: per-gram seeded
    * 40-bit hash, per-window composite argmin (min hash, rightmost pos),
    * distinct selections as (doc_id, fp_pos, fp_hash).
    */
  private def bruteWinnow(
      rows: Seq[(Long, String)], k: Int, w: Int): Set[(Long, Long, Long)] = {
    val scale = 1L << TextAnalysis.WinnowPosBits
    rows.flatMap { case (id, text) =>
      val ts = text.split(" ", -1).toSeq
      if (ts.size < k) Seq.empty
      else {
        val comps = (0 to ts.size - k).map { i =>
          val gram = ts.slice(i, i + k).mkString(" ")
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"${TextAnalysis.WinnowSeed}:$gram".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          val h = java.lang.Long.parseLong(hex.substring(0, 10), 16)
          h * scale + (scale - 1 - i)
        }
        (0 to math.max(0, comps.size - w))
          .map(j => comps.slice(j, j + w).min).distinct
          .map(c => (id, scale - 1 - (c % scale), c / scale))
      }
    }.toSet
  }

  test("winnowFingerprints == brute force; short docs emit nothing") {
    val rows = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven",
      3L -> "too short", // 2 tokens < k -> no grams, no fingerprints
      4L -> "exactly three toks")
    val got = TextAnalysis.winnowFingerprints(docs(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === bruteWinnow(rows, TextAnalysis.WinnowK, TextAnalysis.WinnowW))
    assert(!got.exists(_._1 == 3L))
    // a k-token doc has exactly one gram -> exactly one fingerprint at 0
    assert(got.count(_._1 == 4L) === 1 && got.exists(t => t._1 == 4L && t._2 == 0L))
  }

  test("winnowFingerprints: shared runs >= k+w-1 tokens share a fingerprint hash") {
    // the Schleimer et al. guarantee: any shared token run of length
    // k+w-1 contains a full window of shared grams, and both documents
    // select the same minimal gram hash from it
    val run = "quick brown fox jumps over lazy dog rests here" // 9 >= 6
    val rows = Seq(
      1L -> s"completely different prefix words then $run",
      2L -> s"$run followed by an unrelated suffix entirely")
    val fps = TextAnalysis.winnowFingerprints(docs(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val h1 = fps.collect { case (1L, h) => h }.toSet
    val h2 = fps.collect { case (2L, h) => h }.toSet
    assert((h1 intersect h2).nonEmpty)
  }

  test("winnowFingerprints: identical grams select the RIGHTMOST window minimum") {
    // every gram of "a a a a a a a a" hashes identically, so each
    // window's argmin is its rightmost gram: starts 0..2 select gram
    // positions 3, 4, 5 (one shared hash)
    val got = TextAnalysis.winnowFingerprints(docs(1L -> "a a a a a a a a"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet === Set(3L, 4L, 5L))
    assert(got.map(_._2).toSet.size === 1)
  }

  test("bpeVocabCurve: hand-derived checkpoints; greedy prefix invariant; early stop drops deep rows") {
    // 'abab' x3, 'ab' x2 — round 1 merges (a,b), round 2 (ab,ab)
    val d = docs(0L -> "abab abab abab ab ab")
    val got = TextAnalysis.bpeVocabCurve(d, checkpoints = Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    // k=1: abab->[ab,ab], ab->[ab]: n_bpe = 3*2+2 = 8, pieces {ab};
    //      words 5, chars 16; fert 8000/5 = 1600; comp 16000/8 = 2000
    // k=2: abab->[abab], ab->[ab]: n_bpe = 5, pieces {abab, ab};
    //      fert 1000; comp 16000/5 = 3200
    assert(got === Set(
      (1L, 1L, 1L, 5L, 16L, 8L, 1600L, 2000L),
      (2L, 2L, 2L, 5L, 16L, 5L, 1000L, 3200L)))
    // training merges out after 2 rounds: a deeper checkpoint has no
    // training state and contributes no row (the oracle's recursion
    // never reaches it)
    val stopped = TextAnalysis.bpeVocabCurve(d, checkpoints = Seq(2, 5))
      .collect().map(_.getLong(0)).toSet
    assert(stopped === Set(2L))
    // real-table invariants: one row per reachable checkpoint; token
    // totals non-increasing in k (merges only fuse); the deepest
    // checkpoint agrees with the standalone encode
    val dir = sf("sf0.001")
    val sfDocs = graft.Tables.documents(spark, dir)
    val curve = TextAnalysis.bpeVocabCurve(sfDocs)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).sortBy(_._1)
    assert(curve.map(_._1) ===
      TextAnalysis.BpeCurveCheckpoints.map(_.toLong).toArray)
    assert(curve.sliding(2).forall(w => w(1)._2 <= w(0)._2))
    val encTotal = TextAnalysis.bpeEncode(sfDocs)
      .agg(org.apache.spark.sql.functions.sum(
        col("freq") * col("n_pieces"))).collect().head.getLong(0)
    assert(curve.last._2 === encTotal)
  }

  test("bpeByteFallback: kept alphabet + merge outputs in vocab; OOV pieces expand to UTF-8 bytes") {
    import spark.implicits._
    // recover the engine's deterministic 1/16 sample membership on a
    // small id range (same md5 predicate as bpeSampledDocs)
    val ids = spark.range(0, 200).toDF("doc_id")
      .withColumn("in_sample", org.apache.spark.sql.functions.pmod(
        graft.functions.HashFunctions.md5Long(
          col("doc_id").cast("string"), TextAnalysis.BpeSampleSeed),
        org.apache.spark.sql.functions.lit(TextAnalysis.BpeSampleMod)) === 0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val inId = ids.collectFirst { case (i, true) => i }.get
    val outId = ids.collectFirst { case (i, false) => i }.get
    // sampled doc trains on {a, b}: rules (a,a) then (b,b); both chars
    // kept (two chars can't exceed the 0.05% tail). unsampled doc brings
    // unseen chars: z (1 byte) and ¢ (2 bytes) — every piece OOV
    val d = Seq(
      (inId, "en", "aa aa bb"),
      (outId, "xx", "zz ¢x")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.bpeByteFallback(d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // en: aa->[aa] x2, bb->[bb]: 3 words, 3 pieces, 0 oov, 3 tokens
    // xx: zz->[z,z] (2 oov x 1 byte), ¢x->[¢,x] (2 oov, 2+1 bytes):
    //     2 words, 4 pieces, 4 oov, 5 tokens, 1000 permille
    assert(got === Map(
      "en" -> ((3L, 3L, 0L, 3L, 0L)),
      "xx" -> ((2L, 4L, 4L, 5L, 1000L))))
    // character_coverage drops the tail: 'q' carries 1 of 9999 char
    // occurrences (> the 0.05% boundary), so it falls out of the kept
    // alphabet even though it WAS in the training corpus
    val skew = Seq((inId, "en",
      (Seq.fill(4999)("aa") :+ "q").mkString(" "))).toDF("doc_id", "lang", "text")
    val row = TextAnalysis.bpeByteFallback(skew).collect()
    assert(row.length === 1)
    val r = row.head
    assert(r.getLong(3) === 1L, "q must be out-of-vocabulary") // n_oov_pieces
    assert(r.getLong(1) === 5000L)                             // n_words
  }
}
