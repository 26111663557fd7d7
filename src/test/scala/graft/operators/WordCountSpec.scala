package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** Golden parity with the reference's documented end-to-end check
  * (reference `README.md:103-111`, inputs `README.md:25-26`): the top-5
  * must come out desc-count then asc-word, so the three 3-count words are
  * alphabetical and only the first two 1-count words fit under k=5.
  */
class WordCountSpec extends SparkSpec {

  private def tmpInputs(contents: String*): Seq[String] = {
    val dir = Files.createTempDirectory("wc")
    contents.zipWithIndex.map { case (c, i) =>
      val p = dir.resolve(s"input$i.txt")
      Files.writeString(p, c)
      p.toString
    }
  }

  test("golden top-5 matches the reference output, including tie-break order") {
    val paths = tmpInputs(
      "hello world hello this is a test",
      "world goodbye hello test test world")
    val got = WordCount
      .formatted(WordCount.run(spark, paths, 5))
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(got === Seq("hello: 3", "test: 3", "world: 3", "a: 1", "goodbye: 1"))
  }

  test("punctuation trim matches the reference charset: edge + interior") {
    val paths = tmpInputs("""Don't stop... "quoted" e.g. (parens) mid,dle !!!""")
    val counts = WordCount
      .counts(spark.read.text(paths: _*), "value")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // trims only leading/trailing .,!?:;"' — keeps interior ones and ()
    assert(counts === Map(
      "don't" -> 1L, "stop" -> 1L, "quoted" -> 1L,
      "e.g" -> 1L, "(parens)" -> 1L, "mid,dle" -> 1L))
    // "!!!" normalized to empty and dropped entirely
    assert(!counts.contains(""))
  }

  test("leading/trailing/mixed whitespace never yields empty-word rows") {
    val paths = tmpInputs("  leading\tand\n\ntrailing   ")
    val words = WordCount
      .counts(spark.read.text(paths: _*), "value")
      .collect()
      .map(_.getString(0))
      .toSet
    assert(words === Set("leading", "and", "trailing"))
  }

  test("result is invariant to shuffle partitioning") {
    val paths = tmpInputs("a b c a b a", "b a c")
    def run(): Seq[(String, Long)] =
      WordCount.topK(WordCount.counts(spark.read.text(paths: _*), "value"), 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val one = run()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val seven = run()
      assert(one === seven)
      assert(one === Seq("a" -> 4L, "b" -> 3L, "c" -> 2L))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
