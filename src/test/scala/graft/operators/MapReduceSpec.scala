package graft.operators

import graft.SparkSpec

/** Property-style tests for the generic mapF/reduceF surface (SURVEY §5
  * item 3), with seeded random corpora: total counts equal total tokens,
  * the general (`mapGroups`) and associative (`reduceGroups`) paths agree,
  * and results are invariant to how the corpus is split into "files".
  */
class MapReduceSpec extends SparkSpec {
  import org.apache.spark.sql.{Dataset, SparkSession}
  import MapReduceSpec.wcMapF

  private implicit def s: SparkSession = spark

  private def asInput(files: Seq[String]): Dataset[(String, String)] = {
    import spark.implicits._
    files.zipWithIndex.map { case (c, i) => (s"doc$i", c) }.toDS()
  }

  private val vocab = Vector("alpha", "beta", "Gamma", "delta.", "'eps'", "...", "z")
  private def randomFile(rng: scala.util.Random): String =
    Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  test("sum of counts == total non-empty normalized tokens (10 seeded corpora)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val files = Seq.fill(3)(randomFile(rng))
      val total = MapReduce.wordCountJob(asInput(files)).collect().map(_._2).sum
      val expected = files
        .flatMap(_.split("\\s+"))
        .map(_.toLowerCase.replaceAll("^[.,!?:;\"']+|[.,!?:;\"']+$", ""))
        .count(_.nonEmpty)
      assert(total === expected, s"corpus: $files")
    }
  }

  test("general mapGroups path agrees with associative reduceGroups path") {
    val rng = new scala.util.Random(7)
    import spark.implicits._
    for (_ <- 1 to 5) {
      val input = asInput(Seq.fill(2)(randomFile(rng)))
      val general = MapReduce
        .mapReduce[String, Long](input, wcMapF, (_, vs) => vs.sum)
        .collect().toMap
      val assoc = MapReduce.wordCountJob(input).collect().toMap
      assert(general === assoc)
    }
  }

  test("inverted index works on textInput's file-path doc ids (sorted lexicographically)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inv")
    val f1 = dir.resolve("input1.txt"); val f2 = dir.resolve("input2.txt")
    java.nio.file.Files.writeString(f1, "hello world hello")
    java.nio.file.Files.writeString(f2, "world goodbye")
    val input = MapReduce.textInput(spark, Seq(f1.toString, f2.toString))
    val got = MapReduce.invertedIndexJob(input).collect().toMap
    // one entry per word; file-path ids sorted as strings, comma-joined
    assert(got.keySet === Set("hello", "world", "goodbye"))
    assert(got("hello").contains("input1.txt") && !got("hello").contains(","))
    val worldDocs = got("world").split(",").toSeq
    assert(worldDocs.size === 2 && worldDocs === worldDocs.sorted)
  }

  test("result invariant to re-splitting the corpus into different files") {
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 5) {
      val corpus = randomFile(rng) + " tail"
      val words = corpus.split(" ")
      val oneFile = MapReduce.wordCountJob(asInput(Seq(corpus))).collect().toMap
      val (l, r) = words.splitAt(words.length / 2)
      val twoFiles = MapReduce
        .wordCountJob(asInput(Seq(l.mkString(" "), r.mkString(" "))))
        .collect().toMap
      assert(oneFile === twoFiles)
    }
  }
}

/** mapF lives outside the suite: closures shipped to executors must not
  * capture the (non-serializable) ScalaTest engine.
  */
object MapReduceSpec {
  import scala.collection.mutable

  def wcMapF(doc: String, content: String): IterableOnce[(String, Long)] = {
    val counts = mutable.HashMap.empty[String, Long]
    content.split("\\s+").foreach { raw =>
      val w = raw.toLowerCase.replaceAll("^[.,!?:;\"']+|[.,!?:;\"']+$", "")
      if (w.nonEmpty) counts.update(w, counts.getOrElse(w, 0L) + 1L)
    }
    counts
  }
}
