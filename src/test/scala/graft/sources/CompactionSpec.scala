package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compact shrinks a fragmented directory and preserves the row multiset") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    val frag = s"$base/frag"
    val out = s"$base/out"
    val df = (1L to 10000L).map(i => (i, i % 97, s"row$i")).toDF("id", "k", "s")
    df.repartition(40).write.parquet(frag)
    assert(parquetFiles(frag).length === 40)
    val bytes = Compaction.dataBytes(spark, frag)
    assert(bytes > 0L)
    val n = Compaction.targetFiles(bytes, bytes / 4 + 1) // aim for ~4 files
    Compaction.compact(spark.read.parquet(frag), Seq("id"), out, n)
    val files = parquetFiles(out)
    assert(files.length <= n && files.length < 40, s"got ${files.length} files")
    // same rows, nothing lost or duplicated
    val a = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(a === df.collect().map(_.toSeq).toSet)
    // range partitioning: per-file id ranges are (near-)disjoint -> tight
    // min/max stats; assert strict disjointness which repartitionByRange
    // guarantees for a unique sort key
    val ranges = files.toSeq.map { f =>
      val r = spark.read.parquet(f.toString).agg(min("id"), max("id")).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    graft.streaming.EventStreams.deleteRecursivelyOnExit(base)
  }

  test("targetFiles: ceil division, never zero") {
    assert(Compaction.targetFiles(0L, 1024L) === 1)
    assert(Compaction.targetFiles(1024L, 1024L) === 1)
    assert(Compaction.targetFiles(1025L, 1024L) === 2)
  }
}
