package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZOrderLayoutSpec extends SparkSpec {
  import ZOrderLayout._

  test("zValue: known Morton codes and clamping") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // interleave: x bits at even positions, y at odd
    assert(rows.toSeq === Seq(0L, 1L, 2L, 3L, 39L, (1L << 32) - 1))
    val clamped = Seq((-5L, 70000L)).toDF("x", "y")
      .select(clamp16(col("x")).as("cx"), clamp16(col("y")).as("cy"))
      .collect().head
    assert((clamped.getLong(0), clamped.getLong(1)) === ((0L, 65535L)))
  }

  /** Per-file [min, max] of a column across a parquet directory's parts. */
  private def fileStats(dir: String, c: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files.toSeq.map { f =>
      val r = spark.read.parquet(f.toString).agg(min(col(c)), max(col(c))).collect().head
      (r.getLong(0), r.getLong(1))
    }
  }

  test("z-ordered layout skips files on BOTH dimensions; a linear sort only on its own") {
    import spark.implicits._
    // 64x64 uniform grid — every (x, y) cell once
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("zx", "zy")
      .withColumn("z", zValue(col("zx"), col("zy")))
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_x").toString
    writeZOrdered(grid, "z", zDir, nFiles)
    grid.repartitionByRange(nFiles, col("zx"), col("zy"))
      .sortWithinPartitions("zx", "zy")
      .write.mode("overwrite").parquet(xDir)
    def touched(dir: String, c: String, lo: Long, hi: Long): Int =
      fileStats(dir, c).count { case (mn, mx) => mx >= lo && mn <= hi }
    // y-range box: the x-sorted layout cannot skip anything; z-order can
    val yzTouched = touched(zDir, "zy", 0L, 7L)
    assert(touched(xDir, "zy", 0L, 7L) === nFiles)
    assert(yzTouched < nFiles / 2, s"z layout touched $yzTouched/$nFiles files for a y box")
    // x-range box: z-order still skips most files (vs perfect for x-sort)
    val xzTouched = touched(zDir, "zx", 0L, 7L)
    assert(xzTouched < nFiles / 2, s"z layout touched $xzTouched/$nFiles files for an x box")
    graft.streaming.EventStreams.deleteRecursivelyOnExit(java.nio.file.Paths.get(zDir))
    graft.streaming.EventStreams.deleteRecursivelyOnExit(java.nio.file.Paths.get(xDir))
  }

  test("eventZ is deterministic and within the 32-bit z domain on driver data") {
    val z = eventZ(graft.Tables.events(spark, sf("sf0.001")))
    val r = z.agg(min("z"), max("z"), count(lit(1))).collect().head
    assert(r.getLong(0) >= 0L)
    assert(r.getLong(1) < (1L << 32))
    assert(r.getLong(2) > 0L)
  }
}
