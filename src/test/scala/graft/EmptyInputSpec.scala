package graft

import java.nio.file.Files

/** Robustness: every declared query must run (returning zero rows is fine,
  * throwing is not) against empty copies of all tables — the behavior a
  * pipeline needs when a partition of the lake is legitimately empty.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("empty-sf").toString
    // events stores TIMESTAMP(NANOS): read it as raw long nanos (the same
    // legacy conf Tables.events uses) so the empty copy round-trips
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      Tables.load(spark, sf("sf0.001"), t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries run on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).count()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
