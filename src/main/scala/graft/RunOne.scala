package graft

/** Single-pass diagnostic runner: `runMain graft.RunOne <sfDir> <q1,q2>`
  * executes each named registered query ONCE (no warmup, no medians) and
  * prints its row count and wall seconds. For bounding a query whose
  * cost is the open question — e.g. the uncapped exact miner on the skew
  * replica, where [[Bench]]'s warmup+3-pass protocol would quadruple an
  * already-quadratic bill before reporting anything. Never used for
  * official numbers (those are Bench's interleaved medians).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark =
      Sessions.local(cores = cpus, shufflePartitions = cpus, appName = "graft-runone")
    try names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"RUNONE $n rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    } finally spark.stop()
  }
}
