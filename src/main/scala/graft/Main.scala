package graft

import graft.operators.WordCount
import graft.plans.{DashboardServer, ProgressListener}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Reference-parity CLI (reference `main.go:16-43`): `graft.Main master
  * <input1> [input2 ...]` runs the word-count job over the input text
  * files and writes the global top-k to `mr-final.txt` as `"word: count"`
  * lines (reference `master/master.go:300-311`), serving the progress
  * dashboard over HTTP while the job runs.
  *
  * The reference's `worker` mode has no user-facing analog on purpose:
  * Spark executors ARE the workers — task scheduling, the shuffle, retry
  * and speculation all live in the engine (SURVEY §3 entry point 2), so
  * there is no second process to launch. Parallelism comes from the
  * session's master (`local[n]` here, a real cluster in deployment).
  */
object Main {

  /** Reference job parameters, hard-coded at its entry point
    * (`main.go:20-21`): reduce parallelism and top-k size.
    */
  val NReduce = 2
  val K = 5

  def main(args: Array[String]): Unit = args.toList match {
    case "master" :: inputs if inputs.nonEmpty =>
      val spark = Sessions.local(shufflePartitions = NReduce, appName = "graft-mapreduce")
      val listener = new ProgressListener
      spark.sparkContext.addSparkListener(listener)
      val dashboard = new DashboardServer(listener, port = dashboardPort)
      try {
        println(s"Dashboard: http://localhost:${dashboard.boundPort}/")
        run(spark, inputs, K, "mr-final.txt")
        println("Distributed MapReduce completed. Check mr-final.txt for top words.")
      } finally {
        dashboard.stop()
        spark.stop()
      }
    case "worker" :: _ =>
      System.err.println(
        "worker mode is subsumed by Spark executors: run 'master' and size " +
          "the session's parallelism (local[n] / cluster executors) instead")
      sys.exit(1)
    case _ =>
      System.err.println("Usage: graft.Main master <input_file1> [input_file2 ...]")
      sys.exit(1)
  }

  /** Reference port 8080 (`master/master.go:176`); env-overridable so a
    * busy port doesn't block the job.
    */
  private def dashboardPort: Int =
    sys.env.get("GRAFT_DASHBOARD_PORT").map(_.toInt).getOrElse(8080)

  /** The job body, separated from arg handling for tests: top-k word
    * counts of `inputs` written to `outPath`, one `"word: count"` line per
    * row in rank order (desc count, asc word). The write is driver-side by
    * construction — the result is at most k rows, exactly like the
    * reference master's single-file write of the sorted top-k.
    */
  def run(spark: SparkSession, inputs: Seq[String], k: Int, outPath: String): Unit = {
    val lines = WordCount.formatted(WordCount.run(spark, inputs, k))
      .collect()
      .map(_.getString(0))
    Files.write(
      Paths.get(outPath),
      lines.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8))
    ()
  }
}
