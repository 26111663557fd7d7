package graft.plans

import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

/** Job-progress observability: a `SparkListener` aggregating executor and
  * task state into the same JSON shape as the reference's dashboard
  * endpoint (reference `master/master.go:198-235`: `{workers:
  * [{id, tasks_assigned}], tasks: [{id, type, status}], progress}`).
  *
  * The reference polls master state under a mutex; here the listener bus
  * pushes events and a snapshot renders on demand — attach with
  * `spark.sparkContext.addSparkListener(listener)` and serve
  * [[jsonSnapshot]] from any HTTP endpoint for dashboard parity. Spark's
  * own UI / REST API remains the full-fidelity surface; this shim exists
  * for drop-in compatibility with the reference's `/data` consumers.
  */
class ProgressListener extends SparkListener {

  private val taskCounts = TrieMap.empty[String, Long] // executorId -> tasks assigned
  private val stageTotal = TrieMap.empty[Int, Int]     // stageId -> task count
  // stageId -> distinct successful task indices: a speculative duplicate or
  // a stage-retry re-run of task i must not count i twice (the reference
  // has the same idempotence — a stale straggler's duplicate completion is
  // accepted but the task is already "done", master.go:137-149)
  private val stageDone = TrieMap.empty[Int, TrieMap[Int, Unit]]
  private val stageStatus = TrieMap.empty[Int, String] // idle | in-progress | done

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    stageTotal.put(e.stageInfo.stageId, e.stageInfo.numTasks)
    stageDone.putIfAbsent(e.stageInfo.stageId, TrieMap.empty)
    stageStatus.put(e.stageInfo.stageId, "in-progress")
  }

  override def onTaskStart(e: SparkListenerTaskStart): Unit =
    taskCounts.updateWith(e.taskInfo.executorId) {
      case Some(n) => Some(n + 1)
      case None    => Some(1L)
    }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskInfo.successful) {
      stageDone
        .getOrElseUpdate(e.stageId, TrieMap.empty)
        .put(e.taskInfo.index, ())
    }

  private def doneCount(stageId: Int): Int = {
    val done = stageDone.get(stageId).map(_.size).getOrElse(0)
    // a stage retry can legitimately run MORE distinct indices than the
    // retry attempt's numTasks; clamp so done never exceeds total
    math.min(done, stageTotal.getOrElse(stageId, done))
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    stageStatus.put(e.stageInfo.stageId, "done")

  /** done-tasks / total-tasks percentage, mirroring the reference's
    * done/total × 100 over its task list (`master/master.go:226-235`);
    * task-level (not stage-level) so the bar moves during a long stage.
    */
  def progress: Double = {
    val total = stageTotal.values.sum
    if (total == 0) 0.0
    else math.min(100.0, stageTotal.keys.map(doneCount).sum * 100.0 / total)
  }

  /** Snapshot in the reference dashboard's JSON shape; each Spark stage
    * plays the role of a reference task, with its task-completion counts.
    */
  def jsonSnapshot: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    val workers = taskCounts.toSeq.sortBy(_._1).map { case (id, n) =>
      s"""{"id":"${esc(id)}","tasks_assigned":$n}"""
    }.mkString("[", ",", "]")
    val tasks = stageStatus.toSeq.sortBy(_._1).map { case (id, st) =>
      val done = doneCount(id)
      val total = stageTotal.getOrElse(id, 0)
      s"""{"id":$id,"type":"stage","status":"${esc(st)}","tasks_done":$done,"tasks_total":$total}"""
    }.mkString("[", ",", "]")
    s"""{"workers":$workers,"tasks":$tasks,"progress":$progress}"""
  }
}
