package graft.plans

import graft.SparkSpec

class ProgressListenerSpec extends SparkSpec {

  test("listener reaches 100% progress and renders the reference JSON shape") {
    val listener = new ProgressListener
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      // a job with a shuffle → at least two stages
      (1 to 1000).toDF("x").groupBy(($"x" % 7).as("k")).count().collect()
      // listener bus is async; poll until the events drain
      val deadline = System.currentTimeMillis() + 10000
      while (listener.progress < 100.0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.progress === 100.0)
      val json = listener.jsonSnapshot
      assert(json.startsWith("""{"workers":["""))
      assert(json.contains(""""tasks":[{"id":"""))
      assert(json.contains(""""status":"done""""))
      assert(json.contains(""""progress":100.0"""))

      // dashboard shim serves the same snapshot over HTTP (/data), plus
      // the rendered UI (own markup, reference behavior contract)
      val server = new DashboardServer(listener)
      try {
        def get(path: String): String = {
          val url = new java.net.URI(s"http://localhost:${server.boundPort}$path").toURL
          new String(url.openStream().readAllBytes(), "UTF-8")
        }
        assert(get("/data") === json)
        val page = get("/")
        assert(page.contains("""<tbody id="tasksTable">"""))
        assert(page.contains("""<tbody id="workersTable">"""))
        assert(page.contains("""<script src="/script.js">"""))
        val js = get("/script.js")
        assert(js.contains("/data?t="), "script must poll the /data endpoint")
        assert(js.contains("setInterval(tick, 1000)"), "reference polls every 1 s")
      } finally server.stop()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("duplicate successful task ends (speculation/retry) do not over-count") {
    import org.apache.spark.scheduler.TestTaskEvents._
    val listener = new ProgressListener
    listener.onStageSubmitted(stageSubmitted(stageId = 1, numTasks = 2))
    listener.onTaskEnd(successfulTaskEnd(1, index = 0))
    listener.onTaskEnd(successfulTaskEnd(1, index = 0, attempt = 1)) // speculative dup
    assert(listener.progress === 50.0, "task 0's duplicate completion counted twice")
    assert(listener.jsonSnapshot.contains(""""tasks_done":1,"tasks_total":2"""))
    listener.onTaskEnd(successfulTaskEnd(1, index = 1))
    listener.onTaskEnd(successfulTaskEnd(1, index = 1, attempt = 1))
    assert(listener.progress === 100.0)
    assert(listener.jsonSnapshot.contains(""""tasks_done":2,"tasks_total":2"""))
  }

  test("cluster profile documents straggler re-execution (speculation on)") {
    assert(graft.Sessions.clusterProfile("spark.speculation") === "true")
    assert(graft.Sessions.clusterProfile("spark.sql.adaptive.skewJoin.enabled") === "true")
  }

  test("cluster profile's SQL confs apply to a live session without changing answers") {
    // spark.speculation is a core (context-wide) conf a shared-JVM test
    // cannot flip; every SQL-settable profile entry must both TAKE and
    // leave query semantics untouched — the contract that makes the
    // profile safe to apply wholesale on a real cluster
    val base = graft.operators.WordCount.topK(
      graft.operators.WordCount.counts(
        graft.Tables.documents(spark, sf("sf0.001")).select("text"), "text"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val profiled = spark.newSession()
    val sqlSettable = graft.Sessions.clusterProfile.filter(_._1.startsWith("spark.sql."))
    assert(sqlSettable.nonEmpty)
    sqlSettable.foreach { case (k, v) => profiled.conf.set(k, v) }
    sqlSettable.foreach { case (k, v) => assert(profiled.conf.get(k) === v, k) }
    val got = graft.operators.WordCount.topK(
      graft.operators.WordCount.counts(
        graft.Tables.documents(profiled, sf("sf0.001")).select("text"), "text"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === base, "profile confs must not change query answers")
  }
}
