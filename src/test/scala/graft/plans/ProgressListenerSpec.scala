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

      // dashboard shim serves the same snapshot over HTTP (/data)
      val server = new DashboardServer(listener)
      try {
        val url = new java.net.URI(s"http://localhost:${server.boundPort}/data").toURL
        val body = new String(url.openStream().readAllBytes(), "UTF-8")
        assert(body === json)
      } finally server.stop()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
