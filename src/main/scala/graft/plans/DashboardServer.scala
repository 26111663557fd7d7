package graft.plans

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Thin HTTP shim over [[ProgressListener]] serving the reference
  * dashboard's surface: the `/data` JSON endpoint plus a rendered HTML/JS
  * dashboard at `/` (reference `master/master.go:175-255`,
  * `web/index.html:1-48`, `web/script.js:1-82`). Markup and script are our
  * own and fully self-contained — no CDN dependencies (the reference pulls
  * Tailwind/Chart.js from CDNs; an air-gapped cluster can't) — but the
  * behavior contract is the same: poll `/data` every second with a
  * cache-busting param, render a task table, a worker table, and a
  * progress bar. JDK-builtin HTTP server — no dependencies; Spark's own
  * UI/REST API remains the full-fidelity surface.
  */
class DashboardServer(listener: ProgressListener, port: Int = 0) {

  private def respond(ex: HttpExchange, status: Int, contentType: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes)
    finally os.close()
  }

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/data", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 200, "application/json", listener.jsonSnapshot)
    })
    s.createContext("/script.js", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 200, "application/javascript", DashboardServer.scriptJs)
    })
    // "/" is the fallback context: exact "/" gets the page, the rest 404
    s.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ex.getRequestURI.getPath == "/")
          respond(ex, 200, "text/html", DashboardServer.indexHtml)
        else respond(ex, 404, "text/plain", "not found")
    })
    s.start()
    s
  }

  /** Bound port (useful when constructed with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object DashboardServer {

  /** Dashboard page: progress bar + tasks + workers, ids consumed by
    * [[scriptJs]]. Same information layout as the reference UI
    * (`web/index.html:14-44`), own markup and styling.
    */
  val indexHtml: String =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8">
      |<meta name="viewport" content="width=device-width, initial-scale=1.0">
      |<title>Graft Job Dashboard</title>
      |<style>
      |  body { font-family: system-ui, sans-serif; background: #f4f4f5; margin: 0; }
      |  main { max-width: 56rem; margin: 0 auto; padding: 1.5rem; }
      |  h1 { font-size: 1.6rem; } h2 { font-size: 1.1rem; margin-top: 1.5rem; }
      |  table { width: 100%; border-collapse: collapse; background: #fff;
      |          box-shadow: 0 1px 2px rgba(0,0,0,.08); }
      |  th, td { padding: .45rem .7rem; text-align: left;
      |           border-bottom: 1px solid #e4e4e7; }
      |  thead tr { background: #e4e4e7; }
      |  #barbox { background: #e4e4e7; border-radius: .25rem; overflow: hidden; }
      |  #bar { height: 1.25rem; width: 0%; background: #16a34a;
      |         transition: width .3s; }
      |  #pct { font-variant-numeric: tabular-nums; }
      |</style>
      |</head>
      |<body>
      |<main>
      |  <h1>Graft Job Dashboard</h1>
      |  <h2>Job Progress <span id="pct">0.0%</span></h2>
      |  <div id="barbox"><div id="bar"></div></div>
      |  <h2>Tasks</h2>
      |  <table>
      |    <thead><tr><th>ID</th><th>Type</th><th>Status</th><th>Done</th><th>Total</th></tr></thead>
      |    <tbody id="tasksTable"></tbody>
      |  </table>
      |  <h2>Workers</h2>
      |  <table>
      |    <thead><tr><th>ID</th><th>Tasks Assigned</th></tr></thead>
      |    <tbody id="workersTable"></tbody>
      |  </table>
      |</main>
      |<script src="/script.js"></script>
      |</body>
      |</html>
      |""".stripMargin

  /** Polls `/data` every second (cache-busted, like the reference's
    * `web/script.js:28,81`) and re-renders. DOM built via `textContent` —
    * no innerHTML injection.
    */
  val scriptJs: String =
    """function cell(text) {
      |  const td = document.createElement('td');
      |  td.textContent = String(text);
      |  return td;
      |}
      |
      |function fillTable(id, rows, fields) {
      |  const body = document.getElementById(id);
      |  body.replaceChildren();
      |  rows.forEach(row => {
      |    const tr = document.createElement('tr');
      |    fields.forEach(f => tr.appendChild(cell(row[f])));
      |    body.appendChild(tr);
      |  });
      |}
      |
      |function render(data) {
      |  if (!data.tasks || !data.workers || data.progress === undefined) return;
      |  fillTable('tasksTable', data.tasks,
      |    ['id', 'type', 'status', 'tasks_done', 'tasks_total']);
      |  fillTable('workersTable', data.workers, ['id', 'tasks_assigned']);
      |  document.getElementById('bar').style.width = data.progress + '%';
      |  document.getElementById('pct').textContent = data.progress.toFixed(1) + '%';
      |}
      |
      |function tick() {
      |  fetch('/data?t=' + Date.now())
      |    .then(r => { if (!r.ok) throw new Error('HTTP ' + r.status); return r.json(); })
      |    .then(render)
      |    .catch(err => console.error('dashboard poll failed:', err));
      |}
      |
      |setInterval(tick, 1000);
      |tick();
      |""".stripMargin
}
