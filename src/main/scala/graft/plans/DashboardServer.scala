package graft.plans

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Thin HTTP shim over [[ProgressListener]] serving the reference
  * dashboard's `/data` endpoint (reference `master/master.go:175-255`;
  * polled every second by `web/script.js:81`). JDK-builtin HTTP server —
  * no dependencies; Spark's own UI/REST API remains the full surface.
  */
class DashboardServer(listener: ProgressListener, port: Int = 0) {

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/data", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = listener.jsonSnapshot.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        val os = ex.getResponseBody
        try os.write(body)
        finally os.close()
      }
    })
    s.start()
    s
  }

  /** Bound port (useful when constructed with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}
