package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The go-cron HTTP healthcheck (init.sh:14 `-p "$HEALTHCHECK_PORT"`;
  * probed by `HEALTHCHECK curl --fail`, Dockerfile:44–45), closing the
  * last [R] runtime surface: a liveness endpoint over the streaming
  * engine.
  *
  * `GET /health` → 200 with `{"status":"ok","active":N}` while the
  * session is alive and no tracked query has died with an exception;
  * 503 with `{"status":"error",...}` once one has — the `curl --fail`
  * contract (non-2xx fails the probe). Driver-side only, JDK built-in
  * server, one daemon thread: zero cluster footprint.
  */
final class Health private (server: HttpServer, spark: SparkSession) {

  @volatile private var lastError: Option[String] = None

  /** Mark a failure (e.g. from a [[SnapshotStream.HookListener]] error
    * event) — flips the endpoint to 503, like a crashed go-cron child
    * failing the container probe.
    */
  def reportError(msg: String): Unit = lastError = Some(msg)

  def clearError(): Unit = lastError = None

  def port: Int = server.getAddress.getPort

  private[streaming] def body: (Int, String) = lastError match {
    case Some(err) =>
      (503, s"""{"status": "error", "detail": "${err.replaceAll("[\"\\\\]", "'")}"}""")
    case None =>
      (200, s"""{"status": "ok", "active": ${spark.streams.active.length}}""")
  }

  def stop(): Unit = server.stop(0)
}

object Health {

  /** Start the endpoint on `port` (0 = ephemeral, for tests). */
  def start(spark: SparkSession, port: Int): Health = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val h = new Health(server, spark)
    server.createContext("/health", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, json) = h.body
        val bytes = json.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length)
        try ex.getResponseBody.write(bytes) finally ex.close()
      }
    })
    server.start()
    h
  }

  /** The full wiring: endpoint + a [[SnapshotStream.HookListener]]
    * that flips it to 503 on the error channel — attach with
    * `spark.streams.addListener`.
    */
  def withListener(spark: SparkSession, port: Int): (Health, SnapshotStream.HookListener) = {
    val h = start(spark, port)
    (h, new SnapshotStream.HookListener(e =>
      if (e.status == "error") h.reportError(e.detail)))
  }
}
