package graft.streaming

/** Bounded-retry webhook delivery — hooks/00-webhook as a pluggable
  * publisher. The reference POSTs `{"status": "<action>"}` with
  * `curl --retry 5 --max-time 10` (00-webhook:14–15) and treats hook
  * failure as best-effort: run-parts continues and the backup is never
  * failed by a hook (backup.sh:8).
  *
  * `transport` is the side-effecting send of one JSON payload — an
  * HTTP POST in production, injectable here (tests need failure
  * injection, and the semantics under test are the retry/budget/
  * give-up contract, not socket plumbing). Throwing signals a
  * transient failure and triggers a retry.
  *
  * Driver-side only, O(1) state: listeners run on the driver and
  * events are lifecycle-cardinality (per query/batch), so delivery
  * cost never scales with data.
  */
final class WebhookPublisher(
    transport: String => Unit,
    retries: Int = 5, // 00-webhook:14 `--retry 5`
    maxTimeMillis: Long = 10000L, // 00-webhook:15 `--max-time 10`
    backoffMillis: Long = 100L,
    onGiveUp: (SnapshotStream.HookEvent, Throwable) => Unit = (_, _) => ()) {

  /** The reference's exact payload shape (00-webhook:10). Status values
    * are the fixed lifecycle names — no user content, so no escaping.
    */
  def payload(e: SnapshotStream.HookEvent): String =
    s"""{"status": "${e.status}"}"""

  /** At most `1 + retries` attempts within the `maxTimeMillis` budget
    * (whichever exhausts first), doubling the pause between attempts
    * like curl's default backoff. Returns true iff delivered;
    * exhaustion invokes `onGiveUp` and returns false — hook delivery
    * is best-effort, never fatal to the backup itself.
    */
  def publish(e: SnapshotStream.HookEvent): Boolean = {
    val body = payload(e)
    val deadline = System.nanoTime() + maxTimeMillis * 1000000L
    var attempt = 0
    var pause = backoffMillis
    var last: Throwable = null
    while (attempt <= retries && System.nanoTime() < deadline) {
      try { transport(body); return true }
      catch { case t: Throwable => last = t }
      attempt += 1
      if (attempt <= retries) {
        val leftMs = (deadline - System.nanoTime()) / 1000000L
        if (leftMs > 0) Thread.sleep(math.min(pause, leftMs))
        pause *= 2
      }
    }
    onGiveUp(e, last)
    false
  }

  /** A [[SnapshotStream.HookListener]] delivering through this
    * publisher — the full 00-webhook wiring in one call.
    */
  def listener: SnapshotStream.HookListener =
    new SnapshotStream.HookListener(e => { publish(e); () })
}

object WebhookPublisher {

  /** The production transport: a JDK `HttpClient` POST of the JSON
    * payload to `url` with `Content-Type: application/json` — the
    * `curl -X POST -H 'Content-Type: application/json' -d "$payload"`
    * of 00-webhook:10–13. Any connect/read failure or non-2xx response
    * throws, which is what signals the publisher's retry loop
    * (curl's `--fail` semantics: an HTTP error IS a delivery failure).
    *
    * One shared client per transport (connection reuse across retries
    * and events); per-request timeout bounds a single attempt so the
    * publisher's overall `maxTimeMillis` budget stays in charge of the
    * total.
    */
  def httpTransport(url: String,
      attemptTimeoutMillis: Long = 2000L): String => Unit = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(attemptTimeoutMillis))
      .build()
    val uri = java.net.URI.create(url)
    body => {
      val req = java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofMillis(attemptTimeoutMillis))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"webhook POST to $url returned HTTP ${resp.statusCode()}")
    }
  }

  /** A ready-to-attach publisher over [[httpTransport]] with the
    * reference's shipped retry/budget defaults (00-webhook:14–15).
    */
  def http(url: String): WebhookPublisher =
    new WebhookPublisher(httpTransport(url))
}
