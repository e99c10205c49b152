package graft.sources

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.time.Duration
import java.util.concurrent.{CompletionStage, ConcurrentHashMap, CountDownLatch, TimeUnit}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** S8 drop-in: a browser-backed [[RenderClient]] speaking the Chrome
  * DevTools Protocol over its WebSocket endpoint — the same rendering class
  * as the reference's Playwright page fetch (`src/scraper/page.py:247-284`;
  * Playwright itself drives Chromium over CDP). Uses ONLY what already
  * ships on the Spark classpath: JDK `java.net.http.WebSocket` + Jackson.
  *
  * Deployment: start Chromium with `--headless --remote-debugging-port=9222`
  * on (or reachable from) each executor, set `GRAFT_CDP_WS` to the
  * browser's DevTools WebSocket URL (the `webSocketDebuggerUrl` field of
  * `http://host:9222/json/version`), and inject
  * `new PlaywrightRenderClient()` as the chain's `renderer`. Construction
  * is env-gated like [[IcebergTableIO]] is classpath-gated: in a sandbox
  * without a browser it refuses with guidance instead of failing mid-crawl.
  *
  * Protocol walk per rendered page (flattened-session CDP, documented so a
  * cluster operator can audit it against the browser they deploy):
  *   1. `Target.createTarget {url:"about:blank"}`     → targetId
  *   2. `Target.attachToTarget {targetId, flatten:true}` → sessionId
  *   3. `Page.enable` (session)
  *   4. `Page.navigate {url}` (session)
  *   5. wait for the `Page.loadEventFired` event (session, ≤ navTimeoutMs)
  *      + `settleMs` grace for late JS (the reference's networkidle analog)
  *   6. `Runtime.evaluate {expression:
  *      "document.documentElement.outerHTML"}` (session) → html
  *   7. `Target.closeTarget {targetId}`
  *
  * F6 stays intact: the chain's DNS-resolving SSRF validator is consulted
  * BEFORE the browser navigates (the browser resolves names itself, so the
  * per-request transport gate cannot cover it — same placement as the
  * reference's pre-navigation check, `page.py:25,58,85`). Redirect targets
  * are re-checked after the fact via the final `document.location` and the
  * render is DISCARDED if the landing host fails validation.
  */
final class PlaywrightRenderClient(
    cdpWsUrl: String = sys.env.getOrElse("GRAFT_CDP_WS", ""),
    navTimeoutMs: Long = 15000L,
    settleMs: Long = 250L,
    validate: String => Boolean = u => !graft.operators.Ssrf.isSsrfResolving(u))
    extends RenderClient {
  require(cdpWsUrl.nonEmpty,
    "no browser endpoint: set GRAFT_CDP_WS to the DevTools WebSocket URL " +
      "(webSocketDebuggerUrl of http://<browser-host>:9222/json/version) and " +
      "run Chromium with --headless --remote-debugging-port; in the sandbox " +
      "keep the default RenderClient.Static")

  import PlaywrightRenderClient._

  /** One WebSocket per executor JVM, shared across renders (the reference
    * pools browser pages — `page.py PagePool` — rather than dialing per
    * fetch): each render creates and closes its own CDP target (tab) on
    * the shared connection; sessions multiplex over it. The pool lives in
    * the COMPANION, keyed by endpoint — an instance field (even
    * `@transient`) would give every deserialized task closure its own
    * copy, dialing one connection per task and leaking it when the task's
    * renders all succeed. A failed render invalidates the connection; the
    * chain's retry/backoff then dials fresh. The pooled connection is
    * intentionally kept open for the life of the JVM (one socket per
    * executor). */
  private def connection(): CdpConnection =
    connectionPool.computeIfAbsent(cdpWsUrl,
      url => new CdpConnection(url, navTimeoutMs))

  private def invalidate(c: CdpConnection): Unit = {
    connectionPool.remove(cdpWsUrl, c)
    c.close()
  }

  override def render(url: String,
      get: RenderClient.Get): Option[(Int, String, String)] = {
    if (!validate(url)) return None // F6 pre-navigation gate
    val conn = connection()
    try {
      val targetId = conn.call("Target.createTarget",
        obj("url" -> "about:blank")).get("targetId").asText()
      try {
        val sessionId = conn.call("Target.attachToTarget",
          obj("targetId" -> targetId, "flatten" -> true)).get("sessionId").asText()
        conn.call("Page.enable", obj(), sessionId)
        val loaded = conn.expectEvent("Page.loadEventFired", sessionId)
        conn.call("Page.navigate", obj("url" -> url), sessionId)
        if (!loaded.await(navTimeoutMs, TimeUnit.MILLISECONDS)) {
          conn.forgetEvent("Page.loadEventFired", sessionId) // no latch leak
          return Some((504, "text/html", "")) // render timeout = failed level
        }
        Thread.sleep(settleMs)
        val landed = evalString(conn, sessionId, "document.location.href")
        if (!validate(landed)) return None // F6 on the redirect landing
        val html = evalString(conn, sessionId,
          "document.documentElement.outerHTML")
        Some((200, "text/html", html))
      } finally scala.util.Try( // a dead connection must not mask the
        conn.call("Target.closeTarget", obj("targetId" -> targetId))) // real failure
    } catch { case e: Throwable => invalidate(conn); throw e }
  }

  private def evalString(conn: CdpConnection, sessionId: String,
      expression: String): String =
    conn.call("Runtime.evaluate",
        obj("expression" -> expression, "returnByValue" -> true), sessionId)
      .path("result").path("value").asText("")
}

object PlaywrightRenderClient {
  private[graft] val mapper = new ObjectMapper()

  /** JVM-wide (= per-executor) connection pool, keyed by CDP endpoint. */
  private val connectionPool = new ConcurrentHashMap[String, CdpConnection]()

  private[graft] def obj(fields: (String, Any)*): ObjectNode = {
    val o = mapper.createObjectNode()
    fields.foreach {
      case (k, v: String) => o.put(k, v)
      case (k, v: Boolean) => o.put(k, v)
      case (k, v: Int) => o.put(k, v)
      case (k, v: Long) => o.put(k, v)
      case (k, v) => sys.error(s"unsupported CDP param type for $k: $v")
    }
    o
  }

  /** Pure command framing — unit-tested (the live WebSocket path needs a
    * browser). CDP routes a command to a page session iff `sessionId` is
    * set; top-level (browser) commands omit it. */
  private[graft] def frameCommand(id: Long, method: String,
      params: ObjectNode, sessionId: Option[String]): String = {
    val o = mapper.createObjectNode()
    o.put("id", id)
    o.put("method", method)
    o.set[ObjectNode]("params", params)
    sessionId.foreach(o.put("sessionId", _))
    mapper.writeValueAsString(o)
  }

  /** Pure response/event classification — unit-tested. A frame with an
    * `id` answers the pending call of that id ("result" on success,
    * "error" otherwise); a frame with a `method` is an event, correlated
    * by (method, sessionId). */
  sealed trait CdpFrame
  final case class CdpResult(id: Long, result: JsonNode) extends CdpFrame
  final case class CdpError(id: Long, message: String) extends CdpFrame
  final case class CdpEvent(method: String, sessionId: Option[String],
      params: JsonNode) extends CdpFrame

  private[graft] def classify(text: String): CdpFrame = {
    val n = mapper.readTree(text)
    if (n.has("id")) {
      if (n.has("error"))
        CdpError(n.get("id").asLong(), n.path("error").path("message").asText(""))
      else CdpResult(n.get("id").asLong(), n.path("result"))
    } else CdpEvent(n.path("method").asText(""),
      Option(n.get("sessionId")).map(_.asText()), n.path("params"))
  }

  /** One WebSocket to the browser; synchronous request/response with an
    * id-correlated pending map, plus latches for awaited events. */
  private final class CdpConnection(wsUrl: String, timeoutMs: Long) {
    private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)
    private val pending = new ConcurrentHashMap[Long, java.util.concurrent.CompletableFuture[JsonNode]]()
    private val eventLatches = new ConcurrentHashMap[(String, String), CountDownLatch]()
    private val buf = new StringBuilder

    private val listener = new WebSocket.Listener {
      override def onText(ws: WebSocket, data: CharSequence,
          last: Boolean): CompletionStage[_] = {
        buf.append(data)
        if (last) {
          val text = buf.toString(); buf.clear()
          classify(text) match {
            case CdpResult(id, result) =>
              Option(pending.remove(id)).foreach(_.complete(result))
            case CdpError(id, message) =>
              Option(pending.remove(id)).foreach(
                _.completeExceptionally(new RuntimeException(s"CDP error: $message")))
            case CdpEvent(method, sessionId, _) =>
              Option(eventLatches.remove((method, sessionId.getOrElse(""))))
                .foreach(_.countDown())
          }
        }
        ws.request(1)
        null
      }
    }

    private val ws: WebSocket = HttpClient.newHttpClient().newWebSocketBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .buildAsync(URI.create(wsUrl), listener)
      .get(timeoutMs, TimeUnit.MILLISECONDS)

    /** Register interest in an event BEFORE issuing the command that
      * triggers it (the load event may fire before navigate() returns). */
    def expectEvent(method: String, sessionId: String): CountDownLatch = {
      val latch = new CountDownLatch(1)
      eventLatches.put((method, sessionId), latch)
      latch
    }

    /** Drop a never-fired latch (timeout path) — the connection is shared
      * and long-lived, so abandoned latches would accumulate. */
    def forgetEvent(method: String, sessionId: String): Unit =
      eventLatches.remove((method, sessionId))

    /** Serializes ws.sendText — the JDK WebSocket forbids overlapping
      * sends (IllegalStateException), and the connection is shared by
      * concurrent renders. Only the send is locked; responses multiplex
      * by id, so calls still overlap on the wire. */
    private val sendLock = new Object

    def call(method: String, params: ObjectNode,
        sessionId: String = null): JsonNode = {
      val id = nextId.incrementAndGet()
      val fut = new java.util.concurrent.CompletableFuture[JsonNode]()
      pending.put(id, fut)
      try {
        sendLock.synchronized {
          ws.sendText(frameCommand(id, method, params, Option(sessionId)), true)
            .get(timeoutMs, TimeUnit.MILLISECONDS)
        }
        fut.get(timeoutMs, TimeUnit.MILLISECONDS)
      } finally pending.remove(id) // no entry leak on timeout/failure
    }

    def close(): Unit =
      try ws.sendClose(WebSocket.NORMAL_CLOSURE, "done")
        .get(1, TimeUnit.SECONDS)
      catch { case _: Exception => ws.abort() }
  }
}
