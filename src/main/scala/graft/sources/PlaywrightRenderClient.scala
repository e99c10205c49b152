package graft.sources

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.time.Duration
import java.util.concurrent.{CompletionStage, ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}

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
    validate: String => Boolean = u => !graft.operators.Ssrf.isSsrfResolving(u),
    /** keepalive cadence on the pooled connection. The JDK WebSocket does
      * NOT reliably surface an abrupt peer close on a socket that has
      * already carried traffic (verified empirically: no onClose/onError
      * after the peer's FIN) — so death of an idle-but-awaited connection
      * would only be noticed at the next send. The ping provokes an RST
      * from a dead peer, which DOES surface and marks the connection dead,
      * releasing every render blocked on it. */
    pingIntervalMs: Long = 5000L)
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
  // pool key includes the timeouts: two clients configured differently
  // must not silently share whichever connection was dialed first
  private def poolKey: String = s"$cdpWsUrl#$navTimeoutMs#$pingIntervalMs"

  private def connection(): CdpConnection =
    connectionPool.compute(poolKey, (_, existing) =>
      // a connection that died (browser restart, crash — detected by the
      // keepalive ping or a failed send) is replaced on next use instead
      // of handing out a socket that can only time out
      if (existing == null || existing.isDead)
        new CdpConnection(cdpWsUrl, navTimeoutMs, pingIntervalMs)
      else existing)

  private def invalidate(c: CdpConnection): Unit = {
    connectionPool.remove(poolKey, c)
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
    } catch { case e: Throwable =>
      // invalidate ONLY on connection-level failure: the pool is shared
      // by every render on the executor, and closing it for one page's
      // CDP error or slow evaluate (a healthy connection!) would markDead
      // all other in-flight renders and stampede-redial. Connection death
      // is what the keepalive ping + markDead detect.
      if (conn.isDead || isConnectionFailure(e)) invalidate(conn)
      throw e
    }
  }

  private def evalString(conn: CdpConnection, sessionId: String,
      expression: String): String =
    conn.call("Runtime.evaluate",
        obj("expression" -> expression, "returnByValue" -> true), sessionId)
      .path("result").path("value").asText("")
}

object PlaywrightRenderClient {
  private[graft] val mapper = new ObjectMapper()

  /** Transport-level failure (socket/IO anywhere in the cause chain) vs a
    * per-command outcome on a healthy connection (CdpError → plain
    * RuntimeException; one slow page's evaluate → TimeoutException). */
  private def isConnectionFailure(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(_.isInstanceOf[java.io.IOException])

  /** JVM-wide (= per-executor) connection pool, keyed by CDP endpoint. */
  private val connectionPool = new ConcurrentHashMap[String, CdpConnection]()

  /** One shared daemon thread drives every pooled connection's keepalive
    * ping (pings are microsecond sends; a thread per connection would be
    * waste). */
  private val pinger = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-cdp-ping"); t.setDaemon(true); t
  })

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
  private final class CdpConnection(wsUrl: String, timeoutMs: Long,
      pingIntervalMs: Long = 5000L) {
    private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)
    private val pending = new ConcurrentHashMap[Long, java.util.concurrent.CompletableFuture[JsonNode]]()
    private val eventLatches = new ConcurrentHashMap[(String, String), CountDownLatch]()
    private val buf = new StringBuilder

    @volatile private var deadFlag = false

    /** Set once the socket errors or the peer closes it; the pool replaces
      * dead entries on next use. */
    def isDead: Boolean = deadFlag

    /** Fail fast on connection death: without this, every OTHER render
      * in flight on the shared connection would block its full timeout on
      * a response/event that can never arrive (one bad render would turn
      * into a stall burst across the executor). Pending calls get the
      * failure immediately; awaited latches are released so their renders
      * proceed into a call() that fails fast on the dead check. */
    private def markDead(cause: Throwable): Unit = {
      deadFlag = true
      if (pingTask != null) pingTask.cancel(false)
      val why = new java.io.IOException(s"CDP connection lost: ${cause.getMessage}", cause)
      pending.keySet().forEach { id =>
        Option(pending.remove(id)).foreach(_.completeExceptionally(why))
      }
      eventLatches.keySet().forEach { k =>
        Option(eventLatches.remove(k)).foreach(_.countDown())
      }
    }

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
      override def onError(ws: WebSocket, error: Throwable): Unit =
        markDead(error)
      override def onClose(ws: WebSocket, statusCode: Int,
          reason: String): CompletionStage[_] = {
        markDead(new java.io.IOException(s"peer closed ($statusCode $reason)"))
        null
      }
    }

    private val ws: WebSocket = HttpClient.newHttpClient().newWebSocketBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .buildAsync(URI.create(wsUrl), listener)
      .get(timeoutMs, TimeUnit.MILLISECONDS)
    startPing()

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

    /** Sequences every outgoing message — the JDK WebSocket forbids
      * overlapping sends (IllegalStateException), and the connection is
      * shared by concurrent renders (plus the keepalive ping). Each sender
      * waits (bounded by timeoutMs) on a turn marker the PREVIOUS sender
      * completes even when its own send failed — not on a monitor held
      * across a blocking get, which would queue N callers for up to
      * N×timeoutMs. Responses multiplex by id, so calls still overlap on
      * the wire. */
    private val sendLock = new Object
    private var lastSend: java.util.concurrent.CompletableFuture[Void] =
      java.util.concurrent.CompletableFuture.completedFuture(null.asInstanceOf[Void])

    private def sequencedSend(send: () => java.util.concurrent.Future[WebSocket]): Unit = {
      val myTurn = new java.util.concurrent.CompletableFuture[Void]()
      val prevTurn = sendLock.synchronized {
        val p = lastSend; lastSend = myTurn; p
      }
      try {
        prevTurn.get(timeoutMs, TimeUnit.MILLISECONDS) // bounded turn wait
        send().get(timeoutMs, TimeUnit.MILLISECONDS)
      } finally myTurn.complete(null) // release the next sender even on failure
    }

    def call(method: String, params: ObjectNode,
        sessionId: String = null): JsonNode = {
      if (deadFlag) // fail fast: a response on a dead socket can never arrive
        throw new java.io.IOException("CDP connection lost (marked dead)")
      val id = nextId.incrementAndGet()
      val fut = new java.util.concurrent.CompletableFuture[JsonNode]()
      pending.put(id, fut)
      try {
        val frame = frameCommand(id, method, params, Option(sessionId))
        sequencedSend(() => ws.sendText(frame, true))
        fut.get(timeoutMs, TimeUnit.MILLISECONDS)
      } finally pending.remove(id) // no entry leak on timeout/failure
    }

    /** Active liveness: the JDK WebSocket does not reliably deliver
      * onClose/onError for an abrupt peer close once the socket has
      * carried traffic (verified empirically — the FIN sits unobserved),
      * so a render awaiting `Page.loadEventFired` on a dead browser
      * would block its full navTimeout. A periodic ping forces the
      * failure out: pinging a closed peer draws an RST, the send or the
      * listener errors, and markDead releases everyone immediately. */
    @volatile private var pingTask: java.util.concurrent.ScheduledFuture[_] = _

    private def startPing(): Unit = {
      pingTask = pinger.scheduleWithFixedDelay(() => {
        try {
          if (!deadFlag)
            sequencedSend(() => ws.sendPing(java.nio.ByteBuffer.allocate(0)))
        } catch { case e: Exception => markDead(e) }
      }, pingIntervalMs, pingIntervalMs, TimeUnit.MILLISECONDS)
    }

    def close(): Unit = {
      // invalidation by one failing render must not leave the OTHER
      // in-flight renders blocking their full timeout on this socket
      markDead(new java.io.IOException("connection invalidated"))
      try ws.sendClose(WebSocket.NORMAL_CLOSURE, "done")
        .get(1, TimeUnit.SECONDS)
      catch { case _: Exception => ws.abort() }
    }
  }
}
