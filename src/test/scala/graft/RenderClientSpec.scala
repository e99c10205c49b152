package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PlaywrightRenderClient
import graft.sources.PlaywrightRenderClient._

/** Round-3 ask #7: the browser-backed render client ships as a drop-in
  * file. The live WebSocket path needs a browser (cluster-only); the pure
  * CDP codec and the sandbox refusal gate are covered here. */
class RenderClientSpec extends AnyFunSuite {

  test("refuses construction without a browser endpoint, with guidance") {
    val e = intercept[IllegalArgumentException] {
      new PlaywrightRenderClient(cdpWsUrl = "")
    }
    assert(e.getMessage.contains("GRAFT_CDP_WS"))
    assert(e.getMessage.contains("remote-debugging-port"))
  }

  test("command framing: id + method + params, sessionId only when routed") {
    val top = frameCommand(1L, "Target.createTarget",
      obj("url" -> "about:blank"), None)
    assert(top ==
      """{"id":1,"method":"Target.createTarget","params":{"url":"about:blank"}}""")
    val routed = frameCommand(7L, "Page.navigate",
      obj("url" -> "https://x.test/"), Some("SESS1"))
    assert(routed ==
      """{"id":7,"method":"Page.navigate","params":{"url":"https://x.test/"},"sessionId":"SESS1"}""")
    val flags = frameCommand(2L, "Target.attachToTarget",
      obj("targetId" -> "T1", "flatten" -> true), None)
    assert(flags.contains(""""flatten":true"""))
  }

  test("frame classification: results, errors, events") {
    classify("""{"id":3,"result":{"targetId":"T9"}}""") match {
      case CdpResult(3L, r) => assert(r.get("targetId").asText() == "T9")
      case other => fail(s"unexpected: $other")
    }
    classify("""{"id":4,"error":{"code":-32601,"message":"no such method"}}""") match {
      case CdpError(4L, msg) => assert(msg == "no such method")
      case other => fail(s"unexpected: $other")
    }
    classify(
      """{"method":"Page.loadEventFired","sessionId":"S2","params":{"timestamp":1.5}}""") match {
      case CdpEvent("Page.loadEventFired", Some("S2"), p) =>
        assert(p.get("timestamp").asDouble() == 1.5)
      case other => fail(s"unexpected: $other")
    }
    // browser-level events carry no sessionId
    classify("""{"method":"Target.targetCrashed","params":{}}""") match {
      case CdpEvent("Target.targetCrashed", None, _) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("F6 gate runs before any connection attempt") {
    // an SSRF-rejected URL must return None without touching the (absent)
    // browser — the validator runs before the WebSocket dial
    val client = new PlaywrightRenderClient(
      cdpWsUrl = "ws://browser.invalid:9222/devtools/browser/x",
      validate = _ => false)
    assert(client.render("http://169.254.169.254/latest/meta-data",
      (_, _) => None).isEmpty)
  }

  // ---- live WebSocket path against a scripted CDP endpoint ----
  // No browser ships in this container, but RFC-6455 framing and the
  // flattened-session CDP walk are pure JVM — a minimal scripted server
  // exercises the client's REAL connection/protocol code end-to-end.

  private val bigMain = "<html><body><main>" + ("r" * 300) + "</main></body></html>"

  test("live protocol walk: render over a real WebSocket returns the page HTML") {
    val browser = new FakeCdpBrowser(html = bigMain)
    try {
      val client = new PlaywrightRenderClient(cdpWsUrl = browser.wsUrl,
        navTimeoutMs = 10000, settleMs = 10, validate = _ => true)
      val got = client.render("http://site.test/page", (_, _) => None)
      assert(got.exists { case (st, ct, body) =>
        st == 200 && ct == "text/html" && body.contains("r" * 300) })
      // PagePool analog: further renders — even from a second client with
      // the same endpoint config — multiplex over the ONE pooled socket
      assert(client.render("http://site.test/two", (_, _) => None).nonEmpty)
      val client2 = new PlaywrightRenderClient(cdpWsUrl = browser.wsUrl,
        navTimeoutMs = 10000, settleMs = 10, validate = _ => true)
      assert(client2.render("http://site.test/three", (_, _) => None).nonEmpty)
      assert(browser.connectionsAccepted.get == 1,
        s"expected one pooled connection, got ${browser.connectionsAccepted.get}")
      // each render opened and closed its own tab on the shared socket
      assert(browser.targetsClosed.get == 3)
    } finally browser.close()
  }

  test("live path: a redirect landing that fails F6 discards the render") {
    val browser = new FakeCdpBrowser(html = bigMain,
      landingUrl = _ => "http://169.254.169.254/latest")
    try {
      val client = new PlaywrightRenderClient(cdpWsUrl = browser.wsUrl,
        navTimeoutMs = 10000, settleMs = 10,
        validate = u => !u.contains("169.254"))
      assert(client.render("http://ok.test/", (_, _) => None).isEmpty)
    } finally browser.close()
  }

  test("live path: browser death mid-render fails fast, not a full-timeout stall") {
    val browser = new FakeCdpBrowser(html = bigMain, dieAfterNavigate = true)
    try {
      val client = new PlaywrightRenderClient(cdpWsUrl = browser.wsUrl,
        navTimeoutMs = 30000, settleMs = 10, validate = _ => true,
        pingIntervalMs = 200) // fast keepalive so death detection is quick
      val t0 = System.nanoTime()
      intercept[Exception](client.render("http://x.test/", (_, _) => None))
      val ms = (System.nanoTime() - t0) / 1e6
      // markDead releases the load latch and fails pending calls — without
      // it this render would block the full 30 s navTimeout
      assert(ms < 15000, s"dead connection must fail fast, took $ms ms")
      // the pool replaces the dead entry: a fresh render dials anew
      val before = browser.connectionsAccepted.get
      intercept[Exception](client.render("http://x.test/2", (_, _) => None))
      assert(browser.connectionsAccepted.get == before + 1,
        "a dead pooled connection must be re-dialed, not reused")
    } finally browser.close()
  }
}

/** A minimal RFC-6455 WebSocket server speaking just enough CDP for the
  * client's documented 7-step walk: handshake (Sec-WebSocket-Accept),
  * masked client frames, Target.create/attach, Page.enable/navigate +
  * loadEventFired, Runtime.evaluate (location.href / outerHTML),
  * Target.closeTarget. Scripted failure mode: close the TCP socket right
  * after acknowledging navigate. */
private final class FakeCdpBrowser(
    html: String,
    landingUrl: String => String = identity,
    dieAfterNavigate: Boolean = false) {
  import java.io.{DataInputStream, OutputStream}
  import java.nio.charset.StandardCharsets.UTF_8
  import PlaywrightRenderClient.mapper

  private val server = new java.net.ServerSocket(
    0, 8, java.net.InetAddress.getLoopbackAddress)
  val connectionsAccepted = new java.util.concurrent.atomic.AtomicInteger(0)
  val targetsClosed = new java.util.concurrent.atomic.AtomicInteger(0)

  def wsUrl: String =
    s"ws://127.0.0.1:${server.getLocalPort}/devtools/browser/fake"
  def close(): Unit = server.close()

  private val acceptor = new Thread(() => {
    try while (true) {
      val sock = server.accept()
      connectionsAccepted.incrementAndGet()
      val t = new Thread(() => try serve(sock) catch { case _: Exception => () })
      t.setDaemon(true); t.start()
    } catch { case _: Exception => () } // server closed
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: java.net.Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = sock.getOutputStream
    handshake(in, out)
    var navigated = ""
    var open = true
    while (open) readFrame(in) match {
      case None => open = false
      case Some((0x8, _)) => // close: echo and drop
        out.write(Array(0x88.toByte, 0x00.toByte)); out.flush(); open = false
      case Some((0x9, p)) => // ping → pong
        writeFrame(out, 0xA, p)
      case Some((0x1, payload)) =>
        val n = mapper.readTree(new String(payload, UTF_8))
        val id = n.get("id").asLong()
        def reply(result: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
          val o = mapper.createObjectNode()
          o.put("id", id)
          o.set[com.fasterxml.jackson.databind.node.ObjectNode]("result", result)
          writeFrame(out, 0x1, mapper.writeValueAsString(o).getBytes(UTF_8))
        }
        n.get("method").asText() match {
          case "Target.createTarget" =>
            reply(PlaywrightRenderClient.obj("targetId" -> "T1"))
          case "Target.attachToTarget" =>
            reply(PlaywrightRenderClient.obj("sessionId" -> "S1"))
          case "Page.enable" => reply(mapper.createObjectNode())
          case "Page.navigate" =>
            navigated = landingUrl(n.path("params").path("url").asText())
            reply(mapper.createObjectNode())
            if (dieAfterNavigate) { sock.close(); open = false }
            else writeFrame(out, 0x1,
              """{"method":"Page.loadEventFired","sessionId":"S1","params":{}}"""
                .getBytes(UTF_8))
          case "Runtime.evaluate" =>
            val expr = n.path("params").path("expression").asText()
            val value = if (expr.contains("location")) navigated else html
            val inner = mapper.createObjectNode()
            inner.set[com.fasterxml.jackson.databind.node.ObjectNode]("result",
              PlaywrightRenderClient.obj("value" -> value))
            reply(inner)
          case "Target.closeTarget" =>
            targetsClosed.incrementAndGet()
            reply(mapper.createObjectNode())
          case other =>
            val o = mapper.createObjectNode()
            o.put("id", id)
            o.set[com.fasterxml.jackson.databind.node.ObjectNode]("error",
              PlaywrightRenderClient.obj("message" -> s"unknown method $other"))
            writeFrame(out, 0x1, mapper.writeValueAsString(o).getBytes(UTF_8))
        }
      case Some(_) => () // ignore other opcodes
    }
  }

  private def handshake(in: DataInputStream, out: OutputStream): Unit = {
    val req = new StringBuilder
    while (!req.endsWith("\r\n\r\n")) req.append(in.read().toChar)
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(sys.error("no Sec-WebSocket-Key"))
    val accept = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }

  /** (opcode, unmasked payload); None on EOF. Client frames are masked. */
  private def readFrame(in: DataInputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read(); if (b0 < 0) return None
    val b1 = in.read(); if (b1 < 0) return None
    val opcode = b0 & 0x0f
    val masked = (b1 & 0x80) != 0
    var len: Long = (b1 & 0x7f).toLong
    if (len == 126) len = ((in.read() & 0xff) << 8 | (in.read() & 0xff)).toLong
    else if (len == 127) len = in.readLong()
    val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) payload.indices.foreach(i =>
      payload(i) = (payload(i) ^ mask(i % 4)).toByte)
    Some((opcode, payload))
  }

  /** Server frames are unmasked; single unfragmented frame. */
  private def writeFrame(out: OutputStream, opcode: Int,
      payload: Array[Byte]): Unit = out.synchronized {
    out.write(0x80 | opcode)
    if (payload.length < 126) out.write(payload.length)
    else { out.write(126); out.write(payload.length >> 8); out.write(payload.length & 0xff) }
    out.write(payload)
    out.flush()
  }
}
