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
