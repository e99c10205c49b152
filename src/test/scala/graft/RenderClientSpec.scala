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
}
