package graft

import graft.sources.PlaywrightRenderClient

/** A minimal RFC-6455 WebSocket server speaking just enough CDP for the
  * client's documented 7-step walk: handshake (Sec-WebSocket-Accept),
  * masked client frames, Target.create/attach, Page.enable/navigate +
  * loadEventFired, Runtime.evaluate (location.href / outerHTML),
  * Target.closeTarget. Scripted failure mode: close the TCP socket right
  * after acknowledging navigate. */
final class FakeCdpBrowser(
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
