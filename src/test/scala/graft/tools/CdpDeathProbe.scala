package graft.tools

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CompletionStage, TimeUnit}

/** Scratch probe: replicate the FakeCdpBrowser death-after-navigate path
  * frame-by-frame and print every listener callback with timestamps. */
object CdpDeathProbe {
  def ts: String = f"${System.nanoTime() / 1e6}%.0f"
  def main(args: Array[String]): Unit = {
    val server = new java.net.ServerSocket(0, 8, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      val sock = server.accept()
      val in = new java.io.DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      val req = new StringBuilder
      while (!req.endsWith("\r\n\r\n")) req.append(in.read().toChar)
      val key = req.toString.linesIterator
        .find(_.toLowerCase.startsWith("sec-websocket-key:"))
        .map(_.split(":", 2)(1).trim).get
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
      out.flush()
      def readFrame(): Option[(Int, Array[Byte])] = {
        val b0 = in.read(); if (b0 < 0) return None
        val b1 = in.read(); if (b1 < 0) return None
        var len: Long = (b1 & 0x7f).toLong
        if (len == 126) len = ((in.read() & 0xff) << 8 | (in.read() & 0xff)).toLong
        val mask = if ((b1 & 0x80) != 0) { val m = new Array[Byte](4); in.readFully(m); m } else null
        val p = new Array[Byte](len.toInt); in.readFully(p)
        if (mask != null) p.indices.foreach(i => p(i) = (p(i) ^ mask(i % 4)).toByte)
        Some((b0 & 0x0f, p))
      }
      def writeText(s: String): Unit = {
        val p = s.getBytes(UTF_8)
        out.write(0x81)
        if (p.length < 126) out.write(p.length)
        else { out.write(126); out.write(p.length >> 8); out.write(p.length & 0xff) }
        out.write(p); out.flush()
      }
      var open = true
      var n = 0
      while (open) readFrame() match {
        case None => println(s"[${ts}] SERVER: EOF"); open = false
        case Some((0x1, payload)) =>
          n += 1
          val txt = new String(payload, UTF_8)
          println(s"[${ts}] SERVER: got $txt")
          val id = txt.split("\"id\":")(1).split("[,}]")(0)
          writeText(s"""{"id":$id,"result":{}}""")
          if (n == 2) { // pretend this was navigate: die now
            println(s"[${ts}] SERVER: abrupt close")
            sock.close(); open = false
          }
        case Some((op, _)) => println(s"[${ts}] SERVER: opcode $op")
      }
    })
    t.setDaemon(true); t.start()

    val listener = new WebSocket.Listener {
      val buf = new StringBuilder
      override def onOpen(ws: WebSocket): Unit = { println(s"[${ts}] CLIENT: onOpen"); ws.request(1) }
      override def onText(ws: WebSocket, data: CharSequence, last: Boolean): CompletionStage[_] = {
        println(s"[${ts}] CLIENT: onText $data last=$last"); ws.request(1); null
      }
      override def onError(ws: WebSocket, error: Throwable): Unit =
        println(s"[${ts}] CLIENT: onError ${error.getClass.getName}: ${error.getMessage}")
      override def onClose(ws: WebSocket, code: Int, reason: String): CompletionStage[_] = {
        println(s"[${ts}] CLIENT: onClose $code '$reason'"); null
      }
    }
    val ws = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://127.0.0.1:${server.getLocalPort}/x"), listener)
      .get(5, TimeUnit.SECONDS)
    println(s"[${ts}] CLIENT: connected")
    ws.sendText("""{"id":1,"method":"a","params":{}}""", true).get(5, TimeUnit.SECONDS)
    Thread.sleep(200)
    ws.sendText("""{"id":2,"method":"b","params":{}}""", true).get(5, TimeUnit.SECONDS)
    println(s"[${ts}] CLIENT: sent both; waiting 3s for close/error events")
    Thread.sleep(3000)
    println(s"[${ts}] CLIENT: isInputClosed=${ws.isInputClosed} isOutputClosed=${ws.isOutputClosed}")
    println("PROBE_DONE")
  }
}
