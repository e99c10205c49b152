package graft.tools

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CompletionStage, TimeUnit}

/** Scratch probe: what does the JDK WebSocket listener see when the server
  * closes the TCP socket abruptly (no Close frame)? Run with
  * `Test/runMain graft.tools.WsCloseProbe`. */
object WsCloseProbe {
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
      println("SERVER: handshake done, sleeping 500ms then abrupt close")
      Thread.sleep(500)
      sock.close()
      println("SERVER: closed")
    })
    t.setDaemon(true); t.start()

    val listener = new WebSocket.Listener {
      override def onOpen(ws: WebSocket): Unit = {
        println("CLIENT: onOpen"); ws.request(1)
      }
      override def onText(ws: WebSocket, data: CharSequence, last: Boolean): CompletionStage[_] = {
        println(s"CLIENT: onText $data"); ws.request(1); null
      }
      override def onError(ws: WebSocket, error: Throwable): Unit =
        println(s"CLIENT: onError ${error.getClass.getName}: ${error.getMessage}")
      override def onClose(ws: WebSocket, code: Int, reason: String): CompletionStage[_] = {
        println(s"CLIENT: onClose $code '$reason'"); null
      }
    }
    val ws = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://127.0.0.1:${server.getLocalPort}/x"), listener)
      .get(5, TimeUnit.SECONDS)
    println("CLIENT: connected; waiting 3s for events")
    Thread.sleep(3000)
    println(s"CLIENT: isInputClosed=${ws.isInputClosed} isOutputClosed=${ws.isOutputClosed}")
    println("PROBE_DONE")
  }
}
