package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.sources.HttpFetcher

/** Exercises the REAL transport (pooled java.net.http client, retry loop,
  * content-type gating, href + nav-scoped extraction) against a local
  * in-process HTTP server — no egress. */
class HttpFetcherSpec extends SparkSpec {
  import spark.implicits._

  private def handler(status: Int, ctype: String, body: String): HttpHandler =
    (ex: HttpExchange) => {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", ctype)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

  test("HttpFetcher against a local server: statuses, links, nav scope, misses") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    val base = s"http://127.0.0.1:$port"
    server.createContext("/docs", handler(200, "text/html",
      s"""<html><nav><a href="$base/docs/a">A</a><a href="/docs/b">B</a></nav>
         |<body><a href="$base/docs/c">C</a><a href="mailto:x@y">m</a></body></html>"""
        .stripMargin))
    server.createContext("/docs/a", handler(200, "text/html", "<html>leaf</html>"))
    server.createContext("/bin", handler(200, "application/pdf", "%PDF-1.4"))
    server.createContext("/err", handler(500, "text/html", "boom"))
    server.start()
    try {
      val urls = Seq(
        (s"$base/docs", "127.0.0.1"),
        (s"$base/docs/a", "127.0.0.1"),
        (s"$base/bin", "127.0.0.1"),
        (s"$base/err", "127.0.0.1"),
        (s"$base/missing", "127.0.0.1")).toDF("urlNorm", "host")
      val got = new HttpFetcher(maxRetries = 1, timeoutMs = 3000)
        .fetchPages(urls)
        .select("urlNorm", "status", "contentType", "links", "navLinks")
        .collect().map(r => r.getString(0) ->
          ((r.getInt(1), r.getString(2), r.getSeq[String](3), r.getSeq[String](4))))
        .toMap
      val (st, ct, links, nav) = got(s"$base/docs")
      assert(st == 200 && ct.contains("text/html"))
      assert(links.toSet == Set(s"$base/docs/a", "/docs/b", s"$base/docs/c", "mailto:x@y"))
      assert(nav.toSet == Set(s"$base/docs/a", "/docs/b")) // nav-scoped only
      assert(got(s"$base/docs/a")._1 == 200)
      assert(got(s"$base/bin")._1 == 200 && got(s"$base/bin")._3.isEmpty) // non-html: no links
      assert(got(s"$base/err")._1 == 500)
      assert(got(s"$base/missing")._1 == 404)
    } finally server.stop(0)
  }
}
