package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.epoch.CrawlEngine
import graft.model.CrawlConfig
import graft.operators.Ssrf
import graft.sources.{BootstrapFetch, HttpFetcher, ParquetSnapshotTableIO, Sitemaps}

/** End-to-end integration over the REAL transport: BootstrapFetch loads
  * robots.txt (+ its Sitemap: directive) over HTTP, the engine discovers
  * via BFS or the sitemap cascade, and the fetch phase runs the 5-level
  * chain — native markdown, fast path, blocked detection, content dedup,
  * robots denial, and image ref extraction + J7 validation all against an
  * in-process HTTP site. This is the "a user of the reference could switch"
  * gate with no fixture transport anywhere. */
class EngineHttpE2ESpec extends SparkSpec {
  import spark.implicits._

  private val allowLoopback: String => Boolean =
    u => Ssrf.hostname(u) == "127.0.0.1" || !Ssrf.isSsrf(u)

  private def handler(status: Int, ctype: String, body: Array[Byte]): HttpHandler =
    (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Content-Type", ctype)
      ex.sendResponseHeaders(status, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    }
  private def html(status: Int, body: String): HttpHandler =
    handler(status, "text/html", body.getBytes("UTF-8"))

  private def bigHtml(marker: String, extra: String = ""): String = {
    val para = s"<p>${s"$marker documentation prose with plenty of words. " * 5}</p>"
    s"<html><body><h1>$marker</h1>${para * 5}$extra</body></html>"
  }

  private def fetcher() = new HttpFetcher(maxRetries = 1, timeoutMs = 3000,
    backoffUnitMs = 0L, validate = allowLoopback)

  test("E2E BFS: chain methods, robots denial, dedup, blocked, images — real HTTP") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    val base = s"http://127.0.0.1:$port"
    val host = s"127.0.0.1:$port"
    server.createContext("/robots.txt", handler(200, "text/plain",
      "User-agent: *\nDisallow: /docs/private/\n".getBytes("UTF-8")))
    server.createContext("/docs", html(200, bigHtml("seed",
      s"""<a href="$base/docs/a">a</a><a href="/docs/b">b</a>
         |<a href="/docs/dup">dup</a><a href="/docs/private/x">p</a>
         |<a href="/docs/blocked">bl</a>
         |<img src="img-00000002"/><img src='img-00000003'/>""".stripMargin)))
    server.createContext("/docs/a", (ex: HttpExchange) => {
      val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
      if (accept.contains("text/markdown"))
        handler(200, "text/markdown", "# A\n\nnative markdown body".getBytes("UTF-8")).handle(ex)
      else html(200, bigHtml("a-as-html")).handle(ex)
    })
    server.createContext("/docs/b", html(200,
      bigHtml("bee", "<img src=\"img-00000004\"/>")))
    server.createContext("/docs/dup", html(200,
      bigHtml("bee", "<img src=\"img-00000004\"/>"))) // same markdown → dup
    server.createContext("/docs/blocked", html(200,
      bigHtml("blocked", "<p>Checking your browser before accessing.</p>" +
        "<p>Cloudflare Ray ID: abc123</p>")))
    server.createContext("/docs/private/x", html(200, bigHtml("private")))
    server.start()
    try {
      val seeds = Map(host -> s"$base/docs")
      val policies = BootstrapFetch.robotsPolicies(seeds, validate = allowLoopback)
      assert(policies(host).disallowed == Vector("/docs/private/"))
      val cfg = CrawlConfig(seedUrls = Seq(s"$base/docs"), maxDepth = 3)
      val tableIo = new ParquetSnapshotTableIO(
        spark, Files.createTempDirectory("graft-e2e").toString)
      val engine = new CrawlEngine(spark, cfg, fetcher(),
        graft.fixtures.FixtureGen.imagesDF(spark, 6L), tableIo,
        policies, ssrfCheck = allowLoopback)
      engine.run()

      val disp = engine.orderLog.select("urlNorm", "disposition", "fetchMethod")
        .as[(String, String, String)].collect()
        .map(t => t._1.stripPrefix(base) -> ((t._2, t._3))).toMap
      assert(disp("/docs") == (("ok", "http_fast")))
      assert(disp("/docs/a") == (("ok", "native")))
      assert(disp("/docs/b") == (("ok", "http_fast")))
      assert(disp("/docs/dup")._1 == "skipped") // same content hash as /docs/b
      assert(disp("/docs/blocked")._1 == "blocked")
      assert(!disp.contains("/docs/private/x")) // robots-denied before dispatch
      // discovery saw the private URL (robots applies at admission, not BFS)
      assert(engine.seen.where($"urlNorm" === s"$base/docs/private/x").count() == 1)
      // J7: the three image refs extracted from real <img> tags, all valid
      val imgs = engine.fetched.select("image_id").as[String].collect().toSet
      assert(imgs == Set("img-00000002", "img-00000003", "img-00000004"))
      assert(engine.table("ledger").isDefined)
      assert(tableIo.lastCounters.getOrElse("invalid_rows", -1L) == 0L) // J7 green
    } finally server.stop(0)
  }

  test("E2E sitemap cascade: robots 'Sitemap:' directive drives discovery — real HTTP") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    val base = s"http://127.0.0.1:$port"
    val host = s"127.0.0.1:$port"
    // NO /sitemap.xml at the standard location — only the robots directive
    server.createContext("/robots.txt", handler(200, "text/plain",
      s"User-agent: *\nSitemap: $base/maps/main.xml\n".getBytes("UTF-8")))
    server.createContext("/maps/main.xml", handler(200, "application/xml",
      (s"""<?xml version="1.0" encoding="UTF-8"?>
          |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          |<url><loc>$base/docs/s1</loc></url>
          |<url><loc>$base/docs/s2</loc></url>
          |<url><loc>$base/outside/x</loc></url>
          |</urlset>""".stripMargin).getBytes("UTF-8")))
    server.createContext("/docs/s1", html(200, bigHtml("esse-one")))
    server.createContext("/docs/s2", html(200, bigHtml("esse-two")))
    server.start()
    try {
      val seeds = Map(host -> s"$base/docs")
      val policies = BootstrapFetch.robotsPolicies(seeds, validate = allowLoopback)
      assert(policies(host).sitemaps == Vector(s"$base/maps/main.xml"))
      val bodies = BootstrapFetch.sitemapBodies(seeds, policies, validate = allowLoopback)
      assert(bodies.map(_._1) == Seq(s"$base/maps/main.xml")) // standard roots 404'd
      val cfg = CrawlConfig(seedUrls = Seq(s"$base/docs"), maxDepth = 3)
      // the one-call facade: bootstrap fetches + transport + tables wired
      val engine = graft.Crawl.run(spark, cfg,
        Files.createTempDirectory("graft-e2e-sm").toString,
        graft.fixtures.FixtureGen.imagesDF(spark, 2L),
        fetcher = Some(fetcher()), ssrfCheck = allowLoopback)
      // sitemap cascade: seen = in-scope sitemap entries only (BFS skipped)
      val seen = engine.seen.select("urlNorm").as[String].collect().toSet
      assert(seen == Set(s"$base/docs/s1", s"$base/docs/s2"))
      val disp = engine.orderLog.select("urlNorm", "disposition")
        .as[(String, String)].collect().toMap
      assert(disp == Map(s"$base/docs/s1" -> "ok", s"$base/docs/s2" -> "ok"))
      // post-scrape pipeline (Crawl facade default): every ok page chunked
      // + classified into the committed `chunks` table (runner.py:543-620)
      val chunks = engine.table("chunks").get
      assert(chunks.columns.toSet == Set("url", "chunk_idx", "level", "chunk"))
      val chunkUrls = chunks.select("url").distinct().as[String].collect().toSet
      assert(chunkUrls == Set(s"$base/docs/s1", s"$base/docs/s2"))
      assert(chunks.select("level").as[String].collect()
        .forall(Set("skip", "cleanup", "heavy")))
    } finally server.stop(0)
  }

  test("E2E nav cascade: JS-rendered nav discovered through an injected renderer") {
    // the seed's STATIC html has no nav element (its only static link is a
    // BFS decoy); the injected browser renders a JS-built nav. Reference
    // parity (discovery.py try_nav_parse = always Playwright): the nav
    // cascade must discover the RENDERED nav links, skip BFS entirely,
    // and the fetch phase then scrapes those pages over plain HTTP.
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    val base = s"http://127.0.0.1:$port"
    val host = s"127.0.0.1:$port"
    server.createContext("/robots.txt", handler(200, "text/plain",
      "User-agent: *\n".getBytes("UTF-8")))
    server.createContext("/docs", html(200,
      bigHtml("seed", s"""<a href="/docs/bfs-decoy">d</a>""")))
    server.createContext("/docs/bfs-decoy", html(200, bigHtml("decoy")))
    server.createContext("/docs/js1", html(200, bigHtml("one")))
    server.createContext("/docs/js2", html(200, bigHtml("two")))
    server.start()
    val renderedNav =
      "<html><body><h1>App</h1><nav><a href='/docs/js1'>1</a>" +
        "<a href='/docs/js2'>2</a></nav></body></html>"
    val browserBacked = new graft.sources.RenderClient {
      override def render(url: String, get: graft.sources.RenderClient.Get)
          : Option[(Int, String, String)] =
        Some((200, "text/html", renderedNav))
    }
    try {
      val seeds = Map(host -> s"$base/docs")
      val policies = graft.sources.BootstrapFetch.robotsPolicies(
        seeds, validate = allowLoopback)
      val cfg = CrawlConfig(seedUrls = Seq(s"$base/docs"), maxDepth = 3)
      val tableIo = new ParquetSnapshotTableIO(
        spark, Files.createTempDirectory("graft-e2e-nav").toString)
      val engine = new CrawlEngine(spark, cfg,
        new HttpFetcher(maxRetries = 1, timeoutMs = 3000, backoffUnitMs = 0L,
          validate = allowLoopback, renderer = browserBacked),
        graft.fixtures.FixtureGen.imagesDF(spark, 2L), tableIo,
        policies, ssrfCheck = allowLoopback)
      engine.run()

      // discovered set = the rendered nav links ONLY: no static-link BFS
      // expansion (nav success skips strategy 3), no seed page
      val seen = engine.seen.select("urlNorm").as[String].collect().toSet
      assert(seen == Set(s"$base/docs/js1", s"$base/docs/js2"))
      val disp = engine.orderLog.select("urlNorm", "disposition", "fetchMethod")
        .as[(String, String, String)].collect()
        .map(t => t._1.stripPrefix(base) -> ((t._2, t._3))).toMap
      // the scrape itself stays on the static chain (http_fast wins here)
      assert(disp == Map("/docs/js1" -> (("ok", "http_fast")),
        "/docs/js2" -> (("ok", "http_fast"))))
    } finally server.stop(0)
  }
}
