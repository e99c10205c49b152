package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.io.Source

import graft.fixtures.FixtureGen
import graft.jobs.{JobManager, JobServer}
import graft.model.CrawlConfig
import graft.sources.FixtureFetcher

/** D10 serving surface — the SSE/HTTP job API over the JobManager
  * (reference `src/api/routes.py:90-154` + `src/jobs/manager.py:89-127`),
  * driven end-to-end over real loopback HTTP. */
class JobServerSpec extends SparkSpec {

  private val params = FixtureGen.Params(hosts = 1, pagesPerHost = 12, skew = 2)
  private lazy val web = FixtureGen.webGraphDF(spark, params).cache()
  private lazy val images = FixtureGen.imagesDF(spark, params).cache()
  private lazy val policies = FixtureGen.robotsMap(params)

  private def newServer(createLimit: Int = 10): (JobServer, JobManager, String) = {
    val root = Files.createTempDirectory("graft-http-jobs").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 2)
    val server = new JobServer(mgr, (id, req) => {
      val cfg = CrawlConfig(seedUrls = Seq(req.url), maxDepth = req.maxDepth,
        epochSeconds = 30, respectRobotsTxt = req.respectRobotsTxt)
      mgr.submit(id, cfg, images, new FixtureFetcher(web), policies)
    }, createLimitPerMinute = createLimit)
    server.start()
    (server, mgr, s"http://127.0.0.1:${server.boundPort}")
  }

  private val client = HttpClient.newHttpClient()
  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(url: String, body: String = ""): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("create → status → SSE progress stream → job_done (reference API shape)") {
    val (server, mgr, base) = newServer()
    try {
      assert(get(s"$base/api/health/ready").body().contains("ok"))

      val created = post(s"$base/api/jobs",
        """{"url":"https://site-0.test/docs","max_depth":5}""")
      assert(created.statusCode() == 200, created.body())
      val id = "\"id\":\"([^\"]+)\"".r.findFirstMatchIn(created.body()).get.group(1)

      // SSE: read the stream to terminal — progress events as commits land,
      // exactly one job_done, then the server closes the stream
      val sse = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/api/jobs/$id/events")).GET().build(),
        HttpResponse.BodyHandlers.ofInputStream())
      assert(sse.statusCode() == 200)
      assert(sse.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/event-stream"))
      val lines = Source.fromInputStream(sse.body(), "UTF-8").getLines().toList
      val eventNames = lines.filter(_.startsWith("event: ")).map(_.stripPrefix("event: "))
      assert(eventNames.count(_ == "job_done") == 1, eventNames)
      assert(eventNames.last == "job_done")
      assert(eventNames.contains("progress"), eventNames)
      val lastData = lines.filter(_.startsWith("data: ")).last
      assert(lastData.contains("\"status\":\"completed\""), lastData)

      // the stream outlives the job: status agrees, counters surfaced
      mgr.awaitAll()
      val st = get(s"$base/api/jobs/$id/status")
      assert(st.statusCode() == 200)
      assert(st.body().contains("\"status\":\"completed\""), st.body())
      assert("\"pages_completed\":(\\d+)".r.findFirstMatchIn(st.body())
        .get.group(1).toLong > 0, st.body())
      mgr.shutdown()
    } finally server.stop()
  }

  test("validation, unknown-job 404s, cancel route") {
    val (server, mgr, base) = newServer()
    try {
      // reference field bounds (models.py:19-31) → 422
      assert(post(s"$base/api/jobs", """{"max_depth":3}""").statusCode() == 422)
      assert(post(s"$base/api/jobs",
        """{"url":"ftp://x.test/"}""").statusCode() == 422)
      assert(post(s"$base/api/jobs",
        """{"url":"https://site-0.test/docs","max_depth":99}""").statusCode() == 422)
      assert(post(s"$base/api/jobs",
        """{"url":"https://site-0.test/docs","delay_ms":1}""").statusCode() == 422)
      assert(post(s"$base/api/jobs", "not json at all").statusCode() == 422)
      // fetch-chain knob validation (models.py:19-110 analogs)
      assert(post(s"$base/api/jobs",
        """{"url":"https://site-0.test/docs","markdown_proxy_url":"http://p.test/md"}""")
        .statusCode() == 422) // proxy sees every page body: HTTPS only
      assert(post(s"$base/api/jobs",
        """{"url":"https://site-0.test/docs","converter":"nope"}""").statusCode() == 422)
      assert(post(s"$base/api/jobs",
        """{"url":"https://site-0.test/docs","language":"way-too-long"}""").statusCode() == 422)
      // the stored request round-trips EVERY field, so resume-from-state
      // reconstructs the full fetch chain, not just the crawl bounds
      val full = JobServer.parseRequest(
        """{"url":"https://x.test/","max_depth":7,"delay_ms":200,
           "respect_robots_txt":false,"use_native_markdown":false,
           "markdown_proxy_url":"https://p.test/md","use_http_fast_path":false,
           "converter":"readerlm","language":"de"}""").toOption.get
      assert(JobServer.parseRequest(JobServer.requestJson(full)) == Right(full))
      // bounded body read: an oversized create is refused, not buffered
      assert(post(s"$base/api/jobs",
        "{\"url\":\"" + ("x" * (JobServer.MaxBodyBytes + 10)) + "\"}")
        .statusCode() == 413)

      assert(get(s"$base/api/jobs/nope/status").statusCode() == 404)
      assert(post(s"$base/api/jobs/nope/cancel").statusCode() == 404)
      assert(get(s"$base/api/jobs/nope/events").statusCode() == 404)
      assert(get(s"$base/api/other").statusCode() == 404)

      // cancel an accepted job through the route; terminal state via API
      val created = post(s"$base/api/jobs", """{"url":"https://site-0.test/docs"}""")
      val id = "\"id\":\"([^\"]+)\"".r.findFirstMatchIn(created.body()).get.group(1)
      val cancel = post(s"$base/api/jobs/$id/cancel")
      assert(cancel.statusCode() == 200)
      mgr.awaitAll()
      val st = get(s"$base/api/jobs/$id/status").body()
      assert(st.contains("\"status\":\"cancelled\"") ||
        st.contains("\"status\":\"completed\""), st) // cancel can race a fast finish

      // PR 3.1 routes: pause/resume refuse on a terminal job (409, like
      // the reference's "cannot be paused (status: …)")
      assert(post(s"$base/api/jobs/$id/pause").statusCode() == 409)
      assert(post(s"$base/api/jobs/$id/resume").statusCode() == 409)
      assert(post(s"$base/api/jobs/nope/pause").statusCode() == 404)
      assert(post(s"$base/api/jobs/nope/resume").statusCode() == 404)
      mgr.shutdown()
    } finally server.stop()
  }

  test("submitter 422 leaves no orphan state dir; invalid stored request resumes as 422, not 409") {
    val root = Files.createTempDirectory("graft-http-orphan")
    val mgr = new JobManager(spark, root.toString, maxConcurrentJobs = 2)
    val server = new JobServer(mgr, (id, req) => {
      // stands in for any engine/config-level require on a request that
      // PARSED fine (e.g. a seed the canonicalizer refuses)
      require(!req.url.contains("refused"), s"engine refuses seed ${req.url}")
      val cfg = CrawlConfig(seedUrls = Seq(req.url), maxDepth = req.maxDepth,
        epochSeconds = 30, respectRobotsTxt = req.respectRobotsTxt)
      mgr.submit(id, cfg, images, new FixtureFetcher(web), policies)
    })
    server.start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    def dirCount: Long = {
      val s = java.nio.file.Files.list(root)
      try s.count() finally s.close()
    }
    try {
      val before = dirCount
      val r = post(s"$base/api/jobs", """{"url":"https://refused.test/docs"}""")
      assert(r.statusCode() == 422, r.body())
      // ADVICE r4: the request must not be persisted before submitter
      // validation — sweep only walks the in-memory map, so a dir created
      // for a refused (never-mapped) job would litter the state root forever
      assert(dirCount == before, "422 create left an orphan state dir")

      // resume-from-state over a stored request that now fails the same
      // engine require: the create path's 422, not a "lost race" 409
      val dir = mgr.stateDirOf("jx")
      java.nio.file.Files.createDirectories(dir)
      new graft.sources.ParquetSnapshotTableIO(spark, dir.toString)
        .commit("fetch", 1, Map.empty)
      val req = JobServer.parseRequest(
        """{"url":"https://refused.test/docs"}""").toOption.get
      java.nio.file.Files.write(dir.resolve("request.json"),
        JobServer.requestJson(req).getBytes(UTF_8))
      val rr = post(s"$base/api/jobs/resume-from-state", """{"job_id":"jx"}""")
      assert(rr.statusCode() == 422, s"${rr.statusCode()} ${rr.body()}")
      mgr.shutdown()
    } finally server.stop()
  }

  test("admission control: create rate limit and active-jobs cap both 429") {
    // rate limit (reference @limiter.limit("10/minute") on create)
    val (server1, mgr1, base1) = newServer(createLimit = 2)
    try {
      assert(post(s"$base1/api/jobs", "{}").statusCode() == 422) // counts
      assert(post(s"$base1/api/jobs", "{}").statusCode() == 422)
      val limited = post(s"$base1/api/jobs",
        """{"url":"https://site-0.test/docs"}""")
      assert(limited.statusCode() == 429, limited.body())
      assert(limited.body().contains("rate limit"), limited.body())
      mgr1.shutdown()
    } finally server1.stop()

    // active-jobs cap (routes.py:94-99): two running jobs saturate the
    // cap-2 manager; the third create is rejected, not queued
    val (server2, mgr2, base2) = newServer()
    try {
      assert(post(s"$base2/api/jobs",
        """{"url":"https://site-0.test/docs"}""").statusCode() == 200)
      assert(post(s"$base2/api/jobs",
        """{"url":"https://site-0.test/docs"}""").statusCode() == 200)
      val full = post(s"$base2/api/jobs", """{"url":"https://site-0.test/docs"}""")
      assert(full.statusCode() == 429, full.body())
      assert(full.body().contains("Too many active jobs"), full.body())
      mgr2.awaitAll()
      // capacity freed -> creates admitted again
      assert(post(s"$base2/api/jobs",
        """{"url":"https://site-0.test/docs"}""").statusCode() == 200)
      mgr2.awaitAll()
      mgr2.shutdown()
    } finally server2.stop()
  }

  test("resume-from-state revives a mid-crawl state dir under its stored request") {
    val (server, mgr, base) = newServer(createLimit = 100)
    try {
      // introspection routes (routes.py:407 converters, :426 info)
      val conv = get(s"$base/api/converters")
      assert(conv.statusCode() == 200, conv.body())
      assert(conv.body().contains("\"markdownify\"") &&
        conv.body().contains("\"readerlm\""), conv.body())
      assert(conv.body().contains("\"supports_tables\":true"), conv.body())
      assert(conv.body().contains("\"default\":\"markdownify\""), conv.body())
      val info = get(s"$base/api/info")
      assert(info.statusCode() == 200 && info.body().contains("docrawlspark"))

      // failure modes mirror the reference (routes.py:355-396)
      def resume(body: String) = post(s"$base/api/jobs/resume-from-state", body)
      assert(resume("""{"job_id":"ghost"}""").statusCode() == 404)
      assert(resume("""{"job_id":"../../etc"}""").statusCode() == 422) // traversal
      assert(resume("{}").statusCode() == 422)
      assert(resume("not json").statusCode() == 422)
      Files.createDirectories(mgr.stateDirOf("job-hollow"))
      assert(resume("""{"job_id":"job-hollow"}""").statusCode() == 422) // nothing committed

      // a mid-crawl state dir: one committed fetch epoch then stop (ST2) —
      // the deterministic cross-process crash/stop analog (no cancel race)
      val id = "job-revive"
      val dir = mgr.stateDirOf(id)
      Files.createDirectories(dir)
      val req = JobServer.parseRequest(
        """{"url":"https://site-0.test/docs","max_depth":5}""").toOption.get
      Files.write(dir.resolve("request.json"), JobServer.requestJson(req).getBytes(UTF_8))
      val cfg = CrawlConfig(seedUrls = Seq(req.url), maxDepth = req.maxDepth,
        epochSeconds = 30, respectRobotsTxt = req.respectRobotsTxt)
      def engine(d: String) = new graft.epoch.CrawlEngine(spark, cfg,
        new FixtureFetcher(web), images,
        new graft.sources.ParquetSnapshotTableIO(spark, d), policies)
      engine(dir.toString).run(stopAfterFetchEpoch = Some(1))
      assert(mgr.lastCommittedPhase(id).exists(_._1 == "fetch"))

      // revive over HTTP; a concurrent second revive must refuse (409
      // active — or 409 complete if the small crawl already finished),
      // never hijack the running engine's state dir
      val ok = resume(s"""{"job_id":"$id"}""")
      assert(ok.statusCode() == 200, ok.body())
      assert(ok.body().contains(s""""id":"$id""""), ok.body())
      assert(resume(s"""{"job_id":"$id"}""").statusCode() == 409)
      mgr.awaitAll()
      assert(get(s"$base/api/jobs/$id/status").body()
        .contains("\"status\":\"completed\""))
      // terminal commits landed: the engine's completion marker, then the
      // worker's post-scrape table — nothing pending → the reference's 409
      assert(mgr.lastCommittedPhase(id).exists(_._1 == "postprocess"))
      val done = resume(s"""{"job_id":"$id"}""")
      assert(done.statusCode() == 409, done.body())
      assert(done.body().contains("complete"), done.body())

      // a dir whose crawl finished but whose postprocess never landed
      // (cancel/crash between the two terminal commits — tail `complete`)
      // is REVIVABLE: the revived run is a noop resume whose worker stamps
      // the missing chunks table, then the dir 409s like any finished job
      val ppId = "job-pp"
      val ppDir = mgr.stateDirOf(ppId)
      Files.createDirectories(ppDir)
      Files.write(ppDir.resolve("request.json"), JobServer.requestJson(req).getBytes(UTF_8))
      engine(ppDir.toString).run() // direct run: commits `complete`, no postprocess
      assert(mgr.lastCommittedPhase(ppId).exists(_._1 == "complete"))
      assert(resume(s"""{"job_id":"$ppId"}""").statusCode() == 200)
      mgr.awaitAll()
      assert(mgr.lastCommittedPhase(ppId).exists(_._1 == "postprocess"))
      assert(mgr.engineOf(ppId).get.table("chunks").exists(_.count() > 0))
      assert(resume(s"""{"job_id":"$ppId"}""").statusCode() == 409)

      // the stored-request reconstruction is faithful: revived-run tables
      // equal an uninterrupted crawl of the same request (ST2 oracle)
      val d2 = Files.createTempDirectory("graft-uninterrupted")
      val e2 = engine(d2.toString); e2.run()
      import spark.implicits._
      def log(e: graft.epoch.CrawlEngine) =
        e.orderLog.select("host", "priority", "urlNorm", "disposition")
          .as[(String, Long, String, String)].collect().sortBy(t => (t._1, t._2)).toSeq
      assert(log(mgr.engineOf(id).get) == log(e2))
      mgr.shutdown()
    } finally server.stop()
  }

  test("Serve wiring: POSTed job crawls a real loopback site through the production transport") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    // a minimal real site: robots.txt + a seed page linking one child
    val site = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def page(body: String): com.sun.net.httpserver.HttpHandler = (ex: HttpExchange) => {
      val b = body.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", "text/html")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b); ex.close()
    }
    val prose = "<p>" + ("serve wiring documentation prose with many words. " * 20) + "</p>"
    val sitePort = site.getAddress.getPort
    site.createContext("/robots.txt", (ex: HttpExchange) => {
      val b = "User-agent: *\nDisallow: /docs/private/\n".getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b); ex.close()
    })
    site.createContext("/docs", page(
      s"""<html><body><h1>seed</h1>$prose<a href="/docs/child">c</a>
         |<a href="/docs/private/x">p</a></body></html>""".stripMargin))
    site.createContext("/docs/child", page(s"<html><body><h1>child</h1>$prose</body></html>"))
    site.start()

    val root = Files.createTempDirectory("graft-serve").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 2)
    val allowLoopback: String => Boolean =
      u => graft.operators.Ssrf.hostname(u) == "127.0.0.1" ||
        !graft.operators.Ssrf.isSsrf(u)
    // the REAL production wiring (graft.Serve); loopback-permissive gates —
    // the production default's DNS-resolving check correctly refuses 127/8
    val server = new JobServer(mgr,
      graft.Serve.submitter(spark, mgr, images, ssrfCheck = allowLoopback,
        transportValidate = Some(allowLoopback)))
    server.start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    try {
      val created = post(s"$base/api/jobs",
        s"""{"url":"http://127.0.0.1:$sitePort/docs","max_depth":3}""")
      assert(created.statusCode() == 200, created.body())
      val id = "\"id\":\"([^\"]+)\"".r.findFirstMatchIn(created.body()).get.group(1)
      mgr.awaitAll()
      val st = get(s"$base/api/jobs/$id/status").body()
      assert(st.contains("\"status\":\"completed\""), st)
      // the crawl went through the real HttpFetcher: both pages dispatched,
      // the robots-disallowed child never fetched ok
      import spark.implicits._
      val log = mgr.engineOf(id).get.orderLog
        .select("urlNorm", "disposition").as[(String, String)].collect().toMap
      assert(log.exists { case (u, d) => u.endsWith("/docs") && d == "ok" }, log)
      assert(log.exists { case (u, d) => u.endsWith("/docs/child") && d == "ok" }, log)
      assert(!log.exists { case (u, d) => u.contains("/private/") && d == "ok" }, log)
      // completed → the terminal marker 409s a revival, same as create-path jobs
      val again = post(s"$base/api/jobs/resume-from-state", s"""{"job_id":"$id"}""")
      assert(again.statusCode() == 409, again.body())
      // post-scrape pipeline ran for the SERVED job (reference runner.py:
      // 543-620 does it per job, not only for facade runs): the chunks
      // table is committed and the manifest counters survived the commit
      val io = new graft.sources.ParquetSnapshotTableIO(
        spark, mgr.stateDirOf(id).toString)
      assert(io.lastCommitted.exists(_._1 == "postprocess"))
      assert(io.read("chunks").exists(_.count() > 0))
      // key PRESENCE, not a value: manifest counters are the last epoch's
      // per-epoch values (an all-blocked final epoch would have pages_ok=0
      // legitimately) — the wipe regression this guards against loses the
      // KEYS, and `dequeued` commits with every fetch epoch
      assert(io.lastCounters.contains("dequeued"),
        s"counters wiped by postprocess commit: ${io.lastCounters}")
      mgr.shutdown()
    } finally { server.stop(); site.stop(0) }
  }

  test("failed job: the captured error reaches status JSON and the job_done event") {
    val root = Files.createTempDirectory("graft-http-fail").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 2)
    // a transport that dies on first use → the run throws → Failed(error)
    val boom = new graft.sources.Fetcher {
      override def fetchPages(urls: org.apache.spark.sql.DataFrame) =
        throw new RuntimeException("synthetic transport failure")
    }
    val server = new JobServer(mgr, (id, req) => {
      val cfg = CrawlConfig(seedUrls = Seq(req.url), maxDepth = req.maxDepth,
        epochSeconds = 30, respectRobotsTxt = req.respectRobotsTxt)
      mgr.submit(id, cfg, images, boom, policies)
    })
    server.start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    try {
      val created = post(s"$base/api/jobs", """{"url":"https://site-0.test/docs"}""")
      assert(created.statusCode() == 200, created.body())
      val id = "\"id\":\"([^\"]+)\"".r.findFirstMatchIn(created.body()).get.group(1)
      mgr.awaitAll()
      // the failure reason is the one piece of state Failed carries — it
      // must be readable over HTTP, not only in driver logs
      val st = get(s"$base/api/jobs/$id/status")
      assert(st.body().contains("\"status\":\"failed\""), st.body())
      assert(st.body().contains("synthetic transport failure"), st.body())
      // an SSE stream opened on an already-failed job goes straight to
      // job_done, which must carry the same error
      val sse = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/api/jobs/$id/events")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(sse.body().contains("job_done"), sse.body())
      assert(sse.body().contains("synthetic transport failure"), sse.body())
    } finally { server.stop(); mgr.shutdown() }
  }
}
