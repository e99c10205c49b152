package graft.jobs

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** D10 serving surface — the reference's FastAPI + SSE job API
  * (`src/api/routes.py:90-150`, `src/jobs/manager.py:89-127`) over the
  * [[JobManager]], on the JDK's built-in `HttpServer` (no new deps, binds
  * loopback by default — put a real ingress in front on a cluster).
  *
  * Routes (reference analogs):
  *  - `POST /api/jobs`            body `{"url": …, "max_depth": …,
  *    "delay_ms": …, "respect_robots_txt": …, "use_native_markdown": …,
  *    "markdown_proxy_url": …, "use_http_fast_path": …, "converter": …,
  *    "language": …}` — the engine-consumed `JobRequest` fields with the
  *    reference's validation bounds — submits via the embedder's
  *    `submitter` (transports/images are deployment wiring, like the
  *    reference's scraper/model registry) and returns `{"id","status"}`
  *    (`routes.py:90` create_job).
  *  - `GET  /api/jobs/{id}/status` → `{"id","status","pages_completed",
  *    "phase","epoch"}` (`routes.py:137`; pages from the engine's
  *    manifest counters — no Spark job per poll).
  *  - `POST /api/jobs/{id}/cancel` → cancels, returns status
  *    (`routes.py:122`).
  *  - `GET  /api/jobs/{id}/events` → `text/event-stream`: a `progress`
  *    event whenever the job's committed counters advance, `keepalive`
  *    comments while idle, one terminal `job_done` event, then close —
  *    the `event_stream` contract (`manager.py:92-127`) with the queue
  *    replaced by commit polling (progress is durable table state here,
  *    not an in-process queue, so a reconnecting client misses nothing).
  *  - `GET  /api/health/ready` → `{"status":"ok"}` (`routes.py:154`).
  *  - `POST /api/jobs/resume-from-state` body `{"job_id": …}` → revives a
  *    terminal job from its committed state dir under its ORIGINAL stored
  *    request (`routes.py:355` — the `state_file_path` analog; job id ≡
  *    state dir here). 404/422/409/429 mirror the reference.
  *  - `GET  /api/converters` → converter registry + capability flags
  *    (`routes.py:407`).
  *  - `GET  /api/info` → app identity (`routes.py:426`). The reference's
  *    `/models`/`/providers` routes are LLM-provider config surface with
  *    no analog here: scorers are injected engine wiring (X2), not served
  *    configuration.
  */
final class JobServer(
    mgr: JobManager,
    /** binds a validated request to an engine submission. */
    submitter: (String, JobServer.JobRequest) => Unit,
    port: Int = 0,
    /** SSE poll cadence; keepalives go out every `keepaliveEveryMs`. */
    pollMs: Long = 200L,
    keepaliveEveryMs: Long = 20000L,
    /** job-creation rate limit (reference `@limiter.limit("10/minute")`,
      * `routes.py:91`); the loopback server has no per-client identity, so
      * the window is global — put a real ingress in front for per-IP. */
    createLimitPerMinute: Int = 10) {
  import JobServer._

  private val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-http"); t.setDaemon(true); t
  })

  def boundPort: Int = http.getAddress.getPort

  def start(): Unit = { http.setExecutor(pool); http.start() }
  def stop(): Unit = { http.stop(0); pool.shutdown() }

  http.createContext("/", (ex: HttpExchange) => {
    try route(ex)
    catch {
      case e: Exception =>
        // only answer 500 if no response has started — after an SSE
        // stream's 200 headers, a second sendResponseHeaders throws and
        // masks the original error; log that one instead
        if (ex.getResponseCode == -1)
          respond(ex, 500, s"""{"error":${quote(e.getMessage)}}""")
        else System.err.println(s"[graft] WARN ${ex.getRequestURI.getPath}: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage} (response already started)")
    } finally ex.close()
  })

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    (method, path) match {
      case ("GET", "/api/health/ready") => respond(ex, 200, """{"status":"ok"}""")
      case ("POST", "/api/jobs") => createJob(ex)
      case ("POST", "/api/jobs/resume-from-state") => resumeFromState(ex)
      case ("GET", "/api/converters") => respond(ex, 200, convertersJson)
      case ("GET", "/api/info") => respond(ex, 200, infoJson)
      case ("GET", JobRoute(id, "status")) => jobStatus(ex, id)
      case ("POST", JobRoute(id, "cancel")) =>
        if (mgr.status(id).isEmpty) respond(ex, 404, notFound(id))
        else { mgr.cancel(id); jobStatus(ex, id) }
      // PR 3.1 pause/resume (`routes.py:313-349`): 409 mirrors the
      // reference's "cannot be paused (status: …)" 400-class rejection
      case ("POST", JobRoute(id, "pause")) =>
        if (mgr.status(id).isEmpty) respond(ex, 404, notFound(id))
        else if (mgr.pause(id)) jobStatus(ex, id)
        else respond(ex, 409, s"""{"error":${quote(
          s"job $id cannot be paused (status: ${mgr.status(id).map(statusName).getOrElse("?")})")}}""")
      case ("POST", JobRoute(id, "resume")) =>
        if (mgr.status(id).isEmpty) respond(ex, 404, notFound(id))
        else if (mgr.resume(id)) jobStatus(ex, id)
        else respond(ex, 409, s"""{"error":${quote(
          s"job $id cannot be resumed (status: ${mgr.status(id).map(statusName).getOrElse("?")})")}}""")
      case ("GET", JobRoute(id, "events")) => events(ex, id)
      case _ => respond(ex, 404, """{"error":"no such route"}""")
    }
  }

  // sliding-window create timestamps for the rate limit (shared by create
  // and resume-from-state, which the reference limits identically at
  // 10/minute — routes.py:91,356)
  private val createTimes = new java.util.concurrent.ConcurrentLinkedDeque[Long]()

  /** True (and 429 already written) if the shared create window is full.
    * Decide under the lock, write to the socket OUTSIDE it — responding
    * while holding the monitor would let one slow-reading client block
    * every other create on the rate-limit check. */
  private def rateLimitCreate(ex: HttpExchange): Boolean = {
    val now = System.currentTimeMillis()
    val rateLimited = createTimes.synchronized {
      while (!createTimes.isEmpty && now - createTimes.peekFirst() > 60000L)
        createTimes.pollFirst()
      if (createTimes.size >= createLimitPerMinute) true
      else { createTimes.addLast(now); false }
    }
    if (rateLimited)
      respond(ex, 429,
        s"""{"error":${quote(s"rate limit exceeded ($createLimitPerMinute/minute)")}}""")
    rateLimited
  }

  /** Bounded body read — an unbounded readAllBytes would let one client
    * OOM the driver with a huge POST (the reference fronts FastAPI with an
    * edge worker; this server is its own first line). None = 413 sent. */
  private def readBody(ex: HttpExchange): Option[String] = {
    val limited = ex.getRequestBody.readNBytes(MaxBodyBytes + 1)
    if (limited.length > MaxBodyBytes) {
      respond(ex, 413, s"""{"error":"body exceeds $MaxBodyBytes bytes"}""")
      None
    } else Some(new String(limited, UTF_8))
  }

  /** Cap-gated submit shared by create and resume-from-state: the manager's
    * admission gate is the AUTHORITATIVE check — check-then-act over two
    * HTTP threads (or two server instances on one manager) would let both
    * pass at cap-1 and silently queue the overflow job instead of 429ing. */
  private def admitAndRespond(ex: HttpExchange, id: String)(thunk: => Unit): Unit =
    if (mgr.tryAdmit(thunk)) respond(ex, 200, statusJson(id))
    else respond(ex, 429, s"""{"error":${quote(
      s"Too many active jobs (${mgr.maxConcurrent}/${mgr.maxConcurrent}). Try again later.")}}""")

  private def createJob(ex: HttpExchange): Unit = {
    val body = readBody(ex).getOrElse(return)
    // admission order mirrors the reference: rate limit (decorator), then
    // the active-jobs cap (routes.py:94-99), then validation
    if (rateLimitCreate(ex)) return
    // fast-path cap rejection first, mirroring the reference's admission
    // order (cap before validation, routes.py:94-99)…
    val active = mgr.activeJobCount
    if (active >= mgr.maxConcurrent) {
      respond(ex, 429, s"""{"error":${quote(
        s"Too many active jobs ($active/${mgr.maxConcurrent}). Try again later.")}}""")
      return
    }
    parseRequest(body) match {
      case Left(err) => respond(ex, 422, s"""{"error":${quote(err)}}""")
      case Right(req) =>
        // UUID ids like the reference: a per-process counter would reuse
        // "job-1" after a server restart over the same state root and
        // silently RESUME the previous crawl's state dir on a create
        val id = s"job-${java.util.UUID.randomUUID()}"
        // config-level require failures (e.g. a URL that parses but the
        // engine refuses) are the client's fault — 422, not a 500.
        // The request is persisted BEFORE submit (so the instant the job is
        // mapped its state dir already holds request.json for cross-process
        // resume — persisting after would race both a crash and a zero-TTL
        // sweep), and a refused submit DELETES the dir: a 422 must not leave
        // an orphan request.json that sweep can never remove (sweep only
        // walks the in-memory job map, and a refused job was never mapped).
        try admitAndRespond(ex, id) {
          persistRequest(id, req)
          try submitter(id, req)
          catch { case e: Throwable =>
            // only if the job never got mapped — a post-mapping failure
            // owns its state dir (the job is visible and sweepable)
            if (mgr.status(id).isEmpty) deleteStateDir(id)
            throw e
          }
        }
        catch { case e: IllegalArgumentException =>
          respond(ex, 422, s"""{"error":${quote(e.getMessage)}}""") }
    }
  }

  /** The validated create request, written into the job's state dir — the
    * reference stores it in the state file (`state.request`) so
    * resume-from-state can reconstruct the ORIGINAL job instead of
    * trusting resubmitted parameters. Normalized JSON, not the raw body. */
  private def persistRequest(id: String, req: JobRequest): Unit = {
    val dir = mgr.stateDirOf(id)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("request.json"),
      requestJson(req).getBytes(UTF_8))
  }

  /** Best-effort recursive delete of a never-mapped job's state dir (the
    * create-path 422 cleanup — sweep cannot reach unmapped ids). */
  private def deleteStateDir(id: String): Unit =
    try {
      val dir = mgr.stateDirOf(id)
      if (java.nio.file.Files.exists(dir)) {
        val s = java.nio.file.Files.walk(dir)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { val _ = java.nio.file.Files.deleteIfExists(p) })
        finally s.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** PR 3.1 — `POST /api/jobs/resume-from-state` (`routes.py:355`): revive
    * a job from its committed state dir. Body `{"job_id": …}` — job id ≡
    * state dir here, the reference's `state_file_path` analog. 404 no
    * state dir; 422 nothing committed / no stored request; 409 crawl ran
    * to completion (terminal `postprocess` commit — nothing pending) or
    * the job is still active in-process; 429 at the cap; else the engine
    * continues from its last committed epoch under the original request. */
  private def resumeFromState(ex: HttpExchange): Unit = {
    val body = readBody(ex).getOrElse(return)
    if (rateLimitCreate(ex)) return
    parseResumeRequest(body) match {
      case Left(err) => respond(ex, 422, s"""{"error":${quote(err)}}""")
      case Right(id) =>
        val dir = mgr.stateDirOf(id)
        if (!java.nio.file.Files.isDirectory(dir)) {
          respond(ex, 404, s"""{"error":${quote(s"State not found for job $id")}}""")
          return
        }
        mgr.lastCommittedPhase(id) match {
          case None =>
            respond(ex, 422,
              s"""{"error":${quote(s"No committed state for job $id")}}""")
          case Some(("postprocess", _)) =>
            // the FINAL phase: crawl done AND post-scrape table committed
            // — nothing left to produce. A tail of `complete` (crawl done,
            // postprocess never landed: cancel/crash between the two
            // commits) stays revivable below — the revived run is a noop
            // resume whose worker stamps the missing chunks table.
            respond(ex, 409,
              """{"error":"No pending work in state — job was complete."}""")
          case Some(_) =>
            // EVERY refusal is decided before the old entry is touched:
            // revival only drops it inside the admitted thunk (and the
            // manager restores it if resubmit throws), so a 413/422/429
            // can never make a terminal job vanish from status/SSE and —
            // since sweep() walks the in-memory map — leak its state dir
            val reqFile = dir.resolve("request.json")
            if (!java.nio.file.Files.isRegularFile(reqFile)) {
              respond(ex, 422,
                s"""{"error":${quote(s"No stored request for job $id")}}""")
              return
            }
            parseRequest(new String(
              java.nio.file.Files.readAllBytes(reqFile), UTF_8)) match {
              case Left(err) => respond(ex, 422, s"""{"error":${quote(
                s"Invalid request in state: $err")}}""")
              case Right(req) =>
                try admitAndRespond(ex, id) {
                  if (!mgr.revive(id)(submitter(id, req)))
                    throw new IllegalStateException(
                      s"Job $id is active; use pause/resume or cancel")
                } catch {
                  case e: IllegalStateException =>
                    respond(ex, 409, s"""{"error":${quote(e.getMessage)}}""")
                  case e: JobManager.DuplicateJobException =>
                    // lost a revival race: another thread resubmitted first
                    // (typed — message matching would misroute a validation
                    // failure whose user-controlled text contains the words)
                    respond(ex, 409, s"""{"error":${quote(e.getMessage)}}""")
                  case e: IllegalArgumentException =>
                    // a stored request.json that fails an engine/config
                    // require is a genuinely invalid request — same 422 the
                    // create path gives the identical failure
                    respond(ex, 422, s"""{"error":${quote(e.getMessage)}}""")
                }
            }
        }
    }
  }

  /** `GET /api/converters` (`routes.py:407`): the converter registry with
    * capability flags, from [[graft.sources.MarkdownConverters]]. */
  private def convertersJson: String = {
    val cs = graft.sources.MarkdownConverters.available.map { n =>
      val c = graft.sources.MarkdownConverters.get(n)
      s"""{"name":${quote(n)},"supports_tables":${c.supportsTables},""" +
        s""""supports_code_blocks":${c.supportsCodeBlocks}}"""
    }
    s"""{"converters":[${cs.mkString(",")}],"default":"markdownify"}"""
  }

  /** `GET /api/info` (`routes.py:426`): app identity. The reference's
    * `/models`/`/providers` LLM-config routes have no analog — scorers
    * are injected engine wiring here, not served configuration. */
  private def infoJson: String =
    """{"name":"docrawlspark","version":"0.4.0","engine":"spark"}"""

  private def jobStatus(ex: HttpExchange, id: String): Unit =
    mgr.status(id) match {
      case None => respond(ex, 404, notFound(id))
      case Some(_) => respond(ex, 200, statusJson(id))
    }

  private def statusJson(id: String): String = {
    val status = mgr.status(id)
    val st = status.map(statusName).getOrElse("unknown")
    val (pages, phase) = mgr.engineOf(id)
      .map(e => (e.pagesCompleted, e.phaseEpoch)).getOrElse((0L, None))
    s"""{"id":${quote(id)},"status":${quote(st)},"pages_completed":$pages,""" +
      s""""phase":${quote(phase.map(_._1).getOrElse(""))},""" +
      s""""epoch":${phase.map(_._2).getOrElse(-1)}${errorField(status)}}"""
  }

  /** `,"error":…` for Failed jobs — the captured failure reason is the one
    * piece of state the Failed case exists to carry; without this no HTTP
    * client could learn WHY a job failed (reference JobStatus.error). */
  private def errorField(status: Option[JobManager.Status]): String =
    status match {
      case Some(JobManager.Failed(err)) => s""","error":${quote(err)}"""
      case _ => ""
    }

  /** SSE: progress on counter advance, keepalive while idle, terminal
    * job_done, close. */
  private def events(ex: HttpExchange, id: String): Unit = {
    if (mgr.status(id).isEmpty) { respond(ex, 404, notFound(id)); return }
    ex.getResponseHeaders.set("Content-Type", "text/event-stream")
    ex.getResponseHeaders.set("Cache-Control", "no-cache")
    ex.sendResponseHeaders(200, 0) // chunked stream
    val out = ex.getResponseBody
    def send(event: String, data: String): Unit = {
      out.write(s"event: $event\ndata: $data\n\n".getBytes(UTF_8))
      out.flush()
    }
    var lastCounters: Map[String, Long] = null
    var lastSentMs = System.currentTimeMillis()
    var terminal = false
    def loop(): Unit = while (!terminal) {
      val st = mgr.status(id)
      val now = System.currentTimeMillis()
      val counters = mgr.engineOf(id).map(_.counters).getOrElse(Map.empty)
      if (counters.nonEmpty && counters != lastCounters) {
        lastCounters = counters
        send("progress", statusJson(id))
        lastSentMs = now
      }
      st match {
        case None | Some(JobManager.Done) | Some(JobManager.Cancelled) |
            Some(JobManager.Failed(_)) =>
          // mirror the reference's terminal event then stream close
          val status = st.map(statusName).getOrElse("unknown")
          send("job_done", s"""{"status":${quote(status)}${errorField(st)}}""")
          terminal = true
        case _ =>
          if (now - lastSentMs >= keepaliveEveryMs) {
            send("keepalive", "{}")
            lastSentMs = now
          }
          Thread.sleep(pollMs)
      }
    }
    // a disconnected client surfaces as an IOException from send(); end
    // the stream quietly (reference: GeneratorExit, manager.py:122-124).
    // An interrupt (pool shutdown mid-stream) likewise just ends it.
    try loop()
    catch {
      case _: java.io.IOException => ()
      case _: InterruptedException => ()
    }
  }

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def notFound(id: String) = s"""{"error":${quote(s"no job $id")}}"""
}

object JobServer {
  /** Create-request body cap (ample for the JobRequest JSON). */
  val MaxBodyBytes: Int = 64 * 1024

  /** `api/models.py JobRequest` analog — the fields the Spark engine
    * consumes: crawl bounds plus the fetch-chain knobs (S5/S6/S7 levels,
    * PR 3.4 converter plugin, F3 language). Model-selection fields are
    * scorer wiring bound by the embedder's `submitter`; `output_format`/
    * `use_pipeline_mode`/custom selector lists stay facade-level scope.
    * Validation bounds mirror the reference (`models.py:19-110`, incl.
    * the HTTPS-only proxy URL rule). */
  final case class JobRequest(
      url: String,
      maxDepth: Int = 5,
      delayMs: Int = 500,
      respectRobotsTxt: Boolean = true,
      useNativeMarkdown: Boolean = true,
      markdownProxyUrl: Option[String] = None,
      useHttpFastPath: Boolean = true,
      converter: Option[String] = None,
      language: String = "en")

  private val mapper = new ObjectMapper()

  private[jobs] def quote(s: String): String =
    mapper.writeValueAsString(if (s == null) "" else s)

  private val ConverterName = "^[\\w-]{1,50}$".r

  /** Parse + validate (reference field bounds: `models.py:19-110`). */
  private[graft] def parseRequest(body: String): Either[String, JobRequest] =
    try {
      val n = mapper.readTree(body)
      if (n == null || !n.hasNonNull("url")) Left("url is required")
      else {
        def bool(f: String, dflt: Boolean) =
          if (n.hasNonNull(f)) n.get(f).asBoolean() else dflt
        val req = JobRequest(
          url = n.get("url").asText(),
          maxDepth = if (n.hasNonNull("max_depth")) n.get("max_depth").asInt() else 5,
          delayMs = if (n.hasNonNull("delay_ms")) n.get("delay_ms").asInt() else 500,
          respectRobotsTxt = bool("respect_robots_txt", dflt = true),
          useNativeMarkdown = bool("use_native_markdown", dflt = true),
          markdownProxyUrl =
            if (n.hasNonNull("markdown_proxy_url")) Some(n.get("markdown_proxy_url").asText())
            else None,
          useHttpFastPath = bool("use_http_fast_path", dflt = true),
          converter =
            if (n.hasNonNull("converter")) Some(n.get("converter").asText()) else None,
          language = if (n.hasNonNull("language")) n.get("language").asText() else "en")
        if (!req.url.startsWith("http://") && !req.url.startsWith("https://"))
          Left("url must be http(s)")
        else if (req.maxDepth < 1 || req.maxDepth > 20) Left("max_depth in [1,20]")
        else if (req.delayMs < 100 || req.delayMs > 60000) Left("delay_ms in [100,60000]")
        // reference validate_proxy_url: the proxy sees every page body —
        // HTTPS only (models.py:101-110)
        else if (req.markdownProxyUrl.exists(!_.startsWith("https://")))
          Left("markdown_proxy_url must use HTTPS")
        // name shape (models.py converter pattern) AND existence (the
        // reference's validate_converter model_validator) — rejecting here
        // keeps a bad create from persisting an orphan request.json
        else if (req.converter.exists(c => ConverterName.findFirstIn(c).isEmpty))
          Left("converter must match [\\w-]{1,50}")
        else if (req.converter.exists(c =>
            !graft.sources.MarkdownConverters.available.contains(c)))
          Left(s"Unknown converter: ${req.converter.get}. " +
            s"Available: ${graft.sources.MarkdownConverters.available.mkString(",")}")
        else if (req.language.isEmpty || req.language.length > 10)
          Left("language length in [1,10]")
        else Right(req)
      }
    } catch { case e: Exception => Left(s"bad JSON: ${e.getMessage}") }

  /** Canonical JSON for a validated request (the `request.json` payload —
    * same field names [[parseRequest]] reads back on resume-from-state;
    * EVERY field serializes so revival reconstructs the full fetch chain). */
  private[graft] def requestJson(req: JobRequest): String =
    s"""{"url":${quote(req.url)},"max_depth":${req.maxDepth},""" +
      s""""delay_ms":${req.delayMs},"respect_robots_txt":${req.respectRobotsTxt},""" +
      s""""use_native_markdown":${req.useNativeMarkdown},""" +
      req.markdownProxyUrl.map(u => s""""markdown_proxy_url":${quote(u)},""").getOrElse("") +
      s""""use_http_fast_path":${req.useHttpFastPath},""" +
      req.converter.map(c => s""""converter":${quote(c)},""").getOrElse("") +
      s""""language":${quote(req.language)}}"""

  /** resume-from-state body: `{"job_id": …}`. */
  private[graft] def parseResumeRequest(body: String): Either[String, String] =
    try {
      val n = mapper.readTree(body)
      if (n == null || !n.hasNonNull("job_id")) Left("job_id is required")
      else {
        val id = n.get("job_id").asText()
        // ids are path components of the state root — a traversal here
        // would let a client probe arbitrary directories
        if (id.isEmpty || id.contains('/') || id.contains('\\') ||
          id.contains("..")) Left("invalid job_id")
        else Right(id)
      }
    } catch { case e: Exception => Left(s"bad JSON: ${e.getMessage}") }

  private val JobRoute = "^/api/jobs/([^/]+)/([a-z]+)$".r

  private[jobs] def statusName(s: JobManager.Status): String = s match {
    case JobManager.Queued => "queued"
    case JobManager.Running => "running"
    case JobManager.Paused => "paused"
    case JobManager.Done => "completed"
    case JobManager.Failed(_) => "failed"
    case JobManager.Cancelled => "cancelled"
  }
}
