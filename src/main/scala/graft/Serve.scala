package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobs.{JobManager, JobServer}
import graft.model.CrawlConfig
import graft.operators.Ssrf
import graft.sources.RenderClient

/** spark-submit serving entry — the reference's `main.py` (the uvicorn app
  * with its lifespan cleanup task): ONE long-lived Spark driver hosting the
  * job API ([[graft.jobs.JobServer]]) over a [[graft.jobs.JobManager]],
  * plus the periodic TTL sweep (`manager.py` cleanup). Each POSTed job gets
  * the production wiring of [[Crawl.run]] — per-seed robots/sitemap
  * bootstrap over the real transport, the 5-level fetch chain, its own
  * state dir under `--state-root`.
  *
  * {{{
  * spark-submit --class graft.Serve graft.jar \
  *   --state-root /data/graft-jobs --images s3://…/images.parquet \
  *   [--port 8000] [--max-jobs 3] [--ttl-minutes 60] [--cdp-ws WS_URL]
  * }}}
  *
  * The server binds loopback (like the reference's default uvicorn bind) —
  * put a real ingress in front on a cluster.
  */
object Serve {

  /** The per-request job wiring (`routes.py:90` create_job →
    * `runner.py:113` run_job), factored from [[main]] so specs can drive
    * the REAL wiring over loopback HTTP: robots + sitemap bootstrap per
    * seed, the production transport, manager-owned engine lifecycle.
    * resume-from-state reuses it verbatim — the stored request rebuilds
    * the same wiring the create built. */
  def submitter(spark: SparkSession, mgr: JobManager, images: DataFrame,
      renderer: RenderClient = RenderClient.Static,
      ssrfCheck: String => Boolean = u => !Ssrf.isSsrf(u),
      /** request-time transport validation (per request + redirect hop):
        * the production default layers the DNS-resolving SSRF check on the
        * row gate (Crawl.run's contract); loopback fixture specs inject a
        * permissive one — the resolving check correctly refuses 127/8. */
      transportValidate: Option[String => Boolean] = None)
      : (String, JobServer.JobRequest) => Unit = (id, req) => {
    val cfg = CrawlConfig(seedUrls = Seq(req.url), maxDepth = req.maxDepth,
      delayMs = req.delayMs, language = req.language,
      respectRobotsTxt = req.respectRobotsTxt)
    val seeds = Map(
      graft.util.PyUrl.host(graft.util.PyUrl.canonicalize(req.url)) -> req.url)
    // the SAME wiring [[Crawl.run]] uses — one copy of the SSRF layering —
    // with the request's fetch-chain knobs (S5/S6/S7, PR 3.4 converter:
    // unknown names throw from the registry here → the route's 422, the
    // reference's validate_converter behavior)
    val (policies, sitemaps, fetcher) =
      Crawl.bootstrapWiring(spark, seeds, ssrfCheck, renderer, transportValidate,
        useNativeMarkdown = req.useNativeMarkdown,
        markdownProxyUrl = req.markdownProxyUrl,
        useHttpFastPath = req.useHttpFastPath,
        converter = graft.sources.MarkdownConverters.get(
          req.converter.getOrElse("markdownify")))
    mgr.submit(id, cfg, images, fetcher, policies,
      ssrfCheck = ssrfCheck, sitemaps = sitemaps)
  }

  def main(args: Array[String]): Unit = {
    val known = Set("state-root", "images", "port", "max-jobs",
      "ttl-minutes", "sweep-seconds", "cdp-ws")
    def usage(msg: String): Nothing = {
      System.err.println(s"error: $msg\nusage: graft.Serve " +
        "--state-root DIR --images PARQUET [--port N] [--max-jobs N] " +
        "[--ttl-minutes N] [--sweep-seconds N] [--cdp-ws WS_URL]")
      sys.exit(2)
    }
    val opts = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (!a.startsWith("--")) usage(s"unexpected argument $a")
      val key = a.stripPrefix("--")
      if (!known.contains(key)) usage(s"unknown option $a")
      if (i + 1 >= args.length) usage(s"missing value for $a")
      opts(key) = args(i + 1); i += 2
    }
    val stateRoot = opts.getOrElse("state-root", usage("--state-root required"))
    val imagesPath = opts.getOrElse("images", usage("--images required"))
    val (port, maxJobs, ttlMinutes, sweepSeconds) =
      try (opts.get("port").map(_.toInt).getOrElse(8000),
        opts.get("max-jobs").map(_.toInt).getOrElse(3),
        opts.get("ttl-minutes").map(_.toInt).getOrElse(60),
        opts.get("sweep-seconds").map(_.toInt).getOrElse(60))
      catch { case e: NumberFormatException =>
        usage(s"non-numeric option value: ${e.getMessage}") }
    // bad values fail at parse time like bad flags — a negative sweep would
    // throw out of the loop and self-terminate the service mid-crawl, 0
    // would busy-spin, and a negative TTL would sweep every terminal job's
    // state dir on the first pass
    if (port < 0 || port > 65535) usage(s"--port $port out of range")
    if (maxJobs < 1) usage(s"--max-jobs $maxJobs must be >= 1")
    if (ttlMinutes < 1) usage(s"--ttl-minutes $ttlMinutes must be >= 1")
    if (sweepSeconds < 1) usage(s"--sweep-seconds $sweepSeconds must be >= 1")
    val spark = SparkSession.builder().appName("graft-serve").getOrCreate()
    val images = spark.read.parquet(imagesPath)
    val mgr = new JobManager(spark, stateRoot, maxConcurrentJobs = maxJobs)
    val renderer = opts.get("cdp-ws")
      .map(ws => new graft.sources.PlaywrightRenderClient(cdpWsUrl = ws): RenderClient)
      .getOrElse(RenderClient.Static)
    val server = new JobServer(mgr, submitter(spark, mgr, images, renderer),
      port = port)
    server.start()
    println(s"graft serve: job API on 127.0.0.1:${server.boundPort}, " +
      s"state root $stateRoot, cap $maxJobs jobs, TTL $ttlMinutes min")
    sys.addShutdownHook { server.stop(); mgr.shutdown() }
    // the reference's periodic cleanup task (`manager.py` TTL sweep): swept
    // ids are logged — silent deletion would read as data loss. A sweep
    // failure (transient FS error mid-delete) must not kill the serving
    // process: log and keep the loop alive.
    while (true) {
      Thread.sleep(sweepSeconds * 1000L)
      try {
        val swept = mgr.sweep(ttlMinutes * 60000L)
        if (swept.nonEmpty) println(s"graft serve: swept ${swept.mkString(", ")}")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"graft serve: sweep failed, will retry: $e")
      }
    }
  }
}
