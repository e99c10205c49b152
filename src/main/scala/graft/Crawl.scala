package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.epoch.CrawlEngine
import graft.model.CrawlConfig
import graft.operators.{IdentityScorer, RelevanceScorer, Ssrf}
import graft.sources.{BootstrapFetch, Fetcher, HttpFetcher, ParquetSnapshotTableIO}

/** One-call user entry — the `POST /api/jobs` analog (reference E1,
  * `src/jobs/runner.py:113`): wires the real transport, bootstrap fetches
  * (robots.txt policies + sitemap bodies incl. `Sitemap:` directives), and
  * the snapshot table store, then runs the crawl to completion. Returns
  * the engine for table access (`orderLog`, `fetched`, `seen`, `table(_)`)
  * and post-processing (`operators.Postprocess.chunksTable` over ok pages).
  *
  * Every component stays overridable for tests/deployments (fixture or
  * custom transports, scorers, warm caches, permissive SSRF for loopback
  * fixtures) — the defaults are the production path.
  */
object Crawl {

  def run(spark: SparkSession, cfg: CrawlConfig, stateDir: String,
      /** image table the fetch phase joins refs against
        * (image_id, bytes, w, h, fmt, caption, phash). */
      images: DataFrame,
      fetcher: Option[Fetcher] = None,
      scorer: RelevanceScorer = IdentityScorer,
      warmCache: Option[DataFrame] = None,
      ssrfCheck: String => Boolean = u => !Ssrf.isSsrf(u),
      stopAfterFetchEpoch: Option[Int] = None): CrawlEngine = {
    import spark.implicits._
    val seedPairs = cfg.seedUrls.map(u =>
      graft.util.PyUrl.host(graft.util.PyUrl.canonicalize(u)) -> u)
    // fail the one-seed-per-host contract here, BEFORE the bootstrap
    // fetches issue real robots/sitemap requests for a doomed config
    require(seedPairs.map(_._1).distinct.size == seedPairs.size,
      s"one seed per host (reference: one base_url per job); got ${cfg.seedUrls}")
    val seeds: Map[String, String] = seedPairs.toMap
    val policies = BootstrapFetch.robotsPolicies(seeds, validate = ssrfCheck)
    val bodies = BootstrapFetch.sitemapBodies(seeds, policies, validate = ssrfCheck)
    val engine = new CrawlEngine(
      spark, cfg,
      fetcher.getOrElse(new HttpFetcher(validate = ssrfCheck)),
      images,
      new ParquetSnapshotTableIO(spark, stateDir),
      policies,
      sitemaps =
        if (bodies.nonEmpty) Some(bodies.toDF("sitemap_url", "body", "gzipped"))
        else None,
      scorer = scorer,
      warmCache = warmCache,
      ssrfCheck = ssrfCheck)
    engine.run(stopAfterFetchEpoch = stopAfterFetchEpoch)
    engine
  }
}
