package graft.sources

import graft.operators.{Robots, Ssrf}

/** Driver-side bootstrap fetches for a REAL crawl: per-host robots.txt
  * policies and sitemap bodies, gathered before the engine's epochs start —
  * mirroring the reference, which loads robots.txt inline before filtering
  * (`src/jobs/runner.py:297-309`) and fetches sitemap documents inside
  * discovery (`src/crawler/discovery.py:400-505`). Cardinality is per-host
  * (one robots.txt + a handful of sitemap docs each), so this is driver
  * work by design; the parsed BODIES are then expanded distributed by
  * [[Sitemaps.expandAll]]. SSRF is validated per request like every other
  * fetch path (F6).
  */
object BootstrapFetch {

  /** One shared client (robots + up to 64 sitemap fetches reuse its
    * connection pool instead of building an SSL context per request). */
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5))
    .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
    .build()

  /** One GET via the SHARED redirect loop ([[RedirectGet]] — one
    * implementation of the security-sensitive hop/SSRF logic for every
    * fetch path) — apex→www / http→https robots.txt redirects are
    * routine, and silently treating a 301'd robots.txt as absent would
    * disable robots enforcement for the host. Bootstrap error policy:
    * transport failures and over-long chains mean "absent" (None). */
  def httpGet(url: String, timeoutMs: Int,
      validate: String => Boolean): Option[(Int, Array[Byte])] =
    try RedirectGet.send(client, url, timeoutMs.toLong, validate, Nil,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      .map(r => (r.statusCode(), r.body()))
    catch { case _: Exception => None }

  /** robots.txt per seed host. Missing/failed/non-200 → no entry = fully
    * allowed (reference `robots.py:19-34`: failed load means no filtering).
    */
  def robotsPolicies(seeds: Map[String, String], timeoutMs: Int = 5000,
      validate: String => Boolean = u => !Ssrf.isSsrf(u)): Map[String, Robots.Policy] =
    seeds.flatMap { case (host, baseUrl) =>
      val p = graft.util.PyUrl.urlparse(baseUrl)
      val scheme = if (p.scheme.isEmpty) "https" else p.scheme
      httpGet(s"$scheme://$host/robots.txt", timeoutMs, validate).collect {
        case (200, body) => host -> Robots.parse(new String(body, "UTF-8"))
      }
    }

  /** Sitemap bodies for the cascade: standard roots + robots `Sitemap:`
    * directives, recursively following sitemap-index children (bounded by
    * maxDocs), as (sitemap_url, body, gzipped) rows for
    * [[Sitemaps.expandAll]]. Children are parsed but NOT admitted here —
    * admission (domain/base-path/SSRF) happens in the distributed expand.
    */
  def sitemapBodies(seeds: Map[String, String],
      policies: Map[String, Robots.Policy],
      timeoutMs: Int = 5000,
      validate: String => Boolean = u => !Ssrf.isSsrf(u),
      maxDocs: Int = 64): Seq[(String, Array[Byte], Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte], Boolean)]
    val seen = scala.collection.mutable.HashSet.empty[String]
    val queue = scala.collection.mutable.Queue.empty[String]
    seeds.toSeq.sortBy(_._1).foreach { case (host, baseUrl) =>
      (Sitemaps.standardRoots(baseUrl) ++
        policies.get(host).map(_.sitemaps.toSeq).getOrElse(Seq.empty))
        .foreach(u => if (seen.add(u)) queue += u)
    }
    while (queue.nonEmpty && out.size < maxDocs) {
      val u = queue.dequeue()
      httpGet(u, timeoutMs, validate).foreach { case (status, body) =>
        if (status == 200) {
          // gzip by CONTENT (magic bytes 1f 8b), not by the queued URL's
          // suffix: httpGet follows redirects, so /sitemap.xml may 301 to
          // /sitemap.xml.gz (or vice versa) and suffix-based detection
          // would feed the wrong decoder and silently drop the subtree
          val gz = body.length >= 2 &&
            (body(0) & 0xff) == 0x1f && (body(1) & 0xff) == 0x8b
          out += ((u, body, gz))
          val (_, children) = Sitemaps.parse(body, gz)
          children.foreach(c => if (seen.add(c)) queue += c)
        }
      }
    }
    // loss is LOGGED, never silent (same contract as Sitemaps.expandAll's
    // truncation warning): a dropped subtree silently falling back to BFS
    // would surface only as an unexplained replay divergence
    if (queue.nonEmpty)
      System.err.println(s"[graft] WARN sitemap bodies truncated at " +
        s"maxDocs=$maxDocs; ${queue.size} discovered document(s) unfetched")
    out.toSeq
  }
}
