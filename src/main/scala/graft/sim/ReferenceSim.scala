package graft.sim

import java.util.Locale

import graft.fixtures.FixtureGen
import graft.operators.{Robots, UrlFilters}
import graft.util.PyUrl

/** Pure-Scala transcription of the reference's single-process crawl loop —
  * the golden oracle for the replay gate (SURVEY §5.2-3). Direct, sequential
  * transcription of:
  *   discovery BFS  `src/crawler/discovery.py:131-230`
  *   sorted output  `discovery.py:606-607`
  *   filter_urls    `src/crawler/filter.py:60-149`
  *   robots filter  `src/jobs/runner.py:297-309`
  *   dispatch order `runner.py:781` (enumerate over the sorted list)
  *   blocked check  `src/scraper/detection.py:10-33`
  *   content dedup  `runner.py:543-558`
  * itself pinned by the unit suites (PyUrlSpec, FiltersRobotsSpec).
  */
object ReferenceSim {

  /** Python `sorted()` / Spark `UTF8String` comparison order: CODE-POINT
    * (= UTF-8 byte) lexicographic. Scala's default String ordering is
    * UTF-16 code-UNIT order, which ranks supplementary characters
    * (surrogate range 0xD800+) BELOW high-BMP chars like U+FFFD — the
    * simulator must sort the way BOTH the reference and the engine do or
    * the golden dispatch order diverges on non-BMP URLs. */
  private[sim] val CpOrder: Ordering[String] = new Ordering[String] {
    override def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  // ---- pure transcriptions shared with nothing Spark ----

  def contentHash(markdown: String): String = {
    val ws = graft.functions.Hashing.PyWs
    val normalised = markdown
      .replaceAll(s"^[$ws]+|[$ws]+$$", "") // Python str.strip()
      .toLowerCase(Locale.ROOT)
      .replaceAll(s"[$ws]+", " ")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(normalised.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private val blockedRes = UrlFilters.BlockedPatterns.map(_.r)
  def isBlocked(content: String): Boolean =
    content.nonEmpty && blockedRes.count(_.findFirstIn(content).isDefined) >= 2

  def matchesLanguage(path: String, language: String, baseUrl: String): Boolean = {
    if (language == "all") return true
    val pathLower = path.toLowerCase(Locale.ROOT)
    val target = UrlFilters.LanguagePatterns.getOrElse(language, Seq(s"/$language/"))
    if (target.exists(pathLower.contains)) return true
    val others = (UrlFilters.LanguagePatterns.keySet - language)
      .flatMap(UrlFilters.LanguagePatterns(_))
    if (others.exists(pathLower.contains)) return false
    if (baseUrl.nonEmpty) {
      val basePathLower = PyUrl.urlparse(baseUrl).path.toLowerCase(Locale.ROOT)
      val baseHas = UrlFilters.LanguagePatterns.valuesIterator.flatten
        .exists(basePathLower.contains)
      if (baseHas) return false
    }
    true
  }

  def filterUrls(urls: Seq[String], baseUrl: String, language: String): Seq[String] = {
    val base = PyUrl.urlparse(baseUrl)
    val basePath = { var p = base.path; while (p.endsWith("/")) p = p.dropRight(1); p }
    val filtered = urls.flatMap { url =>
      val p = PyUrl.urlparse(url)
      if (p.netloc != base.netloc) None
      else {
        var path = p.path; while (path.endsWith("/")) path = path.dropRight(1)
        val pathLower = path.toLowerCase(Locale.ROOT)
        if (!path.startsWith(basePath)) None
        else if (UrlFilters.ExcludedExtensions.exists(pathLower.endsWith)) None
        else if (UrlFilters.ExcludedPatterns.exists(pathLower.contains)) None
        else if (!matchesLanguage(path, language, baseUrl)) None
        else Some(s"${p.scheme}://${p.netloc}$path")
      }
    }.toSet
    filtered.toSeq.sorted(CpOrder)
  }

  // ---- the simulated crawl ----

  final case class HostResult(
      order: Seq[String],                       // dispatch-ordered urlNorms
      dispositions: Map[String, String],        // urlNorm → ok/failed/blocked/skipped
      seen: Set[String],                        // discovery visited set
      fetchedImages: Seq[(String, String)])     // (urlNorm, image_id) in order

  /** BFS + filter + robots + sequential fetch for one host (one reference
    * job). maxUrls cap assumed un-hit (fixtures stay under it). */
  def crawlHost(p: FixtureGen.Params, h: Int, maxDepth: Int,
      language: String, respectRobots: Boolean): HostResult = {
    val n = FixtureGen.pageCount(p, h)
    val byUrl: Map[String, FixtureGen.Page] =
      (0 until n).map(j => { val pg = FixtureGen.page(p, h, j); pg.url -> pg }).toMap
    val baseUrl = FixtureGen.seedUrl(h)
    val baseDomain = PyUrl.urlparse(baseUrl).netloc

    // cascade strategy 1 (discovery.py:548-566): sitemap — on success the
    // BFS is skipped entirely; roots include robots.txt Sitemap: directives
    val sitemapUrls = graft.sources.Sitemaps.expandPure(
      FixtureGen.sitemapBodies(p, h), FixtureGen.hostName(h), baseUrl,
      Robots.parse(FixtureGen.robotsTxt(h)))

    // cascade strategy 2 (discovery.py:233-340): nav links on the SEED page
    def navUrls: Set[String] =
      byUrl.get(PyUrl.canonicalize(baseUrl)).toSeq
        .filter(pg => pg.status == 200 && pg.contentType.contains("text/html"))
        .flatMap(pg => pg.navLinks.map(h => PyUrl.navClean(pg.url, h, baseDomain)))
        .filter(_.nonEmpty).toSet

    val visited = scala.collection.mutable.LinkedHashSet.empty[String]
    if (sitemapUrls.nonEmpty) visited ++= sitemapUrls
    else if (navUrls.nonEmpty) visited ++= navUrls
    else {
      // strategy 3 (discovery.py:178-224) BFS (visited = normalized)
      var currentLevel: Seq[String] = Seq(baseUrl)
      var depth = 0
      var continue = true
      while (continue && currentLevel.nonEmpty) {
        val toFetch = scala.collection.mutable.ArrayBuffer.empty[String]
        currentLevel.foreach { url =>
          val norm = PyUrl.canonicalize(url)
          if (!visited.contains(norm)) { visited += norm; toFetch += url }
        }
        if (depth >= maxDepth) continue = false
        else {
          val nextLevelSet = scala.collection.mutable.LinkedHashSet.empty[String]
          toFetch.foreach { url =>
            // _extract_links: only 200 text/html pages yield links
            byUrl.get(PyUrl.canonicalize(url)).foreach { pg =>
              if (pg.status == 200 && pg.contentType.contains("text/html")) {
                pg.links.foreach { href =>
                  val clean = PyUrl.extractClean(pg.url, href, baseDomain)
                  if (clean.nonEmpty) {
                    val norm = PyUrl.canonicalize(clean)
                    if (!visited.contains(norm)) nextLevelSet += norm
                  }
                }
              }
            }
          }
          currentLevel = nextLevelSet.toSeq
          depth += 1
        }
      }
    }

    // discovery output is sorted (discovery.py:606-607)
    val discovered = visited.toSeq.sorted(CpOrder)
    // filter_urls (runner.py:284)
    val filtered = filterUrls(discovered, baseUrl, language)
    // robots admission, order-preserving (runner.py:297-309)
    val policy = Robots.parse(FixtureGen.robotsTxt(h))
    val admitted =
      if (respectRobots) filtered.filter(u => Robots.isAllowed(policy, PyUrl.urlparse(u).path))
      else filtered

    // sequential dispatch (runner.py:781): fetch chain → blocked → dedup
    val seenHashes = scala.collection.mutable.HashSet.empty[String]
    val dispositions = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val fetched = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    admitted.foreach { u =>
      byUrl.get(u) match {
        case None => dispositions(u) = "failed"
        case Some(pg) if pg.status != 200 || !pg.contentType.contains("text/html") =>
          dispositions(u) = "failed"
        case Some(pg) if isBlocked(pg.content) =>
          dispositions(u) = "blocked"
        case Some(pg) =>
          val hsh = contentHash(pg.content)
          if (seenHashes.contains(hsh)) dispositions(u) = "skipped"
          else {
            seenHashes += hsh
            dispositions(u) = "ok"
            pg.imageRefs.foreach(id => fetched += ((u, id)))
          }
      }
    }
    HostResult(admitted, dispositions.toMap, visited.toSet, fetched.toSeq)
  }

  /** All hosts (the engine runs them as one partitioned job). */
  def crawlAll(p: FixtureGen.Params, maxDepth: Int, language: String = "en",
      respectRobots: Boolean = true): Map[String, HostResult] =
    (0 until p.hosts).map { h =>
      FixtureGen.hostName(h) -> crawlHost(p, h, maxDepth, language, respectRobots)
    }.toMap
}
