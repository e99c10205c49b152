package graft

import org.apache.spark.sql.functions._

import graft.operators.{Robots, UrlFilters}
import graft.functions.Hashing

/** Pins F2/F3/F5/F7 + C3/C4 to the reference's behavior (case sources:
  * `tests/crawler/test_filter.py`, `test_url_filter.py`, `test_robots.py`,
  * `tests/scraper/test_detection.py`). */
class FiltersRobotsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Robots (pure) ----

  val robotsTxt =
    """User-agent: Googlebot
      |Disallow: /google-only/
      |
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow: /tmp
      |Crawl-delay: 2.5
      |""".stripMargin

  test("robots parse: only * section, lowercased, crawl-delay") {
    val p = Robots.parse(robotsTxt)
    assert(p.disallowed == Vector("/private/", "/tmp"))
    assert(p.allowed == Vector("/private/ok"))
    assert(p.crawlDelaySec.contains(2.5))
  }

  test("robots precedence: longest match wins, allow wins tie, no-match allowed") {
    val p = Robots.parse(robotsTxt)
    assert(!Robots.isAllowed(p, "/private/x"))
    assert(Robots.isAllowed(p, "/private/ok/page")) // allow longer
    assert(Robots.isAllowed(p, "/public"))          // no match
    assert(!Robots.isAllowed(p, "/tmp/file"))
    val tie = Robots.Policy(Vector("/a"), Vector("/a"), None)
    assert(Robots.isAllowed(tie, "/a/x")) // Allow >= Disallow on tie (RFC 9309)
    val onlyAllow = Robots.Policy(Vector.empty, Vector("/x"), None)
    assert(Robots.isAllowed(onlyAllow, "/x/y") && Robots.isAllowed(onlyAllow, "/z"))
  }

  test("robots parse lowercases rules; uppercase paths don't match") {
    val p = Robots.parse("User-agent: *\nDisallow: /Private/")
    assert(p.disallowed == Vector("/private/"))
    assert(Robots.isAllowed(p, "/Private/x")) // path case preserved → no match
  }

  test("robots join-based admission matches pure semantics") {
    val policies = Map(
      "a.test" -> Robots.parse(robotsTxt),
      "b.test" -> Robots.Empty)
    val (rules, _) = Robots.toRuleRows(policies)
    val urls = Seq(
      ("a.test", "/private/x"), ("a.test", "/private/ok/page"), ("a.test", "/public"),
      ("a.test", "/tmp/file"), ("b.test", "/anything"), ("c.test", "/no-robots"))
      .toDF("host", "path")
    val admitted = Robots.admitJoin(urls, rules.toDF())
      .select("host", "path").as[(String, String)].collect().toSet
    val expected = Seq(
      ("a.test", "/private/ok/page"), ("a.test", "/public"),
      ("b.test", "/anything"), ("c.test", "/no-robots")).toSet
    assert(admitted == expected)
    // and the UDF path agrees
    val bc = Robots.broadcastPolicies(spark, policies)
    val viaUdf = urls.where(Robots.allowedUdf(bc)($"host", $"path"))
      .as[(String, String)].collect().toSet
    assert(viaUdf == expected)
  }

  // ---- F2 deterministic filter ----

  test("filterUrls: domain/subpath/ext/pattern/lang + dedup + sort") {
    val base = "https://docs.test/docs"
    val urls = Seq(
      "https://docs.test/docs/intro",          // keep
      "https://docs.test/docs/intro/",         // dup of above after rstrip
      "https://other.test/docs/x",             // other domain
      "https://docs.test/outside",             // not under base path
      "https://docs.test/docs/file.pdf",       // excluded extension
      "https://docs.test/docs/Guide.PDF",      // excluded extension (case)
      "https://docs.test/docs/blog/post",      // excluded pattern
      "https://docs.test/docs/es/intro",       // other language
      "https://docs.test/docs/en/intro",       // target language
      "https://docs.test/docs/api",            // keep (no lang prefix, base none)
      "https://docs.test/docs/a?q=1#f"         // query dropped by F2 normalize
    ).toDF("url")
    val got = UrlFilters.filterUrls(urls, col("url"), base, "en")
      .as[String].collect().toSeq
    val expected = Seq(
      "https://docs.test/docs/a",
      "https://docs.test/docs/api",
      "https://docs.test/docs/en/intro",
      "https://docs.test/docs/intro")
    assert(got == expected) // sorted + deduped
  }

  test("target language checked before other languages (filter.py:118-130)") {
    val base = "https://docs.test/en/docs"
    val urls = Seq(
      "https://docs.test/en/docs/a",   // target lang → keep
      "https://docs.test/en/docs/fr/b" // contains /en/ first-checked → keep
    ).toDF("url")
    val got = UrlFilters.filterUrls(urls, col("url"), base, "en")
      .as[String].collect().toSeq
    assert(got == Seq("https://docs.test/en/docs/a", "https://docs.test/en/docs/fr/b"))
  }

  test("matchesLanguage fallback: base-has-language excludes unprefixed paths") {
    val paths = Seq("/about", "/es/about", "/en/about").toDF("p")
    // base WITH /en/ prefix: unprefixed excluded
    val withLangBase = paths
      .select($"p", UrlFilters.matchesLanguage($"p", "en", "https://d.test/en/docs").as("m"))
      .as[(String, Boolean)].collect().toMap
    assert(withLangBase == Map("/about" -> false, "/es/about" -> false, "/en/about" -> true))
    // base WITHOUT language prefix: unprefixed included (permissive)
    val noLangBase = paths
      .select($"p", UrlFilters.matchesLanguage($"p", "en", "https://d.test/docs").as("m"))
      .as[(String, Boolean)].collect().toMap
    assert(noLangBase == Map("/about" -> true, "/es/about" -> false, "/en/about" -> true))
  }

  test("language 'all' keeps everything") {
    val urls = Seq(
      "https://d.test/x/es/a", "https://d.test/x/en/b", "https://d.test/x/c")
      .toDF("url")
    val got = UrlFilters.filterUrls(urls, col("url"), "https://d.test/x", "all")
      .count()
    assert(got == 3)
  }

  // ---- F5 blocked detection ----

  test("blocked detection: threshold 2 of 8") {
    val rows = Seq(
      ("Checking your browser... CAPTCHA required", true), // 2 patterns
      ("This page discusses CAPTCHA solving techniques", false), // 1 pattern
      ("Cloudflare Ray ID: abc123", true), // 2 patterns
      ("Just a moment... DDoS protection by Cloudflare", true), // 3
      ("Perfectly normal documentation page", false),
      ("", false)
    ).toDF("content", "expected")
    val got = rows.withColumn("blocked", UrlFilters.isBlockedResponse($"content"))
      .where($"blocked" =!= $"expected").count()
    assert(got == 0)
  }

  // ---- C3/C4 hashing parity with python hashlib ----

  test("contentHash matches python md5 normalization") {
    val got = Seq("  Hello   WORLD  ", "Line1\n\nLine2\tTab").toDF("t")
      .select(Hashing.contentHash($"t")).as[String].collect()
    assert(got(0) == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(got(1) == "4b3be81c1023ee7dd46bfa7381887ce4")
  }

  test("cacheKey matches python sha256[:16]") {
    val got = Seq("https://example.com", "https://site-0.test/docs").toDF("u")
      .select(Hashing.cacheKey($"u")).as[String].collect()
    assert(got(0) == "100680ad546ce6a5")
    assert(got(1) == "f9818dccddb79bad")
  }
}
