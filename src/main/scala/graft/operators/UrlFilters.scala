package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.urlfns
import graft.util.PyUrl

/** F2/F3/F5 — deterministic URL filtering and blocked-response detection as
  * pure column expressions (fully codegen'd, pushdown-friendly).
  *
  * Semantics transcribed from the reference:
  *  - `filter_urls`       `src/crawler/filter.py:60-101`
  *  - `_matches_language` `src/crawler/filter.py:104-149`
  *  - `is_blocked_response` `src/scraper/detection.py:10-33`
  */
object UrlFilters {

  /** 27-extension blocklist (`filter.py:8-36`). */
  val ExcludedExtensions: Seq[String] = Seq(
    ".pdf", ".zip", ".tar", ".gz", ".rar", ".png", ".jpg", ".jpeg", ".gif",
    ".svg", ".ico", ".webp", ".mp4", ".mp3", ".wav", ".avi", ".mov", ".doc",
    ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".exe", ".dmg", ".deb", ".rpm")

  /** 6-pattern path blocklist (`filter.py:38-45`). */
  val ExcludedPatterns: Seq[String] = Seq(
    "/blog/", "/changelog/", "/api-reference/", "/releases/", "/download/", "/assets/")

  /** 9-language prefix table (`filter.py:47-57`). */
  val LanguagePatterns: Map[String, Seq[String]] = Map(
    "en" -> Seq("/en/", "/en-us/", "/en-gb/", "/en-au/", "/en-ca/", "/en-in/", "/english/"),
    "es" -> Seq("/es/", "/es-es/", "/es-mx/", "/es-ar/", "/es-cl/", "/es-co/", "/spanish/"),
    "fr" -> Seq("/fr/", "/fr-fr/", "/fr-ca/", "/french/"),
    "de" -> Seq("/de/", "/de-de/", "/de-at/", "/de-ch/", "/german/"),
    "ja" -> Seq("/ja/", "/jp/", "/japanese/"),
    "zh" -> Seq("/zh/", "/zh-cn/", "/zh-tw/", "/zh-hk/", "/chinese/"),
    "pt" -> Seq("/pt/", "/pt-br/", "/pt-pt/", "/portuguese/"),
    "ru" -> Seq("/ru/", "/russian/"),
    "ko" -> Seq("/ko/", "/kr/", "/korean/"))

  /** contains-any as ONE regexp_like — a per-pattern `Contains` chain would
    * duplicate the operand expression N× in the plan (observed: Janino
    * method-size overflow → interpreted fallback at 60+ patterns). */
  private def containsAny(c: Column, pats: Seq[String]): Column =
    regexp_like(c, lit(pats.map(java.util.regex.Pattern.quote).mkString("|")))

  private def endsWithAny(c: Column, suffixes: Seq[String]): Column =
    regexp_like(c, lit(suffixes.map(java.util.regex.Pattern.quote).mkString("(?:", "|", ")$")))

  /** rstrip('/') as a column op. */
  def rstripSlash(c: Column): Column = regexp_replace(c, "/+$", "")

  /** The language when-chain shared by the single-seed and multi-seed
    * filters — ONE definition so the target/others precedence can never
    * diverge between them. `baseHasLang`: whether the seed's own path
    * carries a language prefix (a literal for the single-seed path, a
    * joined column for multi-seed). */
  private def languagePredicate(pathCol: Column, language: String,
      baseHasLang: Column): Column = {
    if (language == "all") return lit(true)
    val pathLower = lower(pathCol)
    val target = LanguagePatterns.getOrElse(language, Seq(s"/$language/"))
    val others = (LanguagePatterns.keySet - language).toSeq.sorted
      .flatMap(LanguagePatterns(_))
    when(containsAny(pathLower, target), lit(true))
      .when(containsAny(pathLower, others), lit(false))
      .otherwise(!baseHasLang)
  }

  /** Whether a base URL's own path carries any language prefix. */
  def baseHasLanguage(baseUrl: String): Boolean = {
    val basePathLower = PyUrl.urlparse(baseUrl).path.toLowerCase(java.util.Locale.ROOT)
    LanguagePatterns.valuesIterator.flatten.exists(basePathLower.contains)
  }

  /** F3 — language predicate over a (already-extracted) path column.
    * `baseUrl` decides the no-prefix fallback exactly like the reference
    * (`filter.py:131-149`): if the base path itself carries a language
    * prefix, unprefixed URLs are excluded; otherwise included. */
  def matchesLanguage(pathCol: Column, language: String, baseUrl: String): Column =
    languagePredicate(pathCol, language, lit(baseHasLanguage(baseUrl)))

  /** F2 — the deterministic URL filter, as a single DataFrame transform.
    * Input: any df with `urlCol`; output: distinct, lexicographically sorted
    * single column `urlNorm` = scheme://netloc+rstrip(path), matching the
    * reference's `filtered.add(f"{scheme}://{netloc}{path}")` + `sorted()`
    * (`filter.py:93-101`). Query/params/fragment are dropped by the
    * reference here — transcribed as-is. */
  def filterUrls(df: DataFrame, urlCol: Column, baseUrl: String,
      language: String = "en"): DataFrame = {
    val base = PyUrl.urlparse(baseUrl)
    val baseDomain = base.netloc
    val basePath = { var p = base.path; while (p.endsWith("/")) p = p.dropRight(1); p }

    val host = urlfns.url_host(urlCol)
    val path = rstripSlash(urlfns.url_path(urlCol))
    val scheme = urlfns.url_scheme(urlCol)
    val pathLower = lower(path)

    val extPred = not(endsWithAny(pathLower, ExcludedExtensions))
    val patPred = not(containsAny(pathLower, ExcludedPatterns))

    df.select(host.as("host"), path.as("path"), scheme.as("scheme"))
      .where(col("host") === lit(baseDomain))
      .where(col("path").startsWith(lit(basePath)))
      .where(extPred and patPred)
      .where(matchesLanguage(col("path"), language, baseUrl))
      .select(concat(col("scheme"), lit("://"), col("host"), col("path")).as("urlNorm"))
      .distinct()
      .orderBy("urlNorm")
  }

  /** F2 for a multi-seed crawl: same predicates, but base-URL facts
    * (basePath, baseHasLanguage) come from a small broadcast `seeds` table
    * joined on host instead of driver constants. Input must carry
    * (`urlNorm`, `host`); output: (urlNorm, host) distinct.
    * seeds: Map(host → baseUrl). */
  def filterUrlsMulti(df: DataFrame, seeds: Map[String, String],
      language: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val seedRows = seeds.toSeq.sortBy(_._1).map { case (host, baseUrl) =>
      val bp = PyUrl.urlparse(baseUrl)
      val basePath = { var p = bp.path; while (p.endsWith("/")) p = p.dropRight(1); p }
      (host, basePath, baseHasLanguage(baseUrl))
    }
    val seedsDf = broadcast(seedRows.toDF("host", "basePath", "baseHasLang"))

    val path = rstripSlash(urlfns.url_path(col("urlNorm")))
    val scheme = urlfns.url_scheme(col("urlNorm"))
    val langPred = languagePredicate(col("path"), language, col("baseHasLang"))
    df.select(col("urlNorm"), col("host"), path.as("path"), scheme.as("scheme"))
      .join(seedsDf, Seq("host"), "inner") // host ∉ seeds → dropped (other domain)
      .where(startswith(col("path"), col("basePath")))
      .where(not(endsWithAny(lower(col("path")), ExcludedExtensions)))
      .where(not(containsAny(lower(col("path")), ExcludedPatterns)))
      .where(langPred)
      .select(concat(col("scheme"), lit("://"), col("host"), col("path")).as("urlNorm"),
        col("host"))
      .distinct()
  }

  /** The 8 blocked-response patterns (`detection.py:10-21`), as Spark
    * case-insensitive regexes. */
  val BlockedPatterns: Seq[String] = Seq(
    "(?i)checking your browser",
    "(?i)\\bcaptcha\\b",
    "(?i)\\baccess denied\\b",
    "(?i)\\bcloudflare\\b",
    "(?i)\\bray id\\b",
    "(?i)please enable javascript",
    "(?i)ddos protection",
    "(?i)just a moment")

  /** F5 — blocked-response predicate: ≥2 of the 8 patterns (threshold
    * mitigates false positives on docs *about* captchas,
    * `detection.py:22-33`). Null/empty content → not blocked. */
  def isBlockedResponse(content: Column): Column = {
    val matches = BlockedPatterns
      .map(p => when(regexp_like(content, lit(p)), 1).otherwise(0))
      .reduce(_ + _)
    coalesce(content.isNotNull && (matches >= 2), lit(false))
  }
}
