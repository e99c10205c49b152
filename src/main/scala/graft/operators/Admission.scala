package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.PyUrl

/** F6 — SSRF admission (reference `validate_url_not_ssrf`,
  * `src/utils/security.py:19-32`): reject URLs whose host resolves into
  * private/reserved networks. DNS resolution is side-effecting, so the
  * resolver is pluggable — the default only inspects literal IPs (zero-
  * egress sandbox); cluster deployments pass a real resolver and the
  * check runs inside the fetch operator.
  */
object Ssrf {

  /** Private/reserved IPv4/IPv6 check (127/8, 10/8, 172.16/12, 192.168/16,
    * 169.254/16, ::1, fc00::/7 — the reference's list). */
  def isPrivateIp(ip: java.net.InetAddress): Boolean =
    ip.isLoopbackAddress || ip.isSiteLocalAddress || ip.isLinkLocalAddress ||
      ip.isAnyLocalAddress || {
        val b = ip.getAddress
        (b.length == 4 && (b(0) & 0xff) == 10) ||
        (b.length == 16 && ((b(0) & 0xfe) == 0xfc)) // fc00::/7
      }

  /** Literal-IP parse without DNS (returns None for names). */
  def literalIp(host: String): Option[java.net.InetAddress] = {
    val h =
      if (host.startsWith("[")) host.drop(1).takeWhile(_ != ']') // [v6]:port
      else host.takeWhile(_ != ':')                              // v4:port
    val ipv4 = h.matches("\\d{1,3}(\\.\\d{1,3}){3}")
    val ipv6 = host.startsWith("[")
    if (!ipv4 && !ipv6) None
    else try Some(java.net.InetAddress.getByName(h))
    catch { case _: Exception => None }
  }

  /** True if the URL must be rejected. `resolve` defaults to literal-only. */
  def isSsrf(url: String,
      resolve: String => Option[java.net.InetAddress] = literalIp): Boolean = {
    val host = PyUrl.urlparse(url).netloc
    if (host.isEmpty) true // unparseable → reject (reference raises)
    else resolve(host).exists(isPrivateIp)
  }

  /** Admission predicate column (literal-IP resolver). */
  def admitted(urlCol: Column): Column = {
    val u = udf((url: String) => !isSsrf(url))
    u(urlCol)
  }

  def filter(df: DataFrame, urlCol: Column): DataFrame = df.where(admitted(urlCol))
}

/** F8/J3 — the URL relevance filter + priority stage (reference
  * `filter_urls_with_llm`, `src/llm/filter.py:48-97`). The scorer is
  * pluggable; the deterministic default mirrors `crawl_model=None`
  * (stage skipped entirely, `runner.py:313-328`) so replay tests are
  * scorer-free. Any scorer's output is validated by intersection with the
  * input set (a left-semi join — `llm/filter.py:81`) and falls back to the
  * input ordering on failure (`:97`).
  */
trait RelevanceScorer extends Serializable {
  /** Input: (urlNorm, host); output must carry (urlNorm, score double). */
  def score(urls: DataFrame): DataFrame
}

/** crawl_model=None parity: no reordering (lexicographic priority stands). */
object IdentityScorer extends RelevanceScorer {
  override def score(urls: DataFrame): DataFrame =
    urls.select(col("urlNorm"), lit(0.0).as("score"))
}

/** Deterministic heuristic stand-in for the LLM: "reading order" ≈ shallow
  * paths first, then lexicographic. */
object DepthHeuristicScorer extends RelevanceScorer {
  override def score(urls: DataFrame): DataFrame =
    urls.select(col("urlNorm"),
      (size(split(graft.functions.urlfns.url_path(col("urlNorm")), "/")) * 1.0).as("score"))
}

object Relevance {
  /** Apply a scorer with the reference's safety contract: semi-join the
    * scorer output back to the candidate set (hallucinated URLs dropped),
    * candidates the scorer lost keep worst-priority, ordering ties break
    * lexicographically. Returns (urlNorm, host, priority). */
  def prioritize(candidates: DataFrame, scorer: RelevanceScorer): DataFrame = {
    val scored = scorer.score(candidates)
      .join(candidates.select("urlNorm"), Seq("urlNorm"), "left_semi") // J3
    candidates
      .join(scored, Seq("urlNorm"), "left_outer")
      .na.fill(Map("score" -> Double.MaxValue))
      .withColumn("priority", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("host").orderBy(col("score"), col("urlNorm"))).cast("long"))
      .select("urlNorm", "host", "priority")
  }
}
